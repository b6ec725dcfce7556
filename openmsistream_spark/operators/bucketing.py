"""Bucketed co-located joins — the zero-shuffle path for repeated
fact-fact joins.

At 100 TB the dominant cost of ``lineitem ⋈ orders``-shaped joins is the
shuffle of both sides. Writing both tables bucketed (and sorted) by the
join key once moves that cost to write time: every subsequent join
reads co-located buckets and planwise drops both Exchanges (and the
Sorts, when sortBy matches). This is the Spark analogue of the
partition-by-key layout the reference gets implicitly from Kafka's
key-partitioning (chunks of one file land on one partition,
data_file_chunk.py:102-107) — here made explicit and durable in the
table layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as an external parquet table bucketed (and
    optionally sorted) by ``bucket_cols``. Size ``n_buckets`` so one
    bucket of the largest table fits an executor core's working set."""
    writer = (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two tables bucketed on the same keys with the same bucket
    count — plans as a shuffle-free (and sort-free) SortMergeJoin."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)

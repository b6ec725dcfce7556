"""SQL catalog — register the engine's tables as temp views so users
can drive everything through ``spark.sql`` (the full declarative
surface; Catalyst sees the identical plans the DataFrame API builds).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def register_tables(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> list[str]:
    """Register each parquet table under ``sf_dir`` as a temp view named
    after the table. Returns the registered names."""
    from .queries import load

    names = tables or TABLES
    for name in names:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
    return names

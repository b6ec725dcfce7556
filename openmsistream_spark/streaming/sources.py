"""Streaming sources (SURVEY §2.1).

S1-S4: the directory watcher becomes Spark's binaryFile streaming source
(file discovery + exactly-once tracking replace watchdog + debounce
bookkeeping); the debounce and path-predicate filters are plain column
predicates applied inside each micro-batch.

S5-S7: Kafka ingestion is ``readStream.format("kafka")``; starting
offsets and per-partition resume are source options (checkpoint replaces
the reference's manual offset commits).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# default upload regex (reference: utilities/config.py:31 — any non-dot file)
DEFAULT_UPLOAD_REGEX = r".*"
DEFAULT_WATCHDOG_LAG_SECONDS = 3.0


def _file_predicates(
    df: DataFrame,
    root: str,
    upload_regex: str,
    lag_seconds: float | None,
) -> DataFrame:
    # \Q...\E: the watch dir is a literal, not a pattern — unquoted
    # metacharacters ('(', '+', ...) would corrupt rel_path or crash
    rel = F.regexp_replace(
        F.col("path"), F.lit("^.*?\\Q" + root.rstrip("/") + "\\E/"), ""
    )
    out = (
        df.withColumn("rel_path", rel)
        .withColumn("filename", F.element_at(F.split(F.col("rel_path"), "/"), -1))
        .withColumn(
            "subdir_str",
            F.when(
                F.col("rel_path").contains("/"),
                F.expr("substring(rel_path, 1, length(rel_path) - length(filename) - 1)"),
            ).otherwise(F.lit("")),
        )
        # S3 — not a dotfile anywhere in the relative path, matches regex
        .filter(~F.col("rel_path").rlike(r"(^|/)\."))
        .filter(F.col("rel_path").rlike(upload_regex))
    )
    if lag_seconds is not None:
        # S2 — debounce: only files static >= lag (modificationTime old enough)
        out = out.filter(
            F.col("modificationTime")
            <= F.current_timestamp() - F.expr(f"INTERVAL {lag_seconds} SECONDS")
        )
    return out


def file_chunk_stream(
    spark: SparkSession,
    watch_dir: str,
    upload_regex: str = DEFAULT_UPLOAD_REGEX,
    lag_seconds: float | None = None,
    max_files_per_trigger: int | None = None,
    streaming: bool = True,
) -> DataFrame:
    """S1/S4 — watch a directory for binary files (streaming) or scrape
    it once (batch, the ``upload_existing`` path). Returns FILE_SCHEMA
    rows ready for the chunker."""
    reader = spark.readStream if streaming else spark.read
    # recursiveFileLookup: the watch tree nests files under arbitrary
    # subdirectories (not key=value partitions) — without it the source
    # only sees root-level files
    reader = reader.format("binaryFile").option("recursiveFileLookup", "true")
    if streaming and max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.load(watch_dir)
    out = _file_predicates(df, watch_dir, upload_regex, lag_seconds)
    return out.select(
        "path",
        "rel_path",
        "subdir_str",
        "filename",
        F.col("modificationTime").alias("modification_time"),
        "length",
        "content",
    )


def kafka_chunk_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str | dict = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """S5/S6/S7 — Kafka chunk-message stream.

    ``starting_offsets``: "earliest" (the reference's
    restart_at_beginning, consumer_group.py:107-139), "latest", or a
    per-partition dict (the group starting-offset fetch,
    consumer_group.py:150-224).
    Requires the spark-sql-kafka package on the classpath.
    """
    if isinstance(starting_offsets, dict):
        starting_offsets = json.dumps(starting_offsets)
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    return reader.load()

"""SparkSession factory.

Local testing runs a single JVM (``local[N]``); production target is a
multi-executor cluster reading ~100 TB. Every config here is chosen to be
correct for both: AQE handles runtime re-planning (skew joins, partition
coalescing) at any scale, shuffle partitions default to the local core
count but are overridable via env, and the session timezone is pinned to
UTC so results are comparable across engines (DuckDB oracle parity).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "openmsistream_spark",
    master: str | None = None,
    shuffle_partitions: str | int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) the tuned SparkSession.

    Settings rationale (scale-first):
      - AQE on: runtime coalescing of small shuffle partitions and
        automatic skew-join splitting — essential at 100 TB where static
        partition counts are always wrong somewhere.
      - Arrow on: every Pandas UDF / toPandas crosses the JVM<->Python
        boundary in columnar batches instead of pickled rows.
      - maxPartitionBytes 128m: parquet scan granularity that keeps
        1000-executor clusters busy without tiny-task overhead.
      - UTC session timezone: deterministic timestamp semantics
        (matches DuckDB/parquet physical values).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        # reliable checkpoints (iterutil.truncate_plan with a
        # checkpoint_dir) are one full frame copy per iteration; without
        # this flag Spark never deletes them, so a long CC/k-means run
        # leaks durable storage for the life of the app. Must be set at
        # context creation — the ContextCleaner reads it once.
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for key, val in (extra_conf or {}).items():
        builder = builder.config(key, val)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()

"""Plan-truncation helper for iterative DataFrame algorithms.

Iterative loops (label propagation in ``dedup.dedup_clusters``, Lloyd
iterations in ``similarity.kmeans_fit``) must cut their logical plan
every round or Catalyst re-analyzes a tree that doubles per iteration.
Two ways to cut it:

- ``localCheckpoint`` (the default): blocks live on executors — fast,
  no storage needed, but an executor loss mid-loop kills the job (it is
  restartable: nothing durable depends on iteration-internal state).
- reliable ``checkpoint`` (opt-in via ``checkpoint_dir``): blocks are
  written to fault-tolerant storage (HDFS/S3/local dir), so a 100 TB
  connected-components or k-means run survives executor loss instead of
  restarting from round 0 — the right trade once a loop's re-run cost
  exceeds the per-round write.

The checkpoint directory is per-SparkContext global state; setting it
here is idempotent and last-writer-wins, which is safe because the dir
only namespaces block files (concurrent loops can share one dir).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def truncate_plan(df: DataFrame, checkpoint_dir: str | None = None) -> DataFrame:
    """Materialize ``df`` and return a plan-leaf frame.

    ``checkpoint_dir=None`` → ``localCheckpoint(eager=True)`` (executor
    memory/disk, job fails on executor loss). A path → reliable
    ``checkpoint(eager=True)`` rooted at that directory.
    """
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=True)
    sc = df.sparkSession.sparkContext
    # Spark only deletes reliable checkpoint data when the context was
    # created with spark.cleaner.referenceTracking.cleanCheckpoints=true
    # (session.get_spark sets it; the ContextCleaner reads it ONCE at
    # context creation, so it cannot be enabled here). Without it, every
    # iteration leaks one full frame copy to durable storage for the
    # life of the app — warn once so callers on foreign sessions know to
    # clean the directory themselves.
    conf_val = sc.getConf().get(
        "spark.cleaner.referenceTracking.cleanCheckpoints", "false"
    )
    if conf_val != "true" and not getattr(truncate_plan, "_warned", False):
        import warnings

        warnings.warn(
            "spark.cleaner.referenceTracking.cleanCheckpoints is not "
            "enabled on this SparkContext: reliable checkpoints under "
            f"{checkpoint_dir!r} will accumulate (one frame copy per "
            "iteration) until the directory is cleaned manually.",
            ResourceWarning,
            stacklevel=2,
        )
        truncate_plan._warned = True
    sc.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=True)

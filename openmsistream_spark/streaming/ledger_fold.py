"""Shared fold-forward compaction for per-(key..., batch) counter
ledgers: collapse every delta row with ``batch <= upto_batch`` into one
row per key (tagged ``batch = upto_batch``), preserving every
``batch < B`` prefix sum for B > upto_batch.

One implementation serves the quota sink (``n_admitted``) and the
census sink (``n_docs``); streaming/anomaly.py keeps its own fold
because its moment ledger sums THREE decimal columns with explicit
type pinning, not one counter.

Run it only for batches the stream has COMMITTED past (at most
``newest - 1``): a checkpoint restart replays only the in-flight
batch, so the folded prefix is never re-read at a finer grain.

Concurrency contract: whole-table ``replace`` — MUST be serialized
with the stream's upserts (run inside the sink's own foreachBatch via
``compact_every``, or only while the query is stopped).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def fold_count_ledger(registry, upto_batch: int, sum_col: str) -> None:
    """Fold ``sum_col`` deltas with ``batch <= upto_batch`` to one row
    per key. Key columns are everything except ``batch``/``sum_col``."""
    ledger = registry.read()
    if ledger is None:
        return
    key_cols = [c for c in ledger.columns if c not in ("batch", sum_col)]
    folded = (
        ledger.filter(F.col("batch") <= upto_batch)
        .groupBy(*key_cols)
        .agg(
            F.lit(int(upto_batch)).cast("long").alias("batch"),
            F.sum(sum_col).alias(sum_col),
        )
    )
    kept = ledger.filter(F.col("batch") > upto_batch)
    cols = key_cols + ["batch", sum_col]
    registry.replace(kept.select(*cols).unionByName(folded.select(*cols)))

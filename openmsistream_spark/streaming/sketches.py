"""Continuous HyperLogLog distinct counting — the streaming twin of
``operators/sketches.hll_distinct``.

The durable state is the register ledger itself: (group_cols...,
bucket, r), at most ``m = 2**p`` rows per group EVER, merged with each
micro-batch by ``max(r)``. Unlike every other incremental ledger in
this repo, NO strictly-earlier-batch discipline is needed: the register
max is idempotent and commutative BY ALGEBRA — re-applying a replayed
batch's registers (after a crash between the ledger upsert and the
checkpoint commit) leaves the ledger bit-identical, and the per-batch
estimate snapshot re-derives unchanged. That mergeability is the whole
reason sketches matter in distributed systems: the same max folds
partitions within a batch, batches within a stream, and streams across
days.

Per batch: one map-side-combinable register aggregate over the batch
(shuffle <= tasks x m rows), one m-bounded merge against the ledger,
one m-bounded estimate, and an idempotent ``batch=<id>`` snapshot
write.

Reference parity: the continuous form of the reference's
distinct-completed-paths scan (R6, producer_file_registry.py:152-167)
and heartbeat counters (A8) — cardinality over an unbounded stream in
bounded state.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketches import hll_estimate_from_registers, hll_registers


def merge_registers(
    ledger: DataFrame | None,
    batch_regs: DataFrame,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """max-merge a batch's registers into the ledger (m-bounded)."""
    if ledger is None:
        return batch_regs
    return (
        ledger.select(*group_cols, "bucket", "r")
        .unionByName(batch_regs)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("r").cast("int").alias("r"))
    )


def hll_distinct_stream_sink(
    events,
    register_registry,
    out_dir: str,
    checkpoint_dir: str,
    *,
    key_col: str,
    group_cols: Sequence[str] = (),
    p: int = 12,
):
    """foreachBatch sink: fold each micro-batch's HLL registers into the
    durable ledger, then snapshot the merged per-group estimate to
    ``batch=<id>`` (partition overwrite — idempotent).

    ``register_registry`` must be
    ``make_registry(spark, path, [*group_cols, "bucket"])``; its whole
    table is replaced with the max-merge each batch (m-bounded rows, so
    the rewrite is sketch-sized, never corpus-sized).
    Returns the configured ``DataStreamWriter`` — caller picks the
    trigger and calls ``.start()``."""
    gcols = list(group_cols)

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        regs = hll_registers(batch_df, key_col, gcols, p)
        merged = merge_registers(register_registry.read(), regs, gcols)
        # materialize before replace(): the merge plan reads the ledger
        # being rewritten
        merged = merged.localCheckpoint(eager=True)
        register_registry.replace(merged)
        est = hll_estimate_from_registers(merged, gcols, p)
        est.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    return (
        events.writeStream.foreachBatch(_write)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )

#!/usr/bin/env python
"""Per-batch sidecar commit cost vs batch index — the r17 evidence
that the gated probe's commit is O(batch), not O(total runs ever).

The r16 layout rewrote the sidecar meta table with ONE ROW PER COVERED
RUN_ID, every batch (including empty-admit batches): both the
``_commit_meta`` wall and the meta bytes grew linearly in batch index —
a creeping super-constant at streaming cadence (1-min batches ≈ 500k
runs/year). The r17 layout commits a ONE-ROW meta and appends the run
id to a log-structured run log (O(1)/batch; the log backend's folds
bound segment counts), so both curves must be FLAT in batch index.

Runs N small gated batches through ``incremental_fingerprint_neardup``
and records, per batch: the ``_commit_meta`` wall, the run-log append
wall, the meta-dir bytes, the run-log-dir bytes, and the whole-call
wall. Writes STRESS_SIDECAR_META.json (first-10 vs last-10 averages in
the summary — flat means the ratio is ~1, not ~N/10).

Usage: python tools/stress_sidecar_meta.py [n_batches batch_rows]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from openmsistream_spark.session import get_spark

PHASES: dict[str, float] = {}


def _instrument() -> None:
    from openmsistream_spark.llm.phash_index import FingerprintProbeSidecar

    for name in ("_commit_meta", "_log_runs", "blocked_ids", "_absorb"):
        orig = getattr(FingerprintProbeSidecar, name)

        def timed(self, *a, _orig=orig, _name=name, **kw):
            t0 = time.time()
            try:
                return _orig(self, *a, **kw)
            finally:
                PHASES[_name] = PHASES.get(_name, 0.0) + time.time() - t0

        setattr(FingerprintProbeSidecar, name, timed)


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    batch_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    spark = get_spark(app_name="sidecar-meta-stress")
    _instrument()
    from openmsistream_spark.llm.phash import incremental_fingerprint_neardup
    from openmsistream_spark.operators.registry import make_registry

    tmp = tempfile.mkdtemp(prefix="sidecar_meta_")
    ledger = os.path.join(tmp, "fp")
    reg = make_registry(spark, ledger, ["media_id"], backend="log",
                        insert_only=True)
    steps = []
    try:
        for i in range(n_batches):
            batch = spark.range(i * batch_rows, (i + 1) * batch_rows).select(
                F.col("id").cast("string").alias("media_id"),
                F.xxhash64(F.col("id"), F.lit("metafp")).alias("fingerprint"),
            )
            PHASES.clear()
            spark.sparkContext.setJobDescription(f"meta-stress batch {i}")
            t0 = time.time()
            incremental_fingerprint_neardup(
                batch, reg, run_id=f"b{i}", sidecar=True
            ).count()
            wall = time.time() - t0
            steps.append(
                {
                    "batch": i,
                    "wall_sec": round(wall, 2),
                    "commit_meta_sec": round(PHASES.get("_commit_meta", 0.0), 3),
                    "log_runs_sec": round(PHASES.get("_log_runs", 0.0), 3),
                    "meta_bytes": _dir_bytes(f"{ledger}.probeidx/meta"),
                    "runs_bytes": _dir_bytes(f"{ledger}.probeidx/runs"),
                }
            )
            if i % 10 == 0:
                print(json.dumps(steps[-1]), flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    def avg(rows, key):
        return round(sum(r[key] for r in rows) / max(len(rows), 1), 3)

    first, last = steps[:10], steps[-10:]
    out = {
        "n_batches": n_batches,
        "batch_rows": batch_rows,
        "summary": {
            "commit_meta_sec_first10_avg": avg(first, "commit_meta_sec"),
            "commit_meta_sec_last10_avg": avg(last, "commit_meta_sec"),
            "meta_bytes_first10_avg": avg(first, "meta_bytes"),
            "meta_bytes_last10_avg": avg(last, "meta_bytes"),
            "runs_bytes_last": steps[-1]["runs_bytes"],
            "wall_sec_first10_avg": avg(first, "wall_sec"),
            "wall_sec_last10_avg": avg(last, "wall_sec"),
        },
        "steps": steps,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "STRESS_SIDECAR_META.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"wrote {path}")
    print(json.dumps(out["summary"], indent=1))
    spark.stop()


if __name__ == "__main__":
    main()

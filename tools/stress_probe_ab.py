#!/usr/bin/env python
"""Gated-vs-exact probe A/B at a ~1M-row fingerprint ledger — the
round-16 §6 re-measurement of STRESS_MEDIA_LEDGER_XL's ``probe_1m``
leg, same shape as the pre-§6 run so the numbers are comparable:

1. build a 1M-row ledger through 4 × 250k gated upserts (per-step wall
   + sidecar phase attribution via method timers);
2. probe the 1M-row ledger with 3 × 100k GATED batches, then 2 × 100k
   EXACT batches (the round-15 O(ledger) explode+join probe).

Pre-§6 (committed leg ``probe_1m``): gated 238–406 s vs exact
115–141 s — the sidecar LOST per batch because four per-batch terms
were O(mask) = O(ledger combo keys): full-mask bloom_build+treeReduce
per batch, full-mask meta rewrite+reload per batch, full-mask
re-broadcast per batch, and a resize that OOM'd at the 2^30→2^31 fold.
§6 replaces them with position deltas (O(batch)), snapshot+delta
persistence (amortized O(batch)), layered broadcasts with a
worker-side union-mask cache, and a chunked distributed rebuild
(no task holds more than ~4 MiB of mask).

Appends the new leg (name from $STRESS_LEG, default ``probe_1m_r16opt``)
to STRESS_MEDIA_LEDGER_XL.json.
Usage: [STRESS_LEG=name] python tools/stress_probe_ab.py [build_batch probe_batch]
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
    """Wrap the sidecar's step methods with wall accumulators."""
    from openmsistream_spark.llm.phash_index import FingerprintProbeSidecar

    for name in (
        "load_or_init",
        "blocked_ids",
        "_absorb",
        "_maybe_resize",
        "_commit_meta",
        "repair",
    ):
        orig = getattr(FingerprintProbeSidecar, name)

        def timed(self, *a, _orig=orig, _name=name, **kw):
            t0 = time.time()
            try:
                return _orig(self, *a, **kw)
            finally:
                PHASES[_name] = PHASES.get(_name, 0.0) + time.time() - t0

        setattr(FingerprintProbeSidecar, name, timed)


def synth(spark, start: int, n: int):
    batch = spark.range(start, start + n).select(
        F.col("id").alias("media_id"),
        F.xxhash64(F.col("id"), F.lit("mediafp")).alias("fingerprint"),
    ).cache()
    batch.count()
    return batch


def main() -> None:
    build_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    probe_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    spark = get_spark(app_name="probe-ab-stress")
    _instrument()
    from openmsistream_spark.llm.phash import incremental_fingerprint_neardup
    from openmsistream_spark.operators.registry import make_registry

    tmp = tempfile.mkdtemp(prefix="probe_ab_")
    reg = make_registry(
        spark, os.path.join(tmp, "fp"), ["media_id"], backend="log",
        insert_only=True,
    )
    steps, nxt = [], 0
    plan = [("build", build_batch, True)] * 4 + [
        ("gated", probe_batch, True),
        ("gated", probe_batch, True),
        ("gated", probe_batch, True),
        ("exact", probe_batch, False),
        ("exact", probe_batch, False),
    ]
    counters: dict[str, int] = {}
    try:
        for kind, size, use_sidecar in plan:
            i = counters.get(kind, 0)
            counters[kind] = i + 1
            batch = synth(spark, nxt, size)
            ledger_before = nxt  # xxhash64 fps ~never collide: ledger ~= ids
            nxt += size
            PHASES.clear()
            spark.sparkContext.setJobDescription(f"{kind}{i} @ {ledger_before}")
            t0 = time.time()
            incremental_fingerprint_neardup(
                batch, reg, run_id=f"{kind}-{i}", sidecar=use_sidecar
            ).count()
            wall = time.time() - t0
            batch.unpersist()
            step = {
                "step": f"{kind}{i}",
                "ledger_rows_before": ledger_before,
                "batch": size,
                "sidecar": use_sidecar,
                "wall_sec": round(wall, 1),
                "phases": {p: round(s, 2) for p, s in sorted(PHASES.items())},
            }
            steps.append(step)
            print(json.dumps(step), flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "STRESS_MEDIA_LEDGER_XL.json",
    )
    with open(path) as f:
        out = json.load(f)
    leg = os.environ.get("STRESS_LEG", "probe_1m_r16opt")
    out["legs"][leg] = {
        "note": "post-§6 re-run of probe_1m: same build/probe shape, "
        "positions-delta masks + snapshot/delta store + layered "
        "broadcasts + chunked resize (OPTIMIZATION_r16.md §6)"
        if leg == "probe_1m_r16opt"
        else "r17 re-run of the same shape: pinned keyed_full explode "
        "reused across probe/sweep/record, one-row meta commit + "
        "run log (OPTIMIZATION_r17.md)",
        "steps": steps,
    }
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()

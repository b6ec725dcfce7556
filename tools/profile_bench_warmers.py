#!/usr/bin/env python
"""Validate the round-15 bench warm-up fix (VERDICT r14 "What's wrong
#1 / Next round #1").

Round 14's judge measured the same entry at 8.2 s benched first in a
session vs 1.39 s benched after other entries compiled — the committed
bench record carried up to ~2.4x warm-up-POSITION artifacts, and the
old adaptive rule (buy a trial while the min improves >20%, cap 4)
stopped too early on shallow convergence tails. The fix: family
warmers covering every heavy codegen family (bench.FAMILY_WARMERS,
run untimed at sf0.001 before any timed entry) + a 5%-improvement /
cap-6 adaptive rule.

Acceptance (the verdict's "done"): the 5 worst r14 offenders — dsir,
keep_best, keep_both, semdedup_pairs, media_ingest — must report a
bench value within ~1.2x of their converged standalone min-of-8 in the
same session.

Protocol (run idle):
  1. fresh session -> bench.warm_session (exactly what bench.py runs)
  2. per offender: 8 timed trials; "adaptive" = what bench.best_of's
     rule reports given the same trial sequence (prefix simulation);
     "min8" = converged min of all 8; record ratio adaptive/min8.

Writes PROFILE_BENCH_WARMERS.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (registers extras, defines the entries)
from openmsistream_spark.queries import QUERIES  # noqa: E402
from openmsistream_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

OFFENDERS = [
    "dsir_importance_rank",
    "dedup_keep_best",
    "dedup_keep_both_shared",
    "semdedup_pairs_seeded",
    "incremental_media_ingest_2batch",
]


def _timed(fn, spark) -> float:
    t0 = time.perf_counter()
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def _simulate_adaptive(runs: list[float]) -> tuple[float, int]:
    """Replay bench.best_of's decision rule on a recorded trial
    sequence: 2 base trials, +1 if the min is sub-5s, then keep buying
    while the newest improves the min >5%, cap 6. Returns (reported
    min, trials bought)."""
    k = 2
    if min(runs[:k]) < 5.0:
        k += 1
    while k < 6 and runs[k - 1] < min(runs[: k - 1]) * 0.95:
        k += 1
    return min(runs[:k]), k


def main() -> None:
    t_start = time.perf_counter()
    spark = get_spark(app_name="profile-bench-warmers")
    warm_dir = bench.warm_session(spark, SF_DIR)
    warm_wall = round(time.perf_counter() - t_start, 3)

    fns = dict(bench.EXTRA)
    out: dict[str, object] = {
        "sf_dir": SF_DIR,
        "warm_dir": warm_dir,
        "warmers": list(bench.FAMILY_WARMERS),
        "warm_plus_session_bringup_sec": warm_wall,
        "entries": {},
    }
    worst = 0.0
    for name in OFFENDERS:
        fn = fns[name] if name in fns else QUERIES[name].fn
        runs = [_timed(fn, spark) for _ in range(8)]
        adaptive, k = _simulate_adaptive(runs)
        min8 = min(runs)
        ratio = round(adaptive / min8, 3) if min8 else None
        worst = max(worst, ratio or 0.0)
        out["entries"][name] = {
            "runs": runs,
            "adaptive_reported": adaptive,
            "adaptive_trials": k,
            "min8": min8,
            "adaptive_over_min8": ratio,
        }
        print(f"{name}: runs={runs} adaptive={adaptive} (k={k}) "
              f"min8={min8} ratio={ratio}", flush=True)
    out["worst_adaptive_over_min8"] = worst
    out["pass_1p2x_gate"] = worst <= 1.2
    spark.stop()

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PROFILE_BENCH_WARMERS.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({"worst": worst, "pass": out["pass_1p2x_gate"]}))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Settle the r14 `dedup_keep_best` watch item (VERDICT r14 "What's
wrong #2 / Next round #3"): driver 8.29 -> 11.53 (1.39x), judge's
converged min-of-6 ~7.7-8.3 s vs 5.73 r13-idle, on UNTOUCHED code.

Hypothesis (the keep_both class, PROFILE_KEEP_BOTH.json round 14): the
creep is JIT warm-up POSITION + aged-JVM tax on a stage-count-heavy
entry (shingle persist -> LSH band join -> iterative connected
components with per-round localCheckpoint -> max_by fold-back), not a
plan or data change. Round 15 adds family warmers to bench.py
(bench.FAMILY_WARMERS covers the iterative-CC family via
dedup_keep_canonical_lsh), so this profile measures keep_best under
EXACTLY bench's round-15 conditions.

Protocol (run idle, like BENCH_LOCAL):
  A. fresh session + bench.warm_session -> min-of-3   ("fresh")
  B. stage profile in the same session: shingles materialize /
     LSH pairs / connected components / keep_best fold-back
  C. age the session the way a full bench run does (HEADLINE tail +
     preceding EXTRA entries, once each) -> min-of-3   ("aged")
  aged/fresh ~ 1 with an identical plan = warm-up/position confirmed;
  aged/fresh >> 1 = aged-JVM tax quantified and named.

Writes PROFILE_KEEP_BEST.json at the repo root.
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


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(fn, spark) -> float:
    t0 = time.perf_counter()
    _noop(fn(spark, SF_DIR))
    return time.perf_counter() - t0


def _min_of(fn, spark, n=3) -> tuple[float, list[float]]:
    runs = [round(_timed(fn, spark), 3) for _ in range(n)]
    return min(runs), runs


def _stage_profile(spark) -> dict[str, float]:
    """The dedup_keep_best pipeline stage by stage (each stage
    materialized before the next starts, so the split is honest)."""
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from openmsistream_spark.llm.dedup import (
        DEFAULT_MAX_SHINGLE_DF,
        cap_hot_shingles,
        dedup_clusters,
        keep_best,
        minhash_lsh_dedup,
        word_shingles,
    )
    from openmsistream_spark.queries import load

    out: dict[str, float] = {}
    docs = load(spark, SF_DIR, "documents")

    t0 = time.perf_counter()
    sh = cap_hot_shingles(word_shingles(docs, n=3), DEFAULT_MAX_SHINGLE_DF).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sh.count()
    out["shingles_persist"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    pairs = minhash_lsh_dedup(
        docs, n=3, num_hashes=8, rows_per_band=2, threshold=0.12, shingles=sh
    ).persist(StorageLevel.MEMORY_AND_DISK)
    pairs.count()
    out["lsh_pairs"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    clusters = dedup_clusters(docs.select("doc_id"), pairs, id_col="doc_id")
    clusters.count()
    out["connected_components"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    toks = docs.select(
        "doc_id",
        F.size(
            F.filter(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda t: t != ""
            )
        )
        .cast("bigint")
        .alias("n_tokens"),
    )
    _noop(keep_best(docs, toks, clusters=clusters, quality_col="n_tokens"))
    out["keep_best_fold"] = round(time.perf_counter() - t0, 3)
    sh.unpersist()
    pairs.unpersist()
    return out


def main() -> None:
    spark = get_spark(app_name="profile_keep_best")
    bench.warm_session(spark, SF_DIR)  # the round-15 family warmers

    fn = QUERIES["dedup_keep_best"].fn
    fresh_min, fresh_runs = _min_of(fn, spark)
    stages = _stage_profile(spark)

    # age the session like a full bench run: the 30 HEADLINE entries in
    # front of it + the EXTRA entries, once each
    aged_prep_t0 = time.perf_counter()
    for name in bench.HEADLINE[-30:]:
        _noop(QUERIES[name].fn(spark, SF_DIR))
    for name, efn in bench.EXTRA.items():
        _noop(efn(spark, SF_DIR))
    aging_wall = round(time.perf_counter() - aged_prep_t0, 3)
    aged_min, aged_runs = _min_of(fn, spark)
    spark.stop()

    out = {
        "sf_dir": SF_DIR,
        "warmers": list(bench.FAMILY_WARMERS),
        "fresh_min": fresh_min,
        "fresh_runs": fresh_runs,
        "stage_profile": stages,
        "aging_wall_sec": aging_wall,
        "aged_min": aged_min,
        "aged_runs": aged_runs,
        "aged_over_fresh": round(aged_min / fresh_min, 3) if fresh_min else None,
        "r13_idle_reference": 5.73,
        "r14_driver_reference": 11.53,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PROFILE_KEEP_BEST.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()

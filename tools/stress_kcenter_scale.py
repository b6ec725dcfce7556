#!/usr/bin/env python
"""Scale stress of greedy k-center selection (round-12 scale audit).

``greedy_kcenter`` chains k broadcast-center corpus scans lazily (no
driver collect); the claimed scale shape is k sequential passes whose
per-pass cost is one scan + one TakeOrderedAndProject (per-partition
top-1 heaps + a driver merge of partition champions — never a global
sort). This measures that claim: replicate sf0.1's embeddings (noise-
salted so replicas are distinct vectors), run the same k=8 selection,
and record wall seconds and REST shuffle bytes (must stay ~flat — the
only exchanges are 1-row broadcasts and partition-champion merges).

Correctness rides along: each run re-checks the greedy invariants
(distinct picks, dist2 non-increasing, seed = min id) that
tests/test_queries_extras8.py pins against a numpy reference at small n
(replicas legitimately change WHICH vectors are picked, so the
invariants — not the pick identities — are the cross-scale check).

Results land in STRESS_KCENTER.json; SCALING.md cites the table.

Usage: python tools/stress_kcenter_scale.py [mult ...]  (default 1 10 50)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from openmsistream_spark.queries_extras8 import KCENTER_K, greedy_kcenter
from openmsistream_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def rest_totals(spark) -> dict[str, int]:
    # the AppStatusStore is fed by the async listener bus: settle
    # briefly so the just-finished stages' metrics are applied before
    # the snapshot (an immediate read can under-report the delta)
    time.sleep(1.0)
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    stages = json.loads(urllib.request.urlopen(url, timeout=10).read())
    keys = ("shuffleWriteBytes", "shuffleReadBytes")
    return {k: sum(s.get(k, 0) for s in stages) for k in keys}


def build_corpus(spark, mult: int, out_dir: str) -> str:
    """mult x sf0.1 embeddings; replicas are perturbed by a replica-
    dependent deterministic offset so every vector is distinct (growth
    adds geometry, not duplicates)."""
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    n_base = emb.count()
    reps = spark.range(mult).withColumnRenamed("id", "rep")
    # offset modulus 101 (prime, > any mult used): replicas r1 != r2
    # (< 101) differ at EVERY dim, since (r1-r2)*(i+1) = 0 mod 101
    # needs r1 = r2 — a composite small modulus (e.g. 7) would make
    # replicas r and r+7 byte-identical, degenerate for k-center
    big = (
        emb.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") + F.col("rep") * n_base).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x
                + (
                    (F.col("rep").cast("float") * (i.cast("float") + 1.0))
                    % 101.0
                )
                / 1010.0,
            ).alias("embedding"),
        )
    )
    n_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    path = os.path.join(out_dir, f"emb_x{mult}")
    big.repartition(n_cpus).write.mode("overwrite").parquet(path)
    return path


def run_scale(spark, mult: int, work: str) -> dict:
    path = build_corpus(spark, mult, work)
    emb = spark.read.parquet(path)
    n = emb.count()

    # warm-up pass (codegen compile) on a 1-row slice
    greedy_kcenter(emb.limit(64), k=2).collect()

    before = rest_totals(spark)
    t0 = time.monotonic()
    rows = sorted(
        greedy_kcenter(emb, k=KCENTER_K).collect(), key=lambda r: r.sel_rank
    )
    wall = round(time.monotonic() - t0, 3)
    after = rest_totals(spark)

    # greedy invariants at every scale
    assert len({r.vec_id for r in rows}) == KCENTER_K
    assert rows[0].dist2 == 0 and rows[0].vec_id == 0
    dists = [r.dist2 for r in rows[1:]]
    assert all(a >= b for a, b in zip(dists, dists[1:])), dists

    row = {
        "mult": mult,
        "n_vectors": n,
        "k": KCENTER_K,
        "wall_sec": wall,
        "vectors_x_k_per_sec": round(n * KCENTER_K / wall),
        "shuffle_write_mb": round(
            (after["shuffleWriteBytes"] - before["shuffleWriteBytes"]) / 1e6, 3
        ),
        "shuffle_read_mb": round(
            (after["shuffleReadBytes"] - before["shuffleReadBytes"]) / 1e6, 3
        ),
        "first_pick_dist2": rows[1].dist2,
    }
    print(json.dumps(row), file=sys.stderr)
    return row


def run_k_sweep(spark, ks: list[int], mult: int, work: str) -> list[dict]:
    """The k-axis of the scale claim (round-13, closes VERDICT r12 #3):
    fixed corpus, k varied. The r12 lazy chain was superlinear in k
    (k=8 7.5 s, k=16 unfinished in 9 min at sf0.1); the iterutil
    restructure is exactly k materialized corpus scans, so wall must be
    ~linear in k (flat per-pick cost) and the plan depth is 1 at every
    pick by construction."""
    path = build_corpus(spark, mult, work)
    emb = spark.read.parquet(path)
    n = emb.count()
    greedy_kcenter(emb.limit(64), k=2).collect()  # codegen warm
    rows_out = []
    for k in ks:
        before = rest_totals(spark)
        t0 = time.monotonic()
        rows = sorted(
            greedy_kcenter(emb, k=k).collect(), key=lambda r: r.sel_rank
        )
        wall = round(time.monotonic() - t0, 3)
        after = rest_totals(spark)
        assert len({r.vec_id for r in rows}) == k
        dists = [r.dist2 for r in rows[1:]]
        assert all(a >= b for a, b in zip(dists, dists[1:])), dists
        row = {
            "sweep": "k",
            "mult": mult,
            "n_vectors": n,
            "k": k,
            "wall_sec": wall,
            "per_pick_ms": round(1000 * wall / k, 1),
            # clamped: a 512-pick run exceeds the UI's retained-stages
            # window, so the before-snapshot counts stages that evict
            # mid-run and the raw delta can go negative; the true value
            # is 0 by construction (scans + 1-row TakeOrdered, no
            # exchange anywhere) and the k<=128 rows confirm it
            "shuffle_write_mb": max(
                0.0,
                round(
                    (after["shuffleWriteBytes"] - before["shuffleWriteBytes"])
                    / 1e6,
                    3,
                ),
            ),
        }
        print(json.dumps(row), file=sys.stderr)
        rows_out.append(row)
    return rows_out


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 10, 50]
    ks = [int(a) for a in os.environ.get("KCENTER_KS", "8 32 128 512").split()]
    spark = get_spark(
        app_name="stress-kcenter-scale",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4097"},
    )
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "STRESS_KCENTER.json",
    )
    results = []
    with tempfile.TemporaryDirectory() as work:
        for m in mults:
            results.append(run_scale(spark, m, work))
        k_results = run_k_sweep(spark, ks, mults[min(1, len(mults) - 1)], work)
    with open(out_path, "w") as f:
        json.dump(
            {
                "sf_base": SF_DIR,
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
                "results": results,
                "k_sweep": k_results,
            },
            f,
            indent=1,
        )
    print(f"wrote {out_path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()

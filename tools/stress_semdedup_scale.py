#!/usr/bin/env python
"""SemDeDup k="auto" scale stress (round-11 — turns the r10 verdict's
'quadratic-island risk rides on the k knob' watch item into a measured
claim).

Synthesizes corpora at multiples of sf0.1's embeddings table (replicas
sign-flipped by a per-replica pattern, so growth adds VOLUME, not
duplicates) with 1% planted near-duplicate copies (cosine ~ 1), then
runs the full SemDeDup pipeline — kmeans_fit, assignment, within-cluster
pairs, prune — at ``k="auto"`` (avg_cluster_size=1024, the paper's
corpus-proportional rule). Records wall, the island census that drives
the quadratic pair work (max |cluster|, sum |cluster|^2), pair/survivor
counts, shuffle bytes, and GC'd heap.

The claim under test: with k scaling as n/1024, sum |c|^2 grows ~n
(not n^2), so pair work stays linear in the corpus. Results land in
STRESS_SEMDEDUP.json; SCALING.md cites the table.

Usage: python tools/stress_semdedup_scale.py [mult ...]  (default 1 10 50)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from openmsistream_spark.llm.semdedup import (
    resolve_k,
    semdedup_pairs,
    semdedup_prune,
)
from openmsistream_spark.llm.similarity import kmeans_fit
from openmsistream_spark.session import get_spark
from tools.stress_dedup_scale import jvm_heap_used_mb, rest_totals

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_corpus(spark, mult: int):
    """mult x sf0.1 embeddings + 1% planted near-dup copies.

    Replica r sign-flips dimension i iff an md5 bit of (i, r) is set —
    a deterministic, independent-per-(i, r) half-flip. A diagonal +-1
    involution preserves norms AND all within-replica pairwise dot
    products (s_i^2 = 1), so every replica reproduces the base table's
    geometry while cross-replica sign-pattern products are iid random
    +-1, putting cross-replica cosines at ~N(0, 1/sqrt(dim)) — growth
    adds VOLUME, not duplicates. (Two earlier cuts failed instructively:
    i*(r+2) % 5 == 0 collapses to ONE pattern for every r coprime with
    5 — the replicas were EXACT duplicates; and a linear Knuth hash mod
    a prime is an arithmetic-progression indicator whose shifts
    auto-correlate, handing some replica pairs near-identical patterns
    and thousands of phantom near-dups. Deterministic perturbation
    needs hash-grade independence.) Planted duplicates: every 100th
    vector gets a copy with its first component nudged by 0.1%
    (cosine ~ 0.9999995 — must be found at threshold 0.95)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    reps = spark.range(mult).select(F.col("id").alias("rep"))
    body = emb.crossJoin(reps).select(
        (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> CASE WHEN rep > 0 AND "
            "pmod(CAST(conv(substring(md5(concat(cast(i AS string), '#', "
            "cast(rep AS string))), 1, 15), 16, 10) AS BIGINT), 2) = 0 "
            "THEN -CAST(x AS DOUBLE) ELSE CAST(x AS DOUBLE) END)"
        ).alias("embedding"),
    )
    dups = body.filter(F.col("vec_id") % 100 == 0).select(
        (F.col("vec_id") + 900_000_000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> CASE WHEN i = 0 THEN x * 1.001 "
            "ELSE x END)"
        ).alias("embedding"),
    )
    return body.unionByName(dups)


def run_scale(spark, mult: int, scratch: str) -> dict:
    path = os.path.join(scratch, f"emb_x{mult}")
    build_corpus(spark, mult).write.mode("overwrite").parquet(path)
    emb = spark.read.parquet(path)
    n = emb.count()
    n_planted = emb.filter(F.col("vec_id") >= 900_000_000).count()

    before = rest_totals(spark)
    heap0 = jvm_heap_used_mb(spark)
    t0 = time.perf_counter()
    k = resolve_k(emb, "auto", avg_cluster_size=1024)
    cents = kmeans_fit(emb, k=k)
    pairs = semdedup_pairs(emb, threshold=0.95, centroids=cents).cache()
    n_pairs = pairs.count()
    survivors = semdedup_prune(emb, pairs=pairs)
    n_surv = survivors.count()
    wall = round(time.perf_counter() - t0, 2)
    # sample the counters BEFORE the census: the census re-runs a full
    # corpus assignment, and including it would overstate the measured
    # pipeline's shuffle/heap while wall excludes it (round-11 review)
    after = rest_totals(spark)
    heap1 = jvm_heap_used_mb(spark)
    pairs.unpersist()

    # island census off the SAME assignment the pipeline used —
    # diagnostic only, outside every measured bound
    from openmsistream_spark.llm.semdedup import _assigned_normed

    sizes = (
        _assigned_normed(emb, cents, "vec_id", "embedding")
        .groupBy("cluster")
        .agg(F.count("*").alias("c"))
        .agg(
            F.max("c").alias("max_c"),
            F.sum(F.col("c") * F.col("c")).alias("sum_c2"),
            F.count("*").alias("n_clusters"),
        )
        .collect()[0]
    )
    # planted copies must be deduped away (each partner has the lower
    # id); allow a whisker for pairs k-means splits across a cluster
    # boundary — SemDeDup's documented recall trade, not a defect
    assert n_surv <= n - int(0.95 * n_planted), (n_surv, n, n_planted)
    return {
        "mult": mult,
        "n_vectors": n,
        "k_auto": k,
        "n_clusters_used": sizes["n_clusters"],
        "max_cluster": sizes["max_c"],
        "sum_cluster_sq": sizes["sum_c2"],
        "n_pairs": n_pairs,
        "n_planted_dups": n_planted,
        "n_survivors": n_surv,
        "wall_sec": wall,
        "shuffle_write_mb": round(
            (after["shuffleWriteBytes"] - before["shuffleWriteBytes"]) / 1e6, 1
        ),
        "heap_mb_before": heap0,
        "heap_mb_after": heap1,
    }


def main() -> None:
    import tempfile

    mults = [int(a) for a in sys.argv[1:]] or [1, 10, 50]
    scratch = tempfile.mkdtemp(prefix="stress_semdedup_")
    spark = get_spark(
        app_name="stress-semdedup-scale",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4098"},
    )
    results = []
    for m in mults:
        r = run_scale(spark, m, scratch)
        results.append(r)
        print(json.dumps(r), flush=True)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, os.environ.get("STRESS_OUT", "STRESS_SEMDEDUP.json")), "w") as f:
        json.dump(results, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()

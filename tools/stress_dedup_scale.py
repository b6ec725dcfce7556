#!/usr/bin/env python
"""100x-shape stress of the dedup_keep_* family (round-11 scale audit).

Synthesizes corpora at multiples of sf0.1's documents table with TWO
planted pathologies a real 100 TB curation run hits:

- a HEAVY DUPLICATE CLUSTER (identical text across ~0.8% of the corpus,
  below the hot-shingle DF cap so the cluster must actually form): the
  LSH band join, the exact-Jaccard verify, and connected components all
  see one giant component — the skew case.
- a DEEP-DIAMETER CHAIN (block-overlap documents where doc_i shares
  text only with near neighbors): min-label propagation needs many
  rounds to converge — the iteration-depth case that exposes plan-
  lineage blowup and driver-memory growth if truncation is broken.

For each multiplier it runs the SHARED keep-both pipeline exactly as
bench.py's dedup_keep_both_shared does (one shingle pass, one pair
pipeline with the DF cap, ONE connected-components run with a reliable
checkpoint_dir, both keep policies off the same label frame) and
records wall seconds, cumulative shuffle read/write bytes (Spark REST
stage metrics), JVM heap before/after CC, and the cluster census
(planted sizes must be recovered exactly — the run is also a
correctness check at scale).

Results land in STRESS_DEDUP.json; SCALING.md cites the measured table.

Usage: python tools/stress_dedup_scale.py [mult ...]   (default 1 5 20 50)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F

from openmsistream_spark.llm.dedup import (
    DEFAULT_MAX_SHINGLE_DF,
    cap_hot_shingles,
    dedup_clusters,
    keep_best,
    keep_canonical,
    minhash_lsh_dedup,
    word_shingles,
)
from openmsistream_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BASE_ROWS = 5000  # sf0.1 documents
# heavy cluster = 0.8% of corpus (2000 docs at 50x); override to pin the
# clique size across multipliers and isolate its quadratic pair count
# from the linear corpus cost (STRESS_HEAVY_FRAC=0.0032 at 50x -> 800)
HEAVY_FRAC = float(os.environ.get("STRESS_HEAVY_FRAC", "0.008"))
# Chain construction (empirically validated against the bench LSH
# params): doc_i = 19 consecutive 10-word blocks -> consecutive Jaccard
# (k-1)/(k+1) ~ 0.9, band edges reach skip distance <= 14, and the
# 320-doc chain forms ONE component whose label-propagation diameter is
# ~320/14 ~ 23 hops (~12 two-hop CC rounds — an order deeper than real
# near-dup clusters). Weaker overlap (9 blocks, J ~ 0.8) measurably
# SPLITS under positionally-correlated minhash band misses, and longer
# chains (640) split even at J ~ 0.9 — these constants are the
# validated deep-but-connected point.
CHAIN_LEN = 320
CHAIN_BLOCKS = 19
CHAIN_BLOCK_WORDS = 10


def build_corpus(spark, mult: int):
    """mult x sf0.1 documents + planted heavy cluster + deep chain.

    Replicas are word-salted with the replica id so cross-replica
    Jaccard is 0 — corpus growth adds VOLUME, not duplicates; the only
    planted structure is the two pathologies (plus whatever natural
    near-dups the base table carries, identical in every replica)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    reps = spark.range(mult).select(F.col("id").alias("rep"))
    body = docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
        F.when(F.col("rep") == 0, F.col("text"))
        .otherwise(
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.concat(w, F.lit("r"), F.col("rep").cast("string")),
                ),
                " ",
            )
        )
        .alias("text"),
    )

    n_heavy = int(BASE_ROWS * mult * HEAVY_FRAC)
    assert n_heavy < DEFAULT_MAX_SHINGLE_DF, "heavy cluster must stay under the DF cap"
    heavy = spark.range(n_heavy).select(
        (F.col("id") + 900_000_000).alias("doc_id"),
        # identical body + a tiny unique tail: pairwise Jaccard ~ 1,
        # every doc distinct — the worst-case single LSH bucket
        F.concat(
            F.lit(" ".join(f"heavyword{i}" for i in range(120)) + " tail"),
            F.col("id").cast("string"),
        ).alias("text"),
    )

    # chain: doc_i = blocks[i .. i+CHAIN_BLOCKS) of globally-unique
    # blocks -> doc_i overlaps doc_j iff |i-j| < CHAIN_BLOCKS with
    # Jaccard (k-d)/(k+d); see the constants above for the validated
    # deep-but-connected geometry
    def block(b: int) -> str:
        return " ".join(f"chainblk{b}word{w}" for w in range(CHAIN_BLOCK_WORDS))

    chain_rows = [
        (950_000_000 + i, " ".join(block(i + j) for j in range(CHAIN_BLOCKS)))
        for i in range(CHAIN_LEN)
    ]
    chain = spark.createDataFrame(chain_rows, "doc_id bigint, text string")
    return body.unionByName(heavy).unionByName(chain), n_heavy


def rest_totals(spark) -> dict[str, int]:
    """Cumulative shuffle/in-out bytes across all completed stages."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    stages = json.loads(urllib.request.urlopen(url, timeout=10).read())
    keys = ("shuffleWriteBytes", "shuffleReadBytes", "inputBytes", "outputBytes")
    return {k: sum(s.get(k, 0) for s in stages) for k in keys}


def jvm_heap_used_mb(spark) -> float:
    rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
    rt.gc()  # live-set measurement, not allocation-rate noise
    time.sleep(0.5)
    return round((rt.totalMemory() - rt.freeMemory()) / 1e6, 1)


def run_scale(spark, mult: int, ckpt_root: str) -> dict:
    corpus, n_heavy = build_corpus(spark, mult)
    # materialize the synthetic corpus to parquet so generation cost
    # (the interpreted word-salting transform) stays out of the timings
    path = os.path.join(ckpt_root, f"corpus_x{mult}")
    corpus.write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    n_docs = docs.count()

    before = rest_totals(spark)
    heap0 = jvm_heap_used_mb(spark)
    t0 = time.perf_counter()

    sh = cap_hot_shingles(word_shingles(docs, n=3), DEFAULT_MAX_SHINGLE_DF).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        pairs = minhash_lsh_dedup(
            docs, n=3, num_hashes=8, rows_per_band=2, threshold=0.12, shingles=sh
        )
        t_pairs0 = time.perf_counter()
        clusters = dedup_clusters(
            docs.select("doc_id"),
            pairs,
            id_col="doc_id",
            max_iterations=60,
            checkpoint_dir=os.path.join(ckpt_root, f"ckpt_x{mult}"),
        )
        heap_cc = jvm_heap_used_mb(spark)
        toks = docs.select(
            "doc_id",
            F.size(
                F.filter(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda t: t != "")
            )
            .cast("bigint")
            .alias("n_tokens"),
        )
        canon = keep_canonical(docs, clusters=clusters)
        best = keep_best(docs, toks, clusters=clusters, quality_col="n_tokens").drop(
            "n_members"
        )
        out = canon.join(best, canon.representative_id == best.cluster, "inner").select(
            "representative_id", "n_members", "kept_id", "kept_quality"
        )
        out.write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 2)

        # correctness at scale: each planted structure must land in
        # exactly ONE recovered cluster of exactly its planted size
        planted = (
            clusters.filter(F.col("doc_id") >= 900_000_000)
            .withColumn("kind", F.when(F.col("doc_id") >= 950_000_000, "chain").otherwise("heavy"))
            .groupBy("kind")
            .agg(
                F.countDistinct("cluster").alias("n_clusters"),
                F.count("*").alias("n_docs_in"),
            )
            .collect()
        )
        stats = {r["kind"]: (r["n_clusters"], r["n_docs_in"]) for r in planted}
        assert stats["heavy"] == (1, n_heavy), stats
        assert stats["chain"] == (1, CHAIN_LEN), stats
        top_sizes = [
            r["n_members"]
            for r in canon.orderBy(F.desc("n_members")).limit(5).collect()
        ]
    finally:
        sh.unpersist()

    after = rest_totals(spark)
    heap1 = jvm_heap_used_mb(spark)
    return {
        "mult": mult,
        "n_docs": n_docs,
        "heavy_cluster": n_heavy,
        "chain_len": CHAIN_LEN,
        "wall_sec": wall,
        "plan_build_sec": round(t_pairs0 - t0, 2),  # lazy-plan construction only
        "shuffle_write_mb": round((after["shuffleWriteBytes"] - before["shuffleWriteBytes"]) / 1e6, 1),
        "shuffle_read_mb": round((after["shuffleReadBytes"] - before["shuffleReadBytes"]) / 1e6, 1),
        "input_mb": round((after["inputBytes"] - before["inputBytes"]) / 1e6, 1),
        "heap_mb_before": heap0,
        "heap_mb_after_cc": heap_cc,
        "heap_mb_after": heap1,
        "top_cluster_sizes": top_sizes,
    }


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 5, 20, 50]
    ckpt_root = tempfile.mkdtemp(prefix="stress_dedup_")
    spark = get_spark(
        app_name="stress-dedup-scale",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4099"},
    )
    results = []
    for m in mults:
        r = run_scale(spark, m, ckpt_root)
        results.append(r)
        print(json.dumps(r), flush=True)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_name = os.environ.get("STRESS_OUT", "STRESS_DEDUP.json")
    with open(os.path.join(here, out_name), "w") as f:
        json.dump(results, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()

"""SemDeDup (cluster-then-prune semantic dedup) vs a brute-force
reference, determinism of the trained path, and plan shape."""

import math
import random

from pyspark.sql import functions as F

from openmsistream_spark.llm.semdedup import semdedup_pairs, semdedup_prune

SCHEMA = "vec_id long, embedding array<double>"


def _mk(spark, vecs):
    return spark.createDataFrame(sorted(vecs.items()), SCHEMA)


def _seeds(emb, k):
    return emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cluster"), F.col("embedding").alias("centroid")
    )


def brute(vecs, centroids, threshold):
    """Literal reference: assign to max-cosine centroid (ties -> lowest
    cluster id), within-cluster pairs at >= threshold (4dp-rounded),
    drop the higher id of each pair."""

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    assign = {}
    for i, v in vecs.items():
        if not any(v):
            continue
        best = max(centroids.items(), key=lambda c: (cos(v, c[1]), -c[0]))
        assign[i] = best[0]
    pairs, dropped = set(), set()
    ids = sorted(assign)
    for x in ids:
        for y in ids:
            if x < y and assign[x] == assign[y]:
                c = round(cos(vecs[x], vecs[y]) + 1e-12, 4)
                if c >= threshold:
                    pairs.add((assign[x], x, y, c))
                    dropped.add(y)
    return pairs, set(vecs) - dropped


def test_matches_bruteforce_seeded(spark):
    rng = random.Random(3)
    base = [[rng.uniform(-1, 1) for _ in range(6)] for _ in range(4)]
    vecs = {}
    for i in range(24):
        b = base[i % 4][:]
        # near-duplicates of a base direction with slight jitter
        vecs[i] = [x + rng.uniform(-0.05, 0.05) for x in b]
    vecs[24] = [0.0] * 6  # zero-norm: never assigned, always survives
    emb = _mk(spark, vecs)
    cents = {i: vecs[i] for i in range(4)}
    want_pairs, want_survivors = brute(vecs, cents, 0.9)
    got_pairs = {
        (r.cluster, r.id_a, r.id_b, r.cosine)
        for r in semdedup_pairs(emb, 0.9, centroids=_seeds(emb, 4)).collect()
    }
    assert {p[:3] for p in got_pairs} == {p[:3] for p in want_pairs}
    got_survivors = {
        r.vec_id
        for r in semdedup_prune(emb, 0.9, centroids=_seeds(emb, 4)).collect()
    }
    assert got_survivors == want_survivors
    assert 24 in got_survivors


def test_trained_path_is_deterministic_and_prunes(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = sorted(r.vec_id for r in semdedup_prune(emb, 0.4, k=4).collect())
    b = sorted(r.vec_id for r in semdedup_prune(emb, 0.4, k=4).collect())
    assert a == b
    assert len(a) <= emb.count()


def test_duplicate_group_keeps_lowest_id(spark):
    v = [1.0, 0.5, -0.25, 0.125]
    vecs = {0: v, 7: v, 3: v, 9: [-x for x in v]}
    emb = _mk(spark, vecs)
    seeds = _seeds(emb, 1)  # one cluster seeded by vec 0
    survivors = {
        r.vec_id for r in semdedup_prune(emb, 0.99, centroids=seeds).collect()
    }
    # 0,3,7 are identical -> only 0 survives; 9 is anti-parallel -> kept
    assert survivors == {0, 9}


def test_pairs_plan_is_cluster_equijoin_no_cartesian(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = semdedup_pairs(emb, 0.4, centroids=_seeds(emb, 8))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_auto_k_scales_with_corpus(spark):
    """k="auto" closes the round-7 'toy default' caveat: the cluster
    count tracks corpus size / avg_cluster_size (floor 8), so island
    pair work stays bounded as the corpus grows."""
    import pytest as _pytest

    from openmsistream_spark.llm.semdedup import resolve_k, semdedup_prune

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    assert resolve_k(emb, "auto", avg_cluster_size=50) == max(8, -(-n // 50))
    assert resolve_k(emb, "auto", avg_cluster_size=10**9) == 8  # floor
    assert resolve_k(emb, 13) == 13  # explicit int passes through
    with _pytest.raises(ValueError, match="positive int or 'auto'"):
        resolve_k(emb, 0)
    # end-to-end: auto-k trains and prunes without loss of rows beyond
    # the dropped duplicates (survivors + drops == corpus)
    survivors = semdedup_prune(emb, threshold=0.99, k="auto",
                               avg_cluster_size=100).count()
    assert 0 < survivors <= n


def test_prune_pairs_injection_matches_full_run(spark):
    """pairs= lets one assignment+pair pipeline feed both the pair
    report and the pruned corpus (the keep_canonical/keep_best
    injection contract): injected == end-to-end."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = _seeds(emb, 8)
    pairs = semdedup_pairs(emb, threshold=0.4, centroids=cents).persist()
    try:
        shared = {r.vec_id for r in semdedup_prune(emb, pairs=pairs).collect()}
        full = {
            r.vec_id
            for r in semdedup_prune(emb, threshold=0.4, centroids=cents).collect()
        }
        assert shared == full
    finally:
        pairs.unpersist()


def test_prototype_prune_drops_closest_to_centroid(spark):
    """One seeded cluster at e1: with drop_fraction=0.5 the two vectors
    MOST aligned with the centroid go; the oblique ones survive."""
    from openmsistream_spark.llm.semdedup import prototype_prune

    vecs = {
        0: [1.0, 0.0, 0.0],      # cos 1.0 to centroid — dropped
        1: [0.99, 0.1, 0.0],     # near-prototype — dropped
        2: [0.5, 0.8, 0.0],      # oblique — kept
        3: [0.1, 0.99, 0.0],     # oblique — kept
        4: [0.0, 0.0, 0.0],      # zero-norm: no cluster, always kept
    }
    emb = _mk(spark, vecs)
    seeds = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0])], "cluster long, centroid array<double>"
    )
    kept = {
        r.vec_id
        for r in prototype_prune(emb, 0.5, centroids=seeds).collect()
    }
    assert kept == {2, 3, 4}


def test_d4_prune_is_dedup_then_diversify(spark):
    """d4 = semdedup_prune then prototype_prune over the survivors with
    one shared centroid table; the composition must equal running the
    two stages by hand."""
    from openmsistream_spark.llm.semdedup import (
        d4_prune,
        prototype_prune,
        semdedup_prune,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    seeds = _seeds(emb, 8)
    got = {
        r.vec_id
        for r in d4_prune(
            emb, threshold=0.4, drop_fraction=0.25, centroids=seeds
        ).collect()
    }
    step1 = semdedup_prune(emb, threshold=0.4, centroids=seeds)
    want = {
        r.vec_id
        for r in prototype_prune(
            step1, drop_fraction=0.25, centroids=seeds
        ).collect()
    }
    assert got == want and len(got) < emb.count()

"""Spherical k-means trainer + trained-centroid IVF search.

The embeddings fixture is isotropic (labels are not geometric), so the
tests pin the MECHANICS a trainer must have — determinism, objective
monotonicity, complete assignment, unit-norm centroids, recall against
exact brute force — rather than cluster purity."""

import math

import pytest
from pyspark.sql import functions as F

from openmsistream_spark.llm.similarity import (
    _dot,
    cosine_topk,
    ivf_search,
    kmeans_assign,
    kmeans_fit,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_kmeans_centroids_unit_norm_and_deterministic(spark, emb):
    a = kmeans_fit(emb, k=4, max_iters=3)
    b = kmeans_fit(emb, k=4, max_iters=3)
    ra = {r.cluster: r.centroid for r in a.collect()}
    rb = {r.cluster: r.centroid for r in b.collect()}
    assert set(ra) == set(rb) == {0, 1, 2, 3}
    for c in ra:
        assert ra[c] == rb[c], f"cluster {c} not run-to-run identical"
        assert abs(math.sqrt(sum(x * x for x in ra[c])) - 1.0) < 1e-9


def test_kmeans_objective_non_decreasing(spark, emb):
    """Spherical k-means: mean max-cosine to the assigned centroid must
    not decrease with more Lloyd iterations (up to fp noise)."""
    objs = []
    for iters in (1, 2, 4):
        cents = kmeans_fit(emb, k=4, max_iters=iters)
        a = kmeans_assign(emb, cents)
        objs.append(a.agg(F.avg("dot")).first()[0])
    assert objs[1] >= objs[0] - 1e-9
    assert objs[2] >= objs[1] - 1e-9


def test_kmeans_assign_covers_all_nonzero_vectors(spark, emb):
    cents = kmeans_fit(emb, k=4, max_iters=2)
    a = kmeans_assign(emb, cents)
    n_nonzero = (
        emb.select(
            _dot(
                F.transform("embedding", lambda x: x.cast("double")),
                F.transform("embedding", lambda x: x.cast("double")),
            ).alias("sq")
        )
        .filter(F.col("sq") > 0)
        .count()
    )
    assert a.count() == n_nonzero
    assert a.select("vec_id").distinct().count() == n_nonzero
    # every assignment points at an existing cluster, with a valid cosine
    rows = a.collect()
    assert {r.cluster for r in rows} <= {0, 1, 2, 3}
    assert all(-1.0 - 1e-9 <= r.dot <= 1.0 + 1e-9 for r in rows)


def test_ivf_search_full_probe_matches_bruteforce(spark, emb):
    """nprobe = k clusters degrades IVF to exact search: top-k must then
    equal the brute-force oracle on the same queries."""
    cents = kmeans_fit(emb, k=4, max_iters=2)
    qids = [10, 11, 12]
    ivf = ivf_search(emb, cents, qids, k=5, nprobe=4)
    brute = cosine_topk(emb, qids, k=5)
    got = sorted((r.query_id, r.rank, r.neighbor_id) for r in ivf.collect())
    want = sorted((r.query_id, r.rank, r.neighbor_id) for r in brute.collect())
    assert got == want


def test_ivf_search_single_probe_is_subset_and_ranked(spark, emb):
    cents = kmeans_fit(emb, k=4, max_iters=2)
    out = ivf_search(emb, cents, [10, 11], k=5, nprobe=1).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {10, 11}
    for q, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        cosines = [r.cosine for r in rs]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r.neighbor_id != q for r in rs)


def test_kmeans_plan_broadcasts_and_stays_jvm_side(spark, emb):
    cents = kmeans_fit(emb, k=4, max_iters=1)
    a = kmeans_assign(emb, cents)
    plan = a._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # row-at-a-time Python is never acceptable; the sanctioned stage is
    # the Arrow-batched argmax map
    assert "BatchEvalPython" not in plan
    # the corpus must never hit a join for assignment at all — the
    # centroid matrix ships as a SparkContext broadcast inside the
    # Arrow stage's closure (round-9 shape), so the whole plan is
    # scan -> project -> MapInPandas: zero Exchange, zero join
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "MapInPandas" in plan
    assert "Exchange" not in plan, plan


def test_ivf_index_search_matches_inmemory_and_prunes(spark, emb, tmp_path):
    """The on-disk index path returns the same ranking as the in-memory
    ivf_search, and its scan carries a dynamic-partition-pruning filter
    on cluster — only probed cluster directories are read."""
    from openmsistream_spark.llm.similarity import (
        ivf_search_index,
        write_ivf_index,
    )

    cents = kmeans_fit(emb, k=4, max_iters=2)
    path = str(tmp_path / "ivf_index")
    write_ivf_index(emb, cents, path)
    # partition layout on disk
    import os

    clusters = sorted(
        d for d in os.listdir(path) if d.startswith("cluster=")
    )
    assert clusters == [f"cluster={i}" for i in range(4)]

    queries = emb.filter(F.col("vec_id").isin(10, 11)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = ivf_search_index(spark, path, cents, queries, k=5, nprobe=2)
    want = ivf_search(emb, cents, [10, 11], k=5, nprobe=2)
    g = sorted((r.query_id, r.rank, r.neighbor_id) for r in got.collect())
    w = sorted((r.query_id, r.rank, r.neighbor_id) for r in want.collect())
    assert g == w

    plan = got._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "dynamicpruning" in plan.lower(), plan


def test_recall_at_k_full_probe_is_one(spark, emb):
    from openmsistream_spark.llm.similarity import recall_at_k

    cents = kmeans_fit(emb, k=4, max_iters=2)
    qids = [10, 11, 12]
    brute = cosine_topk(emb, qids, k=5)
    ivf = ivf_search(emb, cents, qids, k=5, nprobe=4)
    rows = recall_at_k(brute, ivf).collect()
    assert {r.query_id for r in rows} == set(qids)
    assert all(r.recall == 1.0 and r.n_exact == 5 and r.n_hit == 5 for r in rows)


def test_recall_at_k_partial_and_bounds(spark, emb):
    """nprobe=1 recall is in [0, 1] per query, equals |∩|/k, and rises
    monotonically (>=) when nprobe doubles — the tuning curve the
    helper exists to measure."""
    from openmsistream_spark.llm.similarity import recall_at_k

    cents = kmeans_fit(emb, k=4, max_iters=2)
    qids = [10, 11, 12, 13]
    brute = cosine_topk(emb, qids, k=5)
    r1 = {r.query_id: r.recall for r in recall_at_k(brute, ivf_search(emb, cents, qids, k=5, nprobe=1)).collect()}
    r2 = {r.query_id: r.recall for r in recall_at_k(brute, ivf_search(emb, cents, qids, k=5, nprobe=2)).collect()}
    for q in qids:
        assert 0.0 <= r1[q] <= 1.0
        assert r2[q] >= r1[q] - 1e-9


def test_recall_at_k_trims_to_k(spark, emb):
    from openmsistream_spark.llm.similarity import recall_at_k

    qids = [10, 11]
    brute10 = cosine_topk(emb, qids, k=10)
    brute3 = cosine_topk(emb, qids, k=3)
    rows = recall_at_k(brute10, brute10, k=3).collect()
    assert all(r.n_exact == 3 and r.recall == 1.0 for r in rows)
    # trimmed ground truth equals the natively-k=3 run
    native = recall_at_k(brute3, brute3).collect()
    assert {(r.query_id, r.n_exact) for r in native} == {
        (r.query_id, r.n_exact) for r in rows
    }


def test_recall_at_k_requires_rank_on_both_sides(spark, emb):
    import pytest

    from openmsistream_spark.llm.similarity import recall_at_k

    brute = cosine_topk(emb, [10], k=5)
    no_rank = brute.select("query_id", "neighbor_id")
    with pytest.raises(ValueError, match="rank"):
        recall_at_k(brute, no_rank, k=3)
    # without k the frames are compared as given — no rank needed
    rows = recall_at_k(no_rank, no_rank).collect()
    assert rows and all(r.recall == 1.0 for r in rows)


def test_reliable_checkpoint_dir_matches_default(spark, emb, tmp_path):
    """checkpoint_dir= switches the per-iteration truncation to a
    reliable checkpoint (files actually land under the dir) without
    changing any number — for k-means AND the CC loop."""
    import os

    from openmsistream_spark.llm.dedup import dedup_clusters

    ck = str(tmp_path / "ck")
    a = {r.cluster: r.centroid for r in kmeans_fit(emb, k=4, max_iters=2).collect()}
    b = {
        r.cluster: r.centroid
        for r in kmeans_fit(emb, k=4, max_iters=2, checkpoint_dir=ck).collect()
    }
    assert a == b
    written = [f for root, _, fs in os.walk(ck) for f in fs]
    assert written, "reliable checkpoint wrote nothing under checkpoint_dir"

    nodes = spark.range(8).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long"
    )
    plain = sorted(
        (r.doc_id, r.cluster)
        for r in dedup_clusters(nodes, pairs).collect()
    )
    ck2 = str(tmp_path / "ck2")
    reliable = sorted(
        (r.doc_id, r.cluster)
        for r in dedup_clusters(nodes, pairs, checkpoint_dir=ck2).collect()
    )
    assert plain == reliable
    assert [f for root, _, fs in os.walk(ck2) for f in fs]


def test_assignment_matches_plain_python_argmax(spark):
    """The packed-argmax assignment (round-8) must agree with a plain
    Python nearest-centroid computation, including the max-cosine /
    lowest-cluster-id tie rule, on vectors engineered to tie."""
    import math

    # NO centroid at [1,1]: vector 2 must genuinely TIE between the two
    # axis centroids at its argmax (cos 0.7071 each), so a wrong
    # tie-break (highest id) would flip its assignment and fail
    vecs = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [1.0, 1.0]),   # equidistant from both centroids → tie
        (3, [-1.0, 0.0]),
        (4, [0.6, 0.8]),
    ]
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs],
        "vec_id long, embedding array<double>",  # no float32 rounding,
        # so the plain-Python oracle's arithmetic matches exactly
    )
    cdf = spark.createDataFrame(
        [(c, [x / math.hypot(*v) for x in v]) for c, v in cents],
        "cluster long, centroid array<double>",
    )
    got = {
        r.vec_id: (r.cluster, r.dot)
        for r in kmeans_assign(emb, cdf).collect()
    }

    def expect(v):
        n = math.hypot(*v)
        best = None
        for c, cv in cents:
            cn = math.hypot(*cv)
            d = sum(a / n * b / cn for a, b in zip(v, cv))
            # max dot; ties to LOWEST cluster id (strictly-greater keeps
            # the earlier, lower id)
            if best is None or d > best[1] + 1e-15:
                best = (c, d)
        return best

    for i, v in vecs:
        c, d = expect(v)
        assert got[i][0] == c, (i, got[i], (c, d))
        assert got[i][1] == pytest.approx(d, abs=1e-9)


def test_assignment_slicing_is_result_invariant(spark, emb, monkeypatch):
    """The per-slice score-matrix bound inside _assign_nearest is a peak-
    memory knob only: forcing one-row slices must not change a single
    assignment or score (the argmax is row-local)."""
    from openmsistream_spark.llm import similarity

    cents = kmeans_fit(emb, k=4, max_iters=2)
    whole = sorted(tuple(r) for r in kmeans_assign(emb, cents).collect())
    monkeypatch.setattr(similarity, "_ASSIGN_SLICE_ELEMS", 1)
    sliced = sorted(tuple(r) for r in kmeans_assign(emb, cents).collect())
    assert sliced == whole

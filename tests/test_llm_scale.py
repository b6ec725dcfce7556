"""Scale-path unit tests for the LLM dedup/similarity operators: the
hot-shingle document-frequency cap (a high-DF shingle is a quadratic hot
key in any shared-shingle pair join) and the two-phase top-k (a bare
per-query window shuffles every scored candidate to one reducer)."""

from pyspark.sql import functions as F

from openmsistream_spark.llm.dedup import (
    cap_hot_shingles,
    jaccard_pairs,
    minhash_lsh_dedup,
)
from openmsistream_spark.llm.similarity import cosine_topk


def test_hot_shingle_excluded_from_pairs(spark):
    # docs 1..6 share "hot" (DF 6); only docs 1,2 share real content
    rows = (
        [(i, "hot") for i in range(1, 7)]
        + [(1, s) for s in ("a", "b", "c")]
        + [(2, s) for s in ("a", "b", "c")]
    )
    sh = spark.createDataFrame(rows, "doc_id long, shingle string")

    capped = jaccard_pairs(sh, threshold=0.1, max_shingle_df=5).collect()
    assert {(r.id_a, r.id_b) for r in capped} == {(1, 2)}
    # capped sizes exclude the hot shingle on both sides → exact 3/3
    assert capped[0].jaccard == 1.0

    # uncapped: the single hot shingle alone creates all C(6,2)=15 pairs
    uncapped = jaccard_pairs(sh, threshold=0.1, max_shingle_df=None).collect()
    assert len(uncapped) == 15


def test_cap_hot_shingles_noop_below_cap(spark):
    sh = spark.createDataFrame(
        [(1, "x"), (2, "x"), (1, "y")], "doc_id long, shingle string"
    )
    assert cap_hot_shingles(sh, 10_000).count() == 3
    assert cap_hot_shingles(sh, None).count() == 3
    assert cap_hot_shingles(sh, 1).count() == 1  # "x" (DF 2) dropped


def test_minhash_pipeline_ignores_hot_shingle(spark):
    # two docs whose ONLY overlap is a stop-word shingle repeated
    # everywhere; with the cap they must not pair up
    common = "the of and " * 4  # produces the same hot shingles in both
    docs = spark.createDataFrame(
        [(1, common + "alpha beta gamma delta"), (2, common + "zeta eta theta iota")]
        + [(i, common + f"filler{i} a{i} b{i} c{i}") for i in range(3, 9)],
        "doc_id long, text string",
    )
    out = minhash_lsh_dedup(docs, threshold=0.2, max_shingle_df=5).collect()
    assert out == []


def test_restrict_verify_knob_same_pairs_any_shape(spark):
    # duplicate pairs are identical whether the verify stage reads the
    # whole shingle table or only candidate docs' shingles — the
    # restriction is semantics-preserving (verify only ever consumes
    # candidate rows); "auto" must resolve to one of the two shapes
    # docs 1 and 2 are exact duplicates: identical shingle sets give
    # identical minhash signatures, so the pair survives banding with
    # probability 1 (no flakiness from band-collision chance)
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "alpha beta gamma delta epsilon"),
         (3, "one two three four five six"), (4, "totally unrelated words here now")],
        "doc_id long, text string",
    )
    outs = {
        mode: sorted(
            (r.id_a, r.id_b, r.jaccard)
            for r in minhash_lsh_dedup(
                docs, threshold=0.1, restrict_verify=mode
            ).collect()
        )
        for mode in (True, False, "auto")
    }
    assert outs[True] == outs[False] == outs["auto"]
    assert (1, 2) in {(a, b) for a, b, _ in outs[True]}

    # the restriction is the pipeline's only left-semi join, so the plan
    # shows the knob
    def plan(frame, mode):
        return (
            minhash_lsh_dedup(frame, threshold=0.1, restrict_verify=mode)
            ._jdf.queryExecution()
            .explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "simple"
                )
            )
        )

    assert "LeftSemi" in plan(docs, True)
    assert "LeftSemi" not in plan(docs, False)
    # auto, in-memory frame: createDataFrame inputs carry NO size
    # estimate (Long.MaxValue) and must take the safe (restricted) shape
    assert "LeftSemi" in plan(docs, "auto")
    # auto, small parquet scan: the estimate is real and far below the
    # crossover, so the semi-join (which costs more than it saves on a
    # small corpus) must be skipped
    small = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert "LeftSemi" not in plan(small, "auto")


def test_keep_policies_share_one_pair_pipeline(spark):
    # the pairs=/clusters= injection points: both keep policies fed from
    # ONE pair pipeline + ONE connected-components run must equal the
    # independent end-to-end runs (the library's pay-once contract)
    from pyspark.sql import functions as F

    from openmsistream_spark.llm.dedup import (
        dedup_clusters,
        keep_best,
        keep_canonical,
        minhash_lsh_dedup,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    kw = dict(n=3, num_hashes=8, rows_per_band=2, threshold=0.12)
    toks = docs.select(
        "doc_id",
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
        .cast("bigint")
        .alias("n_tokens"),
    )

    pairs = minhash_lsh_dedup(docs, **kw).persist()
    try:
        clusters = dedup_clusters(docs.select("doc_id"), pairs)
        canon_shared = keep_canonical(docs, clusters=clusters)
        best_shared = keep_best(
            docs, toks, clusters=clusters, quality_col="n_tokens"
        )

        canon_full = keep_canonical(docs, **kw)
        best_full = keep_best(docs, toks, quality_col="n_tokens", **kw)

        as_set = lambda df: {tuple(r) for r in df.collect()}  # noqa: E731
        assert as_set(canon_shared) == as_set(canon_full)
        assert as_set(best_shared) == as_set(best_full)
        # sanity: every cluster keeps exactly one member, best keeps the
        # max-quality one
        canon = as_set(canon_shared)
        assert len(canon) == len({c for c, _ in canon})
        assert sum(n for _, n in canon) == docs.count()
    finally:
        pairs.unpersist()


def test_two_phase_topk_matches_bruteforce_window(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in range(60)],
        "vec_id long, embedding array<double>",
    ).repartition(7)  # several partitions so phase 1 actually prunes
    out = cosine_topk(emb, query_ids=[3, 4, 5], k=4).collect()
    # exactly k per query, ranks 1..k, cosine non-increasing
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {3, 4, 5}
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == [1, 2, 3, 4]
        assert all(
            rows[i].cosine >= rows[i + 1].cosine for i in range(len(rows) - 1)
        )
        assert all(r.neighbor_id != q for r in rows)

    # cross-check against a driver-side exact computation
    vecs = {i: np.array(v) for i, v in [(r.vec_id, r.embedding) for r in emb.collect()]}
    for q, rows in by_q.items():
        sims = sorted(
            (
                (round(float(vecs[q] @ v / (np.linalg.norm(vecs[q]) * np.linalg.norm(v))), 4), -i)
                for i, v in vecs.items()
                if i != q
            ),
            reverse=True,
        )[:4]
        expect = [(-i, c) for c, i in sims]
        got = [(r.neighbor_id, r.cosine) for r in sorted(rows, key=lambda r: r.rank)]
        assert got == expect


def test_int8_quantized_topk_recall(spark, sf_dir):
    """int8 scalar quantization must preserve most of the exact top-k
    (the whole point: 4x less scan bandwidth for ~the same neighbors),
    and quantization must be deterministic."""
    from openmsistream_spark.llm.similarity import (
        cosine_topk,
        cosine_topk_sq8,
        quantize_int8,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qids = [0, 1, 2]
    exact = cosine_topk(emb, qids, k=10).collect()
    approx = cosine_topk_sq8(emb, qids, k=10).collect()
    per_q = {}
    for r in exact:
        per_q.setdefault(r.query_id, [set(), set()])[0].add(r.neighbor_id)
    for r in approx:
        per_q.setdefault(r.query_id, [set(), set()])[1].add(r.neighbor_id)
    recalls = [len(a & b) / len(a) for a, b in per_q.values() if a]
    assert recalls and min(recalls) >= 0.7, recalls
    # deterministic quantization: identical qvecs on a rerun
    q1 = sorted(map(str, quantize_int8(emb).limit(50).collect()))
    q2 = sorted(map(str, quantize_int8(emb).limit(50).collect()))
    assert q1 == q2

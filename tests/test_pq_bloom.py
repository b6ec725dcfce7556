"""Product quantization (llm/pq.py) and bloom membership (llm/bloom.py)."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import load


# ----------------------------------------------------------------- PQ


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load(spark, sf_dir, "embeddings")


def test_pq_encode_shape_and_range(spark, emb):
    from openmsistream_spark.llm.pq import pq_codebooks_from_seeds, pq_encode

    cb = pq_codebooks_from_seeds(emb, m=8, kc=8)
    assert cb.count() == 64
    codes = pq_encode(emb, cb).toPandas()
    assert len(codes) == emb.count()
    mats = np.asarray([np.asarray(c) for c in codes["codes"]])
    assert mats.shape[1] == 8
    assert mats.min() >= 0 and mats.max() < 8


def test_pq_encode_matches_literal_python(spark, emb):
    """Codes agree with a sequential-fold literal Python encoder
    (the arithmetic the oracle replicates)."""
    from openmsistream_spark.llm.pq import pq_codebooks_from_seeds, pq_encode

    rows = emb.filter(F.col("vec_id") < 40).collect()
    cb = pq_codebooks_from_seeds(emb, m=8, kc=8)
    got = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(emb.filter(F.col("vec_id") < 40), cb).collect()
    }
    cbrows = cb.collect()
    C = {}
    for r in cbrows:
        C[(r["sub"], r["code"])] = [float(x) for x in r["cw"]]

    def seq_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    for r in rows:
        v = [float(x) for x in r["embedding"]]
        want = []
        for s in range(8):
            sub = v[s * 8 : (s + 1) * 8]
            dxx = seq_dot(sub, sub)
            best, bestd = None, None
            for c in range(8):
                cw = C[(s, c)]
                d = dxx - 2 * seq_dot(sub, cw) + seq_dot(cw, cw)
                if bestd is None or d < bestd:
                    best, bestd = c, d
            want.append(best)
        assert got[r["vec_id"]] == want


def test_pq_adc_reasonable_recall(spark, emb):
    """ADC top-k against exact cosine top-k: sanity recall floor (PQ is
    approximate — with 8 seeded codewords we only demand better than
    random) and structural contract."""
    from openmsistream_spark.llm.pq import pq_adc_topk, pq_codebooks_from_seeds
    from openmsistream_spark.llm.similarity import cosine_topk, recall_at_k

    qids = [10, 11, 12, 13, 14]
    cb = pq_codebooks_from_seeds(emb, m=8, kc=8)
    approx = pq_adc_topk(emb, cb, qids, k=10).withColumnRenamed("score", "cosine")
    exact = cosine_topk(emb, qids, k=10)
    rec = recall_at_k(exact, approx).agg(F.avg("recall")).first()[0]
    n = emb.count()
    assert rec > 10.0 / n  # strictly better than random top-10
    pdf = approx.toPandas()
    assert set(pdf["query_id"]) == set(qids)
    assert (pdf.groupby("query_id")["rank"].max() == 10).all()


def test_pq_fit_improves_quantization_error(spark, emb):
    """Trained codebooks reconstruct subvectors with lower total squared
    error than the raw seeds (Lloyd's monotonicity, PQ objective)."""
    from openmsistream_spark.llm.pq import (
        _collect_codebooks,
        pq_codebooks_from_seeds,
        pq_encode,
        pq_fit,
    )

    sub = emb.filter(F.col("vec_id") < 200)

    def sqerr(cb):
        C, _ = _collect_codebooks(cb)
        m, kc, dsub = C.shape
        codes = {
            r["vec_id"]: list(r["codes"]) for r in pq_encode(sub, cb).collect()
        }
        tot = 0.0
        for r in sub.collect():
            v = np.asarray([float(x) for x in r["embedding"]])
            for s in range(m):
                cw = C[s, codes[r["vec_id"]][s]]
                d = v[s * dsub : (s + 1) * dsub] - cw
                tot += float((d * d).sum())
        return tot

    seeded = pq_codebooks_from_seeds(sub, m=4, kc=8)
    trained = pq_fit(sub, m=4, kc=8, max_iter=5)
    assert sqerr(trained) < sqerr(seeded)


def test_pq_adc_codes_injection(spark, emb):
    """codes= injects a pre-encoded frame; result identical to inline
    encoding (the pay-encode-once serving path)."""
    from openmsistream_spark.llm.pq import (
        pq_adc_topk,
        pq_codebooks_from_seeds,
        pq_encode,
    )

    cb = pq_codebooks_from_seeds(emb, m=8, kc=8)
    pre = pq_encode(emb, cb)
    a = pq_adc_topk(emb, cb, [10, 11], k=5).toPandas().sort_values(
        ["query_id", "rank"]
    )
    b = (
        pq_adc_topk(emb, cb, [10, 11], k=5, codes=pre)
        .toPandas()
        .sort_values(["query_id", "rank"])
    )
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_pq_adc_plan_no_corpus_exchange(spark, emb):
    """The scored corpus path before the bounded top-k survivor merge is
    scan -> project -> MapInPandas: the only Exchange in the whole plan
    is the survivor-set window at queries x k x partitions rows."""
    from openmsistream_spark.llm.pq import pq_adc_topk, pq_codebooks_from_seeds

    cb = pq_codebooks_from_seeds(emb, m=8, kc=8)
    plan = pq_adc_topk(emb, cb, [10], k=5)._jdf.queryExecution().executedPlan().toString()
    # exactly one exchange: the survivor merge (hashpartitioning on query_id)
    assert plan.count("Exchange") <= 2  # survivor merge (+ AQE read)
    assert "MapInPandas" in plan


# -------------------------------------------------------------- bloom


def test_bloom_positions_engine_parity(spark):
    """Python md5 positions == the JVM expression == the DuckDB oracle
    arithmetic."""
    import duckdb

    from openmsistream_spark.llm.bloom import positions, positions_col

    keys = ["alpha", "beta#x", "", "Ωmega"]
    m, k = 1 << 20, 4
    df = spark.createDataFrame([(x,) for x in keys], "key string")
    jvm = {
        r["key"]: list(r["pos"])
        for r in df.select("key", positions_col(F.col("key"), k, m).alias("pos")).collect()
    }
    con = duckdb.connect()
    for key in keys:
        py = positions(key, k, m)
        assert jvm[key] == py
        for i, p in enumerate(py):
            (dp,) = con.execute(
                "SELECT ('0x' || substr(md5(? || '#' || ?),1,15))::UBIGINT % ?",
                [key, str(i), m],
            ).fetchone()
            assert int(dp) == p


def test_bloom_no_false_negatives_and_fp_rate(spark):
    from openmsistream_spark.llm.bloom import bloom_build, bloom_mark

    inserted = [f"key-{i}" for i in range(2000)]
    df = spark.createDataFrame([(x,) for x in inserted], "k string")
    bloom = bloom_build(df, "k", m_bits=1 << 16, k=4)
    # no false negatives
    marked = bloom_mark(df, "k", bloom).toPandas()
    assert marked["maybe_seen"].all()
    # false-positive rate on fresh keys tracks the fill-based estimate
    fresh = spark.createDataFrame([(f"other-{i}",) for i in range(4000)], "k string")
    fp = bloom_mark(fresh, "k", bloom).toPandas()["maybe_seen"].mean()
    est = bloom.fp_rate()
    assert fp < max(5 * est, 0.02)
    # python-side membership agrees with the distributed mark
    assert "key-7" in bloom
    assert ("key-7x" in bloom) == bool(
        bloom_mark(
            spark.createDataFrame([("key-7x",)], "k string"), "k", bloom
        ).first()["maybe_seen"]
    )


def test_bloom_build_partition_invariance(spark):
    """The OR of per-partition masks is independent of partitioning."""
    from openmsistream_spark.llm.bloom import bloom_build

    rows = [(f"k{i}",) for i in range(500)]
    a = bloom_build(spark.createDataFrame(rows, "k string").repartition(1), "k", 1 << 14, 3)
    b = bloom_build(spark.createDataFrame(rows, "k string").repartition(13), "k", 1 << 14, 3)
    assert a.mask == b.mask


def test_gram_novelty_vs_exact_join(spark, sf_dir):
    """Bloom novelty counts can only undercount novelty vs the exact
    gram join (false positives mark novel grams as seen, never the
    reverse), and the undercount is bounded by the fp estimate."""
    from openmsistream_spark.llm.bloom import bloom_build, gram_novelty
    from openmsistream_spark.llm.dedup import word_shingles

    docs = load(spark, sf_dir, "documents")
    ref = word_shingles(docs.filter(F.col("source") == "src0"), n=8, hashed=True)
    bloom = bloom_build(ref.select("shingle"), "shingle", m_bits=1 << 20, k=4)
    got = gram_novelty(docs.filter(F.col("source") != "src0"), bloom, n=8).toPandas()

    probe = word_shingles(docs.filter(F.col("source") != "src0"), n=8, hashed=True)
    exact = (
        probe.join(ref.select("shingle").distinct(), "shingle", "left_anti")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_novel_exact"))
        .toPandas()
    )
    merged = got.merge(exact, on="doc_id", how="left").fillna(0)
    assert (merged["n_novel"] <= merged["n_novel_exact"]).all()
    # total undercount bounded: fp flips are rare at this fill
    slack = merged["n_novel_exact"].sum() - merged["n_novel"].sum()
    assert slack <= max(10, 0.01 * merged["n_grams"].sum())


def test_bloom_build_chunked_matches_bloom_build(spark):
    """The chunked builder (shuffle by mask chunk, no full mask in any
    task) must produce the BIT-IDENTICAL mask to bloom_build — it is
    the resize/huge-batch path of the probe sidecar."""
    from openmsistream_spark.llm.bloom import bloom_build, bloom_build_chunked

    rows = [(f"ck{i}",) for i in range(800)]
    df = spark.createDataFrame(rows, "k string").repartition(7)
    a = bloom_build(df, "k", m_bits=1 << 17, k=4)
    # delegate_below=0 forces the real multi-chunk shuffle + assembly
    b = bloom_build_chunked(
        df, "k", m_bits=1 << 17, k=4, chunk_bits=1 << 14, delegate_below=0
    )
    assert a.m_bits == b.m_bits and a.mask == b.mask
    # single-chunk degenerate case (chunk_bits clamped to m_bits)
    c = bloom_build_chunked(
        df, "k", m_bits=1 << 17, k=4, chunk_bits=1 << 20, delegate_below=0
    )
    assert c.mask == a.mask
    # the small-mask default delegates to bloom_build — same bits
    d = bloom_build_chunked(df, "k", m_bits=1 << 17, k=4)
    assert d.mask == a.mask


def test_bloom_mark_layered_matches_union_mask(spark):
    """Layered marking (base broadcast + ordered position-delta
    broadcasts) must give the verdicts of marking against the full
    union mask — the layers reconstruct it bit-exactly, whatever the
    base/delta split."""
    import numpy as np

    from openmsistream_spark.llm.bloom import (
        bloom_build,
        bloom_mark,
        bloom_mark_layered,
        pack_positions,
        positions,
    )

    m, k = 1 << 14, 4
    base_keys = [f"b{i}" for i in range(120)]
    d1_keys = [f"d{i}" for i in range(40)]
    d2_keys = [f"e{i}" for i in range(40)]
    base = bloom_build(
        spark.createDataFrame([(x,) for x in base_keys], "k string"), "k", m, k
    )
    full = bloom_build(
        spark.createDataFrame(
            [(x,) for x in base_keys + d1_keys + d2_keys], "k string"
        ),
        "k",
        m,
        k,
    )

    def pos_arr(keys):
        return np.unique(
            np.array(
                [p for x in keys for p in positions(x, k, m)], dtype=np.int64
            )
        )

    def packed(keys):
        idx, val = pack_positions(pos_arr(keys))
        return idx.tobytes(), val.tobytes()

    sc = spark.sparkContext
    base_bc = sc.broadcast(base.mask)
    deltas = [sc.broadcast(packed(d1_keys)), sc.broadcast(packed(d2_keys))]
    probe = spark.createDataFrame(
        [(x,) for x in base_keys[:5] + d1_keys[:5] + d2_keys[:5]]
        + [(f"absent{i}",) for i in range(50)],
        "k string",
    )
    want = {
        r.k: r.maybe_seen for r in bloom_mark(probe, "k", full).collect()
    }
    got = {
        r.k: r.maybe_seen
        for r in bloom_mark_layered(
            probe, "k", k, m, base_bc, deltas, ("t-layered", "ep1")
        ).collect()
    }
    assert got == want
    # every inserted key must mark positive (no false negatives)
    assert all(got[x] for x in base_keys[:5] + d1_keys[:5] + d2_keys[:5])

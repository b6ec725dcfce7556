"""TF-IDF weighting + sparse text cosine: numeric parity with a
driver-side numpy reference, hot-term cap semantics, plan shape."""

import math

from pyspark.sql import functions as F

from openmsistream_spark.llm.tfidf import tfidf_cosine_pairs, tfidf_terms

CORPUS = [
    (1, "apple banana apple cherry"),
    (2, "apple banana banana durian"),
    (3, "cherry durian elderberry fig"),
    (4, "grape honeydew kiwi lemon"),
]


def _ref_tfidf(corpus):
    """Reference TF-IDF + cosine, straight from the formulas."""
    docs = {d: t.split() for d, t in corpus}
    n = len(docs)
    vocab = sorted({w for ws in docs.values() for w in ws})
    df = {w: sum(w in set(ws) for ws in docs.values()) for w in vocab}
    vecs = {}
    for d, ws in docs.items():
        vecs[d] = {
            w: round(
                ws.count(w) * (math.log((n + 1) / (df[w] + 1)) + 1), 6
            )
            for w in set(ws)
        }
    return vecs, df


def test_tfidf_terms_match_reference(spark):
    sdf = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {
        (r.doc_id, r.term): (r.tf, r.df, r.tfidf)
        for r in tfidf_terms(sdf).collect()
    }
    vecs, df = _ref_tfidf(CORPUS)
    want = {
        (d, w): (ws.count(w), df[w], vecs[d][w])
        for d, ws in ((d, t.split()) for d, t in CORPUS)
        for w in set(ws)
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert got[k][1] == want[k][1], k
        assert abs(got[k][2] - want[k][2]) < 1e-6, k


def test_tfidf_cosine_pairs_match_reference(spark):
    # max_df_frac=None: this test pins the UNCAPPED arithmetic against
    # the literal formulas (on a 4-doc corpus the default relative cap
    # floor(0.1*N)=0 would rightly drop every term)
    sdf = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in tfidf_cosine_pairs(sdf, threshold=0.0, max_df_frac=None).collect()
    }
    vecs, _ = _ref_tfidf(CORPUS)

    def cos(a, b):
        shared = set(a) & set(b)
        if not shared:
            return None
        dot = sum(a[w] * b[w] for w in shared)
        na = math.sqrt(sum(v * v for v in a.values()))
        nb = math.sqrt(sum(v * v for v in b.values()))
        return round(dot / (na * nb), 4)

    ids = sorted(vecs)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            c = cos(vecs[a], vecs[b])
            if c is not None and c >= 0.0:
                want[(a, b)] = c
    # doc 4 shares no term with anyone: it must appear in NO pair
    assert not any(4 in k for k in got)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-4, k
    # docs 1,2 (two shared terms) are the most similar pair
    assert max(got, key=got.get) == (1, 2)


def test_tfidf_hot_term_cap_drops_ubiquitous_terms(spark):
    # 'the' appears in every doc -> df over the cap -> excluded entirely
    rows = [(i, f"the unique{i} word{i}") for i in range(1, 6)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    t = tfidf_terms(sdf, max_term_df=4)
    assert t.filter(F.col("term") == "the").count() == 0
    assert t.filter(F.col("term") == "unique1").count() == 1
    # with the hot term gone, no doc shares a term -> zero pairs
    assert tfidf_cosine_pairs(sdf, threshold=0.0, max_term_df=4).count() == 0


def test_tfidf_plan_stays_jvm_side(spark):
    sdf = spark.createDataFrame(CORPUS, "doc_id long, text string")
    plan = tfidf_cosine_pairs(sdf)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_tfidf_relative_df_cap(spark):
    """max_df_frac drops terms by df/N regardless of corpus size — the
    guard the absolute cap cannot provide on small-vocabulary corpora."""
    # 'the' in 10/10 docs, 'hot' in 5/10, unique terms in 1/10
    rows = [(i, f"the {'hot ' if i < 5 else ''}u{i} v{i} w{i}") for i in range(10)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    t = tfidf_terms(sdf, max_df_frac=0.5)
    terms = {r.term for r in t.select("term").distinct().collect()}
    assert "the" not in terms          # 10/10 > 0.5
    assert "hot" in terms              # 5/10 <= 0.5 (boundary stays)
    assert "u0" in terms
    t2 = tfidf_terms(sdf, max_df_frac=0.1)
    terms2 = {r.term for r in t2.select("term").distinct().collect()}
    assert "hot" not in terms2 and "u0" in terms2
    # composes with the absolute cap as a conjunction
    t3 = tfidf_terms(sdf, max_term_df=0, max_df_frac=1.0)
    assert t3.count() == 0

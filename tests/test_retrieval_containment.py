"""BM25 retrieval + shingle containment: numeric parity with
driver-side reference formulas, directionality, tie determinism, and
the bounded top-k plan shape."""

import math
from decimal import ROUND_HALF_UP, Decimal

import pytest

from openmsistream_spark.llm.containment import containment_pairs
from openmsistream_spark.llm.retrieval import bm25_scores, bm25_topk

CORPUS = [
    (1, "spark merge window spark spark"),
    (2, "vector window table scan"),
    (3, "table scan filter join group"),
    (4, "spark vector merge window spark vector"),
    (5, "the quick brown fox"),
]
QUERY = ["spark", "vector", "window"]


def _round_half_up(x: float, digits: int) -> Decimal:
    """Spark's round() on a double: HALF_UP over the shortest decimal
    representation (BigDecimal.valueOf). Python's float round() is
    banker's and disagrees on exact half-ties — e.g. a per-term score
    pair summing to 1.309750 rounds to 1.3098 in Spark/DuckDB but
    1.3097 under float round()."""
    return Decimal(repr(x)).quantize(
        Decimal(1).scaleb(-digits), rounding=ROUND_HALF_UP
    )


def _ref_bm25(corpus, query, k1=1.2, b=0.75):
    docs = {d: t.lower().split() for d, t in corpus}
    n = len(docs)
    avgdl = sum(len(ws) for ws in docs.values()) / n
    df = {t: sum(t in ws for ws in docs.values()) for t in query}
    out = {}
    for d, ws in docs.items():
        s = Decimal(0)
        for t in query:
            tf = ws.count(t)
            if tf == 0 or df[t] == 0:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += _round_half_up(
                idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(ws) / avgdl)),
                6,
            )
        if s:
            # engines round the DECIMAL sum (exact), then cast to double
            out[d] = float(s.quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP))
    return out


def test_bm25_scores_match_reference(spark):
    sdf = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {r.doc_id: r.bm25 for r in bm25_scores(sdf, QUERY).collect()}
    assert got == _ref_bm25(CORPUS, QUERY)


def test_bm25_omits_nonmatching_docs(spark):
    sdf = spark.createDataFrame(CORPUS, "doc_id long, text string")
    ids = {r.doc_id for r in bm25_scores(sdf, QUERY).collect()}
    # docs 3 and 5 contain no query term -> absent from result, not 0.0
    assert ids == {1, 2, 4}


def test_bm25_topk_order_and_cut(spark):
    sdf = spark.createDataFrame(CORPUS, "doc_id long, text string")
    rows = bm25_topk(sdf, QUERY, k=2).collect()
    ref = sorted(_ref_bm25(CORPUS, QUERY).items(), key=lambda kv: (-kv[1], kv[0]))
    assert [(r.doc_id, r.bm25) for r in rows] == ref[:2]


def test_bm25_topk_is_take_ordered(spark):
    sdf = spark.createDataFrame(CORPUS, "doc_id long, text string")
    plan = bm25_topk(sdf, QUERY, k=2)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan  # bounded top-k, no global sort


def test_bm25_rejects_empty_query(spark):
    sdf = spark.createDataFrame(CORPUS, "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_scores(sdf, [])


# --- containment -----------------------------------------------------

EXCERPT_CORPUS = [
    # doc 11's full text appears inside doc 12 (an excerpt/quote)
    (11, "alpha beta gamma delta epsilon"),
    (12, "intro words alpha beta gamma delta epsilon and a long tail here"),
    (13, "totally unrelated text about other things entirely"),
]


def test_containment_is_directional(spark):
    sdf = spark.createDataFrame(EXCERPT_CORPUS, "doc_id long, text string")
    rows = {
        (r.id_a, r.id_b): r.containment
        for r in containment_pairs(sdf, threshold=0.0).collect()
    }
    # every 3-shingle of doc 11 appears in doc 12 -> full containment
    assert rows[(11, 12)] == 1.0
    # doc 12 has many shingles outside doc 11 -> strictly lower reverse
    assert rows[(12, 11)] < 1.0
    # disjoint docs never meet (pair generation via shared shingles)
    assert (11, 13) not in rows and (13, 11) not in rows


def test_containment_threshold_filters(spark):
    sdf = spark.createDataFrame(EXCERPT_CORPUS, "doc_id long, text string")
    rows = containment_pairs(sdf, threshold=0.9).collect()
    assert [(r.id_a, r.id_b, r.containment) for r in rows] == [(11, 12, 1.0)]


def test_containment_reuses_prebuilt_shingles(spark):
    from openmsistream_spark.llm.dedup import word_shingles

    sdf = spark.createDataFrame(EXCERPT_CORPUS, "doc_id long, text string")
    sh = word_shingles(sdf, n=3)
    via_shingles = {
        (r.id_a, r.id_b): r.containment
        for r in containment_pairs(shingles=sh, threshold=0.0).collect()
    }
    direct = {
        (r.id_a, r.id_b): r.containment
        for r in containment_pairs(sdf, threshold=0.0).collect()
    }
    assert via_shingles == direct


def test_containment_requires_input(spark):
    with pytest.raises(ValueError):
        containment_pairs(None)


def test_bm25_per_query_matches_single_query_scores(spark):
    from openmsistream_spark.llm.retrieval import bm25_topk_per_query

    sdf = spark.createDataFrame(CORPUS, "doc_id long, text string")
    qdf = spark.createDataFrame(
        [(1, "spark vector window"), (2, "table scan")],
        "query_id long, query_text string",
    )
    got = bm25_topk_per_query(sdf, qdf, k=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.doc_id, r.bm25, r.rank))
    # query 1 must agree with the single-query path on the same terms
    ref1 = sorted(
        _ref_bm25(CORPUS, ["spark", "vector", "window"]).items(),
        key=lambda kv: (-kv[1], kv[0]),
    )[:3]
    assert [(d, s) for d, s, _ in by_q[1]] == ref1
    ref2 = sorted(
        _ref_bm25(CORPUS, ["table", "scan"]).items(),
        key=lambda kv: (-kv[1], kv[0]),
    )[:3]
    assert [(d, s) for d, s, _ in by_q[2]] == ref2
    assert [r for _, _, r in by_q[1]] == [1, 2, 3]


def test_bm25_per_query_plan_uses_window_group_limit(spark):
    from openmsistream_spark.llm.retrieval import bm25_topk_per_query

    sdf = spark.createDataFrame(CORPUS, "doc_id long, text string")
    qdf = spark.createDataFrame(
        [(1, "spark vector"), (2, "table scan")],
        "query_id long, query_text string",
    )
    plan = (
        bm25_topk_per_query(sdf, qdf, k=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # per-query top-k must push into the window (bounded per-task heaps,
    # never a full per-query sort buffer)
    assert "WindowGroupLimit" in plan, plan


# --- property-based parity on random corpora -------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_WORDS = ["spark", "vector", "merge", "window", "table", "scan", "row", "agg"]
_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12)
_corpus = st.lists(_doc, min_size=1, max_size=8)
_query = st.lists(st.sampled_from(_WORDS), min_size=1, max_size=3, unique=True)


@given(corpus=_corpus, query=_query)
@settings(max_examples=15, deadline=None)
def test_bm25_property_matches_reference(spark, corpus, query):
    rows = [(i, " ".join(ws)) for i, ws in enumerate(corpus)]
    # empty-text docs still count toward N/avgdl in the reference only
    # if they produce tokens; normalize both sides to non-empty docs
    rows = [(i, t) for i, t in rows if t.strip()]
    if not rows:
        return
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.bm25 for r in bm25_scores(sdf, query).collect()}
    assert got == _ref_bm25(rows, query)


def _ref_containment(rows, n=3):
    sh = {
        d: {
            " ".join(ws[i : i + n])
            for ws in [t.split()]
            for i in range(len(ws) - n + 1)
        }
        for d, t in rows
    }
    out = {}
    for a, sa in sh.items():
        if not sa:
            continue
        for b, sb in sh.items():
            if a == b:
                continue
            inter = len(sa & sb)
            if inter:
                out[(a, b)] = round(inter / len(sa), 4)
    return out


@given(corpus=_corpus)
@settings(max_examples=15, deadline=None)
def test_containment_property_matches_reference(spark, corpus):
    rows = [(i, " ".join(ws)) for i, ws in enumerate(corpus) if ws]
    if not rows:
        return
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.containment
        for r in containment_pairs(sdf, threshold=0.0).collect()
    }
    assert got == _ref_containment(rows)


# --- reciprocal-rank fusion ------------------------------------------

def test_rrf_fuse_math_and_single_list_items(spark):
    from openmsistream_spark.llm.retrieval import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank int")
    b = spark.createDataFrame([(2, 1), (4, 2)], "doc_id long, rank int")
    got = {r.doc_id: r.rrf for r in rrf_fuse([a, b], k=60).collect()}

    def c(rank):
        return round(1.0 / (60 + rank), 6)

    assert got == {
        1: round(c(1), 4),
        2: round(c(2) + c(1), 4),   # ranked by both arms -> sums
        3: round(c(3), 4),
        4: round(c(2), 4),          # vector-only item still scores
    }
    # agreement wins: doc 2 (rank 2 + rank 1) beats doc 1 (rank 1 alone)
    assert got[2] > got[1]


def test_rrf_fuse_topk_deterministic_ties(spark):
    from openmsistream_spark.llm.retrieval import rrf_fuse

    # two docs with identical rank in one list each -> equal rrf; the
    # cut must pick the lower id
    a = spark.createDataFrame([(7, 1)], "doc_id long, rank int")
    b = spark.createDataFrame([(5, 1)], "doc_id long, rank int")
    rows = rrf_fuse([a, b], topk=1).collect()
    assert [(r.doc_id) for r in rows] == [5]


def test_rrf_fuse_rejects_empty(spark):
    from openmsistream_spark.llm.retrieval import rrf_fuse

    with pytest.raises(ValueError):
        rrf_fuse([])


# --- on-disk inverted text index -------------------------------------

def test_text_index_search_matches_direct_bm25(spark, tmp_path):
    """Index-backed search must return byte-identical scores to the
    direct corpus scan (same formula, same decimal rounding)."""
    from openmsistream_spark.llm.retrieval import (
        bm25_search_index,
        write_text_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = str(tmp_path / "tix")
    write_text_index(docs, idx)
    terms = ["spark", "vector", "merge"]
    direct = [(r.doc_id, r.bm25) for r in bm25_topk(docs, terms, k=15).collect()]
    via_index = [
        (r.doc_id, r.bm25)
        for r in bm25_search_index(spark, idx, terms, k=15).collect()
    ]
    assert via_index == direct


def test_text_index_scan_prunes_partitions(spark, tmp_path):
    """The postings scan must carry the bucket partition predicate
    (static pruning: only the query terms' bucket dirs are read) and
    push the term filter to parquet."""
    from openmsistream_spark.llm.retrieval import (
        _term_bucket_py,
        bm25_search_index,
        write_text_index,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma"), (3, "delta epsilon")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "tix")
    write_text_index(docs, idx)
    df = bm25_search_index(spark, idx, ["alpha"], k=5)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    b = _term_bucket_py("alpha")
    assert f"bucket#" in plan and "PartitionFilters" in plan, plan
    # the literal bucket id appears inside the partition filter clause
    pf = plan[plan.index("PartitionFilters"):]
    assert str(b) in pf.split("PushedFilters")[0], plan
    # term equality reaches the row groups
    assert "PushedFilters" in plan and "term" in plan.split("PushedFilters", 1)[1][:200], plan


def test_text_index_append_updates_tf_df(spark, tmp_path):
    """Appended postings participate in tf/df immediately (stats stay
    frozen by contract)."""
    from openmsistream_spark.llm.retrieval import (
        bm25_search_index,
        write_text_index,
    )

    d0 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    idx = str(tmp_path / "tix")
    write_text_index(d0, idx)
    before = {r.doc_id for r in bm25_search_index(spark, idx, ["alpha"]).collect()}
    assert before == {1}
    d1 = spark.createDataFrame([(9, "alpha alpha")], "doc_id long, text string")
    # append only the postings (stats frozen)
    from openmsistream_spark.llm.retrieval import _tokens
    from pyspark.sql import functions as F

    toks = _tokens(d1, "doc_id", "text")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    (
        tf.join(dl, "doc_id")
        .withColumn("bucket", F.crc32(F.col("term")) % 64)
        .write.mode("append")
        .partitionBy("bucket")
        .parquet(f"{idx}/postings")
    )
    after = {r.doc_id for r in bm25_search_index(spark, idx, ["alpha"]).collect()}
    assert after == {1, 9}


# --- pseudo-relevance-feedback expansion -----------------------------

def test_prf_expansion_terms_and_rescore(spark):
    from openmsistream_spark.llm.retrieval import bm25_prf_expand

    corpus = [
        (1, "spark shuffle executor spark"),
        (2, "spark shuffle partition"),
        (3, "spark executor partition shuffle"),
        (4, "cooking recipes and garlic"),
        (5, "garlic bread recipes"),
    ]
    sdf = spark.createDataFrame(corpus, "doc_id long, text string")
    expanded, rescored = bm25_prf_expand(
        sdf, ["spark"], n_feedback_docs=3, n_expand_terms=2
    )
    # original query leads; mined terms come from the feedback docs'
    # vocabulary, never the cooking cluster, never the original term
    assert expanded[0] == "spark" and len(expanded) == 3
    assert set(expanded[1:]) <= {"shuffle", "executor", "partition"}
    got = {r.doc_id: r.bm25 for r in rescored.collect()}
    # expansion can only add matching docs from the feedback cluster
    assert set(got) == {1, 2, 3}
    # rescored equals a direct query with the same expanded terms
    direct = {r.doc_id: r.bm25 for r in bm25_scores(sdf, expanded).collect()}
    assert got == direct


def test_prf_expansion_deterministic(spark):
    from openmsistream_spark.llm.retrieval import bm25_prf_expand

    sdf = spark.createDataFrame(
        [(1, "a b c"), (2, "a c d"), (3, "a d e")], "doc_id long, text string"
    )
    e1, _ = bm25_prf_expand(sdf, ["a"], n_feedback_docs=2, n_expand_terms=2)
    e2, _ = bm25_prf_expand(sdf, ["a"], n_feedback_docs=2, n_expand_terms=2)
    assert e1 == e2


def test_bm25_terms_with_quotes_do_not_break_expression(spark):
    """Query terms are embedded as SQL literals in the stack() unpivot —
    quotes/backslashes must be escaped, not crash or inject."""
    sdf = spark.createDataFrame(
        [(1, "it's o'clock somewhere"), (2, "plain words here")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.bm25 for r in bm25_scores(sdf, ["it's", "o'clock"]).collect()}
    assert set(got) == {1} and got[1] > 0

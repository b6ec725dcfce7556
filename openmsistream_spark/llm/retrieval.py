"""BM25 keyword retrieval over a document corpus.

The lexical-retrieval member of the similarity family: where
``llm/similarity.py`` ranks by dense-vector cosine and ``llm/tfidf.py``
scores document *pairs* by sparse term overlap, ``bm25_topk`` ranks the
corpus against a small *query* term set — the classic Okapi BM25
scoring used to mine training data for a topic, build retrieval-eval
candidate pools, or drive contamination triage from a benchmark's
keywords.

Scale shape (the part that matters at 100 TB):

- The token explode is a narrow flatMap; the only corpus-sized shuffle
  is the per-document length aggregate (map-side combinable longs).
- Query-term frequencies are computed AFTER filtering the token stream
  to the (tiny, literal) query-term set, so the tf aggregate's input is
  a vanishing fraction of the corpus and its key space is
  |docs matching| x |query terms|.
- Per-term document frequencies and the corpus-size/average-length
  scalars are broadcast back (a handful of rows).
- The final top-k is an ``orderBy().limit(k)`` — Spark executes it as
  TakeOrdered (per-partition heaps, bounded driver merge), never a
  global sort materialization.

Numeric discipline mirrors ``llm/tfidf.py``: per-(doc, term) scores are
rounded to 6 dp and summed as DECIMAL(18,6), so the total is exact over
the rounded terms and independent of partitioning — an oracle engine
reproducing the same expression tree matches bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_K1 = 1.2
DEFAULT_B = 0.75


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term) rows — one per token occurrence (NOT distinct)."""
    return docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")


def bm25_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 score of every matching document against the query.

    For each query term t with document frequency df over the N-doc
    corpus, idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)) (the
    Robertson/Lucene form — always positive), and a document with term
    frequency tf and length dl (token count; avgdl = corpus mean)
    contributes

        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    per term; the document score is the sum over query terms, rounded
    per-term to 6 dp and accumulated as DECIMAL(18,6) (order-independent
    — see module docstring). Documents containing none of the query
    terms are absent from the result (their score is 0).

    Returns (id_col, bm25) — bm25 rounded to 4 dp.
    """
    if not query_terms:
        raise ValueError("bm25_scores needs at least one query term")
    terms = sorted({t.lower() for t in query_terms})
    toks = _tokens(docs, id_col, text_col)
    # ONE corpus-sized shuffle: per-doc length and per-query-term counts
    # in the same map-side-combinable aggregate (the term set is a small
    # literal, so the conditional counters are fixed columns, not keys)
    per_doc = toks.groupBy(id_col).agg(
        F.count("*").alias("dl"),
        *[
            F.sum((F.col("term") == t).cast("long")).alias(f"_tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    # corpus scalars + per-term document frequencies: one tiny broadcast
    # row (exact integer sum / count divided as doubles — engine-portable;
    # a float `avg` could accumulate differently elsewhere)
    stats = per_doc.agg(
        F.count("*").alias("n"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    # unpivot the fixed term columns back to (id, dl, tf, df) rows; docs
    # with tf 0 for a term contribute nothing (filtered before scoring).
    # terms are embedded as SQL string literals — escape them (a query
    # term containing a quote/backslash must not break the expression)
    def _lit(t: str) -> str:
        return "'" + t.replace("\\", "\\\\").replace("'", "\\'") + "'"

    stack_expr = ", ".join(f"{_lit(t)}, _tf{i}" for i, t in enumerate(terms))
    long = (
        per_doc.crossJoin(F.broadcast(stats))
        .selectExpr(
            id_col,
            "dl",
            "n",
            "avgdl",
            *[f"_df{i}" for i in range(len(terms))],
            f"stack({len(terms)}, {stack_expr}) AS (term, tf)",
        )
        .filter(F.col("tf") > 0)
    )
    df_for_term = F.coalesce(
        *[
            F.when(F.col("term") == t, F.col(f"_df{i}"))
            for i, t in enumerate(terms)
        ]
    ) if len(terms) > 1 else F.col("_df0")
    long = long.withColumn("df", df_for_term)
    idf = F.log(
        F.lit(1) + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    per_term = F.round(idf * (F.col("tf") * (k1 + 1)) / denom, 6)
    return (
        long.select(F.col(id_col), per_term.alias("_s"))
        .groupBy(id_col)
        .agg(
            # round ON the decimal (HALF_UP in Spark and DuckDB alike),
            # THEN cast: no float half-tie can perturb the 4th decimal
            F.round(F.sum(F.col("_s").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("bm25")
        )
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 25,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by BM25 against the query term set.

    Deterministic under score ties: ordering is (bm25 DESC, id ASC), so
    the same k rows come back on any partitioning/engine. Executes as
    TakeOrdered — no global sort.
    """
    scores = bm25_scores(
        docs, query_terms, k1=k1, b=b, id_col=id_col, text_col=text_col
    )
    return scores.orderBy(F.desc("bm25"), F.asc(id_col)).limit(k)


def bm25_topk_per_query(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 25,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
) -> DataFrame:
    """Top-k documents per query for a whole query TABLE — the batch
    shape behind retrieval-eval candidate pools (one row per benchmark
    question) and topic-mining sweeps.

    ``queries`` is (query_id, query_text); its text tokenizes with the
    same rule as the corpus. Document frequencies are computed once over
    the union of all queries' terms, idf/avgdl/N are shared, and each
    (query, doc) score sums only that query's terms, so q queries cost
    one corpus token pass + one (query-term-matched tokens x q-fanout)
    aggregate — not q separate jobs.

    The per-query top-k is a ``row_number() <= k`` window partitioned by
    query: Spark plans it as WindowGroupLimit (per-partition top-k
    heaps), so a query never buffers more than k rows per task — the
    many-key analogue of ``bm25_topk``'s TakeOrdered. Ordering within a
    query is (bm25 DESC, doc id ASC): deterministic under ties.

    Returns (query_id, id_col, bm25, rank) with rank 1..k.
    """
    qterms = queries.select(
        F.col(query_id_col),
        F.explode(
            F.split(F.lower(F.trim(F.col(query_text_col))), r"\s+")
        ).alias("term"),
    ).filter(F.col("term") != "").distinct()
    toks = _tokens(docs, id_col, text_col)
    dl = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    all_terms = qterms.select("term").distinct()
    tf = (
        toks.join(F.broadcast(all_terms), "term")
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        F.lit(1) + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    per_term = F.round(idf * (F.col("tf") * (k1 + 1)) / denom, 6)
    scored = (
        tf.join(F.broadcast(qterms), "term")  # fan out to interested queries
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(df), "term")
        .select(F.col(query_id_col), F.col(id_col), per_term.alias("_s"))
        .groupBy(query_id_col, id_col)
        .agg(
            # round ON the decimal (HALF_UP in Spark and DuckDB alike),
            # THEN cast: no float half-tie can perturb the 4th decimal
            F.round(F.sum(F.col("_s").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("bm25")
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("bm25"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "bm25", "rank")
    )


def rrf_fuse(
    rankings: "Sequence[DataFrame]",
    k: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    topk: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion across N rankings — the standard hybrid-
    retrieval combiner (Cormack et al., SIGIR'09): each list contributes
    1 / (k + rank) for every item it ranked, and items are re-ranked by
    the sum, so agreement across heterogeneous scorers (BM25 ranks vs
    cosine ranks — incomparable score scales) beats any single arm
    without score normalization.

    Each input frame needs (id_col, rank_col) — the natural output of
    ``bm25_topk_per_query``/``cosine_topk``-style ops, already trimmed
    to their own top-k, so every input is k-row bounded and the fusion
    aggregate touches at most N*k rows regardless of corpus size.

    Contributions are rounded to 6 dp and summed as DECIMAL(18,6), the
    total rounded to 4 dp ON the decimal (HALF_UP in Spark and DuckDB
    alike) — rank ints make every contribution bit-identical across
    engines, so fused scores are too. ``topk`` trims the fused ranking
    (ordered rrf DESC, id ASC — deterministic under ties) via
    TakeOrdered.

    Returns (id_col, rrf).
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    contrib = F.round(F.lit(1.0) / (F.lit(k) + F.col(rank_col)), 6).cast(
        "decimal(18,6)"
    )
    parts = [r.select(F.col(id_col), contrib.alias("_c")) for r in rankings]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy(id_col).agg(
        F.round(F.sum("_c"), 4).cast("double").alias("rrf")
    )
    if topk is not None:
        fused = fused.orderBy(F.desc("rrf"), F.asc(id_col)).limit(topk)
    return fused


N_TERM_BUCKETS = 64


def _term_bucket_py(term: str, n_buckets: int = N_TERM_BUCKETS) -> int:
    """Python twin of the build-side bucket expression (crc32 % B) —
    lets the query path push a LITERAL partition predicate, so pruning
    is static (no subquery needed)."""
    import zlib

    return zlib.crc32(term.encode("utf-8")) % n_buckets


def _build_postings(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int,
) -> "tuple[DataFrame, DataFrame]":
    """Shared postings construction for the static build AND the
    streaming sink (streaming/text_index.py): score parity between the
    two index layouts requires bit-identical tokenization, tf/dl
    derivation, and the crc32 bucket formula — keeping them in one
    place is what enforces it. Returns (postings, dl)."""
    toks = _tokens(docs, id_col, text_col)
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    postings = (
        tf.join(dl, id_col)
        .withColumn("bucket", F.crc32(F.col("term")) % n_buckets)
    )
    return postings, dl


def write_text_index(
    docs: DataFrame,
    path: str,
    mode: str = "overwrite",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_TERM_BUCKETS,
) -> None:
    """Materialize an inverted text index as TERM-BUCKET-PARTITIONED
    parquet — the lexical analogue of ``write_ivf_index``: what makes
    BM25 an actual index at 100 TB rather than a per-query corpus scan.

    Layout:

    - ``{path}/postings/bucket=B/``: (term, id, tf, dl) — the document
      length is DENORMALIZED onto every posting (8 bytes/row) so the
      query path needs no join against a corpus-sized doclens table;
      ``bucket = crc32(term) % n_buckets`` (crc32 is identical in
      Python's zlib, so the query side computes its buckets locally).
    - ``{path}/stats/``: one row (n, avgdl) — frozen at build time.

    Per-term document frequencies are NOT stored: the query has already
    read exactly its terms' postings, so df is a count over rows in
    hand. That also means appended postings change df/tf automatically;
    only n/avgdl live in stats, so after heavy appends rebuild stats (or
    the index) to keep scores calibrated — same contract as any
    IVF/centroid refresh.

    ``mode`` applies to the POSTINGS write only; the one-row stats
    frame is always overwritten whole (a multi-row stats table would
    silently multiply every search score through the broadcast cross
    join) — after a mode='append' postings load, the frozen n/avgdl are
    those of the final call's input, so rebuild stats from the full
    corpus (or rebuild the index) to keep scores calibrated.

    Deterministic; re-running a failed build converges under
    mode='overwrite'.
    """
    from pyspark import StorageLevel

    postings, dl = _build_postings(docs, id_col, text_col, n_buckets)
    # dl feeds two actions (the postings write and the stats aggregate);
    # uncached, the second action re-tokenizes the whole corpus
    dl = dl.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        postings.write.mode(mode).partitionBy("bucket").parquet(
            f"{path}/postings"
        )
        stats = dl.agg(
            F.count("*").alias("n"),
            (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        )
        stats.write.mode("overwrite").parquet(f"{path}/stats")
    finally:
        dl.unpersist()


def bm25_search_index(
    spark,
    path: str,
    query_terms: "Sequence[str]",
    k: int = 25,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    id_col: str = "doc_id",
    n_buckets: int = N_TERM_BUCKETS,
) -> DataFrame:
    """BM25 top-k against a ``write_text_index`` on-disk index.

    I/O scales with the query, not the corpus: the postings scan carries
    a LITERAL partition predicate (the query terms' crc32 buckets,
    computed driver-side by the same formula the build used), so only
    those bucket directories are listed and read (``PartitionFilters``
    in the scan — asserted by test), and the term equality filter
    reaches the parquet row groups as a pushed filter. Everything after
    the scan is query-sized: df is a count over the rows in hand, the
    (n, avgdl) stats row rides a broadcast, and the top-k is
    TakeOrdered.

    Scores are IDENTICAL to ``bm25_topk`` run directly on the corpus
    the index was built from (same formula, same decimal rounding) —
    asserted by test.
    """
    if not query_terms:
        raise ValueError("bm25_search_index needs at least one query term")
    terms = sorted({t.lower() for t in query_terms})
    buckets = sorted({_term_bucket_py(t, n_buckets) for t in terms})
    postings = (
        spark.read.parquet(f"{path}/postings")
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
    )
    stats = spark.read.parquet(f"{path}/stats")
    dfreq = postings.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        F.lit(1) + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    per_term = F.round(idf * (F.col("tf") * (k1 + 1)) / denom, 6)
    scored = (
        postings.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(F.col(id_col), per_term.alias("_s"))
        .groupBy(id_col)
        .agg(
            F.round(F.sum(F.col("_s").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("bm25")
        )
    )
    return scored.orderBy(F.desc("bm25"), F.asc(id_col)).limit(k)


def bm25_prf_expand(
    docs: DataFrame,
    query_terms: "Sequence[str]",
    n_feedback_docs: int = 10,
    n_expand_terms: int = 5,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "tuple[list[str], DataFrame]":
    """Pseudo-relevance-feedback query expansion (the RM3/Rocchio
    shape): run BM25, treat the top ``n_feedback_docs`` as relevant,
    mine their ``n_expand_terms`` highest-TF-IDF terms (weighted against
    the WHOLE corpus's document frequencies, so feedback-doc stopwords
    don't win), append them to the query, and rescore.

    The only driver-side materialization is the expansion term list
    itself — bounded at ``n_expand_terms`` (the same contract as
    ``cosine_topk``'s query-id list); feedback-doc term mining runs as a
    semi join of the corpus token stream against the top-k id set.

    Returns (expanded_terms, rescored) where ``expanded_terms`` is the
    original query plus the mined terms (original order first, mined by
    descending weight) and ``rescored`` is ``bm25_scores`` over the
    expanded query. Deterministic: term mining breaks weight ties by
    term string.
    """
    base = [t.lower() for t in query_terms]
    top = bm25_topk(
        docs, base, k=n_feedback_docs, k1=k1, b=b,
        id_col=id_col, text_col=text_col,
    ).select(id_col)
    toks = _tokens(docs, id_col, text_col)
    # corpus-wide df (Zipf-bounded vocab aggregate); feedback tf via a
    # semi join against the bounded top-k id set
    cdf = toks.groupBy("term").agg(F.count_distinct(F.col(id_col)).alias("df"))
    n_docs = docs.select(F.count_distinct(F.col(id_col)).alias("_n"))
    fb_tf = (
        toks.join(top, id_col, "left_semi")
        .groupBy("term")
        .agg(F.count("*").alias("tf"))
    )
    mined = (
        fb_tf.filter(~F.col("term").isin(base))
        .join(cdf, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            F.round(
                F.col("tf") * (F.log((F.col("_n") + 1) / (F.col("df") + 1)) + 1), 6
            ).alias("weight"),
        )
        .orderBy(F.desc("weight"), F.asc("term"))
        .limit(n_expand_terms)
    )
    expanded = base + [r.term for r in mined.collect()]
    return expanded, bm25_scores(
        docs, expanded, k1=k1, b=b, id_col=id_col, text_col=text_col
    )

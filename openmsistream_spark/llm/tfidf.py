"""TF-IDF term weighting and sparse text cosine similarity.

The text-native member of the similarity family: where
``llm/similarity.py`` scores dense embedding vectors,
``tfidf_cosine_pairs`` scores documents directly from their term
distributions — no embedding model required — via the classic sparse
trick: two documents have nonzero cosine only if they SHARE a term, so
pair generation is an equi-join on the term (never all-pairs), with the
same hot-key discipline as the shingle-based deduppers
(``cap_hot_shingles``): a stop-word-like term shared by k docs fans out
k² join rows, so high-document-frequency terms are dropped from the
join. Dropping them barely moves the scores (their IDF is already near
zero) and removes the one quadratic hotspot — the standard trade at
corpus scale.

All weights are md5-free plain arithmetic (ln-based IDF) rounded before
aggregation, so the numbers are engine-portable if an oracle is ever
attached; pair scores are exact over the capped term sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_TERM_DF = 10_000
# Relative document-frequency cap: drop terms present in more than this
# fraction of the corpus. The absolute cap alone is a trap on corpora
# whose vocabulary is small relative to doc count (every term passes and
# the shared-term join degenerates toward all-pairs); a relative cap
# scales with N the way ``cap_hot_shingles``' relative guard does, so
# stop-word-like terms always fall out no matter the corpus shape.
DEFAULT_MAX_DF_FRAC = 0.1


def tfidf_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_term_df: int | None = None,
    max_df_frac: float | None = None,
) -> DataFrame:
    """Sparse TF-IDF rows (id, term, tf, df, tfidf).

    tf = term count in the document (raw count — length effects cancel
    in cosine after normalization); idf = ln((N+1)/(df+1)) + 1 (the
    smoothed form, never negative); tfidf = tf * idf rounded to 6 dp.

    Scale shape: one map-side-combinable (doc, term) count, a term-DF
    count joined back onto the term rows (NOT force-broadcast — the
    distinct-term table grows with the corpus's typo/rare-token tail,
    so the join side is left to AQE, which broadcasts it exactly when
    it is small enough), and the corpus-size scalar rides a broadcast
    cross join. ``max_term_df`` drops ubiquitous terms entirely (see
    module docstring); 0 is a real cap, None disables. ``max_df_frac``
    is the RELATIVE form of the same guard (df/N <= frac, evaluated in
    exact parts-per-million integer arithmetic so a SQL oracle can
    mirror it bit-for-bit); the two compose as a conjunction.
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.select(
        F.count_distinct(F.col(id_col)).alias("_n")
    )
    if max_term_df is not None:
        df = df.filter(F.col("df") <= max_term_df)
    if max_df_frac is not None:
        # df/N <= frac as integer cross-multiplication at ppm precision:
        # no float division, so Spark and any SQL oracle agree exactly
        ppm = int(round(max_df_frac * 1_000_000))
        df = (
            df.crossJoin(F.broadcast(n_docs))
            .filter(F.col("df") * 1_000_000 <= F.lit(ppm) * F.col("_n"))
            .drop("_n")
        )
    idf = (
        F.log((F.col("_n") + 1) / (F.col("df") + 1)) + 1
    )
    return (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            "tf",
            "df",
            F.round(F.col("tf") * idf, 6).alias("tfidf"),
        )
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    threshold: float = 0.3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_term_df: int | None = DEFAULT_MAX_TERM_DF,
    max_df_frac: float | None = DEFAULT_MAX_DF_FRAC,
) -> DataFrame:
    """All qualifying document pairs with TF-IDF cosine >= threshold.

    Pairs arise ONLY through shared terms (equi-join on the term), so
    disjoint documents never meet and the plan never goes all-pairs;
    hot terms above ``max_term_df`` OR ``max_df_frac * N`` are excluded
    from both the join and the norms (they are near-zero-IDF noise and
    the quadratic hotspot). The relative cap is the load-bearing one:
    an absolute cap silently passes every term on a corpus whose
    vocabulary is small relative to doc count, and the join degenerates
    toward all-pairs — exactly the corpus shape a relative cap always
    survives. Norms are one map-side-combinable aggregate; the dot
    product is a sum over the (sparse, capped) shared-term rows.

    Returns (id_a, id_b, cosine) with id_a < id_b.
    """
    t = tfidf_terms(
        docs,
        id_col=id_col,
        text_col=text_col,
        max_term_df=max_term_df,
        max_df_frac=max_df_frac,
    ).select(id_col, "term", "tfidf")
    # order-independent accumulation: the 6-dp weights multiply into
    # decimal(28,12) terms, so sums do not drift with partitioning the
    # way float sums would, and a SQL oracle mirroring the same casts
    # reproduces them (residual cross-engine risk is confined to exact
    # half-ties at the 12th decimal of a product — far below the 4-dp
    # compared digits in practice)
    sq = (F.col("tfidf") * F.col("tfidf")).cast("decimal(28,12)")
    norms = t.groupBy(id_col).agg(
        F.sqrt(F.sum(sq).cast("double")).alias("nrm")
    )
    a = t.select(F.col(id_col).alias("id_a"), "term", F.col("tfidf").alias("wa"))
    b = t.select(F.col(id_col).alias("id_b"), "term", F.col("tfidf").alias("wb"))
    dots = (
        a.join(b, "term")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.sum((F.col("wa") * F.col("wb")).cast("decimal(28,12)"))
            .cast("double")
            .alias("dot")
        )
    )
    return (
        dots.join(norms.withColumnRenamed(id_col, "id_a").withColumnRenamed("nrm", "na"), "id_a")
        .join(norms.withColumnRenamed(id_col, "id_b").withColumnRenamed("nrm", "nb"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )

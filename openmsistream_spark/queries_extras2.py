"""Round-7 catalog additions, registered OUT-OF-BAND.

Same discipline as ``queries_extras.py`` (see its module docstring):
this module is imported directly by the catalog entry points
(``__spark_entry__.py``, ``bench.py``, ``tests/conftest.py``), never
from ``queries.py``, so landing new queries does not dirty the source
closure of already-verified catalog entries.

Content:

- ``duplicated_spans_docs`` / ``dup_span_ratio_docs``: exact-substring
  (span-level) dedup — the Spark-shaped form of suffix-array duplicated
  span removal (Lee et al. 2021) via fixed-k token-gram fingerprints +
  interval merge, and the per-document duplication-load ratio built on
  it (llm/spandedup.py);
- ``tfidf_cosine_pairs_dense``: the uncapped-arithmetic twin of
  ``tfidf_cosine_pairs``. The headline query now runs the library's
  relative DF cap (the 100 TB-safe default), which on the driver's
  deliberately dense synthetic corpus excludes most terms; this twin
  disables the caps so the full TF-IDF/cosine arithmetic keeps a rich
  (~14k-pair) oracle. It is a correctness instrument: deliberately
  quadratic on this corpus, oracle-gated at sf0.01, NOT in bench
  HEADLINE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import load, query

_SPAN_CTE = r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         t -> t <> '') AS t
      FROM documents
    ),
    idx AS (
      SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i FROM toks
    ),
    g AS (
      SELECT doc_id, i - 1 AS pos,
             array_to_string(list_slice(t, i, i + 7), ' ') AS gram
      FROM idx
    ),
    dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
    sp AS (SELECT doc_id, pos AS s, pos + 8 AS e FROM g JOIN dup USING (gram)),
    m AS (
      SELECT doc_id, s, e,
             CASE WHEN s > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY s
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
             THEN 1 ELSE 0 END AS brk
      FROM sp
    ),
    grp AS (
      SELECT doc_id, s, e,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY s) AS gid
      FROM m
    ),
    merged AS (
      SELECT doc_id, CAST(min(s) AS BIGINT) AS span_start,
             CAST(max(e) AS BIGINT) AS span_end,
             CAST(max(e) - min(s) AS BIGINT) AS span_tokens
      FROM grp GROUP BY doc_id, gid
    )
"""


@query(
    "duplicated_spans_docs",
    _SPAN_CTE
    + """
    SELECT doc_id, span_start, span_end, span_tokens FROM merged
    """,
    doc="exact-substring dedup: maximal duplicated token spans (k=8 "
    "token-gram fingerprints, corpus-wide occurrence >= 2, "
    "overlap/adjacency-merged) — suffix-array duplicate-span removal "
    "at granularity k, Spark-shaped (Lee et al. 2021)",
    survey="LLM dedup: exact-substring / duplicated-span detection",
)
def duplicated_spans_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog form of ``llm.spandedup.duplicated_spans`` (its docstring
    has the scale shape: fingerprint count + equi-join bounded by actual
    duplication, per-doc window merge — never all-pairs, no global
    sort). ``fingerprint="text"`` here so the DuckDB oracle compares the
    exact same grouping keys; the library default is ``"hash"``
    (xxhash64) so 100 TB shuffles move 8-byte keys."""
    from .llm.spandedup import duplicated_spans

    docs = load(spark, sf_dir, "documents")
    return duplicated_spans(docs, k=8, fingerprint="text").select(
        "doc_id",
        F.col("span_start").cast("bigint").alias("span_start"),
        F.col("span_end").cast("bigint").alias("span_end"),
        F.col("span_tokens").cast("bigint").alias("span_tokens"),
    )


@query(
    "dup_span_ratio_docs",
    _SPAN_CTE
    + """
    , per_doc AS (
      SELECT doc_id, CAST(sum(span_tokens) AS BIGINT) AS dup_tokens
      FROM merged GROUP BY doc_id
    ),
    tot AS (
      SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens
      FROM toks WHERE len(t) > 0
    )
    SELECT t.doc_id, t.n_tokens,
           coalesce(p.dup_tokens, 0) AS dup_tokens,
           CAST((2 * coalesce(p.dup_tokens, 0) * 10000 + t.n_tokens)
                // (2 * t.n_tokens) AS DOUBLE) / 10000.0 AS dup_ratio
    FROM tot t LEFT JOIN per_doc p ON t.doc_id = p.doc_id
    """,
    doc="per-document duplication load: fraction of tokens inside "
    "duplicated spans (half-up 4 dp integer rounding) — the curation "
    "signal separating mostly-boilerplate docs (drop/excise) from "
    "lightly contaminated ones (keep)",
    survey="LLM dedup: span-duplication ratio for curation policies",
)
def dup_span_ratio_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog form of ``llm.spandedup.duplicated_span_ratio`` — spans
    as in ``duplicated_spans_docs``, folded per doc against the doc's
    token count, zero-filled for clean docs."""
    from .llm.spandedup import duplicated_span_ratio

    docs = load(spark, sf_dir, "documents")
    return duplicated_span_ratio(docs, k=8, fingerprint="text")


@query(
    "span_excised_corpus",
    r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         t -> t <> '') AS t
      FROM documents
    ),
    idx AS (
      SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i FROM toks
    ),
    g AS (
      SELECT doc_id, i - 1 AS pos,
             array_to_string(list_slice(t, i, i + 7), ' ') AS gram
      FROM idx
    ),
    agg AS (
      SELECT gram, count(*) AS n,
             min({'d': doc_id, 'p': pos}) AS first
      FROM g GROUP BY gram
    ),
    marked AS (
      SELECT g.doc_id, CAST(g.pos AS BIGINT) AS s,
             CAST(g.pos + 8 AS BIGINT) AS e
      FROM g JOIN agg USING (gram)
      WHERE agg.n >= 2
        AND NOT (g.doc_id = agg.first.d AND g.pos = agg.first.p)
    ),
    m AS (
      SELECT doc_id, s, e,
             CASE WHEN s > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY s
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
             THEN 1 ELSE 0 END AS brk
      FROM marked
    ),
    grp AS (
      SELECT doc_id, s, e,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY s) AS gid
      FROM m
    ),
    merged AS (
      SELECT doc_id, min(s) AS s, max(e) AS e FROM grp GROUP BY doc_id, gid
    ),
    per_doc AS (
      SELECT doc_id, list({'s': s, 'e': e}) AS sp FROM merged GROUP BY doc_id
    ),
    clean AS (
      SELECT t.doc_id,
             CASE WHEN p.sp IS NULL THEN t.t
             ELSE list_filter(t.t, (x, i) ->
                  len(list_filter(p.sp, q -> i - 1 >= q.s AND i - 1 < q.e)) = 0)
             END AS kept,
             t.t AS t
      FROM toks t LEFT JOIN per_doc p ON t.doc_id = p.doc_id
    )
    -- coalesce: DuckDB's array_to_string([]) is NULL where Spark's
    -- array_join([]) is '' (a fully-excised doc must compare equal)
    SELECT doc_id, coalesce(array_to_string(kept, ' '), '') AS text,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(len(t) - len(kept) AS BIGINT) AS n_tokens_removed
    FROM clean
    """,
    doc="keep-first exact-substring EXCISION: rewrite every document "
    "with duplicated spans removed, retaining only the corpus-order-"
    "first occurrence of each duplicated k-gram (k=8) — Lee et al. "
    "2021's remove-all-but-one-copy step, Spark-shaped (one combinable "
    "per-gram aggregate, per-doc span merge, one array-filter rewrite; "
    "no explode of the corpus, no per-gram windows)",
    survey="LLM dedup: exact-substring excision (keep-first rewrite)",
)
def span_excised_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog form of ``llm.spandedup.excise_duplicated_spans`` — see
    its docstring for semantics and the skew story (the per-gram
    (count, first) aggregate replaces a per-gram window, so hot
    boilerplate grams never concentrate on one task).
    ``fingerprint="text"`` for oracle key parity; library default is
    ``"hash"``."""
    from .llm.spandedup import excise_duplicated_spans

    docs = load(spark, sf_dir, "documents")
    return excise_duplicated_spans(docs, k=8, fingerprint="text")


# Seeded-assignment CTE shared by the two SemDeDup queries: nearest of
# the 8 lowest-id vectors by cosine (ties to the lowest cluster id) —
# the ann_ivf_topk convention, so the oracle reproduces the assignment
# without iterating Lloyd's. The library default trains real k-means.
from .queries_llm import _EMB_NORM_CTE  # noqa: E402  (a string constant)

_SEMDEDUP_CTE = (
    _EMB_NORM_CTE
    + """
    , cents AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm
                FROM normed WHERE vec_id < 8 AND nrm > 0),
    assigned AS (
      SELECT vec_id, v, nrm, cent_id FROM (
        SELECT n.vec_id, n.v, n.nrm, c.cent_id,
               row_number() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cnrm) DESC,
                          c.cent_id) AS rn
        FROM normed n CROSS JOIN cents c WHERE n.nrm > 0) t
      WHERE rn = 1),
    sd_pairs AS (
      SELECT a.cent_id AS cluster, a.vec_id AS id_a, b.vec_id AS id_b,
             round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) AS cosine
      FROM assigned a JOIN assigned b
        ON b.cent_id = a.cent_id AND a.vec_id < b.vec_id
      WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) >= 0.4)
"""
)


def _seed_centroids(emb: DataFrame) -> DataFrame:
    return emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cluster"), F.col("embedding").alias("centroid")
    )


@query(
    "semdedup_pairs_seeded",
    _SEMDEDUP_CTE + "\n    SELECT cluster, id_a, id_b, cosine FROM sd_pairs",
    doc="SemDeDup (Abbas et al. 2023) duplicate pairs: k-means-assign "
    "embeddings, cosine pairs WITHIN clusters only (equi-join on the "
    "cluster id — pair work is sum of cluster^2, never corpus^2). "
    "Seeded centroids here for oracle parity; the library trains "
    "real spherical k-means",
    survey="LLM dedup: semantic (embedding-cluster) dedup — pair stage",
)
def semdedup_pairs_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog form of ``llm.semdedup.semdedup_pairs`` with seed
    centroids (the 8 lowest-id vectors) and the corpus-appropriate
    threshold 0.4 (this synthetic embedding table tops out at ~0.49
    within-cluster cosine; real SemDeDup runs ~0.95+)."""
    from .llm.semdedup import semdedup_pairs

    emb = load(spark, sf_dir, "embeddings")
    return semdedup_pairs(emb, threshold=0.4, centroids=_seed_centroids(emb))


@query(
    "semdedup_survivors_seeded",
    _SEMDEDUP_CTE
    + """
    SELECT e.vec_id, e.label FROM embeddings e
    WHERE e.vec_id NOT IN (SELECT id_b FROM sd_pairs)
    """,
    doc="SemDeDup survivor set: the corpus minus every vector with a "
    "lower-id same-cluster neighbor at cosine >= threshold — each "
    "duplicate group keeps exactly its lowest id (deterministic, "
    "replay-stable; the drop set is duplicate-sized so the final "
    "anti-join broadcasts)",
    survey="LLM dedup: semantic (embedding-cluster) dedup — prune stage",
)
def semdedup_survivors_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog form of ``llm.semdedup.semdedup_prune`` (seeded, t=0.4);
    projects (vec_id, label) — embedding arrays stay out of the compare."""
    from .llm.semdedup import semdedup_prune

    emb = load(spark, sf_dir, "embeddings")
    return semdedup_prune(emb, threshold=0.4, centroids=_seed_centroids(emb)).select(
        "vec_id", "label"
    )


@query(
    "tfidf_cosine_pairs_dense",
    r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
      FROM documents
    ),
    t2 AS (SELECT * FROM toks WHERE term <> ''),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM t2 GROUP BY doc_id, term),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
    w AS (
      SELECT doc_id, term,
             round(tf * (ln((n + 1.0) / (df + 1.0)) + 1), 6) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    ),
    nrm AS (
      SELECT doc_id,
             sqrt(CAST(sum(CAST(tfidf * tfidf AS DECIMAL(28,12))) AS DOUBLE))
               AS nrm
      FROM w GROUP BY doc_id
    ),
    dots AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(sum(CAST(a.tfidf * b.tfidf AS DECIMAL(28,12))) AS DOUBLE)
               AS dot
      FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           round(dot / (na.nrm * nb.nrm), 4) AS cosine
    FROM dots
    JOIN nrm na ON na.doc_id = id_a
    JOIN nrm nb ON nb.doc_id = id_b
    WHERE round(dot / (na.nrm * nb.nrm), 4) >= 0.75
    """,
    doc="TF-IDF cosine pairs with ALL hot-term caps disabled — the "
    "uncapped-arithmetic correctness twin of tfidf_cosine_pairs "
    "(deliberately quadratic on the driver's dense corpus; "
    "oracle-gated, never benched)",
    survey="LLM similarity: TF-IDF cosine, uncapped correctness twin",
)
def tfidf_cosine_pairs_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the full TF-IDF/cosine arithmetic with ``max_term_df=None``
    and ``max_df_frac=None``: every term participates, so the driver's
    dense corpus exercises the decimal norm/dot arithmetic over ~14k
    pairs at sf0.01 — the rich oracle the capped headline query can no
    longer provide there. A scale trap BY DESIGN; see
    ``tfidf_cosine_pairs`` for the production shape."""
    from .llm.tfidf import tfidf_cosine_pairs

    docs = load(spark, sf_dir, "documents")
    return tfidf_cosine_pairs(
        docs, threshold=0.75, max_term_df=None, max_df_frac=None
    )

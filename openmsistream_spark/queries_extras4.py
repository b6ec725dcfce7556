"""Round-9 catalog additions, registered OUT-OF-BAND.

Same discipline as ``queries_extras*.py`` (see their module
docstrings): imported directly by the catalog entry points
(``__spark_entry__.py``, ``bench.py``, ``tests/conftest.py``), never
from ``queries.py``, so landing new queries does not dirty the source
closure of already-verified catalog entries.

Content — model-based quality filtering (llm/quality.py), the trained-
discriminator stage of GPT-3/LLaMA-class pipelines (the one standard
LLM-curation family the catalog lacked through round 8):

- ``quality_classifier_rank``: every document's linear quality margin
  under the classifier's exact first gradient step from w=0
  (``count_difference_weights``, balanced) with the DSIR target
  convention for labels (source='src0' is the high-quality seed, the
  rest is raw). The whole computation is integer (DECIMAL(38,0) /
  HUGEINT), so the oracle matches bit-for-bit; the float-trained path
  is pinned to this anchor by a pytest property (one training step
  ranks identically).
- ``quality_classifier_survivors``: the filter form — documents whose
  margin is >= 0 (more seed-mass than raw-mass under the balanced
  weights), i.e. what ``quality_classifier_filter`` admits into a
  training corpus.
- ``d4_prototype_prune``: D4 diversification (Tirumala et al. 2023) —
  after clustering, drop the fraction of each cluster CLOSEST to its
  centroid (the most prototypical, least marginally informative
  examples). Seeded unit-normalized centroids for oracle parity; the
  library composes it with SemDeDup as ``llm.semdedup.d4_prune``.
- ``winnowing_fingerprints_docs`` / ``winnowing_overlap_pairs``:
  rolling-hash document fingerprinting (Schleimer et al. 2003
  winnowing / MOSS, llm/fingerprint.py) — per-window rightmost-min
  k-gram hash selection with the shared-substring coverage guarantee,
  and the fingerprint-overlap near-dup report it exists for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import load, query

# Per-token balanced count-difference weights with the DSIR target
# convention (source='src0' = high-quality seed). All integer: HUGEINT
# here, DECIMAL(38,0) on the Spark side.
_QUALITY_CTE = r"""
    WITH per_doc AS (
      SELECT doc_id, token, count(*) AS cnt
      FROM (SELECT doc_id,
                   unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                      x -> x <> '')) AS token
            FROM documents)
      GROUP BY 1, 2),
    labs AS (SELECT doc_id, CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS y
             FROM documents),
    nn AS (SELECT CAST(sum(y) AS HUGEINT) AS n_pos,
                  CAST(count(*) - sum(y) AS HUGEINT) AS n_neg
           FROM labs),
    tok_cls AS (
      SELECT p.token,
             sum(CASE WHEN l.y = 1 THEN p.cnt ELSE 0 END) AS cnt_pos,
             sum(CASE WHEN l.y = 0 THEN p.cnt ELSE 0 END) AS cnt_neg
      FROM per_doc p JOIN labs l USING (doc_id) GROUP BY 1),
    w AS (SELECT token, n_neg * cnt_pos - n_pos * cnt_neg AS w
          FROM tok_cls, nn),
    scored AS (
      SELECT p.doc_id,
             CAST(sum(p.cnt) AS BIGINT) AS n_tokens,
             CAST(sum(CAST(p.cnt AS HUGEINT) * w.w) AS DOUBLE) AS score
      FROM per_doc p JOIN w USING (token)
      GROUP BY 1)
"""


def _seed_weights(spark: SparkSession, sf_dir: str):
    """Balanced count-difference weights with src0 as the seed class."""
    from .llm.quality import count_difference_weights

    docs = load(spark, sf_dir, "documents")
    return docs, count_difference_weights(
        docs.filter(F.col("source") == "src0"),
        docs.filter(F.col("source") != "src0"),
    )


@query(
    "quality_classifier_rank",
    _QUALITY_CTE + "\n    SELECT doc_id, n_tokens, score FROM scored",
    doc="model-based quality filtering (the GPT-3-style trained "
    "discriminator): per-document linear margin under the classifier's "
    "exact first gradient step from w=0 — balanced per-token "
    "count-difference weights (seed class: source='src0'), scored with "
    "one vocab-sized broadcast join + one combinable aggregate. "
    "Integer-exact end to end (DECIMAL(38,0)/HUGEINT); the float "
    "trainer is pinned to this anchor by a rank-equality pytest",
    survey="LLM curation: model-based quality filtering — scoring (round-9)",
)
def quality_classifier_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog form of ``llm.quality.count_difference_weights`` +
    ``score_with_weights``. The score is the ranking key (sort-free
    output — no global window; a top-k consumer bounds it the usual
    two-phase way)."""
    from .llm.quality import score_with_weights

    docs, weights = _seed_weights(spark, sf_dir)
    return score_with_weights(docs, weights)


@query(
    "quality_classifier_survivors",
    _QUALITY_CTE
    + """
    SELECT d.doc_id, d.source, s.n_tokens
    FROM documents d JOIN scored s USING (doc_id)
    WHERE s.score >= 0
    """,
    doc="the quality filter's admitted corpus: documents whose balanced "
    "classifier margin is >= 0 (more seed-mass than raw-mass) — the "
    "filter form a training pipeline applies after dedup/decontamination",
    survey="LLM curation: model-based quality filtering — filter (round-9)",
)
def quality_classifier_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog form of ``llm.quality.quality_classifier_filter`` at the
    decision boundary; projects (doc_id, source, n_tokens) — the text
    column stays out of the compare."""
    from .llm.quality import quality_classifier_filter, score_with_weights

    docs, weights = _seed_weights(spark, sf_dir)
    kept = quality_classifier_filter(docs, weights, threshold=0.0)
    toks = score_with_weights(docs, weights).select("doc_id", "n_tokens")
    return kept.join(toks, "doc_id").select("doc_id", "source", "n_tokens")


# Seeded D4 prototype-prune oracle: unit-normalize points and seed
# centroids, assign by max unit-dot (ties to lowest cent_id), rank
# within cluster by (round(cos,4) DESC, vec_id ASC), drop the first
# ceil(frac*n). The normalize-THEN-dot order mirrors kmeans_assign
# exactly (dot of unit vectors, not dot/norms) so the doubles match
# bit-for-bit.
from .queries_llm import _EMB_NORM_CTE  # noqa: E402  (a string constant)

_D4_CTE = (
    _EMB_NORM_CTE
    + """
    , cents AS (SELECT vec_id AS cent_id,
                       list_transform(v, x -> x / nrm) AS cu
                FROM normed WHERE vec_id < 8 AND nrm > 0),
    pts AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS vu
            FROM normed WHERE nrm > 0),
    assigned AS (
      SELECT vec_id, cent_id, d FROM (
        SELECT p.vec_id, c.cent_id, list_dot_product(p.vu, c.cu) AS d,
               row_number() OVER (
                 PARTITION BY p.vec_id
                 ORDER BY list_dot_product(p.vu, c.cu) DESC, c.cent_id) AS rn
        FROM pts p CROSS JOIN cents c) t
      WHERE rn = 1),
    ranked AS (
      SELECT vec_id, cent_id,
             row_number() OVER (PARTITION BY cent_id
                                ORDER BY round(d, 4) DESC, vec_id) AS rn,
             count(*) OVER (PARTITION BY cent_id) AS n
      FROM assigned)
"""
)


def _unit_seed_centroids(emb):
    """The 8 lowest-id vectors, unit-normalized — kmeans_assign scores
    by plain dot against unit centroids, so seeding must normalize the
    same way the oracle does (transform x -> x/nrm)."""
    from .llm.similarity import _with_norm

    return (
        _with_norm(emb.filter(F.col("vec_id") < 8))
        .filter(F.col("_norm") > 0)
        .select(
            F.col("vec_id").alias("cluster"),
            F.transform("_vec", lambda x: x / F.col("_norm")).alias("centroid"),
        )
    )


@query(
    "d4_prototype_prune",
    _D4_CTE
    + """
    SELECT e.vec_id, e.label
    FROM embeddings e JOIN ranked r USING (vec_id)
    WHERE r.rn > ceil(0.25 * r.n)
    """,
    doc="D4 diversification (Tirumala et al. 2023): after clustering, "
    "DROP the 25% of each cluster closest to its centroid — the most "
    "prototypical examples carry the least marginal information, so "
    "removing them diversifies the corpus (the paper's gain over dedup "
    "alone). Deterministic rank: (cosine rounded 4dp DESC, id ASC); "
    "seeded centroids for oracle parity, the library trains k-means",
    survey="LLM curation: D4 prototype pruning / diversification (round-9)",
)
def d4_prototype_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog form of ``llm.semdedup.prototype_prune`` (seeded,
    drop_fraction=0.25); projects (vec_id, label) — embedding arrays
    stay out of the compare."""
    from .llm.semdedup import prototype_prune

    emb = load(spark, sf_dir, "embeddings")
    return prototype_prune(
        emb, drop_fraction=0.25, centroids=_unit_seed_centroids(emb)
    ).select("vec_id", "label")


# Winnowing fingerprints (Schleimer et al. 2003 / MOSS): hash every
# 5-char k-gram of the normalized text, slide a 4-hash window, keep
# each window's minimum (rightmost on ties). Positions are 1-based;
# hashes are 16-hex md5 prefixes (engine-identical).
_WINNOW_CTE = r"""
    WITH normed AS (
      SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
      FROM documents),
    g AS (
      SELECT doc_id, p,
             substr(md5(substr(t, CAST(p AS INT), 12)), 1, 16) AS h
      FROM (SELECT doc_id, t, unnest(range(1, length(t) - 10)) AS p
            FROM normed WHERE length(t) >= 12)),
    sel AS (
      -- rightmost window minimum in ONE window aggregate: arg_min over
      -- the scalar key (h || zero-padded descending position) — h is
      -- fixed-width hex, so the concatenation orders by (h asc, p desc)
      SELECT doc_id,
             arg_min(p, h || lpad(CAST(100000000 - p AS VARCHAR), 9, '0'))
               OVER (PARTITION BY doc_id ORDER BY p
                     ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS sp,
             min(h) OVER (PARTITION BY doc_id ORDER BY p
                          ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS fp,
             row_number() OVER (PARTITION BY doc_id ORDER BY p) AS rn
      FROM g),
    fps AS (SELECT DISTINCT doc_id, sp, fp FROM sel WHERE rn >= 8)
"""


@query(
    "winnowing_fingerprints_docs",
    _WINNOW_CTE
    + """
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_fp,
           md5(string_agg(fp, ',' ORDER BY sp)) AS fp_digest
    FROM fps GROUP BY 1
    """,
    doc="winnowing document fingerprints (Schleimer et al. 2003 / MOSS "
    "— the rolling-hash fingerprint of the dedup literature): each "
    "8-window of 12-char k-gram hashes contributes its rightmost "
    "minimum; any shared substring of length >= k+w-1 = 19 chars is "
    "guaranteed a shared fingerprint. Per doc: selected-set size + "
    "position-ordered digest",
    survey="LLM text analysis: rolling-hash document fingerprinting (round-9)",
)
def winnowing_fingerprints_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog form of ``llm.fingerprint.winnow_fingerprints`` (k=12,
    w=8); the digest folds the position-ordered fingerprint list so the
    oracle checks the exact selected SET, not just its size."""
    from .llm.fingerprint import winnow_fingerprints

    docs = load(spark, sf_dir, "documents")
    fps = winnow_fingerprints(docs, k=12, w=8)
    return fps.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_fp"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("sp", "fp"))),
                    lambda x: x.getField("fp"),
                ),
            )
        ).alias("fp_digest"),
    )


@query(
    "winnowing_overlap_pairs",
    _WINNOW_CTE
    + """
    , allfp AS (SELECT DISTINCT doc_id, fp FROM fps),
    keepfp AS (SELECT fp FROM allfp GROUP BY fp HAVING count(*) <= 10),
    dfp AS (SELECT doc_id, fp FROM allfp JOIN keepfp USING (fp))
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM dfp a JOIN dfp b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING count(*) >= 3
    """,
    doc="winnowing overlap report: document pairs sharing >= 3 distinct "
    "rare fingerprint values (document frequency <= 10 — the hot-fp "
    "boilerplate guard, same rationale as the shingle cap) — the MOSS "
    "near-dup/plagiarism signal; the pair join runs on 16-hex "
    "fingerprints, never text",
    survey="LLM dedup: fingerprint-overlap near-dup report (round-9)",
)
def winnowing_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog form of ``llm.fingerprint.fingerprint_overlap_pairs``
    (k=12, w=8, min_shared=3, max_fp_df=10 — short grams on this
    synthetic corpus are corpus-wide-shared vocabulary, so the report
    keys on long rare fingerprints; an uncapped 5-gram run pairs half
    the corpus)."""
    from .llm.fingerprint import fingerprint_overlap_pairs

    docs = load(spark, sf_dir, "documents")
    return fingerprint_overlap_pairs(
        docs, k=12, w=8, min_shared=3, max_fp_df=10
    )

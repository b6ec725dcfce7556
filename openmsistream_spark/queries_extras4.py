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

"""Model-based quality filtering — a trainable linear classifier over
hashed n-gram features, the quality-filter stage of GPT-3/LLaMA-class
data pipelines (Brown et al. 2020 §2.2 train a logistic classifier on
high-quality vs raw text and keep documents the classifier favors;
fastText-style linear models are the standard choice).

DSIR (llm/dsir.py) and surprisal are importance PROXIES — fixed
functionals of unigram statistics. This module is the trained
DISCRIMINATOR: given a labeled split (high-quality seed vs raw crawl),
it fits logistic-regression weights over the same hashed n-gram feature
space DSIR uses (``dsir._doc_token_counts``) and scores documents with
one broadcast join.

Scale shape
-----------

TRAIN on a sample, SCORE the corpus — the published recipe. Training is
full-batch gradient descent expressed as DataFrame aggregations: each
step is two map-side-combinable shuffles over the sample's (doc,
feature, count) rows (margins per doc, then gradient per feature) plus
a feature-table broadcast; a quality classifier needs ~10^5-10^6
labeled docs, not the corpus, so the per-step cost is sample-sized.
Scoring is identical to DSIR scoring: the weight table is vocab-sized
(or ``hash_buckets``-bounded — the reason it broadcasts at any corpus
size), one broadcast join + one combinable per-doc aggregate, zero
corpus-side state.

Determinism / oracle anchor
---------------------------

All cross-row sums accumulate in DECIMAL (order-independent), so a fit
is bit-reproducible run-to-run at any partitioning. The float sigmoid
makes a CONVERGED fit engine-specific, so the SQL-oracle anchor is the
classifier's exact FIRST gradient step from w=0: there σ(0)=1/2
exactly and the gradient is pure counting — ``count_difference_weights``
computes it in exact integer arithmetic (DECIMAL(38,0); HUGEINT in the
DuckDB twin), and a property test pins that one float training step
ranks documents identically. The weight table is self-describing like
DSIR's ratio table: feature config travels as ``_ngram`` /
``_hash_buckets`` columns (read once via ``dsir.table_feature_config``),
so a consumer cannot tokenize differently from the trainer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dsir import _doc_token_counts, table_feature_config
from .iterutil import truncate_plan


def _dsum(col: F.Column, scale: int = 12) -> F.Column:
    """Order-independent sum of float terms: each term is quantized to
    ``scale`` dp by the decimal cast, then accumulated exactly — the
    repo's engine-parity / run-reproducibility discipline."""
    return F.sum(col.cast(f"decimal(38,{scale})")).cast("double")


def _cfg_cols(ngram: int, hash_buckets: int | None) -> list[F.Column]:
    return [
        F.lit(ngram).cast("int").alias("_ngram"),
        F.lit(hash_buckets).cast("int").alias("_hash_buckets"),
    ]


def count_difference_weights(
    pos: DataFrame,
    neg: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 1,
    hash_buckets: int | None = None,
    balanced: bool = True,
) -> DataFrame:
    """The classifier's exact first gradient step from w=0, as integer
    arithmetic: per feature,

        balanced:   w = n_neg * cnt_pos - n_pos * cnt_neg
        unbalanced: w =         cnt_pos -         cnt_neg

    (at w=0 the logistic residual is exactly y - 1/2, so the
    unbalanced form IS -2x the gradient; the balanced form reweights
    each class by the other's size — scale-free when the labeled split
    is lopsided, which a high-quality-seed-vs-crawl split always is).
    Positive scores mean "more like ``pos``". Equivalently the
    Rocchio / class-centroid-difference discriminant.

    Everything stays in DECIMAL(38,0) (HUGEINT in the DuckDB twin), so
    the weights — and any score summed from them — are engine-exact:
    this is the oracle-checkable anchor of the trained path. Returns
    (token, w DECIMAL(38,0), _ngram, _hash_buckets, _intercept) with a
    zero intercept (a constant shift never changes the ranking).

    Scale: two combinable count shuffles (one per side) + a one-row
    scalar broadcast; output is vocab-sized (``hash_buckets``-bounded
    when hashing), so it broadcasts at score time."""
    cp = (
        _doc_token_counts(pos, id_col, text_col, ngram, hash_buckets)
        .groupBy("token")
        .agg(F.sum("cnt").alias("cnt_pos"))
    )
    cn = (
        _doc_token_counts(neg, id_col, text_col, ngram, hash_buckets)
        .groupBy("token")
        .agg(F.sum("cnt").alias("cnt_neg"))
    )
    vocab = cp.join(cn, "token", "full_outer").select(
        "token",
        F.coalesce("cnt_pos", F.lit(0)).alias("cnt_pos"),
        F.coalesce("cnt_neg", F.lit(0)).alias("cnt_neg"),
    )
    if balanced:
        scalars = F.broadcast(
            pos.agg(F.count("*").alias("n_pos")).crossJoin(
                neg.agg(F.count("*").alias("n_neg"))
            )
        )
        w = F.expr(
            "CAST(n_neg AS DECIMAL(38,0)) * cnt_pos"
            " - CAST(n_pos AS DECIMAL(38,0)) * cnt_neg"
        )
        vocab = vocab.crossJoin(scalars)
    else:
        w = F.expr("CAST(cnt_pos AS DECIMAL(38,0)) - cnt_neg")
    return vocab.select(
        "token",
        w.cast("decimal(38,0)").alias("w"),
        *_cfg_cols(ngram, hash_buckets),
        F.lit(0.0).alias("_intercept"),
    )


def score_with_weights(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    config: tuple[int, int | None] | None = None,
) -> DataFrame:
    """(id_col, n_tokens, score): the linear margin of every document
    under a weight table (``count_difference_weights`` or
    ``train_quality_classifier`` output). Feature config is read FROM
    the self-describing table (hoist with
    ``dsir.table_feature_config`` + ``config=`` for repeat scorers, the
    same contract as DSIR scoring); tokens outside the table contribute
    0 (an untrained feature carries no evidence) but still count toward
    ``n_tokens``.

    One broadcast join + one combinable per-doc aggregate; exact-decimal
    weights sum exactly (engine-parity with a HUGEINT oracle), float
    weights accumulate via the decimal-sum discipline (deterministic at
    any partitioning). Documents with no features produce no row."""
    ngram, hash_buckets = (
        table_feature_config(weights) if config is None else config
    )
    per_doc = _doc_token_counts(
        docs, id_col, text_col, ngram=ngram, hash_buckets=hash_buckets
    )
    b0 = weights.agg(F.first("_intercept").alias("_b0"))
    w_type = dict(weights.dtypes)["w"]
    joined = (
        per_doc.join(F.broadcast(weights.select("token", "w")), "token", "left")
        .crossJoin(F.broadcast(b0))
        .withColumn("_wv", F.coalesce(F.col("w"), F.lit(0).cast(w_type)))
    )
    exact = w_type.startswith("decimal")
    if exact:
        score = (
            F.sum(F.col("cnt").cast("decimal(38,0)") * F.col("_wv"))
            .cast("double")
            + F.first("_b0")
        ).alias("score")
    else:
        score = (_dsum(F.col("cnt") * F.col("_wv")) + F.first("_b0")).alias(
            "score"
        )
    return joined.groupBy(id_col).agg(
        F.sum("cnt").cast("bigint").alias("n_tokens"), score
    )


def train_quality_classifier(
    pos: DataFrame,
    neg: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 1,
    hash_buckets: int | None = None,
    steps: int = 20,
    lr: float = 1.0,
    l2: float = 0.0,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Fit logistic-regression weights (full-batch gradient descent,
    mean gradient, learning rate ``lr``, optional ``l2`` ridge) for
    P(doc is ``pos``-like). Returns the self-describing weight table
    (token, w DOUBLE, _ngram, _hash_buckets, _intercept) for
    ``score_with_weights`` — score is the pre-sigmoid margin, so
    threshold 0 is the decision boundary.

    Per step: ONE pass over the (materialized-once) sample feature rows
    — a broadcast of the vocab-sized weight table onto them, a
    combinable per-doc margin aggregate, an equi-join of the per-doc
    residuals back onto the feature rows, and a combinable per-feature
    gradient aggregate. Weight frames are plan-truncated per step
    (``truncate_plan`` — the iterative-algorithm idiom; pass
    ``checkpoint_dir=`` for reliable checkpoints on long fits). All
    cross-row sums use the decimal-accumulation discipline, so the fit
    is bit-reproducible at any partitioning. Train on a labeled SAMPLE
    and score the corpus — the GPT-3 recipe; nothing here scales with
    the unlabeled corpus."""
    labeled = pos.select(
        F.concat(F.lit("p"), F.col(id_col).cast("string")).alias("_qid"),
        F.col(text_col),
        F.lit(1.0).alias("_y"),
    ).unionByName(
        neg.select(
            F.concat(F.lit("n"), F.col(id_col).cast("string")).alias("_qid"),
            F.col(text_col),
            F.lit(0.0).alias("_y"),
        )
    )
    feats = truncate_plan(
        _doc_token_counts(labeled, "_qid", text_col, ngram, hash_buckets),
        checkpoint_dir,
    )
    ys = truncate_plan(labeled.select("_qid", "_y"), checkpoint_dir)
    n_docs = ys.count()
    if n_docs == 0:
        raise ValueError("train_quality_classifier: no labeled documents")
    weights = truncate_plan(
        feats.select("token").distinct().select(
            "token", F.lit(0.0).alias("w")
        ),
        checkpoint_dir,
    )
    b0 = 0.0
    for _ in range(steps):
        margins = (
            feats.join(F.broadcast(weights), "token")
            .groupBy("_qid")
            .agg(_dsum(F.col("cnt") * F.col("w")).alias("_m"))
        )
        # residuals feed BOTH the per-feature gradient join and the
        # intercept sum — materialize once (sample-sized leaf) so each
        # step pays one margins pass, not two
        resid = truncate_plan(
            ys.join(margins, "_qid", "left").select(
                "_qid",
                (
                    F.lit(1.0)
                    / (F.lit(1.0) + F.exp(-(F.coalesce("_m", F.lit(0.0)) + b0)))
                    - F.col("_y")
                ).alias("_r"),
            ),
            checkpoint_dir,
        )
        grads = (
            feats.join(resid, "_qid")
            .groupBy("token")
            .agg(_dsum(F.col("cnt") * F.col("_r")).alias("_g"))
        )
        stepped = weights.join(grads, "token", "left").select(
            "token",
            (
                F.col("w")
                - lr * (F.coalesce("_g", F.lit(0.0)) / n_docs + l2 * F.col("w"))
            ).alias("w"),
        )
        weights = truncate_plan(stepped, checkpoint_dir)
        gb = resid.agg(_dsum(F.col("_r")).alias("g")).first()["g"] or 0.0
        b0 = b0 - lr * gb / n_docs
    return weights.select(
        "token",
        "w",
        *_cfg_cols(ngram, hash_buckets),
        F.lit(float(b0)).alias("_intercept"),
    )


def quality_classifier_filter(
    docs: DataFrame,
    weights: DataFrame,
    threshold: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The filter form: keep ``docs`` rows whose classifier margin is
    >= ``threshold`` (0 = the decision boundary; for
    ``count_difference_weights`` 0 means "more target-mass than
    raw-mass"). Documents with no features score nothing and are
    DROPPED — a featureless document carries no quality evidence.
    Returns the surviving rows of ``docs`` unchanged (semi-join on the
    admitted id set — the corpus side never shuffles when the admitted
    set broadcasts)."""
    admitted = (
        score_with_weights(docs, weights, id_col=id_col, text_col=text_col)
        .filter(F.col("score") >= threshold)
        .select(id_col)
    )
    return docs.join(admitted, id_col, "left_semi")

"""DSIR-style importance scoring for data selection (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling").

The published pipeline estimates, for every raw-corpus document, how
much more likely its features are under a TARGET (in-domain) unigram
distribution than under the RAW distribution, then resamples the corpus
by that importance weight — the standard way to tilt a 100 TB crawl
toward a high-quality seed set without training a classifier.

Scale shape (one combinable token-count shuffle, then broadcasts only):

- per-doc token counts: explode → one map-side-combinable groupBy (the
  single corpus-sized shuffle in the pipeline; ``dsir_importance``
  computes it ONCE and derives both the raw totals and the scoring
  input from it);
- the unigram tables (raw and target) are VOCAB-sized: token totals via
  a second combinable groupBy, full-outer-joined per token;
- the three scalars (raw token mass, target token mass, vocab size) ride
  a one-row broadcast;
- per-token ratio table (vocab-sized — or ``hash_buckets``-bounded with
  hashed n-gram features) broadcasts onto the per-doc counts; the final
  score is one more combinable per-doc aggregate.

Two scoring modes:

- ``mode="log"`` — the paper's estimator: Σ_w cnt_d(w) ·
  ln p̂_target(w)/p̂_raw(w) (Laplace-smoothed). Float ln is libm-
  dependent, so this mode is for library use / pytest, not the oracle.
- ``mode="ratio"`` — an engine-exact surrogate: the per-token
  likelihood RATIO, half-up-rounded to 6 dp in widened-integer
  arithmetic ((2·num·10⁶+den) div (2·den), DECIMAL(38,0)/HUGEINT — the
  ratio is an exact rational of counts), summed per doc weighted by
  count. Order statistics under the two modes agree except where the
  6-dp quantization collides; the point of this mode is a bit-exact
  DuckDB oracle for the whole pipeline.

The frozen table is SELF-DESCRIBING: it carries its feature config
(``_ngram``, ``_hash_buckets``) and the smoothed out-of-vocabulary
ratio (``_oov``) as constant columns, so a consumer — notably the
streaming twin scoring drifting vocabulary months after the freeze —
cannot tokenize differently from the freezer, and unseen tokens score
at their Laplace floor instead of silently vanishing from the join.

Resampling: rank/top-k on the score is deterministic (the catalog
query's form); for sampling ∝ weight, feed ``exp(score)`` of the log
mode to ``llm.sampling.weighted_sample_wor``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _doc_token_counts(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 1,
    hash_buckets: int | None = None,
) -> DataFrame:
    """(id, token, cnt). ``ngram=2`` switches to word bigrams and
    ``hash_buckets`` maps each feature to ``xxhash64 % buckets`` — the
    paper's hashed n-gram features, which bound the ratio-table size to
    the bucket count regardless of corpus vocabulary (the reason DSIR
    scales: the table stays broadcastable at any corpus size)."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    if ngram == 1:
        feat = docs.select(F.col(id_col), F.explode(toks).alias("token"))
    else:
        grams = F.expr(
            f"CASE WHEN size(_t) >= {ngram} THEN "
            f"transform(sequence(1, size(_t)-{ngram - 1}), "
            f"i -> concat_ws(' ', slice(_t, i, {ngram}))) "
            "ELSE array() END"
        )
        feat = docs.withColumn("_t", toks).select(
            F.col(id_col), F.explode(grams).alias("token")
        )
    if hash_buckets is not None:
        feat = feat.select(
            id_col,
            F.pmod(F.xxhash64("token"), F.lit(hash_buckets))
            .cast("string")
            .alias("token"),
        )
    return feat.groupBy(id_col, "token").agg(F.count("*").alias("cnt"))


def _ratio_from_counts(
    raw_tok: DataFrame,
    tgt_tok: DataFrame,
    mode: str,
    ngram: int,
    hash_buckets: int | None,
) -> DataFrame:
    """(token, r|r_micro, _ngram, _hash_buckets, _oov) from per-token
    totals — the self-describing frozen artifact (see module doc)."""
    if mode not in ("ratio", "log"):
        raise ValueError(f"mode must be 'ratio' or 'log', got {mode!r}")
    vocab = raw_tok.join(tgt_tok, "token", "full_outer").select(
        "token",
        F.coalesce("cnt_r", F.lit(0)).alias("cnt_r"),
        F.coalesce("cnt_t", F.lit(0)).alias("cnt_t"),
    )
    scalars = vocab.agg(
        F.sum("cnt_r").alias("n_raw"),
        F.sum("cnt_t").alias("n_tgt"),
        F.count("*").alias("v"),
    )
    scored_tok = vocab.crossJoin(F.broadcast(scalars))
    cfg = [
        F.lit(ngram).cast("int").alias("_ngram"),
        F.lit(hash_buckets).cast("int").alias("_hash_buckets"),
    ]
    if mode == "log":
        ratio = F.expr(
            "ln(CAST((cnt_t + 1) * (n_raw + v) AS DOUBLE) / ((n_tgt + v) * (cnt_r + 1)))"
        ).alias("r")
        # the Laplace floor for a token seen by NEITHER side at freeze
        # time (cnt_t = cnt_r = 0) — a per-table constant
        oov = F.expr(
            "ln(CAST(n_raw + v AS DOUBLE) / (n_tgt + v))"
        ).alias("_oov")
    else:
        # half-up round of the exact rational num/den at 6 dp, in
        # widened integers (counts can push num past bigint at 100 TB).
        # Spark's `div` (IntegralDivide) returns BIGINT even on decimal
        # operands, so the quotient is cast straight back to
        # DECIMAL(38,0) — without it, r_micro (~1e6 · n_raw with a
        # disjoint target) re-narrows to 64-bit and can overflow past
        # n_raw ≈ 9e12 tokens while the DuckDB twin's HUGEINT `//` does
        # not (round-8 advisory): the cast keeps the widened-integer
        # invariant end to end on BOTH engines.
        ratio = F.expr(
            "CAST((2 * CAST((cnt_t + 1) AS DECIMAL(38,0)) * (n_raw + v) * 1000000"
            " + (CAST(n_tgt AS DECIMAL(38,0)) + v) * (cnt_r + 1))"
            " div (2 * (CAST(n_tgt AS DECIMAL(38,0)) + v) * (cnt_r + 1))"
            " AS DECIMAL(38,0))"
        ).alias("r_micro")
        oov = F.expr(
            "CAST((2 * CAST(n_raw + v AS DECIMAL(38,0)) * 1000000"
            " + (CAST(n_tgt AS DECIMAL(38,0)) + v))"
            " div (2 * (CAST(n_tgt AS DECIMAL(38,0)) + v))"
            " AS DECIMAL(38,0))"
        ).alias("_oov")
    return scored_tok.select("token", ratio, *cfg, oov)


def unigram_ratio_table(
    raw_docs: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    mode: str = "ratio",
    ngram: int = 1,
    hash_buckets: int | None = None,
) -> DataFrame:
    """The per-token importance table — the frozen artifact a selection
    run (or its streaming twin) scores documents against. Vocab-sized
    (or ``hash_buckets``-bounded), so it broadcasts; build it ONCE from
    the raw-corpus sample + target seed, MATERIALIZE it (localCheckpoint
    or parquet), then reuse. Self-describing: feature config and the
    OOV floor travel with the table."""
    raw_tok = (
        _doc_token_counts(
            raw_docs.select(F.lit(0).alias("_rid"), text_col), "_rid", text_col,
            ngram=ngram, hash_buckets=hash_buckets,
        )
        .groupBy("token")
        .agg(F.sum("cnt").alias("cnt_r"))
    )
    tgt_tok = (
        _doc_token_counts(
            target.select(F.lit(0).alias("_tid"), text_col), "_tid", text_col,
            ngram=ngram, hash_buckets=hash_buckets,
        )
        .groupBy("token")
        .agg(F.sum("cnt").alias("cnt_t"))
    )
    return _ratio_from_counts(raw_tok, tgt_tok, mode, ngram, hash_buckets)


def _score_counts(per_doc: DataFrame, table: DataFrame, id_col: str) -> DataFrame:
    """Score prebuilt (id, token, cnt) rows against a ratio table: LEFT
    join (an out-of-vocabulary token scores at the table's Laplace
    floor instead of vanishing — and ``n_tokens`` counts every feature,
    matched or not), then one combinable per-doc aggregate."""
    mode = "log" if "r" in table.columns else "ratio"
    rcol = "r" if mode == "log" else "r_micro"
    oov = table.agg(F.first("_oov").alias("_oov_const"))
    joined = (
        per_doc.join(F.broadcast(table.select("token", rcol)), "token", "left")
        .crossJoin(F.broadcast(oov))
        .withColumn("_rv", F.coalesce(F.col(rcol), F.col("_oov_const")))
    )
    if mode == "log":
        return joined.groupBy(id_col).agg(
            F.sum("cnt").cast("bigint").alias("n_tokens"),
            F.sum(F.col("cnt") * F.col("_rv")).alias("score"),
        )
    # Σ cnt·r_micro is integer; round(…/1e6, 4) = half-up((Σ)/100)/1e4,
    # done in integer arithmetic so both engines agree bit-for-bit
    return (
        joined.groupBy(id_col)
        .agg(
            F.sum("cnt").cast("bigint").alias("n_tokens"),
            F.sum(F.col("cnt").cast("decimal(38,0)") * F.col("_rv")).alias("_sm"),
        )
        .select(
            id_col,
            "n_tokens",
            (F.expr("CAST((2 * _sm + 100) div 200 AS DOUBLE)") / 1e4).alias(
                "score"
            ),
        )
    )


def table_feature_config(table: DataFrame) -> tuple[int, int | None]:
    """Read a ratio table's frozen feature config — (ngram,
    hash_buckets) — off its self-describing columns. One driver action
    against the table's plan: a caller that scores REPEATEDLY against
    one table (the streaming sink, a selection loop) should call this
    ONCE and pass the result to ``score_with_table(config=...)``, so no
    per-batch driver action can ever re-execute an unmaterialized table
    build."""
    cfg = table.select("_ngram", "_hash_buckets").first()
    return (
        int(cfg["_ngram"]),
        None if cfg["_hash_buckets"] is None else int(cfg["_hash_buckets"]),
    )


def score_with_table(
    docs: DataFrame,
    table: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    config: tuple[int, int | None] | None = None,
) -> DataFrame:
    """Score documents against a prebuilt ratio table. The feature
    config (n-gram size, hash buckets) is read FROM the table — the
    round-8 review found that re-specifying it per call site let a
    stream tokenize unigrams against a bigram table and silently match
    nothing. One cheap driver read of the config row (freeze/materialize
    the table, as its contract says), then one broadcast join + one
    combinable per-doc aggregate; usable identically on a batch frame or
    inside a streaming micro-batch. Documents with no features at all
    (shorter than the n-gram size) produce no output row.

    ``config=`` takes a ``table_feature_config(table)`` result so
    repeat scorers pay the driver read once — it exists for call-site
    hoisting, not for overriding the table's frozen config (passing
    anything else re-opens the mismatched-tokenization hole the
    self-describing columns closed)."""
    ngram, hash_buckets = (
        table_feature_config(table) if config is None else config
    )
    per_doc = _doc_token_counts(
        docs, id_col, text_col, ngram=ngram, hash_buckets=hash_buckets
    )
    return _score_counts(per_doc, table, id_col)


def dsir_importance(
    docs: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "ratio",
    ngram: int = 1,
    hash_buckets: int | None = None,
) -> DataFrame:
    """(id_col, n_tokens, score): importance of each ``docs`` row under
    the ``target`` unigram distribution relative to the raw one.

    ``target`` is any frame with ``text_col`` (an in-domain seed set —
    typically a few thousand documents next to a huge raw corpus).
    Laplace smoothing over the UNION vocabulary keeps every ratio
    finite, including for raw tokens the target never saw. Semantically
    ``score_with_table(docs, unigram_ratio_table(docs, target))``, but
    the corpus token-count pass is computed ONCE (localCheckpoint) and
    feeds both the table build and the scoring — the single-shuffle
    shape the module header promises. Freeze the table separately when
    it will be reused (the streaming twin requires this)."""
    per_doc = _doc_token_counts(
        docs, id_col, text_col, ngram=ngram, hash_buckets=hash_buckets
    ).localCheckpoint(eager=False)
    raw_tok = per_doc.groupBy("token").agg(F.sum("cnt").alias("cnt_r"))
    tgt_tok = (
        _doc_token_counts(
            target.select(F.lit(0).alias("_tid"), text_col), "_tid", text_col,
            ngram=ngram, hash_buckets=hash_buckets,
        )
        .groupBy("token")
        .agg(F.sum("cnt").alias("cnt_t"))
    )
    table = _ratio_from_counts(raw_tok, tgt_tok, mode, ngram, hash_buckets)
    return _score_counts(per_doc, table, id_col)

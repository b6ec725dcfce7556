"""Text analysis operators: token stats, quality scoring, language-ID
heuristic, document fingerprinting.

All pure column expressions (whole-stage codegen; no Python). Each has
an exact SQL twin for the DuckDB oracle — note DuckDB's regexp_replace
needs the 'g' flag to match Spark's replace-all semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def _tokens(text_col: str = "text") -> F.Column:
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def text_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    passthrough_cols: "tuple[str, ...] | list[str]" = (),
) -> DataFrame:
    """Per-document stats: char/token counts, distinct-token ratio, mean
    token length, non-alphanumeric density — the standard quality-filter
    features of a pretraining pipeline. ``passthrough_cols`` are carried
    through unchanged (pure projection, stateless/streaming-safe)."""
    toks = _tokens(text_col)
    return docs.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough_cols],
        F.length(text_col).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(
            F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
            / F.size(toks),
            4,
        ).alias("mean_token_len"),
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 4).alias("distinct_ratio"),
        F.length(F.regexp_replace(F.lower(text_col), r"[a-z0-9\s]", "")).alias("n_punct"),
    )


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-ratio language heuristic: the fraction of tokens that are
    common English function words. (Real pipelines swap in per-language
    stopword tables or an n-gram model; the plan shape is identical.)"""
    toks = _tokens(text_col)
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    ratio = F.round(n_stop / F.size(toks), 4)
    return docs.select(
        F.col(id_col),
        ratio.alias("stopword_ratio"),
        F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("other")).alias("predicted_lang"),
    )


def quality_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    min_mean_token_len: float = 3.0,
    max_mean_token_len: float = 12.0,
    min_distinct_ratio: float = 0.3,
    max_punct_ratio: float = 0.2,
    passthrough_cols: "tuple[str, ...] | list[str]" = (),
) -> DataFrame:
    """The keep/drop decision a pretraining pipeline runs over every
    document (Gopher/C4-style heuristic rules composed from text_stats):
    too-short, degenerate token lengths, low lexical diversity, and
    punctuation-heavy documents are dropped. Emits the per-rule verdicts
    so filter rates are auditable per rule.

    ``passthrough_cols`` — extra input columns carried into the output
    unchanged (e.g. the text itself for a downstream redaction stage);
    pure projection, so the whole operator stays stateless and
    streaming-safe."""
    stats = text_stats(
        docs, id_col=id_col, text_col=text_col, passthrough_cols=passthrough_cols
    )
    rules = {
        "ok_len": F.col("n_tokens") >= min_tokens,
        "ok_token_len": F.col("mean_token_len").between(
            min_mean_token_len, max_mean_token_len
        ),
        "ok_diversity": F.col("distinct_ratio") >= min_distinct_ratio,
        "ok_punct": (F.col("n_punct") / F.col("n_chars")) <= max_punct_ratio,
    }
    out = stats.select(
        id_col,
        *passthrough_cols,
        "n_tokens",
        *[expr.alias(name) for name, expr in rules.items()],
    )
    keep = None
    for name in rules:
        keep = F.col(name) if keep is None else keep & F.col(name)
    return out.withColumn("keep", keep)


# (name, regex, replacement) — minimal portable patterns: no lookaround
# or backreferences, so Java regex (Spark) and RE2 (DuckDB oracle) agree
# on every match; real deployments extend this table.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+\d{1,2}-\d{3}-\d{4}", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def pii_redact(
    docs: DataFrame,
    text_col: str = "text",
    out_col: str = "redacted",
    patterns: list[tuple[str, str, str]] = PII_PATTERNS,
) -> DataFrame:
    """PII scrubbing: replace each pattern with its placeholder token and
    count the hits per document (``n_<name>`` columns, BIGINT).

    Patterns apply in table order, each matching the text as already
    redacted by earlier patterns — so the email rule consumes
    ``user@host.com`` before the IPv4 rule can see digit runs inside it,
    and counts never double-book one span. Pure column expressions
    (regexp_count + regexp_replace chain, whole-stage codegen); the
    projection chain collapses to a single pass over the column.
    """
    cur = F.col(text_col)
    out = docs
    for name, rx, token in patterns:
        out = out.withColumn(f"n_{name}", F.regexp_count(cur, F.lit(rx)).cast("bigint"))
        cur = F.regexp_replace(cur, rx, token)
    return out.withColumn(out_col, cur)


def repetition_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals, per document:

    - ``top_token_frac``: share of tokens taken by the single most
      frequent token;
    - ``dup_token_mass``: share of tokens whose token occurs more than
      once (1 - distinct mass);
    - ``top_bigram_frac``: share of bigrams taken by the most frequent
      bigram.

    Boilerplate, keyword-stuffed, and template pages score high on these
    and get dropped by pretraining quality filters. Unlike the per-row
    array approach, each signal is explode → count → per-doc aggregate —
    two map-side-combinable shuffles each, safe for documents of any
    length (a 10M-token document never materializes an O(distinct×len)
    per-row comparison).
    """
    base = docs.select(id_col, _tokens(text_col).alias("_ws"))
    uni = (
        base.select(id_col, F.explode("_ws").alias("token"))
        .filter(F.col("token") != "")
        .groupBy(id_col, "token")
        .agg(F.count("*").alias("cnt"))
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_tok"),
            F.max("cnt").alias("top_cnt"),
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias("dup_mass"),
        )
    )
    # guard: Spark's sequence(1, 0) counts DOWN — emit [] for <2 tokens
    bigrams = F.when(
        F.size("_ws") >= 2,
        F.expr("transform(sequence(1, size(_ws)-1), i -> concat(_ws[i-1], ' ', _ws[i]))"),
    ).otherwise(F.array().cast("array<string>"))
    bi = (
        base.select(id_col, F.explode(bigrams).alias("bg"))
        .groupBy(id_col, "bg")
        .agg(F.count("*").alias("cnt"))
        .groupBy(id_col)
        .agg(F.max("cnt").alias("top_bg"), F.sum("cnt").alias("n_bg"))
    )
    return (
        uni.join(bi, id_col, "left")
        .select(
            id_col,
            F.col("n_tok").cast("bigint").alias("n_tokens"),
            F.round(F.col("top_cnt") / F.col("n_tok"), 4).alias("top_token_frac"),
            F.round(F.col("dup_mass") / F.col("n_tok"), 4).alias("dup_token_mass"),
            F.round(
                F.coalesce(F.col("top_bg") / F.col("n_bg"), F.lit(0.0)), 4
            ).alias("top_bigram_frac"),
        )
    )


def doc_fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", kgram: int = 8
) -> DataFrame:
    """Content fingerprints: md5 of the normalized text plus a
    winnowing-style k-gram fingerprint (min over character k-gram
    hashes) that survives local edits."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    grams = F.expr(
        f"CASE WHEN length(_norm) >= {kgram} THEN "
        f"transform(sequence(1, length(_norm)-{kgram - 1}), i -> md5(substring(_norm, CAST(i AS INT), {kgram}))) "
        f"ELSE array(md5(_norm)) END"
    )
    return (
        docs.withColumn("_norm", norm)
        .select(
            F.col(id_col),
            F.md5(F.col("_norm")).alias("content_fp"),
            F.array_min(grams).alias("kgram_fp"),
        )
    )

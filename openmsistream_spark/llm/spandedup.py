"""Exact-substring (span-level) deduplication.

The missing member of the dedup family next to exact (hash), MinHash/
SimHash (whole-document near-dup) and containment (doc-level excerpt
detection): find the duplicated SPANS themselves — (doc_id, start, end)
ranges whose token content occurs elsewhere in the corpus — so a
curation pass can excise repeated boilerplate/licenses/templates from
otherwise-unique documents instead of dropping whole docs. This is the
Spark-shaped form of suffix-array duplicate-span removal (Lee et al.
2021, "Deduplicating Training Data Makes Language Models Better"): a
suffix array needs a global sort of every suffix, which does not
distribute; fixed-length k-gram fingerprints find exactly the spans a
suffix array would flag at granularity k (every duplicated run of
length >= k is a union of duplicated k-grams, and the span-merge step
reassembles the maximal run), at the cost of missing duplicates shorter
than k — the same k-threshold the reference implementations use
(k=50 tokens in the paper).

Reference parity: the reference's chunk-level content addressing
(data_file_chunk.py:26-36) dedups fixed-size BYTE ranges by hash; this
is the token-level generalization with overlap-aware span merging.

Scale shape: one tokenize pass, one posexplode to (position, k-gram)
rows, one map-side-combinable count by fingerprint, one equi-join of
positions against the duplicated-fingerprint set (bounded by actual
duplication, never all-pairs), and a per-document window for the
interval merge (per-doc data, partition-local after one shuffle by
doc). With ``fingerprint="hash"`` the shuffled key is an 8-byte
xxhash64, not the k-token text — the 100 TB default; ``"text"`` keeps
the raw gram (exact, SQL-oracle-portable, collision-free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SPAN_K = 8


def kgram_positions(
    docs: DataFrame,
    k: int = DEFAULT_SPAN_K,
    id_col: str = "doc_id",
    text_col: str = "text",
    fingerprint: str = "hash",
) -> DataFrame:
    """Every token position's k-gram: (id, pos, gram) with ``pos`` the
    0-based index of the k-gram's first token.

    Documents shorter than k tokens emit nothing (they have no k-gram;
    the filter also guards Spark's ``sequence``, which would descend for
    a negative stop). ``fingerprint="hash"`` replaces the gram text with
    ``xxhash64`` so downstream shuffles move 8 bytes per row.
    """
    toks = docs.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
            lambda t: t != "",
        ).alias("_t"),
    ).filter(F.size("_t") >= k)
    grams = toks.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("_t") - k),
                lambda i: F.array_join(F.slice("_t", i + 1, k), " "),
            )
        ).alias("pos", "gram"),
    )
    if fingerprint == "hash":
        grams = grams.withColumn("gram", F.xxhash64("gram"))
    elif fingerprint != "text":
        raise ValueError(f"fingerprint must be 'hash' or 'text', got {fingerprint!r}")
    return grams


def duplicated_spans(
    docs: DataFrame,
    k: int = DEFAULT_SPAN_K,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_occurrences: int = 2,
    fingerprint: str = "hash",
) -> DataFrame:
    """Maximal duplicated token spans per document.

    A position is duplicated when its k-gram occurs ``min_occurrences``
    or more times corpus-wide (across documents or within one — a
    within-doc repeat is just as much training-data duplication);
    overlapping and adjacent duplicated k-grams merge into one maximal
    span, so a duplicated run of m >= k tokens comes back as ONE row
    (start, start+m), exactly the suffix-array answer at granularity k.

    Returns (id_col, span_start, span_end, span_tokens) — token
    offsets, end-exclusive.

    The interval merge is the classic running-max window: a span starts
    a new group when its start lies past everything seen so far. The
    window partitions by document, so state is per-doc and the merge is
    partition-local after one shuffle — no global sort.
    """
    grams = kgram_positions(
        docs, k=k, id_col=id_col, text_col=text_col, fingerprint=fingerprint
    )
    dup = (
        grams.groupBy("gram")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= min_occurrences)
        .select("gram")
    )
    spans = grams.join(dup, "gram").select(
        id_col,
        F.col("pos").alias("s"),
        (F.col("pos") + k).alias("e"),
    )
    w = Window.partitionBy(id_col).orderBy("s")
    prev_max_e = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = F.when(
        F.col("s") > F.coalesce(prev_max_e, F.lit(-1)), 1
    ).otherwise(0)
    return (
        spans.withColumn("_brk", brk)
        .withColumn("_grp", F.sum("_brk").over(w))
        .groupBy(id_col, "_grp")
        .agg(
            F.min("s").alias("span_start"),
            F.max("e").alias("span_end"),
            (F.max("e") - F.min("s")).alias("span_tokens"),
        )
        .drop("_grp")
    )


def duplicated_span_ratio(
    docs: DataFrame,
    k: int = DEFAULT_SPAN_K,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_occurrences: int = 2,
    fingerprint: str = "hash",
) -> DataFrame:
    """Per-document duplication load: the fraction of tokens covered by
    duplicated spans — the curation signal that decides which documents
    are mostly boilerplate (drop or excise) versus lightly contaminated
    (keep). Documents with no duplicated span report 0.

    The ratio is an exact rational (covered/total), half-up-rounded at
    4 dp in integer arithmetic ((2*num*10^4+den) div (2*den)) so any
    SQL oracle reproduces it bit-for-bit. Returns
    (id_col, n_tokens, dup_tokens, dup_ratio) for docs with >= 1 token.
    """
    spans = duplicated_spans(
        docs,
        k=k,
        id_col=id_col,
        text_col=text_col,
        min_occurrences=min_occurrences,
        fingerprint=fingerprint,
    )
    per_doc = spans.groupBy(id_col).agg(
        F.sum("span_tokens").alias("dup_tokens")
    )
    totals = docs.select(
        F.col(id_col),
        F.size(
            F.filter(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                lambda t: t != "",
            )
        ).cast("bigint").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    return totals.join(per_doc, id_col, "left").select(
        id_col,
        "n_tokens",
        F.coalesce("dup_tokens", F.lit(0)).cast("bigint").alias("dup_tokens"),
        (
            F.expr(
                "(2 * coalesce(dup_tokens, 0) * 10000 + n_tokens)"
                " div (2 * n_tokens)"
            ).cast("double")
            / 1e4
        ).alias("dup_ratio"),
    )

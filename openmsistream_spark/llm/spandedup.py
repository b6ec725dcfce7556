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
    return _merge_intervals(spans, id_col)


def _merge_intervals(spans: DataFrame, id_col: str) -> DataFrame:
    """Merge overlapping/adjacent (s, e) intervals per document into
    maximal spans — the classic running-max window: an interval starts a
    new group when its start lies past everything seen so far. Input
    columns: (id_col, s, e); output (id_col, span_start, span_end,
    span_tokens)."""
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


def excise_duplicated_spans(
    docs: DataFrame,
    k: int = DEFAULT_SPAN_K,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_occurrences: int = 2,
    fingerprint: str = "hash",
    max_passes: int = 1,
) -> DataFrame:
    """Keep-first exact-substring dedup: rewrite every document with its
    duplicated spans REMOVED, keeping only the corpus-order-first
    occurrence of each duplicated k-gram — the excision step of Lee et
    al. 2021 (their suffix-array pipeline removes all but one copy of
    each duplicated substring; here "one copy" = the occurrence with the
    lexicographically smallest (doc_id, position)).

    Mechanics: one aggregate per k-gram yields (count, first occurrence)
    — map-side-combinable, no per-gram windows, so a boilerplate gram
    occurring a million times never concentrates on one task. Every
    non-first occurrence of a duplicated gram marks its k positions;
    marks merge to maximal spans per doc; the rewrite drops the spanned
    tokens with one array filter (no explode — the doc row never
    leaves its partition).

    Tokens are the unit (whitespace-split, lowercased, like every
    text operator here), so the rewrite canonicalizes whitespace/case.
    Docs shorter than k tokens pass through untouched. Removing a span
    can abut tokens that now form NEW k-grams across the cut — the
    standard artifact of excision-based dedup. ``max_passes`` (default 1
    — the catalog/oracle contract) re-runs excision on the rewritten
    corpus until a pass removes nothing or the cap is reached, each pass
    one full distributed job over a localCheckpoint-truncated frame (the
    iterative-algorithm idiom); ``n_tokens`` stays the ORIGINAL count
    and ``n_tokens_removed`` accumulates across passes, so the output
    contract is identical at any pass count.

    Returns (id_col, text, n_tokens, n_tokens_removed).
    """
    out = _excise_pass(
        docs,
        k=k,
        id_col=id_col,
        text_col=text_col,
        min_occurrences=min_occurrences,
        fingerprint=fingerprint,
    )
    if max_passes <= 1:
        return out
    from .iterutil import truncate_plan

    cur = truncate_plan(out)
    for _ in range(max_passes - 1):
        nxt = truncate_plan(
            _excise_pass(
                cur.select(id_col, text_col),
                k=k,
                id_col=id_col,
                text_col=text_col,
                min_occurrences=min_occurrences,
                fingerprint=fingerprint,
            )
        )
        removed = nxt.agg(F.sum("n_tokens_removed")).first()[0] or 0
        if removed == 0:
            break  # fixpoint: nothing cut, text unchanged
        cur = cur.select(
            id_col, "n_tokens", F.col("n_tokens_removed").alias("_prev")
        ).join(
            nxt.select(
                id_col, text_col, F.col("n_tokens_removed").alias("_now")
            ),
            id_col,
        ).select(
            id_col,
            text_col,
            "n_tokens",
            (F.col("_prev") + F.col("_now")).alias("n_tokens_removed"),
        )
    return cur


def _excise_pass(
    docs: DataFrame,
    k: int,
    id_col: str,
    text_col: str,
    min_occurrences: int,
    fingerprint: str,
) -> DataFrame:
    """One excision pass (the whole operator when ``max_passes=1``)."""
    grams = kgram_positions(
        docs, k=k, id_col=id_col, text_col=text_col, fingerprint=fingerprint
    )
    agg = grams.groupBy("gram").agg(
        F.count("*").alias("_n"),
        F.min(F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))).alias(
            "_first"
        ),
    )
    marked = (
        grams.join(agg.filter(F.col("_n") >= min_occurrences), "gram")
        .filter(
            ~(
                (F.col(id_col) == F.col("_first.d"))
                & (F.col("pos") == F.col("_first.p"))
            )
        )
        .select(
            id_col,
            F.col("pos").cast("bigint").alias("s"),
            (F.col("pos") + k).cast("bigint").alias("e"),
        )
    )
    per_doc = (
        _merge_intervals(marked, id_col)
        .groupBy(id_col)
        .agg(
            F.collect_list(
                F.struct(
                    F.col("span_start").alias("s"), F.col("span_end").alias("e")
                )
            ).alias("sp")
        )
    )
    toks = docs.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
            lambda t: t != "",
        ).alias("_t"),
    )
    kept = F.expr(
        "CASE WHEN sp IS NULL THEN _t ELSE "
        "filter(_t, (x, i) -> NOT exists(sp, q -> i >= q.s AND i < q.e)) END"
    )
    return toks.join(per_doc, id_col, "left").select(
        id_col,
        F.array_join(kept, " ").alias(text_col),
        F.size("_t").cast("bigint").alias("n_tokens"),
        (F.size("_t") - F.size(kept)).cast("bigint").alias("n_tokens_removed"),
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

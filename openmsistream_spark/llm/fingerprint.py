"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003,
"Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
algorithm): hash every character k-gram of the normalized text, slide a
window of ``w`` consecutive hashes, and keep each window's minimum
(rightmost on ties). The selected set is a content-defined O(n/w)
sample of the document with the guarantee that any shared substring of
length >= k + w - 1 contributes at least one SHARED fingerprint — the
property that makes fingerprint overlap a sound near-dup/plagiarism
signal without comparing full texts.

Relation to the neighbors: ``dedup.word_shingles``/MinHash sample
shingles by hash RANK (corpus-global), span dedup keeps EVERY k-gram;
winnowing is the position-local selection, the classic "rolling hash
fingerprint" of the dedup literature.

Scale shape: one explode to (doc, pos, hash) rows (the same cost class
as word shingling — rows ~ text length), one per-doc ordered window
(partition = one document, never corpus-wide), and a w-bounded
self-range-join per window to apply the rightmost-min tie rule. Hashes
are 16-hex md5 prefixes (identical in Spark and DuckDB; fixed-width hex
compares lexicographically = numerically). Overlap pairs join on the
fingerprint value — bounded by fingerprint frequency, with the usual
hot-key cap knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm_text(text_col: str) -> F.Column:
    # lower + trim + whitespace-collapse: layout must not change the
    # fingerprints (the paper normalizes before hashing)
    return F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")


def kgram_hashes(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, p, h): the 16-hex md5 prefix of every character k-gram
    of the normalized text, with its 1-based start position. Documents
    shorter than ``k`` produce no rows."""
    normed = docs.select(
        F.col(id_col), _norm_text(text_col).alias("_t")
    ).filter(F.length("_t") >= k)
    return normed.select(
        id_col,
        F.explode(
            F.sequence(F.lit(1), F.length("_t") - (k - 1))
        ).alias("p"),
        "_t",
    ).select(
        id_col,
        "p",
        F.substring(F.md5(F.expr(f"substr(_t, p, {k})")), 1, 16).alias("h"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, sp, fp): the winnowing fingerprint set — for every
    window of ``w`` consecutive k-gram hashes, the minimum hash, with
    ties going to the RIGHTMOST position (the paper's rule; it
    minimizes the selected set), deduplicated across overlapping
    windows. ``sp`` is the selected k-gram's start position.

    Guarantee (paper Thm 2): any substring match of length
    >= k + w - 1 between two documents yields at least one common
    fingerprint value.

    Shape: ONE per-doc ordered window computes both the window minimum
    and its rightmost position (``min_by(p, struct(h, -p))`` — an
    aggregate over the w-row frame: minimal hash, ties to the largest
    position), then a distinct — no join, no corpus-wide window; the
    fingerprint set is ~n/w per document. (A first cut located the
    rightmost min with a w-bounded range join back onto the gram table;
    the window aggregate does the same work in one pass — 8.4 s → far
    less at sf0.1.)"""
    g = kgram_hashes(docs, k=k, id_col=id_col, text_col=text_col)
    win = Window.partitionBy(id_col).orderBy("p").rowsBetween(-(w - 1), 0)
    seq = Window.partitionBy(id_col).orderBy("p")
    return (
        g.select(
            F.col(id_col),
            F.expr("min_by(p, struct(h, -p))").over(win).alias("sp"),
            F.min("h").over(win).alias("fp"),
            F.row_number().over(seq).alias("_rn"),
        )
        # only full windows select (the first w-1 prefixes are covered
        # by the first full window, per the paper)
        .filter(F.col("_rn") >= w)
        .select(id_col, "sp", "fp")
        .distinct()
    )


def fingerprint_overlap_pairs(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_fp_df: int | None = None,
    fingerprints: DataFrame | None = None,
) -> DataFrame:
    """(id_a, id_b, n_shared): document pairs sharing at least
    ``min_shared`` distinct fingerprint VALUES — the winnowing
    near-dup/plagiarism report. The join runs on 16-hex fingerprint
    values (never text); ``max_fp_df`` drops fingerprints present in
    more than that many documents first (the boilerplate hot-key guard,
    same rationale as ``cap_hot_shingles``). ``fingerprints=`` injects
    a precomputed ``winnow_fingerprints`` output (the usual pay-once
    contract)."""
    fps = (
        winnow_fingerprints(docs, k=k, w=w, id_col=id_col, text_col=text_col)
        if fingerprints is None
        else fingerprints
    )
    dfp = fps.select(id_col, "fp").distinct()
    if max_fp_df is not None:
        hot = (
            dfp.groupBy("fp")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > max_fp_df)
            .select("fp")
        )
        dfp = dfp.join(hot, "fp", "left_anti")
    a = dfp.select(F.col(id_col).alias("id_a"), "fp")
    b = dfp.select(F.col(id_col).alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )

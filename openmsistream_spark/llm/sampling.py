"""Deterministic weighted sampling without replacement.

``mixture_sample`` (llm/packing.py) draws WITH replacement in
expectation — right for epoch weighting, wrong when each document may
appear at most once (eval-set carving, budgeted corpus subsetting,
fair per-source quotas by importance weight). This module implements
the Efraimidis–Spirakis (2006) one-pass scheme with the randomness
replaced by a hash-derived uniform, so the sample is a pure function of
the ids — identical on any engine, any rerun, any partitioning (the
same determinism contract as ``hash_sample_documents``).

Key: u = (int(md5(id)[:8], 16) + 0.5) / 2^32 ∈ (0,1);
     key = -ln(u) / w  (exponential with rate w — the Gumbel/ES trick).
The k rows with the SMALLEST keys form a weighted sample without
replacement: P(item first) = w_i / Σw, then recurse on the rest.

Scale shape: one narrow projection computes every key, and the top-k by
(key ASC, id ASC) runs as TakeOrdered — per-partition heaps, bounded
driver merge, no shuffle of the corpus. Engine-exactness: the uniform
is integer-derived, ln is bit-identical IEEE, and the key rounds to
6 dp before the (key, id) ordering, so an oracle reproduces the exact
sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def weighted_sample_wor(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k deterministic weighted sample without replacement.

    ``weight_col`` must be strictly positive (a zero weight divides by
    zero → null key → row sorts last and is never sampled, but pass
    clean weights). Returns the input rows plus ``sample_key`` (the ES
    key, rounded to 6 dp; ordering ties broken by id).
    """
    hex8 = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    u = (F.conv(hex8, 16, 10).cast("double") + 0.5) / F.lit(4294967296.0)
    key = -F.log(u) / F.col(weight_col).cast("double")
    return (
        df.withColumn("sample_key", F.round(key, 6))
        .orderBy(F.asc("sample_key"), F.asc(id_col))
        .limit(k)
    )

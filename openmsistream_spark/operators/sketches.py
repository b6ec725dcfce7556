"""Sketch aggregates — HyperLogLog distinct counting and Count-Min
frequency estimation (Flajolet et al. 2007; Cormode & Muthukrishnan
2005).

Why this family exists at 100 TB: exact ``COUNT(DISTINCT key)`` and
exact per-key frequency tables shuffle every distinct key. The sketches
bound the shuffle by the SKETCH size instead of the data:

- **HLL**: the only state is ``m = 2**p`` one-byte registers per group.
  ``groupBy(group, bucket).max(rho)`` is map-side combinable, so the
  shuffle carries at most tasks x m rows no matter how many distinct
  keys exist; merging sketches across partitions/days IS the same max.
- **CMS**: the only state is ``d x w`` counters. ``groupBy(i, pos)
  .sum(cnt)`` is map-side combinable, so the shuffle carries at most
  tasks x d x w rows even over an unbounded vocabulary; point lookups
  join a probe set against a broadcast-sized counter table.

Engine-exactness: both sketches are pure md5 arithmetic over the repo's
portable-hash convention (functions/hashes.py:27 — ``conv`` of an md5
hex prefix), so a SQL oracle reproduces every register and counter
bit-for-bit. The HLL *estimate* is exact fixed-point too: the harmonic
sum is a sum of dyadic rationals (``2**-rho`` scaled by ``2**(vbits+1)``
is an integer), and the alpha_m bias constant is embedded as an integer
micro literal, so the final division is the repo's half-up integer
rounding ((2*num + den) div (2*den)) — no float pow anywhere. The one
float op in the whole family is the single ln() of the small-range
linear-counting arm, branch-selected on exact integers and rounded at
4 dp (the repo's accepted ln-parity convention).

Reference parity: generalizes the reference's distinct-completed-paths
scan (R6, producer_file_registry.py:152-167) and heartbeat counters
(A8) to cardinality/frequency estimation that never materializes the
key space.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 13 hex chars = 52 bits: fits a signed 64-bit long with headroom, and
# matches what a SQL oracle can compute as ('0x' || substr(md5(k),1,13)).
_HASH_HEX = 13
_HASH_BITS = 4 * _HASH_HEX


def hll_alpha_micro(p: int) -> int:
    """The HLL bias-correction constant for ``m = 2**p`` registers, as
    an exact integer in millionths (Flajolet et al. 2007 fig. 3). This
    ONE number is the only non-integer in the estimator; freezing it to
    a micro literal makes the whole estimate engine-exact."""
    m = 1 << p
    if m <= 16:
        alpha = 0.673
    elif m == 32:
        alpha = 0.697
    elif m == 64:
        alpha = 0.709
    else:
        alpha = 0.7213 / (1 + 1.079 / m)
    return round(alpha * 1_000_000)


def _hash52(key: Column) -> Column:
    return F.conv(F.substring(F.md5(key), 1, _HASH_HEX), 16, 10).cast("long")


def hll_registers(
    df: DataFrame,
    key_col: str | Column,
    group_cols: Sequence[str] = (),
    p: int = 12,
) -> DataFrame:
    """HLL registers per group: (group_cols..., bucket, r).

    bucket = top ``p`` bits of the 52-bit md5 hash; rho = position of
    the first 1-bit in the remaining ``vbits`` bits (1-based; all-zero
    -> vbits+1), computed as ``vbits + 1 - length(bin(w))`` — minimal
    binary strings in Spark and DuckDB alike, so no float log2.
    Duplicates need no pre-distinct: the register is a max.
    """
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    vbits = _HASH_BITS - p
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    h = _hash52(key)
    w = h % F.lit(1 << vbits).cast("long")
    rho = F.when(w == 0, F.lit(vbits + 1)).otherwise(
        F.lit(vbits + 1) - F.length(F.bin(w))
    )
    return (
        df.filter(key.isNotNull())
        .select(
            *[F.col(g) for g in group_cols],
            F.shiftright(h, vbits).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").cast("int").alias("r"))
    )


def hll_distinct(
    df: DataFrame,
    key_col: str | Column,
    group_cols: Sequence[str] = (),
    p: int = 12,
) -> DataFrame:
    """Distinct-count estimate per group from one pass of HLL registers.

    Output: (group_cols..., n_registers BIGINT, est_e2 BIGINT,
    estimate DOUBLE). est_e2 is the RAW HLL estimate in exact
    hundredths (engine-reproducible integer). estimate applies the
    paper's small-range rule: when the raw estimate is <= 2.5m and
    empty registers exist, linear counting m*ln(m/V) replaces it (the
    raw estimator is biased high below ~2.5m); otherwise estimate =
    est_e2/100. The branch condition compares exact integers, so both
    engines take the same arm; the single ln() is rounded at 4 dp (the
    repo's accepted float-parity convention, cf. unigram surprisal).

    Exact arithmetic for est_e2: S = sum over all m buckets of
    2**(vbits+1-r) (empty buckets contribute 2**(vbits+1)); E = alpha *
    m^2 * 2**(vbits+1) / S, evaluated as one half-up integer division
    with a DECIMAL(38,0)-widened constant numerator. Worst-case
    quotient (every register saturated) is ~6.5e17 at p=12 — inside
    BIGINT, so Spark's integral ``div`` cannot overflow at any input.
    """
    regs = hll_registers(df, key_col, group_cols, p)
    return hll_estimate_from_registers(regs, group_cols, p)


def hll_estimate_from_registers(
    regs: DataFrame,
    group_cols: Sequence[str] = (),
    p: int = 12,
) -> DataFrame:
    """The estimate step alone, over an existing register table
    (group_cols..., bucket, r) — e.g. ``hll_registers`` output, a
    max-merged union of several, or the streaming sink's durable
    register ledger. Same output contract as :func:`hll_distinct`."""
    vbits = _HASH_BITS - p
    m = 1 << p
    # constant numerator: alpha_micro * m^2 * 2^(vbits+1) * 100
    a_num = hll_alpha_micro(p) * m * m * (1 << (vbits + 1)) * 100
    agg = regs.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n_registers"),
        # coalesce: a global (group-less) aggregate over an EMPTY frame
        # still emits one row — sum() is NULL there, and the estimate
        # must resolve to the all-registers-empty case, not NULL
        F.coalesce(
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {vbits + 1} - r)")),
            F.lit(0).cast("long"),
        ).alias("_s_present"),
    )
    s_total = (
        F.col("_s_present")
        + (F.lit(m).cast("long") - F.col("n_registers"))
        * F.lit(1 << (vbits + 1)).cast("long")
    )
    est_e2 = F.expr(
        f"(2 * {a_num}BD + CAST(_s AS DECIMAL(38,0)) * 1000000)"
        f" div (2 * CAST(_s AS DECIMAL(38,0)) * 1000000)"
    )
    n_zero = F.lit(m).cast("long") - F.col("n_registers")
    lc = F.round(
        F.lit(float(m))
        * F.log(F.lit(float(m)) / n_zero.cast("double")),
        4,
    )
    raw = F.round(F.col("est_e2").cast("double") / F.lit(100.0), 4)
    # 2.5m threshold on the EXACT integer (est_e2 <= 250*m) so both
    # engines take the same branch bit-for-bit
    estimate = F.when(
        (F.col("est_e2") <= F.lit(250 * m)) & (n_zero > 0), lc
    ).otherwise(raw)
    return (
        agg.withColumn("_s", s_total)
        .withColumn("est_e2", est_e2)
        .select(
            *group_cols,
            "n_registers",
            "est_e2",
            estimate.alias("estimate"),
        )
    )


def _cms_pos(key: Column, i: int, w: int) -> Column:
    """Row ``i``'s counter position for ``key`` — the bloom salt
    convention (llm/bloom.py): md5(key + '#i') 60-bit prefix mod w."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(key, F.lit(f"#{i}"))), 1, 15), 16, 10
        ).cast("long")
        % w
    )


def cms_counters(
    df: DataFrame,
    key_col: str | Column,
    d: int = 4,
    w: int = 2048,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min counter table (i, pos, cnt) over every key occurrence
    (optionally ``weight_col``-weighted).

    Straight from occurrences to counters — the vocabulary is never
    materialized: each occurrence contributes to d (i, pos) cells and
    the groupBy's map-side combine collapses every task to <= d*w rows
    before the (single, sketch-sized) shuffle.
    """
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    wt = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    cells = F.array(
        *[
            F.struct(F.lit(i).alias("i"), _cms_pos(key, i, w).alias("pos"))
            for i in range(d)
        ]
    )
    return (
        df.filter(key.isNotNull())
        .select(F.explode(cells).alias("_c"), wt.alias("_wt"))
        .groupBy(F.col("_c.i").alias("i"), F.col("_c.pos").alias("pos"))
        .agg(F.sum("_wt").alias("cnt"))
    )


def cms_lookup(
    counters: DataFrame,
    probes: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 2048,
    out_col: str = "cms_cnt",
) -> DataFrame:
    """Point-frequency estimates for ``probes[key_col]``: min over the d
    counter cells each key hashes to (the CMS guarantee: estimate >=
    truth, overestimate bounded by the sketch's epsilon). The counter
    table is <= d*w rows — broadcast; the probe side never shuffles on
    data volume, only on its own (small) key set for the final min."""
    key = F.col(key_col)
    cells = F.array(
        *[
            F.struct(F.lit(i).alias("i"), _cms_pos(key, i, w).alias("pos"))
            for i in range(d)
        ]
    )
    probe_cols = [f.name for f in probes.schema.fields]
    exploded = probes.select(*probe_cols, F.explode(cells).alias("_c")).select(
        *probe_cols, F.col("_c.i").alias("i"), F.col("_c.pos").alias("pos")
    )
    joined = exploded.join(F.broadcast(counters), ["i", "pos"], "left")
    return joined.groupBy(*probe_cols).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias(out_col)
    )


def hll_union_intersection(
    regs_a: DataFrame,
    regs_b: DataFrame,
    p: int = 12,
) -> DataFrame:
    """Distinct-count estimates for two key sets AND their union and
    intersection from REGISTERS ALONE (no re-scan of either input):
    union registers are the element-wise max of the two tables — the
    mergeability that makes HLL composable across partitions, days, or
    sources — and the intersection estimate is inclusion-exclusion
    (est_a + est_b - est_union; the standard HLL device, noisier than
    the direct estimates and clamped at 0).

    Inputs are group-less ``hll_registers`` outputs (bucket, r) built
    with the same ``p``. Register tables from a DIFFERENT ``p`` have
    incompatible bucket spaces — max-merging them silently produces
    nonsense estimates — so both inputs are range-guarded in the plan:
    any bucket outside [0, 2**p) raises at execution time. (A smaller-p
    table whose buckets happen to fit the range is undetectable from
    registers alone; carry ``p`` alongside persisted register tables —
    the streaming HLL ledger does.) Output: one row (est_a, est_b,
    est_union, est_intersection), each the corrected DOUBLE estimate."""

    def _range_checked(regs: DataFrame, side: str) -> DataFrame:
        ok = F.assert_true(
            (F.col("bucket") >= 0) & (F.col("bucket") < F.lit(1 << p)),
            f"hll_union_intersection: regs_{side} bucket out of range for "
            f"p={p} — both register tables must come from hll_registers "
            f"with this same p",
        )
        # assert_true is NULL on success; threading it through the kept
        # column keeps the guard un-prunable without adding a pass
        return regs.select(
            "bucket", F.when(ok.isNull(), F.col("r")).cast("int").alias("r")
        )

    regs_a = _range_checked(regs_a, "a")
    regs_b = _range_checked(regs_b, "b")
    union = (
        regs_a.select("bucket", "r")
        .unionByName(regs_b.select("bucket", "r"))
        .groupBy("bucket")
        .agg(F.max("r").cast("int").alias("r"))
    )

    def _est(regs: DataFrame, name: str) -> DataFrame:
        return hll_estimate_from_registers(regs, (), p).select(
            F.col("estimate").alias(name)
        )

    return (
        _est(regs_a, "est_a")
        .crossJoin(_est(regs_b, "est_b"))
        .crossJoin(_est(union, "est_union"))
        .select(
            "est_a",
            "est_b",
            "est_union",
            F.greatest(
                F.lit(0.0),
                F.round(
                    F.col("est_a") + F.col("est_b") - F.col("est_union"), 4
                ),
            ).alias("est_intersection"),
        )
    )

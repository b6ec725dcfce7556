"""The relational operator surface (SURVEY §2.3/§2.5/§2.7).

Thin, named wrappers over stock DataFrame ops — each is the declared
Spark mapping of a reference operator, kept declarative so Catalyst can
push filters into the scan, prune columns, and pick broadcast joins.
These are the operators the DuckDB oracle validates (t2).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def regex_filter(df: DataFrame, col: str, pattern: str, negate: bool = False) -> DataFrame:
    """F1/F2 — key/filepath regex filter
    (reference: openmsistream_consumer.py:363-410)."""
    pred = F.col(col).rlike(pattern)
    return df.filter(~pred if negate else pred)


def offset_gate(df: DataFrame, offset_col: str, starting_offset: int) -> DataFrame:
    """F3 — consumed-before gate: keep records at/after the group's
    starting offset (reference: openmsistream_consumer.py:412-449)."""
    return df.filter(F.col(offset_col) >= F.lit(starting_offset))


def dedup_keep_first(
    df: DataFrame, keys: Sequence[str], order_col: str, agg_cols: Sequence[str] = ()
) -> DataFrame:
    """F4 — deterministic dedup: one row per key, keeping the smallest
    ``order_col`` (the reference keeps the first-arriving chunk per
    offset, download_data_file.py:98-107). Map-side combinable:
    min(struct(order, payload...)) — no window shuffle."""
    payload = F.struct(F.col(order_col), *[F.col(c) for c in agg_cols])
    out = df.groupBy(*keys).agg(F.min(payload).alias("_first"))
    return out.select(
        *keys,
        F.col(f"_first.{order_col}").alias(order_col),
        *[F.col(f"_first.{c}").alias(c) for c in agg_cols],
    )


def semi_join(left: DataFrame, right: DataFrame, on, broadcast_right: bool = True) -> DataFrame:
    """Rerun filter: stream ∩ registry (reference:
    stream_handler_registries.py:84-97). Registry side is small → broadcast."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on, broadcast_right: bool = True) -> DataFrame:
    """Skip-already-completed on startup (reference:
    data_file_upload_directory.py:550-572)."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=on, how="left_anti")


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """A7 — top-K (50-most-recent ring buffer, data_file_chunk_handlers.py:24).
    Spark plans orderBy+limit as TakeOrderedAndProject — per-partition
    heap + driver merge of K rows, never a full sort at scale."""
    return df.orderBy(*order_by).limit(k)


def stratified_sample(
    df: DataFrame, strata_col: str, key_col: str, k: int
) -> DataFrame:
    """Deterministic stratified sample: up to ``k`` rows per stratum,
    chosen by ranking each stratum on md5(key) — a pure function of the
    data, so any engine, rerun, or worker draws the identical sample
    (no rand() coordination). Adds ``sample_rank`` (1-based, BIGINT).

    Plan: one shuffle on the stratum + an in-partition row_number. A
    single hot stratum serializes into one task; for that shape use
    ``stratified_sample_hash`` — same determinism and identical output,
    no full-stratum window."""
    hash_key = F.md5(F.col(key_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(hash_key, F.col(key_col))
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("sample_rank") <= k)
    )


def stratified_sample_hash(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    k: int,
    oversample: float = 4.0,
    slack: int = 64,
) -> DataFrame:
    """Hot-stratum-safe deterministic stratified sample — same output as
    ``stratified_sample`` (up to ``k`` rows per stratum, ranked by
    md5(key)), different physical plan.

    ``stratified_sample`` windows over EVERY row of a stratum, so one
    dominant stratum (a 100 TB corpus where one ``source`` holds 90% of
    docs) serializes into a single task. Here the window only ever sees
    pre-filtered survivors:

      1. per-stratum counts — one map-side-combinable groupBy producing
         |strata| rows, broadcast back;
      2. hash-threshold filter — keep rows whose uniform score
         (first 15 hex chars of md5(key), as a fraction of 16^15) falls
         below ``(k*oversample + slack) / |stratum|``. Fully parallel,
         no shuffle of the big side beyond the scan; survivors per
         stratum ≈ k*oversample + slack regardless of stratum size;
      3. exact-k trim — row_number window per stratum over survivors
         only (≈ strata × (4k+64) rows total, never corpus-sized).

    The trim orders by the same md5 the threshold filters on, so ranks
    among survivors equal ranks in the full stratum as long as every
    top-k row survives step 2 — the k-th smallest of |stratum| uniform
    scores concentrates at k/|stratum|, so a 4x+64 margin puts the miss
    probability below exp(-k-slack) (Chernoff); the margin is config if
    a caller wants it wider. Deterministic: the sample is a pure
    function of the data, identical on any engine/rerun/worker.
    """
    counts = df.groupBy(strata_col).agg(F.count("*").alias("_stratum_n"))
    hash_key = F.md5(F.col(key_col).cast("string"))
    # 15 hex chars = 60 bits — fits a BIGINT; /16^15 → uniform in [0,1)
    frac = F.conv(F.substring(hash_key, 1, 15), 16, 10).cast("double") / F.lit(
        float(16**15)
    )
    survivors = (
        df.join(F.broadcast(counts), strata_col)
        .filter(frac * F.col("_stratum_n") < F.lit(k * oversample + slack))
    )
    w = Window.partitionBy(strata_col).orderBy(hash_key, F.col(key_col))
    return (
        survivors.withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("sample_rank") <= k)
        .drop("_stratum_n")
    )


def latest_per_key(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[Column]
) -> DataFrame:
    """A2 — argmax per key (generation adoption by (n_total_chunks, mtime),
    download_data_file.py:160-272). Window row_number==1; ``order_by``
    must be a total order for determinism."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )


def windowed_counts(
    df: DataFrame,
    ts_col: str,
    interval: str = "1 hour",
    extra_keys: Sequence[str] = (),
    byte_col: str | None = None,
) -> DataFrame:
    """A8 — heartbeat counters: tumbling-window message/byte counts
    (reference: controlled_message_reproducer.py:80-104). Single-unit
    intervals ("1 hour") use date_trunc (engine-portable window starts
    for the oracle); multi-unit intervals ("15 minutes") use
    F.window — date_trunc would silently produce 1-unit buckets."""
    count_s, unit = interval.split()
    if count_s in ("1", "01"):
        start = F.date_trunc(unit.rstrip("s"), F.col(ts_col))
    else:
        start = F.window(F.col(ts_col), interval).getField("start")
    g = df.groupBy(start.alias("window_start"), *extra_keys)
    aggs = [F.count("*").alias("n_messages")]
    if byte_col:
        aggs.append(F.sum(byte_col).alias("n_bytes"))
    return g.agg(*aggs)


def status_counts(df: DataFrame, status_col: str = "status") -> DataFrame:
    """A6/R9 — files-by-state summary
    (reference: data_file_upload_directory.py:715-755)."""
    return df.groupBy(status_col).agg(F.count("*").alias("n"))


def salted_counts_sums(
    df: DataFrame,
    keys: Sequence[str],
    value: Column | None = None,
    n_salts: int = 32,
) -> DataFrame:
    """Two-stage salted aggregation for low-cardinality / skewed keys.

    A plain ``groupBy(key)`` over a column with K distinct values puts
    the whole 100 TB table on K reducers. Stage 1 groups by
    (key, random-ish salt) — full cluster parallelism; stage 2 merges the
    ≤ K×n_salts partial rows. The salt is derived from input columns
    (crc32 of the row's key+value text), not rand(), so the result is
    deterministic and retry-safe. Results are identical to the unsalted
    aggregation — salting is pure execution strategy.

    (Spark's partial aggregation already map-side combines; explicit
    salting additionally bounds the *reduce*-side key width, which
    partial agg alone cannot.)
    """
    salt = F.crc32(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in df.columns])) % n_salts
    aggs1 = [F.count("*").alias("_n")]
    aggs2 = [F.sum("_n").cast("long").alias("n")]
    if value is not None:
        aggs1.append(F.sum(value).alias("_s"))
        aggs2.append(F.sum("_s").alias("total"))
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*aggs1)
    return partial.groupBy(*keys).agg(*aggs2)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi join: the fact side gets a deterministic salt
    (crc32 of its key), the dim side is replicated across all salts, and
    the join runs on (key, salt) — a hot key's rows spread over
    ``n_salts`` reducers instead of one. Result is identical to the
    plain join. Use when AQE's runtime skew splitting isn't available
    (streaming joins) or the skew is known up front; the dim replication
    costs n_salts× its size, so keep the replicated side small.

    Only inner/left joins are supported: an outer side on the replicated
    dim would surface its unmatched rows once per salt."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins, not {how!r} "
            "(outer-on-dim would duplicate unmatched dim rows per salt)"
        )
    salted_fact = fact.withColumn(
        "_salt", (F.crc32(F.col(on).cast("string")) % n_salts).cast("int")
    )
    salted_dim = dim.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>")),
    )
    return salted_fact.join(salted_dim, on=[on, "_salt"], how=how).drop("_salt")


def running_total(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    value: Column,
    alias: str = "running_total",
) -> DataFrame:
    """Cumulative aggregation per key in a defined total order (the
    reference's per-file byte accumulation generalized)."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(alias, F.sum(value).over(w))

"""Time-series / ordered operators Spark lacks as built-ins: as-of join,
gap-based sessionization, range join.

All are compositions of existing DataFrame ops (the driver-preferred
strategy for custom operators): the as-of join is the union+last_value
trick — ONE shuffle on (key, time), no join node at all — which beats
the naive per-row correlated subquery by orders of magnitude at scale;
sessionization is lag + a running sum of gap breaks; the range join
broadcasts the (small) ranges side so the non-equi condition never
becomes a cartesian shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right row with the same key
    and ``right_ts <= left_ts`` (backward as-of join).

    Implementation: tag and union both sides, sort within key by time
    (right rows before left rows at equal timestamps), then
    ``last_value(..., ignorenulls)`` over the running window carries the
    most recent right-side values forward onto every left row. One
    shuffle, linear work — no range join, no correlated subquery.
    """
    lcols = left.columns
    l_tagged = left.select(
        *lcols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"_r_{v}") for v in right_vals],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != key],
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(v).alias(f"_r_{v}") for v in right_vals],
    ).select(*lcols, "_ts", "_side", *[f"_r_{v}" for v in right_vals])

    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols,
        "_ts",
        "_side",
        *[
            F.last(f"_r_{v}", ignorenulls=True).over(w).alias(f"{v}{suffix}")
            for v in right_vals
        ],
    )
    return carried.filter(F.col("_side") == 1).drop("_ts", "_side")


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the key's previous event exceeds ``gap``. Returns the input plus
    ``session_id`` (0-based per key). lag + running sum of break flags —
    one shuffle on the key."""
    count_s, unit = gap.split()
    per = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}[unit.rstrip("s")]
    gap_seconds = float(int(count_s) * per)
    w = Window.partitionBy(key).orderBy(F.col(ts_col).asc())
    prev = F.lag(ts_col).over(w)
    # double-seconds: microsecond timestamps are exact in a double, and
    # the math is reproducible across engines (truncating to long would
    # shift gap boundaries by up to a second)
    is_break = F.when(
        prev.isNull()
        | (F.col(ts_col).cast("double") - prev.cast("double") > gap_seconds),
        1,
    ).otherwise(0)
    running = Window.partitionBy(key).orderBy(F.col(ts_col).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("_brk", is_break).withColumn(
        "session_id", (F.sum("_brk").over(running) - 1).cast("long")
    ).drop("_brk")


def range_join(
    facts: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Join each fact row to the range bucket containing its value:
    ``lo <= value < hi``. The ranges side is broadcast, so the non-equi
    predicate evaluates map-side (BroadcastNestedLoopJoin) — never a
    shuffled cartesian."""
    cond = (facts[value_col] >= ranges[lo_col]) & (facts[value_col] < ranges[hi_col])
    return facts.join(F.broadcast(ranges), cond, "left")

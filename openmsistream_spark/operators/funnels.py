"""Event-sequence analytics: ordered funnels and cohort retention.

The two classic product-analytics operators over an event stream —
MATCH_RECOGNIZE-lite shapes expressed as plain aggregations so Catalyst
owns the physical plan:

- ``funnel_steps``: strictly-ordered step progression per user (first
  step-1 event, then the first step-2 event AFTER it, ...) as a cascade
  of filtered min-aggregations joined on the user key — one map-side-
  combinable aggregate + one co-partitioned join per step, never a
  per-user event buffer, so a user with millions of events costs the
  same as one with ten (contrast with collect_list-and-scan, which
  buffers a user's history in one task).
- ``cohort_retention``: users bucketed by first-activity week, activity
  deduplicated to (user, week), offsets counted against the cohort size
  — the retention-matrix query every growth dashboard runs.

Reference parity: the reference has no event-analytics surface; these
extend the engine's analytics layer over the driver's ``events`` table
the same way queries_analytics.py does (sessionize, as-of join).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: "float | None" = None,
) -> DataFrame:
    """Strictly-ordered funnel: per user, the first ``steps[0]`` event,
    then the first ``steps[1]`` event strictly after it, and so on.

    Returns one row per user who completed at least step 1:
    (user_col, ts_step_1..ts_step_N, depth) — unreached steps are null,
    ``depth`` counts reached steps. A later step's event occurring
    before the earlier step's first event does NOT count (strict
    ordering — re-ordering semantics match the SQL cascade an analyst
    would write, and the oracle mirrors it).

    ``within_seconds`` adds the realistic conversion-window variant:
    every later step must occur within that many seconds of the user's
    step-1 event (an extra predicate on each cascade stage — plan shape
    unchanged).

    Scale shape: step k is one filtered min-aggregation over that
    step's events joined (user-key equi-join, AQE-broadcast when the
    funnel narrows) to the step k-1 frontier; no per-user buffering, no
    windows over event history.
    """
    if not steps:
        raise ValueError("funnel_steps needs at least one step")
    frontier = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t1"))
    )
    ts_cols = ["_t1"]
    for i, step in enumerate(steps[1:], start=2):
        prev = ts_cols[-1]
        cur = f"_t{i}"
        probe_cols = [user_col, "_t1"] + ([prev] if prev != "_t1" else [])
        probe = frontier.select(*[F.col(c) for c in probe_cols])
        nxt = (
            events.filter(F.col(type_col) == step)
            .join(probe, user_col)
            .filter(F.col(ts_col) > F.col(prev))
        )
        if within_seconds is not None:
            nxt = nxt.filter(
                F.col(ts_col).cast("double")
                <= F.col("_t1").cast("double") + float(within_seconds)
            )
        nxt = nxt.groupBy(user_col).agg(F.min(ts_col).alias(cur))
        frontier = frontier.join(nxt.select(user_col, cur), user_col, "left")
        ts_cols.append(cur)
    depth = F.lit(1)
    for c in ts_cols[1:]:
        depth = depth + F.col(c).isNotNull().cast("int")
    return frontier.select(
        user_col,
        *[F.col(c).alias(f"ts_{steps[i]}") for i, c in enumerate(ts_cols)],
        depth.alias("depth"),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention matrix.

    Users are assigned to the week (Monday-truncated timestamp) of their
    first event; each (cohort_week, week_offset) cell counts the
    distinct cohort members active that week, with the rate against the
    cohort size. Returns (cohort_week, week_offset, n_active, n_cohort,
    retention) — retention rounded to 4 dp.

    Scale shape: first-activity and (user, week) activity are map-side-
    combinable aggregates; the cohort-size side is groupBy over one row
    per user and joins broadcast-small (|weeks| cohorts).
    """
    week = F.date_trunc("week", F.col(ts_col))
    first = events.groupBy(user_col).agg(F.min(week).alias("cohort_week"))
    act = events.select(F.col(user_col), week.alias("w")).distinct()
    joined = act.join(first, user_col).select(
        user_col,
        "cohort_week",
        F.floor(F.datediff(F.col("w"), F.col("cohort_week")) / 7.0)
        .cast("int")
        .alias("week_offset"),
    )
    sizes = first.groupBy("cohort_week").agg(F.count("*").alias("n_cohort"))
    return (
        joined.groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct(F.col(user_col)).alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "n_cohort",
            F.round(
                F.col("n_active") / F.col("n_cohort").cast("double"), 4
            ).alias("retention"),
        )
    )


def transition_counts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str | None = "event_id",
) -> DataFrame:
    """Event-transition (first-order Markov) counts: how often each
    event type is immediately followed by each other type within a
    user's timeline — the path-analysis aggregate behind "what happens
    after X" dashboards and next-event models.

    One lead() window per user ordered by (ts, tiebreak) — the
    deterministic total order an oracle reproduces — then a
    map-side-combinable (from, to) count. The window shuffles by the
    user key; within a task, state is one row of lookahead (lead), so
    long histories stream rather than buffer.

    Returns (from_type, to_type, n_transitions).
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(*order)
    seq = events.select(
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    return seq.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n_transitions")
    )

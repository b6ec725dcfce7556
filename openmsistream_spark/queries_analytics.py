"""Analytics-completeness queries: the custom ordered operators (as-of
join, sessionization, range join) plus the standard OLAP shapes the
relational surface should round out (rollup, pivot, exact quantiles,
decimal-exact stddev). Each validated against the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.timeseries import asof_join, range_join, sessionize
from .queries import dsum, load, query


@query(
    "asof_join_last_signup",
    """
    SELECT e.event_id, e.user_id, e.ts,
           (SELECT max(s.ts) FROM (SELECT * FROM {EV}) s
            WHERE s.user_id = e.user_id AND s.event_type = 'signup'
              AND s.ts <= e.ts) AS signup_ts_asof
    FROM (SELECT * FROM {EV}) e
    WHERE e.event_type = 'purchase'
    """,
    doc="backward as-of join: each purchase gets the user's latest prior signup",
    survey="custom op (driver list): as-of join via union+last_value, one shuffle",
)
def asof_join_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("signup_ts")
    )
    out = asof_join(
        purchases, signups,
        key="user_id", left_ts="ts", right_ts="signup_ts",
        right_vals=["signup_ts"],
    )
    return out.select(
        "event_id", "user_id", "ts", F.col("signup_ts_asof").alias("signup_ts_asof")
    )


@query(
    "sessionize_user_events",
    """
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER w) > 1800.0
                  THEN 1 ELSE 0 END AS brk
      FROM {EV}
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)),
    sess AS (
      SELECT user_id, ts,
             CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT)
               AS session_id
      FROM marked)
    SELECT user_id, session_id, count(*) AS n_events,
           CAST(floor(epoch(max(ts)) - epoch(min(ts))) AS BIGINT) AS duration_s
    FROM sess GROUP BY user_id, session_id
    """,
    doc="gap-based sessionization (30-min inactivity) + per-session rollup",
    survey="custom op: sessionize via lag + running break sum",
)
def sessionize_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    # deterministic total order within a user: (ts, event_id)
    sess = sessionize(
        ev.withColumn("ts", F.col("ts")), key="user_id", ts_col="ts", gap="30 minutes"
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.floor(
            F.max(F.col("ts").cast("double")) - F.min(F.col("ts").cast("double"))
        ).cast("long").alias("duration_s"),
    )


@query(
    "range_join_value_buckets",
    """
    WITH ranges(bucket, lo, hi) AS (
      VALUES ('small', 0.0, 50.0), ('mid', 50.0, 200.0), ('large', 200.0, 1e9)
    )
    SELECT r.bucket, count(*) AS n,
           CAST(round(sum(CAST(e.value AS DECIMAL(28,6))), 2) AS DOUBLE) AS total
    FROM (SELECT * FROM {EV}) e JOIN ranges r ON e.value >= r.lo AND e.value < r.hi
    GROUP BY r.bucket
    """,
    doc="range join: facts to containing value bucket (broadcast non-equi)",
    survey="custom op (driver list): range join",
)
def range_join_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    ranges = spark.createDataFrame(
        [("small", 0.0, 50.0), ("mid", 50.0, 200.0), ("large", 200.0, 1e9)],
        "bucket string, lo double, hi double",
    )
    joined = range_join(ev, ranges, value_col="value").filter(
        F.col("bucket").isNotNull()
    )
    return joined.groupBy("bucket").agg(
        F.count("*").alias("n"), dsum(F.col("value")).alias("total")
    )


@query(
    "rollup_nation_year_revenue",
    """
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
           CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(28,6))), 2) AS DOUBLE) AS revenue,
           CAST(grouping(n.n_name) AS INT) AS g_nation,
           CAST(grouping(EXTRACT(year FROM o.o_orderdate)) AS INT) AS g_year
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
    GROUP BY ROLLUP(n.n_name, EXTRACT(year FROM o.o_orderdate))
    """,
    doc="ROLLUP with grouping() flags: nation × year → nation → grand total",
    survey="OLAP surface: multi-level aggregation",
)
def rollup_nation_year_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    base = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            "o_totalprice",
        )
    )
    return base.rollup("nation", "o_year").agg(
        dsum(F.col("o_totalprice")).alias("revenue"),
        F.grouping("nation").cast("int").alias("g_nation"),
        F.grouping("o_year").cast("int").alias("g_year"),
    )


@query(
    "pivot_event_counts",
    """
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase
    FROM {EV} GROUP BY user_id
    """,
    doc="pivot: per-user event counts spread across typed columns",
    survey="OLAP surface: pivot",
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id",
        *[F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
          for c in ("click", "view", "purchase")],
    )


@query(
    "event_value_stats",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS median_value,
           round(quantile_cont(value, 0.9), 4) AS p90_value,
           round(sqrt((CAST(sum(CAST(value * value AS DECIMAL(28,6))) AS DOUBLE)
                  - CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                    * CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / count(*))
                 / (count(*) - 1)), 4) AS stddev_value
    FROM {EV} GROUP BY event_type
    """,
    doc="exact interpolated quantiles + decimal-exact sample stddev per key",
    survey="OLAP surface: order statistics (engine-exact across Spark/DuckDB)",
)
def event_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    sum_v = F.sum(F.col("value").cast("decimal(28,6)")).cast("double")
    sum_v2 = F.sum((F.col("value") * F.col("value")).cast("decimal(28,6)")).cast(
        "double"
    )
    n = F.count("*")
    var = (sum_v2 - sum_v * sum_v / n) / (n - 1)
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("median_value"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90_value"),
        F.round(F.sqrt(var), 4).alias("stddev_value"),
    )


@query(
    "cube_status_priority_counts",
    """
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(28,6))), 2) AS DOUBLE) AS revenue,
           CAST(grouping(o_orderstatus) AS INT) AS g_status,
           CAST(grouping(o_orderpriority) AS INT) AS g_priority
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    doc="CUBE with grouping() flags: all 4 grouping sets of status × priority "
    "in one pass (Spark expands to a single Expand+HashAggregate — no "
    "re-reads of the fact table at 100 TB)",
    survey="OLAP surface: grouping sets / cube",
)
def cube_status_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("revenue"),
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
    )


@query(
    "hll_distinct_users_daily",
    # The sketch ESTIMATE itself has no portable oracle (Spark's
    # DataSketches HLL vs DuckDB's own impl give different estimates by
    # design), so the oracle checks the claim instead of the value: the
    # emitted approx_within_5pct boolean — computed from the sketch vs
    # the exact count — must be TRUE for every group, which DuckDB can
    # assert as a constant. Exact/byte-identical columns (exact_users,
    # n_events) hash-match directly.
    """
    SELECT date_trunc('day', ts) AS day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(count(*) AS BIGINT) AS n_events,
           TRUE AS approx_within_5pct
    FROM {EV}
    GROUP BY 1
    """,
    doc="HyperLogLog sketch distinct users per day — the 100 TB path for "
    "COUNT(DISTINCT): mergeable fixed-size sketches instead of a "
    "shuffle of every distinct key; partial-aggregates map-side. The "
    "exact count rides along for the correctness harness only; the "
    "oracle verifies the sketch's 5%-relative-error claim via the "
    "boolean column",
    survey="scale extension: sketch aggregation (A8-style counters at scale)",
)
def hll_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))").alias(
                "_approx"
            ),
            F.count_distinct("user_id").cast("bigint").alias("exact_users"),
            F.count("*").alias("n_events"),
        )
        .select(
            "day",
            "exact_users",
            "n_events",
            (
                F.abs(F.col("_approx") - F.col("exact_users"))
                / F.col("exact_users")
                <= F.lit(0.05)
            ).alias("approx_within_5pct"),
        )
    )

"""TPC-H-shaped relational queries adapted to the driver's star schema.

These widen the validated relational surface beyond the reference's own
instances (SURVEY §2.7): correlated EXISTS (semi join), scalar
subqueries, agg-join-back (argmin per group), outer-join distributions,
conditional aggregation, disjunctive multi-column predicates, and
HAVING. The driver's tables lack partsupp/commitdate/shipmode/phone, so
Q2/Q12/Q21/Q22 keep the *plan shape* with adapted predicates (noted per
query). Decimal-sum discipline and aliasing conventions follow
``queries.py``.

Scale notes (100 TB thinking): every dimension side that is small at
any SF (nation, region, supplier, part, per-group agg results) is
explicitly ``broadcast()``; fact-fact joins shuffle on their equi keys
and rely on AQE for skew; top-K uses TakeOrderedAndProject (no global
sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.relational import top_k
from .queries import davg, dsum, load, query


@query(
    "q2_min_price_supplier",
    """
    WITH minp AS (
      SELECT l_partkey, min(l_extendedprice) AS min_price
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l.l_partkey, p.p_name, min(l.l_suppkey) AS suppkey, m.min_price
    FROM lineitem l
    JOIN minp m ON l.l_partkey = m.l_partkey AND l.l_extendedprice = m.min_price
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size <= 5
    GROUP BY l.l_partkey, p.p_name, m.min_price
    """,
    doc="TPC-H Q2 shape (no partsupp): per-part argmin price via agg-join-back",
    survey="§2.7 min-per-group correlated subquery",
)
def q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    minp = li.groupBy(F.col("l_partkey").alias("mk")).agg(
        F.min("l_extendedprice").alias("min_price")
    )
    return (
        li.join(
            minp,
            (li.l_partkey == F.col("mk")) & (li.l_extendedprice == F.col("min_price")),
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "p_name", "min_price")
        .agg(F.min("l_suppkey").alias("suppkey"))
        .select("l_partkey", "p_name", "suppkey", "min_price")
    )


@query(
    "q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4: correlated EXISTS as semi join with non-equi residual",
    survey="§2.7 semi join; F5",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load(spark, sf_dir, "lineitem")
    matched = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@query(
    "q6_forecast_revenue",
    """
    SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6: tight-filter scan + single agg (pushdown showcase)",
    survey="§2.3 predicates; §4 predicate pushdown",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@query(
    "q7_volume_shipping",
    """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS l_year,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7: nation-pair volume by year (two dim lookups, disjunctive pair filter)",
    survey="§2.7 equi-join chain + grouped sum",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))


@query(
    "q9_product_type_profit",
    """
    SELECT n.n_name AS nation, CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))), 2) AS DOUBLE) AS amount
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    WHERE p.p_type = 'PROMO'
    GROUP BY 1, 2
    """,
    doc="TPC-H Q9 shape (no supplycost): profit by supplier nation × order year",
    survey="§2.7 join chain + multi-key rollup",
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
    ).agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("amount"))


@query(
    "q8_market_share",
    """
    SELECT o_year,
           round(CAST(sum(CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 4) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6)) AS volume,
             sn.n_name AS nation
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
      JOIN region r   ON cn.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
      WHERE r.r_name = 'ASIA' AND p_exists(l.l_partkey)) t
    GROUP BY o_year
    """.replace("AND p_exists(l.l_partkey)", ""),
    doc="TPC-H Q8: market share — nested conditional-sum ratio per year",
    survey="§2.7 multi-join + conditional ratio",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    t = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.cast("decimal(28,6)").alias("volume"),
            "nation",
        )
    )
    zero = F.lit(0).cast("decimal(28,6)")
    return t.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("nation") == "NATION_1", F.col("volume")).otherwise(zero))
            .cast("double")
            / F.sum("volume").cast("double"),
            4,
        ).alias("mkt_share")
    )


@query(
    "q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))), 2) AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 4, 5
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10: returned-item revenue per customer, top-20",
    survey="§2.7 join + group + top-K",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load(spark, sf_dir, "nation")
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )
    return top_k(
        agg.select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name"),
        [F.desc("revenue"), F.asc("c_custkey")],
        20,
    )


@query(
    "q12_priority_by_linestatus",
    """
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_linestatus
    """,
    doc="TPC-H Q12 shape (linestatus for shipmode): conditional aggregation",
    survey="§2.7 grouped conditional count; A6",
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


@query(
    "q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey) t
    GROUP BY c_count
    """,
    doc="TPC-H Q13: outer-join count distribution (null-preserving join predicate)",
    survey="§2.7 outer join + double aggregation",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q14_promo_revenue",
    """
    SELECT round(
             100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))
                    ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
             / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE),
           4) AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
    doc="TPC-H Q14: promo revenue ratio (conditional sum / sum)",
    survey="§2.7 conditional aggregation ratio",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01")
    )
    part = load(spark, sf_dir, "part")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,6)")
    zero = F.lit(0).cast("decimal(28,6)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(zero)).cast(
                    "double"
                )
                / F.sum(disc).cast("double"),
                4,
            ).alias("promo_revenue")
        )
    )


@query(
    "q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))), 2) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
    doc="TPC-H Q15: top supplier via max-of-aggregate scalar subquery",
    survey="§2.7 scalar subquery over derived view",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    supp = load(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    top = rev.agg(F.max("total_revenue").alias("total_revenue"))
    return (
        rev.join(F.broadcast(top), "total_revenue")
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q17_small_quantity_revenue",
    """
    SELECT CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(28,6))) / 7.0, 2) AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (SELECT l_partkey, CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS avg_qty
          FROM lineitem GROUP BY l_partkey) a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND l.l_quantity < 0.2 * a.avg_qty
    """,
    doc="TPC-H Q17: correlated per-part average threshold (agg-join-back)",
    survey="§2.7 correlated scalar subquery",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ak")).agg(
        (F.sum(F.col("l_quantity").cast("decimal(28,6)")).cast("double") / F.count("*")).alias(
            "avg_qty"
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("ak"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(28,6)")) / 7.0, 2)
            .cast("double")
            .alias("avg_yearly")
        )
    )


@query(
    "q18_large_volume_customer",
    """
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(round(sum(CAST(l.l_quantity AS DECIMAL(28,6))), 2) AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
    GROUP BY 1, 2, 3, 4, 5
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18: HAVING-filtered IN subquery (semi join) + top-100",
    survey="§2.7 semi join + HAVING + top-K",
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_sq"))
        .filter(F.col("_sq") > 300)
        .select("l_orderkey")
    )
    agg = (
        orders.join(
            big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi"
        )
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"))
    )
    return top_k(agg, [F.desc("o_totalprice"), F.asc("o_orderkey")], 100)


@query(
    "q19_discounted_revenue",
    """
    SELECT CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))), 2) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19: disjunctive multi-table predicate triplets",
    survey="§2.3 compound predicates over join",
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    b = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & (F.col("p_size").between(1, smax))
        & (F.col("l_quantity").between(qlo, qhi))
    )
    return j.filter(
        b("Brand#1", 15, 1, 11) | b("Brand#2", 25, 10, 20) | b("Brand#3", 35, 20, 30)
    ).agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))


@query(
    "q20_parts_with_surplus",
    """
    SELECT s.s_suppkey, s.s_name FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_type = 'SMALL'
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING sum(l_quantity) > 100)
    """,
    doc="TPC-H Q20 shape: suppliers of SMALL parts with surplus volume (nested semi join)",
    survey="§2.7 semi join over HAVING aggregate",
)
def q20_parts_with_surplus(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    surplus = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("_sq"))
        .filter(F.col("_sq") > 100)
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    return supp.join(F.broadcast(surplus), "s_suppkey", "left_semi").select(
        "s_suppkey", "s_name"
    )


@query(
    "q11_important_stock",
    """
    WITH pv AS (
      SELECT l.l_partkey,
             CAST(round(sum(CAST(l.l_extendedprice * l.l_quantity AS DECIMAL(28,6))), 2) AS DOUBLE) AS part_value
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_1'
      GROUP BY l.l_partkey)
    SELECT l_partkey, part_value FROM pv
    WHERE part_value >
      (SELECT CAST(sum(CAST(part_value AS DECIMAL(28,6))) AS DOUBLE) * 0.001 FROM pv)
    """,
    doc="TPC-H Q11 shape (lineitem value for partsupp): per-part value above a "
    "fraction-of-total scalar-subquery threshold",
    survey="§2.7 grouped sum + scalar subquery threshold",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    pv = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("l_partkey")
        .agg(dsum(F.col("l_extendedprice") * F.col("l_quantity")).alias("part_value"))
    )
    # pv is reused by both the threshold scalar and the filter; its agg is
    # cheap but upstream joins aren't — cache would help iteratively, but a
    # single-action plan lets Spark reuse the shuffle output of the agg.
    # Threshold accumulates as decimal(28,6) (order-independent sum) so a
    # boundary part can't flip between engines on float association.
    thresh = pv.agg(
        (F.sum(F.col("part_value").cast("decimal(28,6)")).cast("double") * 0.001).alias("_t")
    )
    return (
        pv.crossJoin(F.broadcast(thresh))
        .filter(F.col("part_value") > F.col("_t"))
        .select("l_partkey", "part_value")
    )


@query(
    "q16_supplier_part_counts",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND NOT EXISTS (SELECT 1 FROM supplier s
                      WHERE s.s_suppkey = l.l_suppkey AND s.s_acctbal < 0.0)
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q16 shape (lineitem as part-supplier bridge; negative-balance "
    "suppliers for complaints): distinct-supplier counts with NOT IN anti join",
    survey="§2.7 anti join + count distinct",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").startswith("PROMO"))
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    bad_supp = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(F.broadcast(bad_supp), "l_suppkey", "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q21_suppliers_kept_waiting",
    """
    WITH po AS (
      SELECT l_orderkey, max(l_shipdate) AS max_ship,
             count(DISTINCT l_suppkey) AS n_supp
      FROM lineitem GROUP BY l_orderkey),
    late AS (
      SELECT l.l_orderkey, l.l_suppkey, po.n_supp
      FROM lineitem l JOIN po ON l.l_orderkey = po.l_orderkey
      WHERE l.l_shipdate = po.max_ship
      GROUP BY 1, 2, 3),
    sole AS (
      SELECT l_orderkey, min(l_suppkey) AS l_suppkey, min(n_supp) AS n_supp
      FROM late GROUP BY l_orderkey HAVING count(*) = 1)
    SELECT s.s_name, count(*) AS numwait
    FROM sole
    JOIN orders o   ON sole.l_orderkey = o.o_orderkey AND o.o_orderstatus = 'F'
    JOIN supplier s ON sole.l_suppkey = s.s_suppkey
    WHERE sole.n_supp > 1
    GROUP BY s.s_name
    """,
    doc="TPC-H Q21 shape (shipdate for commit/receipt lag): the sole last-to-ship "
    "supplier on multi-supplier finished orders — EXISTS/NOT-EXISTS self-joins "
    "expressed as window-free aggregate-join-back",
    survey="§2.7 double self-join (exists + not-exists) + grouped count",
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = load(spark, sf_dir, "supplier")
    po = li.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("max_ship"),
        F.countDistinct("l_suppkey").alias("n_supp"),
    )
    late = (
        li.join(po, "l_orderkey")
        .filter(F.col("l_shipdate") == F.col("max_ship"))
        .select("l_orderkey", "l_suppkey", "n_supp")
        .distinct()
    )
    sole = (
        late.groupBy("l_orderkey")
        .agg(
            F.min("l_suppkey").alias("l_suppkey"),
            F.min("n_supp").alias("n_supp"),
            F.count("*").alias("_n_late"),
        )
        .filter((F.col("_n_late") == 1) & (F.col("n_supp") > 1))
    )
    return (
        sole.join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey"
        )
        .join(F.broadcast(supp), sole.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@query(
    "q22_idle_customers",
    """
    WITH pos AS (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS avg_bal
                 FROM customer WHERE c_acctbal > 0.0)
    SELECT substr(c.c_name, 10, 4) AS code,
           count(*) AS numcust,
           CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(28,6))), 2) AS DOUBLE) AS totacctbal
    FROM customer c, pos
    WHERE c.c_acctbal > pos.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY 1
    """,
    doc="TPC-H Q22 shape (name prefix for phone code): scalar avg subquery + anti join",
    survey="§2.7 anti join + scalar subquery; R8",
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(28,6)")).cast("double") / F.count("*")).alias(
            "avg_bal"
        )
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    idle = rich.join(
        orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
            F.col("o_custkey").alias("c_custkey")
        ),
        "c_custkey",
        "left_anti",
    )
    return idle.groupBy(F.substring("c_name", 10, 4).alias("code")).agg(
        F.count("*").alias("numcust"),
        dsum(F.col("c_acctbal")).alias("totacctbal"),
    )

"""Bucketed co-located join: both sides bucketed by the join key →
the join plan has NO shuffle Exchange (the 100 TB fact-fact join path)."""

from pyspark.sql import functions as F

from openmsistream_spark.operators.bucketing import cobucketed_join, write_bucketed

SF = "/root/testdata/sf0.001"


def test_cobucketed_join_has_no_shuffle(spark, tmp_path):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice", "o_orderdate"
    )
    write_bucketed(li, "li_b", str(tmp_path / "li_b"), ["l_orderkey"], n_buckets=8)
    write_bucketed(orders, "ord_b", str(tmp_path / "ord_b"), ["l_orderkey"], n_buckets=8)
    try:
        # disable broadcast so the join exercises the SMJ path it would
        # take when both sides are large
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = cobucketed_join(spark, "li_b", "ord_b", on=["l_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle on either side
        # correctness unchanged
        expected = li.join(orders, "l_orderkey").count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")

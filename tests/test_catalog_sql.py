"""SQL surface: registered temp views drive the engine through
spark.sql with plans identical to the DataFrame API."""

from openmsistream_spark.catalog import register_tables

SF = "/root/testdata/sf0.001"


def test_sql_surface(spark):
    names = register_tables(spark, SF)
    assert "lineitem" in names
    out = spark.sql(
        """
        SELECT l_returnflag, count(*) AS n
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag
        """
    ).collect()
    assert {r.l_returnflag for r in out} == {"A", "N", "R"}
    # join across registered views
    top = spark.sql(
        """
        SELECT c_mktsegment, count(*) AS n
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY n DESC LIMIT 1
        """
    ).collect()
    assert top[0].n > 0

"""Driver-contract tests: entry() smoke + full oracle parity sweep at
sf0.001 (the driver's own gate runs the same comparison at sf0.01 —
tests/oracle_check.py runs either on demand)."""

import subprocess
import sys

import pytest


def test_entry_returns_rows(spark):
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert df.columns  # stable schema


def test_every_query_has_callable_and_oracle_alignment():
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert qs, "no queries registered"
    assert set(oracles) <= set(qs)


@pytest.mark.slow
def test_oracle_parity_sf0001():
    out = subprocess.run(
        [sys.executable, "tests/oracle_check.py", "--sf", "/root/testdata/sf0.001"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        env={"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", "")},
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-2000:]


def test_hll_sketch_within_5pct_of_exact(spark):
    from openmsistream_spark.queries import QUERIES, load

    df = QUERIES["hll_distinct_users_daily"].fn(spark, "/root/testdata/sf0.01")
    rows = {r["day"]: r["approx_users"] for r in df.collect()}
    assert rows, "no days produced"
    ev = load(spark, "/root/testdata/sf0.01", "events")
    from pyspark.sql import functions as F

    exact = {
        r["day"]: r["n"]
        for r in ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for day, est in rows.items():
        assert abs(est - exact[day]) / exact[day] < 0.05, (day, est, exact[day])


def test_cube_grouping_sets_complete(spark):
    from openmsistream_spark.queries import QUERIES

    df = QUERIES["cube_status_priority_counts"].fn(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    sets = {(r["g_status"], r["g_priority"]) for r in rows}
    assert sets == {(0, 0), (0, 1), (1, 0), (1, 1)}
    grand = [r for r in rows if r["g_status"] == 1 and r["g_priority"] == 1]
    assert len(grand) == 1 and grand[0]["n_orders"] > 0

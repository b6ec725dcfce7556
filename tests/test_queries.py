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

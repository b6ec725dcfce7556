#!/usr/bin/env python
"""Self-check harness mirroring the driver's t2 gate: run every
``queries()`` entry on Spark AND its ``oracle_sql()`` on DuckDB over the
same parquet, then compare row count, column names, and sorted values.

Usage: PYTHONPATH=/root/repo python tests/oracle_check.py [--sf DIR] [name ...]
"""

from __future__ import annotations

import argparse
import math
import sys

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(df):
    """Sort columns by name, then rows by all columns; stringify values."""
    df = df[sorted(df.columns)].copy()

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return str(int(v))
            return repr(v)
        if isinstance(v, bool):
            return str(bool(v))
        if hasattr(v, "isoformat"):
            return v.isoformat()
        return str(v)

    try:
        import pandas as pd  # noqa

        rows = [tuple(norm(v) for v in row) for row in df.itertuples(index=False)]
    except Exception:
        rows = []
    return sorted(rows), list(df.columns)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from openmsistream_spark.session import get_spark

    spark = get_spark(app_name="oracle_check", shuffle_partitions=16)
    con = duck_con(args.sf)

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = args.names or list(qs)
    n_pass = n_fail = 0
    for name in names:
        try:
            sdf = qs[name](spark, args.sf).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark error: {str(exc)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only): {len(sdf)} rows")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {str(exc)[:300]}")
            n_fail += 1
            continue
        s_rows, s_cols = canon(sdf)
        o_rows, o_cols = canon(odf)
        if s_cols != o_cols:
            print(f"FAIL {name}: columns spark={s_cols} oracle={o_cols}")
            n_fail += 1
            continue
        if len(s_rows) != len(o_rows):
            print(f"FAIL {name}: rowcount spark={len(s_rows)} oracle={len(o_rows)}")
            n_fail += 1
            continue
        if s_rows != o_rows:
            diff = [
                (a, b) for a, b in zip(s_rows, o_rows) if a != b
            ][:3]
            print(f"FAIL {name}: {len([1 for a, b in zip(s_rows, o_rows) if a != b])} "
                  f"value mismatches of {len(s_rows)} rows; first: {diff}")
            n_fail += 1
            continue
        print(f"PASS {name}: {len(s_rows)} rows, {len(s_cols)} cols")
        n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed, {len(names)} total")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

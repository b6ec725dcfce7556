#!/usr/bin/env python
"""Measure the sharded bloom path at a given (m_bits, n_shards) design
point — build wall, probe wall, and the balls-in-bins worst-task shard
count the SCALING.md sizing guidance promises. Round-12 purpose: close
the regime table's extrapolation gap at the stated 100 TB design point
(m=2^36, 1024 shards → 8 MiB per-shard masks).

Usage:
  PYTHONPATH=/root/repo python tools/measure_bloom_sharded.py \
      [--m-bits-log 36] [--n-shards 1024] [--n-keys 1000000] [--k 7]

Keys are synthetic md5 hex (spark.range → md5), 1M build / 1M probe by
default — the same load as the round-11 regime rows, so numbers are
comparable. Results append to STRESS_BLOOM.json.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import openmsistream_spark as oms  # noqa: E402
from openmsistream_spark.llm.bloom_sharded import (  # noqa: E402
    bloom_build_sharded,
    bloom_mark_sharded,
    shard_col,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--m-bits-log", type=int, default=36)
    ap.add_argument("--n-shards", type=int, default=1024)
    ap.add_argument("--n-keys", type=int, default=1_000_000)
    ap.add_argument("--k", type=int, default=7)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "STRESS_BLOOM.json"))
    args = ap.parse_args()
    m_bits = 1 << args.m_bits_log

    spark = oms.get_spark(app_name="measure-bloom-sharded")
    n = args.n_keys
    build_keys = spark.range(n).select(F.md5(F.col("id").cast("string")).alias("key"))
    # probe half overlaps the build set, half is disjoint — both branches
    # of the membership answer get exercised
    probe_keys = spark.range(n // 2, n + n // 2).select(
        F.md5(F.col("id").cast("string")).alias("key")
    )

    # balls-in-bins: after the build's repartition(n_shards, shard), how
    # many DISTINCT shards does the worst task hold? (This multiplies
    # the per-task mask footprint; the docs promise ~O(ln n / ln ln n).)
    per_task = (
        build_keys.select(shard_col(F.col("key"), args.n_shards).alias("shard"))
        .repartition(args.n_shards, F.col("shard"))
        .select(F.spark_partition_id().alias("pid"), "shard")
        .groupBy("pid")
        .agg(F.countDistinct("shard").alias("n_shards_in_task"))
        .agg(F.max("n_shards_in_task").alias("worst"),
             F.avg("n_shards_in_task").alias("avg"))
        .first()
    )

    t0 = time.monotonic()
    masks = bloom_build_sharded(
        build_keys, "key", m_bits=m_bits, k=args.k, n_shards=args.n_shards
    )
    n_mask_rows = masks.count()  # materializes the build
    build_s = time.monotonic() - t0

    # persist the mask table the way a real pipeline would, then probe
    # from the persisted copy (probe cost must not re-pay the build)
    masks = masks.persist()
    masks.count()
    t0 = time.monotonic()
    marked = bloom_mark_sharded(
        probe_keys, "key", masks, m_bits=m_bits, k=args.k, n_shards=args.n_shards
    )
    agg = marked.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("maybe_seen"), 1).otherwise(0)).alias("n_seen"),
    ).first()
    probe_s = time.monotonic() - t0

    row = {
        "m_bits_log2": args.m_bits_log,
        "n_shards": args.n_shards,
        "k": args.k,
        "n_build_keys": n,
        "n_probe_keys": agg["n"],
        "shard_mask_mib": (m_bits // args.n_shards) / 8 / 2**20,
        "total_mask_gib": m_bits / 8 / 2**30,
        "n_mask_rows": n_mask_rows,
        "build_sec": round(build_s, 2),
        "probe_sec": round(probe_s, 2),
        "probe_seen": int(agg["n_seen"]),
        "expect_seen_at_least": n // 2,  # true members, no false negatives
        "worst_task_shards": int(per_task["worst"]),
        "avg_task_shards": round(float(per_task["avg"]), 2),
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", ""),
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
    }
    print(json.dumps(row))
    hist = []
    if os.path.exists(args.out):
        try:
            hist = json.load(open(args.out))
        except Exception:
            hist = []
    hist.append(row)
    with open(args.out, "w") as f:
        json.dump(hist, f, indent=1)
        f.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()

"""HyperLogLog + Count-Min sketches (operators/sketches.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from openmsistream_spark.operators.sketches import (
    cms_counters,
    cms_lookup,
    hll_alpha_micro,
    hll_distinct,
    hll_registers,
)


def _h52(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:13], 16)


def _py_registers(keys, p):
    vbits = 52 - p
    regs: dict[int, int] = {}
    for k in keys:
        h = _h52(k)
        b, w = h >> vbits, h & ((1 << vbits) - 1)
        rho = vbits + 1 if w == 0 else vbits + 1 - w.bit_length()
        regs[b] = max(regs.get(b, 0), rho)
    return regs


def _py_est_e2(regs, p):
    vbits = 52 - p
    m = 1 << p
    s = sum(1 << (vbits + 1 - r) for r in regs.values()) + (m - len(regs)) * (
        1 << (vbits + 1)
    )
    a_num = hll_alpha_micro(p) * m * m * (1 << (vbits + 1)) * 100
    num, den = 2 * a_num + s * 1_000_000, 2 * s * 1_000_000
    return num // den


def test_hll_registers_match_literal_python(spark):
    keys = [f"user-{i}" for i in range(500)] * 3  # duplicates: no-ops
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        r["bucket"]: r["r"]
        for r in hll_registers(df, "k", p=10).collect()
    }
    assert got == _py_registers(keys, p=10)


def test_hll_estimate_exact_fixed_point_and_accuracy(spark):
    import math

    n = 5000
    df = spark.createDataFrame([(f"u{i}",) for i in range(n)], "k string")
    row = hll_distinct(df, "k", p=12).collect()[0]
    regs = _py_registers([f"u{i}" for i in range(n)], 12)
    assert row["est_e2"] == _py_est_e2(regs, 12)
    # n ~ 1.2m is the small-range regime: linear counting must kick in
    m, v = 4096, 4096 - len(regs)
    assert row["est_e2"] <= 250 * m and v > 0
    assert row["estimate"] == pytest.approx(m * math.log(m / v), abs=1e-3)
    assert abs(row["estimate"] - n) / n < 0.03


def test_hll_large_range_uses_raw_estimator(spark):
    n = 60000  # >> 2.5m for p=8 (m=256): raw harmonic-mean arm
    df = spark.createDataFrame([(f"u{i}",) for i in range(n)], "k string")
    row = hll_distinct(df, "k", p=8).collect()[0]
    assert row["est_e2"] > 250 * 256
    assert row["estimate"] == pytest.approx(row["est_e2"] / 100.0, abs=1e-3)
    # raw HLL within ~3 sigma (1.04/sqrt(256) ~ 6.5%) of truth
    assert abs(row["estimate"] - n) / n < 0.20


def test_hll_merge_and_partition_invariance(spark):
    rows = [(f"k{i % 700}",) for i in range(2000)]
    a = spark.createDataFrame(rows, "k string")
    one = {
        (r["bucket"]): r["r"]
        for r in hll_registers(a.repartition(1), "k", p=8).collect()
    }
    many = {
        (r["bucket"]): r["r"]
        for r in hll_registers(a.repartition(13), "k", p=8).collect()
    }
    assert one == many
    # register-level merge of two halves == registers of the union
    h1 = spark.createDataFrame(rows[:1000], "k string")
    h2 = spark.createDataFrame(rows[1000:], "k string")
    merged = (
        hll_registers(h1, "k", p=8)
        .unionByName(hll_registers(h2, "k", p=8))
        .groupBy("bucket")
        .agg(F.max("r").alias("r"))
    )
    got = {r["bucket"]: r["r"] for r in merged.collect()}
    assert got == one


def _py_cms(tokens, d, w):
    cnt: dict[tuple[int, int], int] = {}
    for t in tokens:
        for i in range(d):
            p = int(hashlib.md5(f"{t}#{i}".encode()).hexdigest()[:15], 16) % w
            cnt[(i, p)] = cnt.get((i, p), 0) + 1
    return cnt


def test_cms_counters_match_literal_python(spark):
    toks = [f"t{i % 37}" for i in range(400)]
    df = spark.createDataFrame([(t,) for t in toks], "token string")
    got = {
        (r["i"], r["pos"]): r["cnt"]
        for r in cms_counters(df, "token", d=3, w=64).collect()
    }
    assert got == _py_cms(toks, d=3, w=64)


def test_cms_overestimates_never_underestimate(spark):
    toks = [f"t{i % 211}" for i in range(3000)]
    df = spark.createDataFrame([(t,) for t in toks], "token string")
    counters = cms_counters(df, "token", d=4, w=128)
    exact = df.groupBy("token").agg(F.count("*").cast("long").alias("exact_cnt"))
    est = cms_lookup(counters, exact, "token", d=4, w=128).collect()
    assert len(est) == 211
    assert all(r["cms_cnt"] >= r["exact_cnt"] for r in est)
    # a 128-wide sketch over 211 keys collides, so SOME overestimate
    # exists — the deterministic-overestimate semantics, not a bug
    assert any(r["cms_cnt"] > r["exact_cnt"] for r in est)


def test_cms_weighted(spark):
    rows = [("a", 5), ("b", 7), ("a", 1)]
    df = spark.createDataFrame(rows, "token string, wt long")
    counters = cms_counters(df, "token", d=2, w=32, weight_col="wt")
    probes = spark.createDataFrame([("a",), ("b",)], "token string")
    got = {
        r["token"]: r["cms_cnt"]
        for r in cms_lookup(counters, probes, "token", d=2, w=32).collect()
    }
    assert got["a"] >= 6 and got["b"] >= 7


def test_hll_empty_input_gives_zero_estimate(spark):
    df = spark.createDataFrame([], "k string")
    row = hll_distinct(df, "k", p=8).collect()[0]
    # all registers empty -> linear counting arm with V=m -> m*ln(1)=0
    assert row["n_registers"] == 0
    assert row["estimate"] == 0.0


def test_hll_union_intersection_inclusion_exclusion(spark):
    from openmsistream_spark.operators.sketches import hll_union_intersection

    # A = 0..5999, B = 4000..9999 -> |A|=6000 |B|=6000 |A∪B|=10000 |A∩B|=2000
    a = spark.createDataFrame([(f"u{i}",) for i in range(6000)], "k string")
    b = spark.createDataFrame([(f"u{i}",) for i in range(4000, 10000)], "k string")
    row = hll_union_intersection(
        hll_registers(a, "k", p=12), hll_registers(b, "k", p=12), p=12
    ).collect()[0]
    assert abs(row["est_a"] - 6000) / 6000 < 0.05
    assert abs(row["est_b"] - 6000) / 6000 < 0.05
    assert abs(row["est_union"] - 10000) / 10000 < 0.05
    # inclusion-exclusion compounds the three errors; allow a wide band
    assert abs(row["est_intersection"] - 2000) / 2000 < 0.25
    # disjoint sets: intersection clamps to >= 0
    c = spark.createDataFrame([(f"v{i}",) for i in range(500)], "k string")
    row2 = hll_union_intersection(
        hll_registers(a, "k", p=12), hll_registers(c, "k", p=12), p=12
    ).collect()[0]
    assert row2["est_intersection"] < 0.1 * 6000


def test_hll_union_intersection_rejects_mismatched_p(spark):
    """Round-11 guard: register tables from a different p have an
    incompatible bucket space — max-merging them silently produces
    nonsense, so out-of-range buckets must raise at execution time."""
    import pytest

    from openmsistream_spark.operators.sketches import hll_union_intersection

    a = spark.createDataFrame([(f"u{i}",) for i in range(2000)], "k string")
    regs_p12 = hll_registers(a, "k", p=12)  # buckets in [0, 4096)
    regs_p8 = hll_registers(a, "k", p=8)  # buckets in [0, 256)
    # p=12 registers fed into a p=8 merge: buckets >= 256 out of range
    with pytest.raises(Exception, match="out of range"):
        hll_union_intersection(regs_p12, regs_p8, p=8).collect()
    # matched tables still estimate fine through the guard
    row = hll_union_intersection(regs_p12, regs_p12, p=12).collect()[0]
    assert abs(row["est_union"] - 2000) / 2000 < 0.05

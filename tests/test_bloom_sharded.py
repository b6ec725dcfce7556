"""Sharded bloom masks (round-11): correctness vs a Python reference,
the no-false-negative guarantee, parameter-mismatch guards, sizing
helper, and the measured big-m broadcast feasibility point the verdict
asked for (m=2^27)."""

import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from openmsistream_spark.llm.bloom import (
    BloomFilter,
    bloom_build,
    bloom_mark,
    positions,
)
from openmsistream_spark.llm.bloom_sharded import (
    bloom_build_sharded,
    bloom_mark_sharded,
    bloom_sizing,
    shard_col,
)

M, K, S = 1 << 16, 4, 8  # 8 shards of 8192 bits


def _ref_shard(key: str, n_shards: int) -> int:
    import hashlib

    return int(hashlib.md5(f"{key}#shard".encode()).hexdigest()[:15], 16) % n_shards


def test_build_matches_python_reference(spark):
    keys = [f"gram{i}" for i in range(200)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    masks = {r["shard"]: bytes(r["mask"]) for r in bloom_build_sharded(df, "k", M, K, S).collect()}
    shard_bits = M // S
    want = {s: np.zeros(shard_bits // 8, dtype=np.uint8) for s in range(S)}
    for key in keys:
        s = _ref_shard(key, S)
        for p in positions(key, K, shard_bits):
            want[s][p >> 3] |= 1 << (p & 7)
    for s, mask in masks.items():
        assert mask == want[s].tobytes(), s
    # shards with no keys emit no row
    assert set(masks) == {s for s in range(S) if want[s].any()}


def test_mark_no_false_negatives_and_sane_fp(spark):
    build_keys = [f"seen{i}" for i in range(500)]
    probe_only = [f"fresh{i}" for i in range(500)]
    build = spark.createDataFrame([(k,) for k in build_keys], "k string")
    masks = bloom_build_sharded(build, "k", M, K, S)
    probes = spark.createDataFrame(
        [(k,) for k in build_keys + probe_only] + [(None,)], "k string"
    )
    got = {
        r["k"]: r["maybe_seen"]
        for r in bloom_mark_sharded(probes, "k", masks, M, K, S).collect()
    }
    assert all(got[k] for k in build_keys)  # bloom guarantee
    fp = sum(got[k] for k in probe_only)
    assert fp / len(probe_only) < 0.05  # 2000 bits/500 keys/shard-split
    assert got[None] is False or got[None] == False  # noqa: E712


def test_sharded_equals_monolithic_statistics(spark):
    """Same total m_bits, same k: the sharded filter's verdicts on the
    build set are identical (all true) and the fp statistics land in
    the same band as the monolithic broadcast filter."""
    build_keys = [f"b{i}" for i in range(400)]
    fresh = [f"f{i}" for i in range(2000)]
    build = spark.createDataFrame([(k,) for k in build_keys], "k string")
    probes = spark.createDataFrame([(k,) for k in fresh], "k string")
    mono = bloom_build(build, "k", M, K)
    mono_fp = sum(
        r["maybe_seen"] for r in bloom_mark(probes, "k", mono).collect()
    )
    masks = bloom_build_sharded(build, "k", M, K, S)
    shard_fp = sum(
        r["maybe_seen"]
        for r in bloom_mark_sharded(probes, "k", masks, M, K, S).collect()
    )
    # both are ~fill^k with the same bits-per-key; at these sizes that is
    # < 1% — allow generous slack, the point is same ORDER
    assert mono_fp / len(fresh) < 0.02
    assert shard_fp / len(fresh) < 0.02


def test_geometry_and_mismatch_guards(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="not divisible"):
        bloom_build_sharded(df, "k", 1 << 16, 4, 7)
    masks = bloom_build_sharded(df, "k", M, K, S)
    # probing with a different geometry must fail by name, not alias
    with pytest.raises(Exception, match="mask of|out of range"):
        bloom_mark_sharded(df, "k", masks, M, K, S // 2).collect()


def test_bloom_sizing_formula():
    m, k = bloom_sizing(1_000_000, 0.01)
    assert 9_500_000 < m < 9_700_000  # -n ln(.01)/ln(2)^2 ~= 9.59e6
    assert k == 7
    with pytest.raises(ValueError):
        bloom_sizing(0, 0.01)
    with pytest.raises(ValueError):
        bloom_sizing(10, 1.5)


def test_shard_col_is_uniform_enough(spark):
    df = spark.range(4000).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
    counts = [
        r["cnt"]
        for r in df.select(shard_col(F.col("k"), 8).alias("s"))
        .groupBy("s")
        .agg(F.count("*").alias("cnt"))
        .collect()
    ]
    assert len(counts) == 8
    assert max(counts) < 2 * min(counts)


def test_broadcast_path_feasible_at_m_2_27(spark):
    """The verdict's measured point: the MONOLITHIC broadcast path at
    m=2^27 (16 MiB mask). Build (treeReduce fold) and probe (broadcast +
    Arrow bit-test) must complete in seconds — the numbers land in
    SCALING.md. This is the regime boundary: past ~2^30 the sharded
    path takes over."""
    m = 1 << 27
    build = spark.range(20_000).select(
        F.concat(F.lit("doc"), F.col("id")).alias("k")
    )
    t0 = time.perf_counter()
    bf = bloom_build(build, "k", m_bits=m, k=4)
    t_build = time.perf_counter() - t0
    assert isinstance(bf, BloomFilter) and len(bf.mask) == m // 8
    probes = spark.range(20_000).select(
        F.concat(F.lit("probe"), F.col("id")).alias("k")
    )
    t0 = time.perf_counter()
    n_hit = (
        bloom_mark(probes, "k", bf)
        .agg(F.sum(F.col("maybe_seen").cast("int")).alias("h"))
        .collect()[0]["h"]
    )
    t_probe = time.perf_counter() - t0
    assert n_hit == 0  # 20k keys in 2^27 bits: fill ~6e-4, fp^4 ~ 1e-13
    # generous ceilings — this is a feasibility gate, not a race
    assert t_build < 60, t_build
    assert t_probe < 60, t_probe
    print(f"m=2^27 build {t_build:.2f}s probe {t_probe:.2f}s")


def test_mask_table_persists_and_reloads(spark, tmp_path):
    """The advertised workflow: build once, persist the (shard, mask)
    table as parquet, reload in a later session/run and probe — the
    reloaded masks must give bit-identical verdicts (and the binary
    column must survive the parquet round trip intact)."""
    build_keys = [f"seen{i}" for i in range(300)]
    build = spark.createDataFrame([(k,) for k in build_keys], "k string")
    path = str(tmp_path / "masks")
    bloom_build_sharded(build, "k", M, K, S).write.parquet(path)
    reloaded = spark.read.parquet(path)
    probes = spark.createDataFrame(
        [(k,) for k in build_keys + [f"new{i}" for i in range(300)]], "k string"
    )
    direct = {
        r["k"]: r["maybe_seen"]
        for r in bloom_mark_sharded(
            probes, "k", bloom_build_sharded(build, "k", M, K, S), M, K, S
        ).collect()
    }
    from_disk = {
        r["k"]: r["maybe_seen"]
        for r in bloom_mark_sharded(probes, "k", reloaded, M, K, S).collect()
    }
    assert from_disk == direct
    assert all(from_disk[k] for k in build_keys)

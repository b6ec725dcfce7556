"""Weighted sampling without replacement: exact-key parity with a
driver-side reference, weight sensitivity, and determinism."""

import hashlib
import math

from pyspark.sql import functions as F

from openmsistream_spark.llm.sampling import weighted_sample_wor


def _ref_keys(rows, id_to_w):
    out = {}
    for i in rows:
        u = (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) + 0.5) / 2**32
        out[i] = round(-math.log(u) / id_to_w[i], 6)
    return out


def test_keys_match_reference_and_selection(spark):
    rows = [(i, float(w)) for i, w in [(1, 5.0), (2, 1.0), (3, 3.0), (4, 2.0), (5, 4.0)]]
    sdf = spark.createDataFrame(rows, "doc_id long, w double")
    got = weighted_sample_wor(sdf, k=3, weight_col="w").collect()
    keys = _ref_keys([r[0] for r in rows], dict(rows))
    want = sorted(keys.items(), key=lambda kv: (kv[1], kv[0]))[:3]
    assert [(r.doc_id, r.sample_key) for r in got] == want


def test_higher_weight_is_likelier(spark):
    """Statistical sanity over disjoint id blocks: items with 10x the
    weight must dominate the sample (deterministic — one fixed draw
    over many ids stands in for repeated random draws)."""
    rows = [(i, 10.0 if i < 500 else 1.0) for i in range(1000)]
    sdf = spark.createDataFrame(rows, "doc_id long, w double")
    picked = {r.doc_id for r in weighted_sample_wor(sdf, k=100, weight_col="w").collect()}
    heavy = sum(1 for i in picked if i < 500)
    assert heavy > 75  # E[heavy] ~ 91 under ES; 75 is a loose floor


def test_same_sample_on_any_partitioning(spark):
    rows = [(i, 1.0 + (i % 7)) for i in range(200)]
    sdf = spark.createDataFrame(rows, "doc_id long, w double")
    a = {r.doc_id for r in weighted_sample_wor(sdf, k=20, weight_col="w").collect()}
    b = {
        r.doc_id
        for r in weighted_sample_wor(
            sdf.repartition(13), k=20, weight_col="w"
        ).collect()
    }
    assert a == b


def test_take_ordered_plan(spark):
    rows = [(i, 1.0) for i in range(50)]
    sdf = spark.createDataFrame(rows, "doc_id long, w double")
    plan = (
        weighted_sample_wor(sdf, k=5, weight_col="w")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan


# --- property-based parity ------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_weights = st.lists(
    st.floats(min_value=0.1, max_value=50.0, allow_nan=False),
    min_size=1,
    max_size=20,
)


@given(ws=_weights, k=st.integers(min_value=1, max_value=10))
@settings(max_examples=20, deadline=None)
def test_wor_property_matches_reference(spark, ws, k):
    rows = [(i, float(w)) for i, w in enumerate(ws)]
    sdf = spark.createDataFrame(rows, "doc_id long, w double")
    got = [
        (r.doc_id, r.sample_key)
        for r in weighted_sample_wor(sdf, k=k, weight_col="w").collect()
    ]
    keys = _ref_keys([i for i, _ in rows], dict(rows))
    want = sorted(keys.items(), key=lambda kv: (kv[1], kv[0]))[:k]
    assert got == want


# ------------------------------------------------- seeded shuffle


def test_shuffle_assignment_is_deterministic_permutation(spark):
    from openmsistream_spark.llm.shuffle import shuffle_assignment

    docs = spark.range(500).withColumnRenamed("id", "doc_id")
    a = shuffle_assignment(docs, n_shards=8, salt="s1")
    rows = a.collect()
    # a permutation: every doc exactly once, positions contiguous 1..n
    # within each shard
    assert len(rows) == 500 and len({r.doc_id for r in rows}) == 500
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(8))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # deterministic across re-evaluation and plan-independent
    again = {(r.doc_id, r.shard, r.pos) for r in
             shuffle_assignment(docs.repartition(13), n_shards=8, salt="s1").collect()}
    assert {(r.doc_id, r.shard, r.pos) for r in rows} == again
    # a different salt is a genuinely different permutation
    other = {(r.doc_id, r.shard, r.pos) for r in
             shuffle_assignment(docs, n_shards=8, salt="s2").collect()}
    assert other != {(r.doc_id, r.shard, r.pos) for r in rows}


def test_shuffle_assignment_rejects_reserved_columns(spark):
    import pytest

    from openmsistream_spark.llm.shuffle import shuffle_assignment

    docs = spark.range(5).select(
        F.col("id").alias("doc_id"), F.lit(1).alias("shard")
    )
    with pytest.raises(ValueError, match="collide"):
        shuffle_assignment(docs, keep_cols=["shard"])


def test_write_shuffled_shards_stable_layout(spark, tmp_path):
    """Byte-stable writer: one file per shard, rows in position order,
    and a re-run reproduces the identical bytes (the trainer-resume
    guarantee)."""
    import glob
    import hashlib

    from openmsistream_spark.llm.shuffle import write_shuffled_shards

    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id").cast("string")).alias("text"),
    )
    out = str(tmp_path / "shards")

    def digest():
        parts = sorted(glob.glob(f"{out}/shard=*/part-*.parquet"))
        h = hashlib.sha256()
        for p in parts:
            h.update(p.split("/")[-2].encode())  # shard dir
            h.update(open(p, "rb").read())
        return len(parts), h.hexdigest()

    manifest1 = write_shuffled_shards(docs, out, n_shards=8, salt="epoch0")
    m1 = {(r.doc_id, r.shard, r.pos) for r in manifest1.collect()}
    n_files1, d1 = digest()
    assert n_files1 == 8  # one file per shard (single-task shards)
    # read-back: within a shard the storage order IS position order
    for s in range(8):
        rows = spark.read.parquet(f"{out}/shard={s}").collect()
        assert [r.pos for r in rows] == sorted(r.pos for r in rows)
    # re-run converges byte-identically
    manifest2 = write_shuffled_shards(docs, out, n_shards=8, salt="epoch0")
    assert {(r.doc_id, r.shard, r.pos) for r in manifest2.collect()} == m1
    n_files2, d2 = digest()
    assert (n_files1, d1) == (n_files2, d2)

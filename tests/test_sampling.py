"""Weighted sampling without replacement: exact-key parity with a
driver-side reference, weight sensitivity, and determinism."""

import hashlib
import math

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

"""Property-based tests (hypothesis) for the subtle-correctness spots
SURVEY §7 flags: the msgpack wire codec (byte-for-byte compat with real
msgpack across arbitrary field values) and the A2 generation-adoption
rule (streaming fold ≡ batch argmax under the reference's tri-state
adopt/skip semantics, download_data_file.py:160-272)."""

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

try:
    import msgpack
except ImportError:
    msgpack = None

from openmsistream_spark.functions.serde import packb, unpackb
from openmsistream_spark.streaming.assembly import (
    _adopt_new_generation,
    generation_decision,
)

# --------------------------------------------------------------------------
# wire codec
# --------------------------------------------------------------------------

wire_fields = st.lists(
    st.one_of(
        st.text(max_size=300),  # filename / subdir (unicode)
        st.binary(max_size=2000),  # hashes / payload
        st.integers(min_value=0, max_value=2**62),  # offsets / counts
        st.floats(allow_nan=False, allow_infinity=False),  # mtime
        st.none(),
    ),
    min_size=1,
    max_size=12,
)


@given(wire_fields)
@settings(max_examples=300, deadline=None)
def test_codec_roundtrip_identity(fields):
    assert unpackb(packb(fields)) == fields


@pytest.mark.skipif(msgpack is None, reason="real msgpack not installed")
@given(wire_fields)
@settings(max_examples=300, deadline=None)
def test_codec_matches_real_msgpack(fields):
    ours = packb(fields)
    theirs = msgpack.packb(fields, use_bin_type=True)
    # byte-for-byte wire compatibility in both directions
    assert unpackb(theirs) == fields
    assert msgpack.unpackb(ours, raw=False, strict_map_key=False) == fields


# --------------------------------------------------------------------------
# generation adoption (A2)
# --------------------------------------------------------------------------

# A generation is identified by its content hash; its chunk count and
# mtime are properties OF that generation — derive both from the seed so
# one hash never appears with two different counters (the reference
# treats same-hash/different-count as corruption, not adoption).
generation_seeds = st.lists(
    st.integers(min_value=0, max_value=30), min_size=1, max_size=12
)


def _hash(seed: int) -> bytes:
    return hashlib.sha512(f"gen{seed}".encode()).digest()


def _gen(seed: int) -> tuple[int, float | None]:
    n = 1 + (seed * 7) % 5
    mtime = None if seed % 4 == 0 else float((seed * 13) % 3)
    return n, mtime


@given(generation_seeds)
@settings(max_examples=500, deadline=None)
def test_streaming_fold_is_running_strict_max(seeds):
    """Fold the arrival sequence through the streaming rule; the adopted
    generation must equal the (n, mtime)-max with FIRST-arrival winning
    ties — the reference adopts only strictly-better generations."""
    cur_n, cur_mtime = _gen(seeds[0])
    cur_hash = _hash(seeds[0])
    for seed in seeds[1:]:
        n, mtime = _gen(seed)
        if _adopt_new_generation(cur_n, cur_hash, cur_mtime, n, _hash(seed), mtime):
            cur_n, cur_hash, cur_mtime = n, _hash(seed), mtime

    def order(seed):  # the reference's adoption order: (n, mtime or 0)
        n, mtime = _gen(seed)
        return (n, mtime or 0.0)

    best = max(order(s) for s in seeds)
    assert (cur_n, cur_mtime or 0.0) == best


@given(generation_seeds)
@settings(max_examples=500, deadline=None)
def test_same_hash_never_readopted(seeds):
    """A chunk of the CURRENT generation (same hash) must never trigger a
    reset, whatever its counters claim (resets drop accumulated state)."""
    for seed in seeds:
        n, mtime = _gen(seed)
        assert not _adopt_new_generation(n, _hash(seed), mtime, n + 3, _hash(seed),
                                         (mtime or 0) + 1)


@given(generation_seeds)
@settings(max_examples=500, deadline=None)
def test_same_hash_different_count_is_corrupt(seeds):
    """Same hash + different chunk count must be classified "corrupt"
    (the reference raises a corruption error, download_data_file.py:
    160-272); same hash + same count is a plain "skip" duplicate."""
    for seed in seeds:
        n, mtime = _gen(seed)
        h = _hash(seed)
        assert generation_decision(n, h, mtime, n + 1, h, mtime) == "corrupt"
        assert generation_decision(n, h, mtime, n, h, (mtime or 0) + 5) == "skip"


def test_adoption_tri_state_exact():
    """The reference's exact rules (download_data_file.py:160-272):
    strictly more chunks → adopt; equal chunks + strictly newer mtime →
    adopt; everything else → skip."""
    h1, h2 = _hash(1), _hash(2)
    assert _adopt_new_generation(3, h1, 5.0, 4, h2, 1.0)  # more chunks wins
    assert _adopt_new_generation(3, h1, 5.0, 3, h2, 6.0)  # same n, newer mtime
    assert not _adopt_new_generation(3, h1, 5.0, 3, h2, 5.0)  # tie → keep first
    assert not _adopt_new_generation(3, h1, 5.0, 2, h2, 99.0)  # fewer chunks
    assert not _adopt_new_generation(3, h1, None, 3, h2, 0.0)  # null ≡ 0.0 tie
    assert _adopt_new_generation(3, h1, None, 3, h2, 0.1)  # newer vs null


# --------------------------------------------------------------------------
# operational analytics (queries_extras round-6 additions)
# --------------------------------------------------------------------------

import math
import unittest.mock as mock
from decimal import ROUND_HALF_UP, Decimal


def _half_up(x: float, places: int) -> float:
    """Spark/DuckDB round(): decimal HALF_UP on the double's value —
    NOT Python's banker's round()."""
    q = Decimal(1).scaleb(-places)
    return float(Decimal(x).quantize(q, rounding=ROUND_HALF_UP))


def _ref_zscore(rows):
    """Pure-Python mirror of zscore_anomaly_events' decimal-exact moment
    math: per-value quantize to the cast scale, exact Decimal sums, then
    the same IEEE double formula in the same operation order."""
    by_user: dict = {}
    for _, u, v in rows:
        by_user.setdefault(u, []).append(v)
    out = []
    q8, q12 = Decimal(1).scaleb(-8), Decimal(1).scaleb(-12)
    for u, vs in by_user.items():
        n = len(vs)
        if n < 5:
            continue
        s1 = float(sum(Decimal(v).quantize(q8, rounding=ROUND_HALF_UP) for v in vs))
        s2 = float(
            sum(Decimal(v * v).quantize(q12, rounding=ROUND_HALF_UP) for v in vs)
        )
        mu = s1 / n
        sd = math.sqrt(max((s2 - s1 * s1 / n) / (n - 1), 0.0))
        if not sd > 0:
            continue
        for eid, uu, v in rows:
            if uu == u and abs((v - mu) / sd) > 3:
                out.append((eid, u, v, _half_up((v - mu) / sd, 3)))
    return sorted(out)


_zs_values = st.lists(
    st.floats(min_value=0.0, max_value=1000.0, width=32),
    min_size=1,
    max_size=40,
)


@given(blocks=st.lists(_zs_values, min_size=1, max_size=4))
@settings(max_examples=15, deadline=None)
def test_zscore_matches_decimal_reference(spark, blocks):
    import openmsistream_spark.queries_extras as qe

    rows, eid = [], 0
    for u, vs in enumerate(blocks):
        for v in vs:
            rows.append((eid, u, float(v)))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, user_id long, value double")
    with mock.patch.object(qe, "load", lambda s, d, n: ev):
        got = sorted(
            (r.event_id, r.user_id, r.value, r.zscore)
            for r in qe.zscore_anomaly_events(spark, "unused").collect()
        )
    assert got == _ref_zscore(rows)


@given(
    pairs=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]), st.integers(min_value=0, max_value=5)
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=15, deadline=None)
def test_key_skew_matches_reference(spark, pairs):
    import openmsistream_spark.queries_extras as qe

    rows = [(i, t, u) for i, (t, u) in enumerate(pairs)]
    ev = spark.createDataFrame(rows, "event_id long, event_type string, user_id long")
    with mock.patch.object(qe, "load", lambda s, d, n: ev):
        got = {
            r.event_type: (r.n_events, r.n_users, r.top_user_share, r.skew_factor)
            for r in qe.key_skew_profile(spark, "unused").collect()
        }
    want = {}
    for t in {p[0] for p in pairs}:
        cnt: dict = {}
        for tt, u in pairs:
            if tt == t:
                cnt[u] = cnt.get(u, 0) + 1
        n, users, mx = sum(cnt.values()), len(cnt), max(cnt.values())
        # exact integer half-up at 4 dp — mirrors the query's
        # (2*num*10^4 + den) div (2*den) rounding
        share = ((2 * mx * 10**4 + n) // (2 * n)) / 1e4
        skew = ((2 * mx * users * 10**4 + n) // (2 * n)) / 1e4
        want[t] = (n, users, share, skew)
    assert got == want

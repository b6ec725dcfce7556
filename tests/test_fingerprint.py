"""Winnowing fingerprints (llm/fingerprint.py): the paper's coverage
guarantee, the rightmost-min tie rule, normalization invariance, the
hot-fingerprint cap, and the pay-once injection point."""

import hashlib

from pyspark.sql import functions as F

from openmsistream_spark.llm.fingerprint import (
    fingerprint_overlap_pairs,
    kgram_hashes,
    winnow_fingerprints,
)

SCHEMA = "doc_id long, text string"


def _py_winnow(text, k, w):
    """Literal reference implementation of winnowing."""
    t = " ".join(text.lower().strip().split())
    hs = [
        hashlib.md5(t[p : p + k].encode()).hexdigest()[:16]
        for p in range(len(t) - k + 1)
    ]
    sel = set()
    for q in range(w - 1, len(hs)):
        window = hs[q - w + 1 : q + 1]
        m = min(window)
        # rightmost position attaining the min
        off = max(i for i, h in enumerate(window) if h == m)
        sel.add((q - w + 1 + off + 1, m))  # 1-based
    return sel


def test_matches_literal_python_winnowing(spark):
    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my  box with five dozen LIQUOR jugs"),
        (3, "aaaaaaaaaaaa"),  # degenerate: all k-grams identical (ties)
        (4, "tiny"),  # shorter than k -> no fingerprints
    ]
    k, w = 5, 4
    got = {}
    for r in winnow_fingerprints(
        spark.createDataFrame(docs, SCHEMA), k=k, w=w
    ).collect():
        got.setdefault(r.doc_id, set()).add((r.sp, r.fp))
    for did, text in docs:
        want = _py_winnow(text, k, w)
        assert got.get(did, set()) == want, did
    assert 4 not in got


def test_shared_substring_guarantee(spark):
    """Paper Thm: two documents sharing a substring of length
    >= k + w - 1 share at least one fingerprint VALUE."""
    k, w = 5, 4
    shared = "zqxjkvwpyg distinctive shared passage"  # >= k+w-1 chars
    docs = spark.createDataFrame(
        [
            (1, "alpha " + shared + " omega"),
            (2, "unrelated prefix text then " + shared),
            (3, "completely different content with no overlap here"),
        ],
        SCHEMA,
    )
    fps = {
        did: {r.fp for r in rows}
        for did, rows in (
            (d, list(g))
            for d, g in __import__("itertools").groupby(
                sorted(
                    winnow_fingerprints(docs, k=k, w=w).collect(),
                    key=lambda r: r.doc_id,
                ),
                key=lambda r: r.doc_id,
            )
        )
    }
    assert fps[1] & fps[2], "shared passage must yield a common fingerprint"


def test_whitespace_and_case_invariance(spark):
    docs = spark.createDataFrame(
        [(1, "Hello   World  example"), (2, "hello world\texample")], SCHEMA
    )
    got = {
        did: {(r.sp, r.fp) for r in rows}
        for did, rows in (
            (d, list(g))
            for d, g in __import__("itertools").groupby(
                sorted(
                    winnow_fingerprints(docs, k=5, w=4).collect(),
                    key=lambda r: r.doc_id,
                ),
                key=lambda r: r.doc_id,
            )
        )
    }
    assert got[1] == got[2]


def test_overlap_pairs_cap_and_injection(spark):
    base = "zqxjkvwpyg distinctive shared passage of real length"
    docs = spark.createDataFrame(
        [
            (1, base + " tail one"),
            (2, base + " other ending"),
            (3, "nothing in common with the others at all"),
        ],
        SCHEMA,
    )
    pairs = fingerprint_overlap_pairs(docs, k=5, w=4, min_shared=1)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got and all(3 not in p for p in got)
    # cap of 1 doc per fingerprint kills every shared fingerprint
    capped = fingerprint_overlap_pairs(docs, k=5, w=4, min_shared=1, max_fp_df=1)
    assert capped.count() == 0
    # fingerprints= injection equals the end-to-end run
    fps = winnow_fingerprints(docs, k=5, w=4).persist()
    try:
        inj = {
            (r.id_a, r.id_b, r.n_shared)
            for r in fingerprint_overlap_pairs(
                docs, min_shared=1, fingerprints=fps
            ).collect()
        }
        full = {
            (r.id_a, r.id_b, r.n_shared)
            for r in fingerprint_overlap_pairs(
                docs, k=5, w=4, min_shared=1
            ).collect()
        }
        assert inj == full
    finally:
        fps.unpersist()


def test_kgram_positions_are_dense_and_1based(spark):
    docs = spark.createDataFrame([(1, "abcdefgh")], SCHEMA)
    rows = kgram_hashes(docs, k=5).collect()
    assert sorted(r.p for r in rows) == [1, 2, 3, 4]
    want = hashlib.md5(b"abcde").hexdigest()[:16]
    assert {r.h for r in rows if r.p == 1} == {want}

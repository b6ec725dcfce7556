"""Exact-substring (span) dedup vs a brute-force reference.

``duplicated_spans`` must return exactly the intervals a literal
implementation finds: every position whose k-gram occurs >= 2 times
corpus-wide, merged into maximal spans. Planted duplicated runs of
length m >= k must come back as ONE (start, start+m) span."""

import random

import pytest
from pyspark.sql import functions as F

from openmsistream_spark.llm.spandedup import (
    duplicated_span_ratio,
    duplicated_spans,
    kgram_positions,
)


def brute_spans(token_lists, k, min_occ=2):
    """Literal reference: count k-grams, mark positions, merge intervals."""
    from collections import Counter

    counts = Counter(
        tuple(toks[i : i + k])
        for toks in token_lists.values()
        for i in range(len(toks) - k + 1)
    )
    out = set()
    for doc, toks in token_lists.items():
        marks = [
            (i, i + k)
            for i in range(len(toks) - k + 1)
            if counts[tuple(toks[i : i + k])] >= min_occ
        ]
        merged = []
        for s, e in sorted(marks):
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        for s, e in merged:
            out.add((doc, s, e, e - s))
    return out


def _spark_spans(spark, token_lists, k, fingerprint):
    docs = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in token_lists.items()],
        "doc_id long, text string",
    )
    return {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in duplicated_spans(docs, k=k, fingerprint=fingerprint).collect()
    }


CORPORA = {
    # a 12-token run planted in two docs at different offsets -> one
    # maximal span each, alignment-independent
    "planted_run": {
        0: [f"a{i}" for i in range(10)] + ["dup%d" % i for i in range(12)] + ["z0"],
        1: ["dup%d" % i for i in range(12)] + [f"b{i}" for i in range(9)],
        2: [f"c{i}" for i in range(15)],
    },
    # within-doc repeat counts as duplication
    "within_doc": {
        0: ["r%d" % (i % 4) for i in range(16)],  # period-4 repeat
        1: [f"u{i}" for i in range(10)],
    },
    # doc shorter than k emits nothing even if its text recurs
    "short_docs": {
        0: ["x", "y"],
        1: ["x", "y"],
        2: [f"w{i}" for i in range(8)],
    },
    # two overlapping duplicated regions merge into one span
    "overlap_merge": {
        0: ["p%d" % i for i in range(10)] + [f"e{i}" for i in range(4)],
        1: ["p%d" % i for i in range(7)] + [f"f{i}" for i in range(5)],
        2: ["p%d" % i for i in range(3, 10)] + [f"g{i}" for i in range(5)],
    },
}


@pytest.mark.parametrize("name", sorted(CORPORA))
@pytest.mark.parametrize("fingerprint", ["hash", "text"])
def test_matches_bruteforce(spark, name, fingerprint):
    toks = CORPORA[name]
    k = 4
    assert _spark_spans(spark, toks, k, fingerprint) == brute_spans(toks, k)


def test_planted_run_is_one_maximal_span(spark):
    toks = CORPORA["planted_run"]
    got = _spark_spans(spark, toks, 4, "hash")
    assert got == {(0, 10, 22, 12), (1, 0, 12, 12)}


def test_randomized_corpus_matches_bruteforce(spark):
    rng = random.Random(7)
    toks = {
        d: [f"t{rng.randrange(6)}" for _ in range(rng.randrange(0, 40))]
        for d in range(12)
    }
    for k in (3, 5):
        assert _spark_spans(spark, toks, k, "hash") == brute_spans(toks, k)


def test_ratio_folds_spans_and_zero_fills(spark):
    toks = CORPORA["planted_run"]
    docs = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in toks.items()], "doc_id long, text string"
    )
    rows = {
        r.doc_id: (r.n_tokens, r.dup_tokens, r.dup_ratio)
        for r in duplicated_span_ratio(docs, k=4).collect()
    }
    assert rows[0] == (23, 12, 0.5217)  # half-up 4dp of 12/23
    assert rows[1] == (21, 12, 0.5714)
    assert rows[2] == (15, 0, 0.0)


def test_kgram_positions_skips_short_and_rejects_bad_fingerprint(spark):
    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    assert kgram_positions(docs, k=4).count() == 0
    assert kgram_positions(docs, k=3).count() == 1
    with pytest.raises(ValueError):
        kgram_positions(docs, k=2, fingerprint="md5")


def test_plan_stays_jvm_side(spark):
    """No Python stage anywhere in the span pipeline."""
    docs = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in CORPORA["planted_run"].items()],
        "doc_id long, text string",
    )
    plan = duplicated_spans(docs, k=4)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def brute_excise(token_lists, k, min_occ=2):
    """Literal keep-first reference: mark every non-first occurrence of
    a duplicated k-gram, drop the marked token positions."""
    from collections import defaultdict

    occ = defaultdict(list)
    for doc in sorted(token_lists):
        toks = token_lists[doc]
        for i in range(len(toks) - k + 1):
            occ[tuple(toks[i : i + k])].append((doc, i))
    out = {}
    for doc, toks in token_lists.items():
        drop = set()
        for gram, places in occ.items():
            if len(places) < min_occ:
                continue
            first = min(places)
            for d, p in places:
                if d == doc and (d, p) != first:
                    drop.update(range(p, p + k))
        kept = [t for i, t in enumerate(toks) if i not in drop]
        out[doc] = (" ".join(kept), len(toks), len(toks) - len(kept))
    return out


@pytest.mark.parametrize("name", sorted(CORPORA))
def test_excision_matches_bruteforce(spark, name):
    from openmsistream_spark.llm.spandedup import excise_duplicated_spans

    toks = CORPORA[name]
    docs = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in toks.items()], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.text, r.n_tokens, r.n_tokens_removed)
        for r in excise_duplicated_spans(docs, k=4).collect()
    }
    assert got == brute_excise(toks, 4)


def test_excision_randomized_matches_bruteforce(spark):
    from openmsistream_spark.llm.spandedup import excise_duplicated_spans

    rng = random.Random(11)
    toks = {
        d: [f"t{rng.randrange(5)}" for _ in range(rng.randrange(0, 35))]
        for d in range(10)
    }
    docs = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in toks.items()], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.text, r.n_tokens, r.n_tokens_removed)
        for r in excise_duplicated_spans(docs, k=3).collect()
    }
    assert got == brute_excise(toks, 3)


def test_excision_keeps_exactly_one_copy_of_planted_run(spark):
    """Two identical docs: the lower doc_id keeps its text, the higher
    one is fully excised."""
    from openmsistream_spark.llm.spandedup import excise_duplicated_spans

    text = " ".join(f"w{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(5, text), (9, text)], "doc_id long, text string"
    )
    got = {r.doc_id: r.text for r in excise_duplicated_spans(docs, k=4).collect()}
    assert got == {5: text, 9: ""}


def test_fixpoint_removes_cross_cut_duplicates(spark):
    """Pass 1 provably leaves a duplicate k-gram that only EXISTS after
    the cut (the documented single-pass artifact); max_passes=2 removes
    it, and a higher cap is a no-op once the fixpoint is reached."""
    from openmsistream_spark.llm.spandedup import excise_duplicated_spans

    # A holds both "w x y z" and the run "d1 d2 d3 d4"; B interleaves
    # the run INSIDE w x | y z, so B's only pass-1 duplicate is the run.
    # Excising it from B joins "w x"+"y z" into a NEW "w x y z" gram
    # duplicating A's — invisible to pass 1 by construction.
    a = "w x y z a b c d1 d2 d3 d4"
    b = "p1 w x d1 d2 d3 d4 y z p2"
    docs = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")

    one = {r.doc_id: r for r in excise_duplicated_spans(docs, k=4).collect()}
    assert one[1].text == a
    assert one[2].text == "p1 w x y z p2"  # cross-cut dup survives pass 1
    assert one[2].n_tokens_removed == 4

    two = {
        r.doc_id: r
        for r in excise_duplicated_spans(docs, k=4, max_passes=2).collect()
    }
    assert two[1].text == a
    assert two[2].text == "p1 p2"  # pass 2 excised the cross-cut gram
    assert two[2].n_tokens == 10  # ORIGINAL token count, not post-pass-1
    assert two[2].n_tokens_removed == 8  # cumulative across passes

    # fixpoint: a generous cap changes nothing beyond pass 2
    five = {
        r.doc_id: (r.text, r.n_tokens, r.n_tokens_removed)
        for r in excise_duplicated_spans(docs, k=4, max_passes=5).collect()
    }
    assert five == {
        d: (r.text, r.n_tokens, r.n_tokens_removed) for d, r in two.items()
    }


def test_planted_corpus_wide_boilerplate_gram_no_concentration(spark):
    """The realistic 100 TB skew case (VERDICT r7 #5): ONE boilerplate
    k-gram occurring in every document. The per-gram aggregate is
    map-side combinable (count + min — partials collapse before the
    shuffle, so the hot gram arrives at its reducer as a handful of
    partial rows), and the positions-side join against the duplicated
    gram set must not re-shuffle all occurrences onto one task: at this
    dup-set size Catalyst broadcasts the dup set (occurrences never
    leave their source partitions); past the broadcast threshold the
    session's AQE skew-join splits the skewed partition."""
    from openmsistream_spark.llm.spandedup import excise_duplicated_spans

    boiler = "all rights reserved worldwide"
    docs = spark.createDataFrame(
        [(i, f"{boiler} unique{i}a unique{i}b unique{i}c") for i in range(500)],
        "doc_id long, text string",
    )
    out = excise_duplicated_spans(docs, k=4)
    rows = {r.doc_id: r for r in out.collect()}
    # AQE picks the join strategy at runtime — read the FINAL plan
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "isFinalPlan=true" in plan
    # the hot-gram join is a broadcast of the (tiny) duplicated-gram
    # aggregate — the occurrence rows are the streamed side
    assert "BroadcastHashJoin" in plan
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert len(rows) == 500
    assert rows[0].text.startswith(boiler)  # corpus-first copy survives
    removed = sum(r.n_tokens_removed for r in rows.values())
    assert removed == 4 * 499  # every other doc loses exactly the run


def test_fixpoint_matches_iterated_bruteforce_randomized(spark):
    """Randomized corpora (tiny alphabet → dense duplication → frequent
    cross-cut grams): running the brute-force reference to ITS fixpoint
    must equal max_passes=8 of the distributed operator, with cumulative
    removal accounting against the ORIGINAL token counts."""
    import random

    from openmsistream_spark.llm.spandedup import excise_duplicated_spans

    rng = random.Random(80)
    k = 3
    for trial in range(4):
        toks = {
            d: [rng.choice("abcd") for _ in range(rng.randint(0, 14))]
            for d in range(6)
        }
        # brute fixpoint: re-run single-pass brute on its own output
        cur = {d: list(t) for d, t in toks.items()}
        for _ in range(8):
            res = brute_excise(cur, k)
            nxt = {d: res[d][0].split() if res[d][0] else [] for d in res}
            if nxt == cur:
                break
            cur = nxt
        want = {
            d: (" ".join(cur[d]), len(toks[d]), len(toks[d]) - len(cur[d]))
            for d in toks
        }
        docs = spark.createDataFrame(
            [(d, " ".join(t)) for d, t in toks.items()],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: (r.text, r.n_tokens, r.n_tokens_removed)
            for r in excise_duplicated_spans(docs, k=k, max_passes=8).collect()
        }
        assert got == want, f"trial {trial}: {got} != {want}"

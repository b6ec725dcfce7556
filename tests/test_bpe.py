"""Distributed BPE trainer/segmenter (llm/bpe.py) vs a literal Python
reference implementation (Sennrich et al. 2016 mechanics)."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from tests.conftest import load


def _ref_train(word_counts: dict[str, int], n_merges: int):
    """Literal BPE with the trainer's EXACT mechanics: single-char
    symbols (a merged pair becomes one private-use-area placeholder
    char), overlapping 2-char pair counts, top pair by (count DESC,
    2-char pair STRING asc) — the trainer's ORDER BY pcnt DESC, pair
    ASC. An expanded-symbol lexicographic tie-break (an earlier draft
    of this reference) can disagree with the placeholder-string order
    on count ties: e.g. ('xx','a') sorts before ('z','b') expanded but
    after it as placeholder strings, since every placeholder codepoint
    is above ASCII. Merging is leftmost-non-overlapping str.replace,
    exactly like the trainer and the unrolled SQL oracle."""
    cur = {w: w for w in word_counts}
    exp: dict[str, str] = {}
    merges = []
    for r in range(n_merges):
        counts = Counter()
        for w, c in word_counts.items():
            s = cur[w]
            for i in range(len(s) - 1):
                counts[s[i : i + 2]] += c
        if not counts:
            break
        pair = min(counts, key=lambda p: (-counts[p], p))
        ph = chr(0xE000 + r)

        def expand(s: str) -> str:
            return "".join(exp.get(ch, ch) for ch in s)

        merges.append(((expand(pair[0]), expand(pair[1])), counts[pair]))
        exp[ph] = expand(pair)
        cur = {w: s.replace(pair, ph) for w, s in cur.items()}
    words = {
        w: ([exp.get(ch, ch) for ch in cur[w]], c)
        for w, c in word_counts.items()
    }
    return merges, words


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load(spark, sf_dir, "documents")


def test_bpe_train_matches_reference(spark, docs):
    from openmsistream_spark.llm.bpe import bpe_train, bpe_word_counts

    wc = {r["w"]: r["cnt"] for r in bpe_word_counts(docs).collect()}
    ref_merges, _ = _ref_train(wc, 12)
    got = bpe_train(bpe_word_counts(docs), n_merges=12)
    assert len(got) == len(ref_merges)
    for g, ((a, b), cnt) in zip(got, ref_merges):
        assert (g.left, g.right, g.cnt) == (a, b, cnt)


def test_bpe_segment_matches_reference(spark, docs):
    from openmsistream_spark.llm.bpe import bpe_segment, bpe_train, bpe_word_counts

    wc_df = bpe_word_counts(docs)
    merges = bpe_train(wc_df, n_merges=12)
    seg = {
        r["doc_id"]: list(r["tokens"])
        for r in bpe_segment(docs.filter(F.col("doc_id") < 30), merges).collect()
    }
    # reference: merge each word's symbol list through the merge list
    wc = {r["w"]: r["cnt"] for r in wc_df.collect()}
    _, ref_words = _ref_train(wc, 12)
    for r in docs.filter(F.col("doc_id") < 30).collect():
        want = []
        for w in r["text"].lower().strip().split():
            want.extend(ref_words[w][0])
        assert seg[r["doc_id"]] == want


def test_bpe_overlap_rule(spark):
    """'xxx' under merge (x,x) -> [xx, x] (leftmost non-overlapping) —
    and the placeholder mechanics survive merges-of-merges."""
    from openmsistream_spark.llm.bpe import bpe_segment, bpe_train, bpe_word_counts

    rows = [(i, "xxx xxxx xx x") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_train(bpe_word_counts(df), n_merges=3)
    # round 1 merges (x,x); later rounds merge placeholder combinations
    assert (merges[0].left, merges[0].right) == ("x", "x")
    assert merges[1].merged in ("xxx", "xxxx")
    seg = {r["doc_id"]: list(r["tokens"]) for r in bpe_segment(df, merges).collect()}
    got = seg[0]
    # every token expands back to only 'x' runs and the doc re-concatenates
    assert "".join(got) == "xxxxxxxxxx"


def test_bpe_word_counts_excludes_pua(spark):
    from openmsistream_spark.llm.bpe import bpe_word_counts

    df = spark.createDataFrame(
        [(0, "plain weird plain")], "doc_id long, text string"
    )
    got = {r["w"]: r["cnt"] for r in bpe_word_counts(df).collect()}
    assert got == {"plain": 2}


def test_bpe_segment_plan_no_shuffle(spark, docs):
    from openmsistream_spark.llm.bpe import bpe_segment, bpe_train, bpe_word_counts

    merges = bpe_train(bpe_word_counts(docs.limit(50)), n_merges=2)
    plan = (
        bpe_segment(docs, merges)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "MapInPandas" in plan

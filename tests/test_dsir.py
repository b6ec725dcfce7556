"""DSIR importance scoring (llm/dsir.py): target-likeness ordering,
Laplace smoothing of unseen tokens, and log/ratio mode agreement."""

import math

import pytest

from openmsistream_spark.llm.dsir import dsir_importance

SCHEMA = "doc_id long, text string"
ROWS = [
    (1, "aa bb cc aa bb"),  # pure target-language
    (2, "xx yy zz xx yy"),  # pure raw-only language
    (3, "aa bb xx yy"),  # mixed
    (4, "aa aa aa aa"),  # target-heavy
]
TARGET = [(100, "aa bb cc aa bb cc aa")]


def _scores(spark, mode):
    docs = spark.createDataFrame(ROWS, SCHEMA)
    tgt = spark.createDataFrame(TARGET, SCHEMA)
    return {
        r.doc_id: (r.score, r.n_tokens)
        for r in dsir_importance(docs, tgt, mode=mode).collect()
    }


def test_target_like_docs_outrank_raw_only(spark):
    s = _scores(spark, "ratio")
    assert s[1][0] > s[3][0] > s[2][0]  # pure target > mixed > raw-only
    assert s[1][1] == 5  # n_tokens preserved


def test_log_mode_matches_hand_computation(spark):
    """Paper-faithful estimator on a hand-checkable corpus: doc 2's
    tokens never occur in the target, so every contribution is the
    smoothed floor ln((0+1)(n_raw+V) / ((n_tgt+V)(cnt_r+1)))."""
    s = _scores(spark, "log")
    # corpus: aa:7 bb:3 cc:1 xx:3 yy:3 zz:1 → n_raw=18, V=6; target:
    # aa:3 bb:2 cc:2 → n_tgt=7
    n_raw, v, n_tgt = 18, 6, 7
    def lr(cnt_t, cnt_r):
        return math.log((cnt_t + 1) * (n_raw + v) / ((n_tgt + v) * (cnt_r + 1)))
    expect_doc2 = 2 * lr(0, 3) + 2 * lr(0, 3) + 1 * lr(0, 1)  # xx yy zz
    assert s[2][0] == pytest.approx(expect_doc2, rel=1e-12)
    expect_doc4 = 4 * lr(3, 7)
    assert s[4][0] == pytest.approx(expect_doc4, rel=1e-12)
    # ordering agrees with ratio mode
    r = _scores(spark, "ratio")
    assert sorted(s, key=lambda d: -s[d][0]) == sorted(r, key=lambda d: -r[d][0])


def test_rejects_unknown_mode(spark):
    docs = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(ValueError, match="mode must be"):
        dsir_importance(docs, docs, mode="softmax")


def test_ratio_table_is_broadcast(spark):
    """The per-token ratio join must broadcast the vocab-sized table —
    the corpus side takes no extra shuffle beyond the token count."""
    docs = spark.createDataFrame(ROWS, SCHEMA)
    tgt = spark.createDataFrame(TARGET, SCHEMA)
    out = dsir_importance(docs, tgt)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_hashed_bigram_features(spark):
    """The paper's hashed n-gram option: bigram features bucketed by
    xxhash64 bound the table to hash_buckets rows regardless of vocab,
    and target-like ordering is preserved."""
    from openmsistream_spark.llm.dsir import (
        score_with_table,
        unigram_ratio_table,
    )

    docs = spark.createDataFrame(ROWS, SCHEMA)
    tgt = spark.createDataFrame(TARGET, SCHEMA)
    table = unigram_ratio_table(docs, tgt, ngram=2, hash_buckets=64)
    assert table.count() <= 64
    # config travels WITH the table (round-8 review: per-call-site
    # re-specification let a unigram tokenizer run against a bigram
    # table and match nothing) — score_with_table needs no params
    out = {r.doc_id: r for r in score_with_table(docs, table).collect()}
    # pure target bigrams ("aa bb", "bb cc"...) outrank pure raw-only
    assert out[1].score > out[2].score
    # n_tokens counts FEATURES (bigrams): doc 1 has 5 tokens → 4
    assert out[1].n_tokens == 4


def test_oov_tokens_score_at_laplace_floor_not_dropped(spark):
    """Round-8 review finding: the frozen-table path must keep the
    smoothing contract — a doc of entirely unseen vocabulary scores at
    the OOV floor instead of vanishing from the output, and n_tokens
    counts unmatched tokens too."""
    from openmsistream_spark.llm.dsir import score_with_table, unigram_ratio_table

    raw = spark.createDataFrame([(1, "aa bb"), (2, "cc dd")], SCHEMA)
    tgt = spark.createDataFrame([(100, "aa bb")], SCHEMA)
    for mode in ("ratio", "log"):
        table = unigram_ratio_table(raw, tgt, mode=mode)
        newdocs = spark.createDataFrame(
            [(10, "zz qq"), (11, "aa zz zz zz")], SCHEMA
        )
        out = {r.doc_id: r for r in score_with_table(newdocs, table).collect()}
        assert set(out) == {10, 11}, "fully-OOV doc must not vanish"
        assert out[10].n_tokens == 2 and out[11].n_tokens == 4
        # the floor: raw n=4, tgt n=2, V=4 → oov ratio (4+4)/(2+4) = 4/3
        import math
        per_tok = 4.0 / 3.0 if mode == "ratio" else math.log(4.0 / 3.0)
        import pytest as _pytest
        assert out[10].score == _pytest.approx(2 * per_tok, abs=1e-3)


def test_streaming_sink_scores_hashed_bigram_table(spark, tmp_path):
    """Round-8 review finding: the sink must tokenize the way the table
    was frozen. With a bigram/hashed table it previously matched
    nothing and silently dropped every document."""
    from openmsistream_spark.llm.dsir import score_with_table, unigram_ratio_table
    from openmsistream_spark.streaming.dsir import dsir_select_stream_sink

    raw = spark.createDataFrame(ROWS, SCHEMA)
    tgt = spark.createDataFrame(TARGET, SCHEMA)
    table = unigram_ratio_table(raw, tgt, ngram=2, hash_buckets=64).localCheckpoint(
        eager=True
    )
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt"),
    )
    spark.createDataFrame(ROWS, SCHEMA).coalesce(1).write.parquet(f"{in_dir}/b=0")
    src = spark.readStream.schema(SCHEMA).parquet(f"{in_dir}/b=*")
    q = (
        dsir_select_stream_sink(src, table, out_dir, ckpt, threshold=float("-inf"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = {r.doc_id: r.score for r in spark.read.parquet(out_dir).collect()}
    want = {r.doc_id: r.score for r in score_with_table(raw, table).collect()}
    assert got == want and len(got) == len(ROWS)

"""Streaming DSIR selection: stream == batch equivalence against a
frozen ratio table, threshold semantics, and exactly-once replay."""

from pyspark.sql import functions as F

from openmsistream_spark.llm.dsir import (
    dsir_importance,
    score_with_table,
    unigram_ratio_table,
)
from openmsistream_spark.streaming.dsir import dsir_select_stream_sink

SCHEMA = "doc_id long, text string"
RAW = [
    (1, "aa bb cc aa"),
    (2, "xx yy zz"),
    (3, "aa bb xx"),
    (4, "aa cc cc"),
    (5, "zz zz yy"),
    (6, "bb bb aa"),
]
TARGET = [(100, "aa bb cc aa bb cc")]


def _run(spark, in_dir, out_dir, ckpt, table, threshold):
    src = spark.readStream.schema(SCHEMA).parquet(f"{in_dir}/b=*")
    q = (
        dsir_select_stream_sink(
            src, table, out_dir, ckpt, threshold=threshold
        )
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish"


def test_stream_matches_batch_scoring(spark, tmp_path):
    raw = spark.createDataFrame(RAW, SCHEMA)
    table = unigram_ratio_table(raw, spark.createDataFrame(TARGET, SCHEMA))
    # freeze: a streaming run must not recompute the table per batch
    table = table.localCheckpoint(eager=True)
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    for b, rows in enumerate([RAW[:3], RAW[3:]]):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            f"{in_dir}/b={b}"
        )
        _run(spark, in_dir, out_dir, ckpt, table, threshold=0.0)
    got = {
        r.doc_id: (r.n_tokens, r.score)
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        r.doc_id: (r.n_tokens, r.score)
        for r in score_with_table(raw, table).filter(F.col("score") >= 0.0).collect()
    }
    assert got == want
    # and the frozen-table scores equal the one-shot batch operator's
    # (same raw corpus → same table)
    batch = {
        r.doc_id: (r.n_tokens, r.score)
        for r in dsir_importance(
            raw, spark.createDataFrame(TARGET, SCHEMA)
        ).collect()
    }
    assert got == batch


def test_threshold_drops_off_target_docs(spark, tmp_path):
    raw = spark.createDataFrame(RAW, SCHEMA)
    table = unigram_ratio_table(raw, spark.createDataFrame(TARGET, SCHEMA))
    scores = {r.doc_id: r.score for r in score_with_table(raw, table).collect()}
    cut = scores[3]  # the mixed doc
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    spark.createDataFrame(RAW, SCHEMA).coalesce(1).write.parquet(f"{in_dir}/b=0")
    _run(spark, in_dir, out_dir, ckpt, table, threshold=cut)
    kept = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    assert kept == {d for d, s in scores.items() if s >= cut}
    assert 2 not in kept and 5 not in kept  # pure off-target language


def test_replay_is_exactly_once(spark, tmp_path):
    raw = spark.createDataFrame(RAW, SCHEMA)
    table = unigram_ratio_table(
        raw, spark.createDataFrame(TARGET, SCHEMA)
    ).localCheckpoint(eager=True)
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    spark.createDataFrame(RAW[:3], SCHEMA).coalesce(1).write.parquet(f"{in_dir}/b=0")
    _run(spark, in_dir, out_dir, ckpt, table, threshold=0.0)
    first = sorted(
        (r.doc_id, r.score) for r in spark.read.parquet(out_dir).collect()
    )
    # no new input: re-running over the same checkpoint changes nothing
    _run(spark, in_dir, out_dir, ckpt, table, threshold=0.0)
    again = sorted(
        (r.doc_id, r.score) for r in spark.read.parquet(out_dir).collect()
    )
    assert again == first

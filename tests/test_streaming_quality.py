"""Streaming quality filtering: stream == batch equivalence against a
frozen weight table, and exactly-once replay (mirrors the streaming
DSIR suite — same frozen-artifact contract)."""

from pyspark.sql import functions as F

from openmsistream_spark.llm.quality import (
    count_difference_weights,
    score_with_weights,
)
from openmsistream_spark.streaming.quality import quality_filter_stream_sink

SCHEMA = "doc_id long, text string"
POS = [(100, "good clear prose structure"), (101, "clear good prose")]
NEG = [(200, "spam click buy now"), (201, "buy spam offer")]
RAW = [
    (1, "good prose here"),
    (2, "spam buy click"),
    (3, "good spam mix clear"),
    (4, "now offer buy spam"),
]


def _run(spark, in_dir, out_dir, ckpt, weights, threshold):
    src = spark.readStream.schema(SCHEMA).parquet(f"{in_dir}/b=*")
    q = (
        quality_filter_stream_sink(
            src, weights, out_dir, ckpt, threshold=threshold
        )
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish"


def test_stream_matches_batch_filter(spark, tmp_path):
    pos = spark.createDataFrame(POS, SCHEMA)
    neg = spark.createDataFrame(NEG, SCHEMA)
    # freeze: a streaming run must not refit per batch
    weights = count_difference_weights(pos, neg).localCheckpoint(eager=True)
    raw = spark.createDataFrame(RAW, SCHEMA)
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    for b, rows in enumerate([RAW[:2], RAW[2:]]):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            f"{in_dir}/b={b}"
        )
        _run(spark, in_dir, out_dir, ckpt, weights, threshold=0.0)
    got = {
        r.doc_id: (r.n_tokens, r.score)
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        r.doc_id: (r.n_tokens, r.score)
        for r in score_with_weights(raw, weights)
        .filter(F.col("score") >= 0.0)
        .collect()
    }
    assert got == want
    assert 1 in got and 2 not in got  # planted pure-good vs pure-spam


def test_replay_is_exactly_once(spark, tmp_path):
    weights = count_difference_weights(
        spark.createDataFrame(POS, SCHEMA), spark.createDataFrame(NEG, SCHEMA)
    ).localCheckpoint(eager=True)
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    spark.createDataFrame(RAW, SCHEMA).coalesce(1).write.parquet(f"{in_dir}/b=0")
    _run(spark, in_dir, out_dir, ckpt, weights, threshold=0.0)
    first = sorted(
        (r.doc_id, r.score) for r in spark.read.parquet(out_dir).collect()
    )
    # no new input: re-running over the same checkpoint changes nothing
    _run(spark, in_dir, out_dir, ckpt, weights, threshold=0.0)
    again = sorted(
        (r.doc_id, r.score) for r in spark.read.parquet(out_dir).collect()
    )
    assert again == first

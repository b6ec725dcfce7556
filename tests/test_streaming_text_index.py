"""Streaming text-index maintenance: per-batch ingest partitions,
ledger-derived stats, search parity with a direct scan of the full
corpus, and exactly-once across checkpoint replays."""

from openmsistream_spark.llm.retrieval import bm25_search_index, bm25_topk
from openmsistream_spark.operators.registry import make_registry
from openmsistream_spark.streaming.text_index import text_index_sink


def _run(spark, in_dir, idx, ckpt):
    reg = make_registry(spark, f"{idx}/stats_ledger", ["ingest"])
    src = spark.readStream.schema("doc_id long, text string").parquet(
        f"{in_dir}/batch=*"
    )
    q = (
        text_index_sink(src, idx, reg)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish"


def test_streamed_index_matches_direct_scan(spark, tmp_path):
    in_dir, idx, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "idx"),
        str(tmp_path / "ckpt"),
    )
    b0 = [(1, "spark shuffle executor"), (2, "spark partition")]
    b1 = [(3, "executor shuffle shuffle"), (4, "cooking garlic bread")]
    spark.createDataFrame(b0, "doc_id long, text string").write.parquet(
        f"{in_dir}/batch=0"
    )
    _run(spark, in_dir, idx, ckpt)
    spark.createDataFrame(b1, "doc_id long, text string").write.parquet(
        f"{in_dir}/batch=1"
    )
    _run(spark, in_dir, idx, ckpt)

    terms = ["spark", "shuffle"]
    full = spark.createDataFrame(b0 + b1, "doc_id long, text string")
    direct = [(r.doc_id, r.bm25) for r in bm25_topk(full, terms, k=10).collect()]
    via_index = [
        (r.doc_id, r.bm25)
        for r in bm25_search_index(spark, idx, terms, k=10).collect()
    ]
    assert via_index == direct


def test_streamed_index_replay_is_exactly_once(spark, tmp_path):
    """Re-running the stream over the same input through the SAME
    checkpoint must leave the index unchanged: ingest partitions
    overwrite themselves and the stats ledger upserts by batch id."""
    in_dir, idx, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "idx"),
        str(tmp_path / "ckpt"),
    )
    rows = [(1, "alpha beta"), (2, "beta gamma")]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{in_dir}/batch=0"
    )
    _run(spark, in_dir, idx, ckpt)
    first = sorted(
        (r.doc_id, r.bm25)
        for r in bm25_search_index(spark, idx, ["beta"], k=10).collect()
    )
    # availableNow over the same checkpoint: no new data, nothing changes
    _run(spark, in_dir, idx, ckpt)
    again = sorted(
        (r.doc_id, r.bm25)
        for r in bm25_search_index(spark, idx, ["beta"], k=10).collect()
    )
    assert again == first
    # stats ledger holds exactly one row for the single batch
    reg = make_registry(spark, f"{idx}/stats_ledger", ["ingest"])
    rows_ = reg.read().collect()
    assert len(rows_) == 1 and rows_[0].n_docs == 2

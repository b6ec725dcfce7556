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


def test_search_after_each_ingest_is_fresh_and_pruned(spark, tmp_path):
    """Freshness probe: after EVERY micro-batch the index answers with
    scores byte-identical to a direct bm25_topk scan of exactly the
    documents ingested so far, and the search still runs the
    partition-pruned path (literal bucket PartitionFilters + term
    PushedFilters) on the streamed ingest=*/bucket=* layout."""
    from openmsistream_spark.llm.retrieval import _term_bucket_py

    in_dir, idx, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "idx"),
        str(tmp_path / "ckpt"),
    )
    batches = [
        [(1, "spark shuffle executor"), (2, "spark partition")],
        [(3, "executor shuffle shuffle"), (4, "cooking garlic bread")],
        [(5, "shuffle spark spark"), (6, "partition pruning saves io")],
    ]
    terms = ["spark", "shuffle"]
    seen = []
    for b, rows in enumerate(batches):
        spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
            f"{in_dir}/batch={b}"
        )
        _run(spark, in_dir, idx, ckpt)
        seen += rows
        corpus = spark.createDataFrame(seen, "doc_id long, text string")
        direct = [
            (r.doc_id, r.bm25) for r in bm25_topk(corpus, terms, k=10).collect()
        ]
        via_index = [
            (r.doc_id, r.bm25)
            for r in bm25_search_index(spark, idx, terms, k=10).collect()
        ]
        assert via_index == direct, f"stale or wrong after batch {b}"

    # the streamed layout keeps the pruned scan: literal bucket ids in
    # PartitionFilters, term equality pushed to the row groups
    df = bm25_search_index(spark, idx, terms, k=10)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan, plan
    pf = plan[plan.index("PartitionFilters"):].split("PushedFilters")[0]
    for t in terms:
        assert str(_term_bucket_py(t)) in pf, plan
    assert "term" in plan.split("PushedFilters", 1)[1][:200], plan

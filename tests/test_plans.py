"""Physical-plan regression tests: the scale properties the engine
depends on must survive refactors — filters reach the parquet scan,
column pruning happens, dimension sides broadcast, top-K never global-
sorts, aggregates partial-combine before the shuffle."""

import re

import pytest
from pyspark.sql import functions as F

from openmsistream_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = QUERIES[name].fn(spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q1_filter_pushdown_and_pruning(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan  # predicate reached the scan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    read_cols = m.group(1)
    assert "l_orderkey" not in read_cols  # unused columns pruned from the scan
    assert "l_partkey" not in read_cols
    # partial agg before the exchange (map-side combine)
    assert plan.index("HashAggregate") < plan.index("Exchange")


def test_q5_dimensions_broadcast(spark):
    plan = plan_of(spark, "q5_region_revenue")
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(r_name,ASIA)" in plan  # dim filter pushed into its scan


def test_topk_is_take_ordered_not_global_sort(spark):
    plan = plan_of(spark, "top50_recent_events")
    assert "TakeOrderedAndProject" in plan


def test_chunker_stays_jvm_side(spark):
    # P1 must be pure codegen: no Python/Arrow eval nodes in the plan
    plan = plan_of(spark, "p1_chunk_documents")
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "codegen id" in plan  # whole-stage codegen spans the pipeline


def test_semi_join_for_exists(spark):
    plan = plan_of(spark, "q4_order_priority")
    assert "LeftSemi" in plan


def test_salted_agg_two_stages(spark):
    plan = plan_of(spark, "salted_skew_aggregate")
    # two aggregation layers: (key, salt) then (key)
    assert plan.count("HashAggregate") >= 3  # partial+final per stage


def test_upload_select_bytes(spark, tmp_path):
    """P2 through the pipeline: only the declared byte ranges travel."""
    from openmsistream_spark.pipelines import download_directory, upload_directory

    watch = tmp_path / "watch"
    watch.mkdir()
    payload = bytes(range(256)) * 4
    (watch / "f.bin").write_bytes(payload)
    topic = str(tmp_path / "topic")
    upload_directory(
        spark, str(watch), topic, chunk_size=64, select_bytes=[(0, 100), (200, 300)]
    )
    out = str(tmp_path / "out")
    statuses = download_directory(spark, topic, out).collect()
    assert statuses[0].status == "SUCCESSFULLY_RECONSTRUCTED"
    with open(f"{out}/f.bin", "rb") as fh:
        assert fh.read() == payload[0:100] + payload[200:300]


def test_heartbeat_stream_windowed_agg(spark, tmp_path):
    """A8/K7: the windowed heartbeat agg emits JSON counter messages."""
    import json

    from openmsistream_spark.streaming.sinks import heartbeat_stream

    src = str(tmp_path / "hb_src")
    spark.createDataFrame(
        [(f"k{i}".encode(), b"x" * 10) for i in range(20)], "key binary, data binary"
    ).write.parquet(src)
    stream = spark.readStream.schema("key binary, data binary").parquet(src)
    q = (
        heartbeat_stream(stream, interval="1 minute")
        .writeStream.outputMode("complete")  # emit open windows every trigger
        .format("memory")
        .queryName("hb_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql("SELECT * FROM hb_out").collect()
    assert rows, "heartbeat window emitted nothing"
    beat = json.loads(rows[0].value)
    assert beat["n_messages_read"] == 20
    assert beat["n_bytes_read"] == 200


def test_stratified_sample_hash_plan_shape(spark):
    """The hot-stratum variant's plan must broadcast the counts and get
    the rank-limit pushdown (WindowGroupLimit) on the trim window — the
    two properties that make it safe under a dominant stratum."""
    plan = plan_of(spark, "stratified_sample_hot")
    assert "BroadcastHashJoin" in plan  # counts table broadcast, not shuffled
    assert "WindowGroupLimit" in plan  # top-k pushdown on the trim
    # the hash-fraction threshold must be evaluated INSIDE the broadcast
    # join (Catalyst folds it into the join condition), so full-stratum
    # rows are dropped before the window exchange ever sees them
    assert "Join condition" in plan and "_stratum_n" in plan, plan
    # in the formatted tree, deeper = earlier execution: the join node
    # must sit strictly below the window-limit nodes (filter before sort)
    assert plan.index("BroadcastHashJoin") > plan.index("WindowGroupLimit"), plan


def test_boilerplate_hot_set_broadcasts(spark):
    plan = plan_of(spark, "boilerplate_line_dedup")
    # the hot-line set join must be a broadcast HASH join — a nested-loop
    # fallback would re-scan the corpus per hot line
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastExchange" in plan  # the hot-line set ships broadcast


def test_mixture_sample_zero_shuffles(spark):
    """Mixture sampling is projection + explode — the plan must contain
    no Exchange at all (AQE leaves scans unshuffled)."""
    plan = plan_of(spark, "mixture_sample_sources")
    assert "Exchange" not in plan.replace("BroadcastExchange", "")


def test_token_budget_shards_single_shuffle(spark):
    """Packing shuffles once: the per-bucket sort for the cumsum window."""
    plan = plan_of(spark, "token_budget_shards")
    import re as _re

    n_exchanges = len(_re.findall(r"\(\d+\) Exchange\b", plan))
    assert n_exchanges == 1, plan


def test_incremental_minhash_admitted_plan_shape(spark, tmp_path):
    """The frame returned by incremental_minhash_dedup must read the
    ledger with the run_id filter PUSHED into the parquet scan, prune
    the wide columns (signatures never leave the scan), and semi-join
    without any nested-loop/cartesian fallback — the shape that keeps a
    100 TB ingest's ledger probe ledger-sized, not corpus-sized."""
    from openmsistream_spark.llm.dedup import incremental_minhash_dedup
    from openmsistream_spark.operators.registry import make_registry

    reg = make_registry(
        spark, str(tmp_path / "lsh"), ["band", "band_sig", "doc_id"]
    )
    seed = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again and again")],
        "doc_id long, text string",
    )
    incremental_minhash_dedup(seed, reg, run_id="seed")
    nxt = spark.createDataFrame(
        [(2, "a second batch document with entirely different words here")],
        "doc_id long, text string",
    )
    out = incremental_minhash_dedup(nxt, reg, run_id="b2")
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "EqualTo(run_id,b2)" in plan, plan  # ledger probe pushed down
    assert "sig" not in plan.split("ReadSchema")[1].splitlines()[0], plan
    assert "LeftSemi" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_bm25_single_corpus_shuffle_and_take_ordered(spark):
    """BM25's only corpus-keyed shuffle is the fused per-doc aggregate;
    the top-k is TakeOrdered (bounded heaps), never a global Sort."""
    plan = plan_of(spark, "bm25_topk_keywords")
    assert "TakeOrderedAndProject" in plan, plan
    # exactly two hash-partitioned exchanges appear in the tree: the
    # per-doc aggregate on the scoring path and its (stage-reused at
    # runtime) twin under the stats broadcast — never a third
    # (formatted mode lists each Exchange's partitioning under Arguments)
    n_doc_exchanges = len(re.findall(r"hashpartitioning\(doc_id", plan))
    assert n_doc_exchanges == 2, plan
    # the corpus-wide stats ride a broadcast, not a join shuffle
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan, plan


def test_containment_no_nested_loop_or_cartesian(spark):
    """Pairs must arise only from the shingle equi-join: any BNLJ or
    cartesian product means the corpus went all-pairs."""
    plan = plan_of(spark, "containment_pairs_docs")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_hybrid_rrf_arms_stay_bounded(spark):
    """The fused ranking ends in TakeOrdered; the lexical arm's rank
    window runs over an already-limited 50-row frame (a GlobalLimit
    below the Window), not the corpus."""
    plan = plan_of(spark, "hybrid_rrf_topk")
    assert "TakeOrderedAndProject" in plan, plan
    w = plan.find("Window")
    assert w != -1, plan
    assert "GlobalLimit" in plan[w:] or "TakeOrderedAndProject" in plan[w:], plan


def test_pgm_decode_prunes_scan_to_needed_columns(spark):
    """Column pruning must reach the parquet scan THROUGH the
    mapInPandas codec stage: the PGM framing needs only doc_id + text,
    so lang/source/n_chars must not be read."""
    plan = plan_of(spark, "multimodal_pgm_decode")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = m.group(1)
    assert "doc_id" in cols and "text" in cols
    assert "source" not in cols and "n_chars" not in cols and "lang" not in cols


def test_dsir_rank_is_take_ordered(spark):
    """Top-50 by score must be a bounded TakeOrderedAndProject, never a
    global sort of the scored corpus."""
    plan = plan_of(spark, "dsir_importance_rank")
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan

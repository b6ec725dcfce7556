"""Regression tests for the code-review findings: path traversal,
multi-unit windows, duplicate acks, salted-join outer guard, dlq_split
without verify, and the completed-file tombstone."""

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_sink_rejects_path_traversal(spark, tmp_path):
    from openmsistream_spark.streaming.sinks import write_reconstructed_files

    out = tmp_path / "out"
    out.mkdir()
    evil = spark.createDataFrame(
        [("../escape.bin", b"x", b"\x00" * 64)],
        "rel_path string, file_bytes binary, file_hash binary",
    )
    with pytest.raises(Exception, match="unsafe rel_path"):
        write_reconstructed_files(evil, str(out))
    assert not (tmp_path / "escape.bin").exists()


def test_windowed_counts_multi_unit(spark):
    from openmsistream_spark.operators.relational import windowed_counts
    from openmsistream_spark.queries import load

    ev = load(spark, SF, "events")
    out = windowed_counts(ev, "ts", "15 minutes")
    starts = [r.window_start for r in out.collect()]
    assert all(s.minute % 15 == 0 and s.second == 0 for s in starts)
    # total preserved
    assert sum(r.n_messages for r in out.collect()) == ev.count()


def test_chunk_ledger_duplicate_acks(spark):
    from openmsistream_spark.operators.registry import chunk_ledger

    chunks = spark.createDataFrame(
        [("f", i, 3) for i in range(1, 4)],
        "rel_path string, chunk_i long, n_total_chunks long",
    )
    acks = spark.createDataFrame(
        [("f", 1), ("f", 1), ("f", 2), ("f", 2)],  # each ack delivered twice
        "rel_path string, chunk_i long",
    )
    row = chunk_ledger(chunks, acks).collect()[0]
    assert row.n_chunks_delivered == 2
    assert row.n_chunks_to_send == 1
    assert row.status == "in_progress"


def test_salted_join_rejects_outer(spark):
    from openmsistream_spark.operators.relational import salted_join

    df = spark.range(3).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(df, df, on="k", how="full")


def test_dlq_split_without_verify(spark):
    from openmsistream_spark.functions.serde import (
        deserialize_chunks,
        dlq_split,
        packb,
    )

    import hashlib

    wire = packb(
        ["f", hashlib.sha512(b"x").digest(), hashlib.sha512(b"d").digest(),
         0, 1, 1, "", "", b"d", 0.0]
    )
    msgs = spark.createDataFrame([(wire,), (b"garbage",)], "value binary")
    good, dlq = dlq_split(deserialize_chunks(msgs, verify=False))
    assert good.count() == 1
    assert dlq.count() == 1


def test_completed_tombstone_blocks_phantom(spark, tmp_path):
    """A late duplicate chunk of an already-reconstructed file must be
    ignored (ALREADY_WRITTEN), not re-create phantom partial state."""
    from openmsistream_spark.operators.chunking import chunk_binary_column
    from openmsistream_spark.streaming.assembly import streaming_assemble

    payload = os.urandom(3 * 32)
    base = spark.createDataFrame(
        [("t.bin", payload, 1.0)], "rel_path string, content binary, file_mtime double"
    )
    chunks = chunk_binary_column(base, chunk_size=32, keep=["rel_path", "file_mtime"])
    rows = chunks.collect()
    cols = rows[0].asDict().keys()
    in_dir = str(tmp_path / "in")
    # batch 0: the complete file; batch 1: a late duplicate of chunk 0
    spark.createDataFrame(rows).select(*cols).write.parquet(f"{in_dir}/batch=0")
    spark.createDataFrame(rows[:1]).select(*cols).write.parquet(f"{in_dir}/batch=1")

    schema = (
        "rel_path string, file_mtime double, n_total_chunks bigint, "
        "file_hash binary, chunk_i bigint, chunk_offset_write bigint, data binary"
    )
    src = spark.readStream.schema(schema).parquet(f"{in_dir}/batch=*")
    q = (
        streaming_assemble(src)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("tomb_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM tomb_out").collect()
    # exactly ONE completion, no phantom IN_PROGRESS rows afterwards
    assert len(out) == 1
    assert out[0].status == "SUCCESSFULLY_RECONSTRUCTED"
    assert bytes(out[0].file_bytes) == payload


def test_ensemble_releases_its_shingle_cache(spark):
    """Round-7 ADVICE: ensemble_neardup_pairs persisted the shingle
    frame per invocation with no unpersist — a long-lived session
    (repeated driver sweeps) accumulated one cached dataset per call.
    Now the pair set is materialized eagerly and the cache released
    before the call returns."""
    from openmsistream_spark.queries import QUERIES

    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    df = QUERIES["ensemble_neardup_pairs"].fn(spark, SF)
    # the shingle cache must be gone at return time (the result rides a
    # localCheckpoint, which the context cleaner frees on GC — explicit
    # caches are the leak class this guards against)
    leaked = jsc.getPersistentRDDs().size() - before
    assert df.count() >= 0
    # one localCheckpoint block for the returned pair frame is expected;
    # the (much larger) shingle cache would add a second entry per call
    df2 = QUERIES["ensemble_neardup_pairs"].fn(spark, SF)
    assert df2.count() >= 0
    grown = jsc.getPersistentRDDs().size() - before
    # two invocations: at most the two result checkpoints linger until
    # GC — NOT two shingle caches on top (the round-7 leak was +2 per
    # call: shingle cache never released)
    assert grown - leaked <= leaked + 1


def test_truncate_plan_warns_without_cleaner_flag(spark, tmp_path, recwarn):
    """Round-7 ADVICE: reliable checkpoints leak durable storage unless
    spark.cleaner.referenceTracking.cleanCheckpoints was set at context
    creation. get_spark sets it; on sessions where it is absent,
    truncate_plan must say so (once)."""
    from openmsistream_spark.llm.iterutil import truncate_plan

    df = spark.range(4)
    flag = spark.sparkContext.getConf().get(
        "spark.cleaner.referenceTracking.cleanCheckpoints", "false"
    )
    out = truncate_plan(df, str(tmp_path / "ckpt"))
    assert out.count() == 4
    warned = [w for w in recwarn.list if issubclass(w.category, ResourceWarning)]
    if flag == "true":
        assert not warned  # session factory configured cleanup — silent
    else:
        assert warned and "cleanCheckpoints" in str(warned[0].message)

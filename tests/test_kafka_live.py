"""S5/S6/S7/K1 against a REAL Kafka broker — the Spark restatement of the
reference's container-backed E2E (test/README.md:1-30, conftest.py:105-207
spin up brokers; test_data_file_directories.py:230 asserts byte
equality after the round trip).

Marker-gated: ``pytest -m kafka`` with ``KAFKA_BOOTSTRAP=host:port`` set
(and the spark-sql-kafka connector on the classpath, e.g.
``spark.jars.packages=org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.0``).
Skips cleanly when no broker is configured; the default suite deselects
the marker entirely (pytest.ini addopts)."""

import os
import uuid

import pytest
from pyspark.sql import functions as F

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP", "")

pytestmark = [
    pytest.mark.kafka,
    pytest.mark.skipif(not BOOTSTRAP, reason="KAFKA_BOOTSTRAP not set"),
]


def _require_kafka_connector(spark):
    try:
        spark.read.format("kafka").option(
            "kafka.bootstrap.servers", BOOTSTRAP
        ).option("subscribe", "__connector_probe__").option(
            "startingOffsets", "earliest"
        ).option("endingOffsets", "earliest").load().schema
    except Exception as exc:
        if "Failed to find data source: kafka" in str(exc):
            pytest.skip(
                "spark-sql-kafka connector not on classpath — add "
                "spark.jars.packages=org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>"
            )
        raise


def _chunked_files(spark, n_files=3, chunk_size=64):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(n_files)
    from openmsistream_spark.operators.chunking import chunk_files

    files = docs.select(
        F.concat(F.lit("k/doc_"), "doc_id").alias("rel_path"),
        F.concat(F.lit("doc_"), "doc_id").alias("filename"),
        F.lit("k").alias("subdir_str"),
        F.current_timestamp().alias("modification_time"),
        F.encode("text", "utf-8").alias("content"),
    )
    return chunk_files(files, chunk_size=chunk_size)


def test_chunk_round_trip_through_broker(spark, tmp_path):
    """produce chunks → topic → consume from earliest → reassemble →
    byte equality (K1 + S5 + S6)."""
    from openmsistream_spark.functions import serde
    from openmsistream_spark.operators.assembly import assemble_files
    from openmsistream_spark.schemas import CODE_SUCCESSFULLY_RECONSTRUCTED
    from openmsistream_spark.streaming.sinks import kafka_chunk_sink
    from openmsistream_spark.streaming.sources import kafka_chunk_stream

    _require_kafka_connector(spark)
    topic = f"oms-spark-test-{uuid.uuid4().hex[:12]}"

    chunks = _chunked_files(spark)
    original = {
        r.rel_path: bytes(r.file_hash)
        for r in chunks.select("rel_path", "file_hash").distinct().collect()
    }

    # K1: the chunk sink as a real availableNow writeStream
    wire_dir = str(tmp_path / "wire_in")
    serde.serialize_chunks(chunks).select("msg_key", "value").write.parquet(wire_dir)
    src = spark.readStream.schema("msg_key string, value binary").parquet(wire_dir)
    q = (
        kafka_chunk_sink(src, BOOTSTRAP, topic, str(tmp_path / "ckpt_produce"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # S5/S6: streaming consume from the beginning of the topic
    stream = kafka_chunk_stream(spark, BOOTSTRAP, topic, starting_offsets="earliest")
    q2 = (
        stream.selectExpr("key", "value")
        .writeStream.format("memory")
        .queryName("kafka_rt")
        .option("checkpointLocation", str(tmp_path / "ckpt_consume"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    consumed = spark.sql("SELECT * FROM kafka_rt")

    decoded = serde.deserialize_chunks(consumed)
    good, dlq = serde.dlq_split(decoded)
    assert dlq.count() == 0
    out = assemble_files(
        good.withColumn("rel_path", F.concat_ws("/", "subdir_str", "filename"))
    ).collect()
    assert len(out) == len(original)
    for r in out:
        assert r.status == CODE_SUCCESSFULLY_RECONSTRUCTED
        assert bytes(r.file_hash) == original[r.rel_path]


def test_per_partition_starting_offsets(spark, tmp_path):
    """S7 — the group starting-offset fetch maps to a per-partition
    startingOffsets dict: skipping past offset 0 of partition 0 drops
    the first message."""
    from openmsistream_spark.streaming.sources import kafka_chunk_stream

    _require_kafka_connector(spark)
    topic = f"oms-spark-offsets-{uuid.uuid4().hex[:12]}"
    msgs = spark.createDataFrame(
        [("k0", b"m0"), ("k1", b"m1"), ("k2", b"m2")], "key string, value binary"
    )
    (
        msgs.selectExpr("CAST(key AS BINARY) AS key", "value")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", topic)
        .save()
    )
    offsets = {topic: {"0": 1}}  # partition 0: start at offset 1
    stream = kafka_chunk_stream(spark, BOOTSTRAP, topic, starting_offsets=offsets)
    q = (
        stream.selectExpr("CAST(key AS STRING) AS key")
        .writeStream.format("memory")
        .queryName("kafka_offs")
        .option("checkpointLocation", str(tmp_path / "ckpt_offs"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    keys = {r.key for r in spark.sql("SELECT * FROM kafka_offs").collect()}
    assert "k0" not in keys and len(keys) == 2

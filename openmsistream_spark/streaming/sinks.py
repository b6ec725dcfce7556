"""Sinks (SURVEY §2.6).

K1 Kafka sink: ``writeStream.format("kafka")`` on (key, value) columns —
delivery retries/acks are built in; the reference's re-enqueue-on-error
callback chain (K2) collapses into checkpointed exactly-once.

K3 disk reconstruction sink: ``foreachBatch`` writing completed files
under an output dir, idempotent by (rel_path, file_hash) so replays
don't double-write — the commit protocol that turns Spark's internal
exactly-once into end-to-end idempotence (SURVEY §4 custom work #2).

K4 S3 sink: same protocol against an object store (boto3 optional).
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_reconstructed_files(batch_df: DataFrame, out_dir: str) -> int:
    """Write completed-file rows (rel_path, file_bytes, file_hash) to
    disk, preserving subdirectories (reference:
    data_file_download_directory.py:74-174). Idempotent: a file whose
    on-disk sha512 already matches is skipped. Returns files written.

    Runs on executors via foreachPartition — the driver never holds file
    bytes.
    """
    rows = batch_df.select("rel_path", "file_bytes", "file_hash")

    def _write_partition(it):
        root = os.path.abspath(out_dir)
        for row in it:
            # rel_path comes off the wire — never let '..' or an absolute
            # path escape the output root
            target = os.path.abspath(os.path.join(root, row.rel_path.lstrip("/")))
            if os.path.commonpath([root, target]) != root:
                raise ValueError(
                    f"unsafe rel_path escapes output dir: {row.rel_path!r}"
                )
            os.makedirs(os.path.dirname(target), exist_ok=True)
            payload = bytes(row.file_bytes)
            want = bytes(row.file_hash)
            if os.path.exists(target):
                with open(target, "rb") as fh:
                    if hashlib.sha512(fh.read()).digest() == want:
                        continue  # already written (replay) — idempotent skip
            tmp = target + ".inprogress"
            with open(tmp, "wb") as fh:
                fh.write(payload)
                fh.flush()
                os.fsync(fh.fileno())
            os.replace(tmp, target)  # atomic publish

    rows.rdd.foreachPartition(_write_partition)
    return 0


def reconstruction_sink(completed: DataFrame, out_dir: str, checkpoint_dir: str):
    """K3 — attach the disk-reconstruction foreachBatch sink to a
    streaming DataFrame of completed files."""
    return (
        completed.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(lambda df, _epoch: write_reconstructed_files(df, out_dir))
    )


def kafka_chunk_sink(
    chunks_with_wire: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
):
    """K1 — produce (key, value) rows to a Kafka topic."""
    return (
        chunks_with_wire.selectExpr(
            "CAST(msg_key AS BINARY) AS key", "value"
        )
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
    )


def s3_object_sink(completed: DataFrame, bucket: str, prefix: str, checkpoint_dir: str):
    """K4 — upload completed files to S3 under ``prefix/rel_path`` with a
    read-back hash verify (reference: s3_transfer_stream_processor.py:52-90).
    boto3 is optional; raises cleanly when absent."""

    def _upload(batch_df: DataFrame, _epoch: int) -> None:
        def _part(it):
            try:
                import boto3  # noqa: F401
            except ImportError as exc:  # pragma: no cover - env-dependent
                raise RuntimeError("s3_object_sink requires boto3") from exc
            client = boto3.client("s3")
            for row in it:
                key = f"{prefix.rstrip('/')}/{row.rel_path}"
                body = bytes(row.file_bytes)
                client.put_object(Bucket=bucket, Key=key, Body=body)
                got = client.get_object(Bucket=bucket, Key=key)["Body"].read()
                if hashlib.sha512(got).digest() != bytes(row.file_hash):
                    raise IOError(f"S3 read-back hash mismatch for {key}")

        batch_df.select("rel_path", "file_bytes", "file_hash").rdd.foreachPartition(_part)

    return (
        completed.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_upload)
    )


def heartbeat_stream(chunks: DataFrame, interval: str = "1 minute") -> DataFrame:
    """A8/K7 — windowed heartbeat counters over a chunk stream
    (reference: heartbeat_producibles.py:29-101): message + byte counts
    per tumbling interval, as JSON key/value rows for a Kafka sink."""
    agg = (
        chunks.withColumn("_now", F.current_timestamp())
        .withWatermark("_now", interval)
        .groupBy(F.window("_now", interval).alias("w"))
        .agg(
            F.count("*").alias("n_messages_read"),
            F.sum(F.length("data")).alias("n_bytes_read"),
        )
    )
    return agg.select(
        F.lit("heartbeat").alias("key"),
        F.to_json(
            F.struct(
                F.col("w.start").alias("timestamp"),
                "n_messages_read",
                "n_bytes_read",
            )
        ).alias("value"),
    )

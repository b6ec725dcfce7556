"""K4 S3 sink tests against a filesystem-backed boto3-shaped fake:
verified writes (upload → read-back hash compare, reference
s3_buckets/s3_data_transfer.py:15-40), skip-if-same-checksum replay
idempotence, the status filter, and a checkpointed streaming E2E."""

import hashlib
import json
import os

import pytest
from pyspark.sql import functions as F

from openmsistream_spark.schemas import (
    CODE_IN_PROGRESS,
    CODE_SUCCESSFULLY_RECONSTRUCTED,
)
from openmsistream_spark.streaming.sinks import (
    FilesystemS3Client,
    s3_object_sink,
    upload_batch_to_s3,
)

BUCKET = "testbucket"


def _completed_files_df(spark):
    rows = [
        ("sub/dir/a.csv", b"alpha,beta\n1,2\n"),
        ("sub/b.bin", b"\x00\x01\x02"),
        ("c.txt", b"hello s3"),
    ]
    return spark.createDataFrame(
        [(rp, p, hashlib.sha512(p).digest()) for rp, p in rows],
        "rel_path string, file_bytes binary, file_hash binary",
    )


@pytest.fixture()
def s3_root(tmp_path):
    return str(tmp_path / "s3_state")


def _n_puts(root, key):
    with open(os.path.join(root, BUCKET, key) + ".s3meta.json") as fh:
        return json.load(fh)["n_puts"]


def test_upload_writes_objects_with_checksum_metadata(spark, s3_root):
    upload_batch_to_s3(
        _completed_files_df(spark), BUCKET, "topic", lambda: FilesystemS3Client(s3_root)
    )
    obj = os.path.join(s3_root, BUCKET, "topic/sub/dir/a.csv")
    assert os.path.isfile(obj)
    with open(obj, "rb") as fh:
        body = fh.read()
    assert body == b"alpha,beta\n1,2\n"
    client = FilesystemS3Client(s3_root)
    head = client.head_object(Bucket=BUCKET, Key="topic/sub/dir/a.csv")
    assert head["Metadata"]["sha512"] == hashlib.sha512(body).hexdigest()


def test_replay_skips_matching_checksums(spark, s3_root):
    df = _completed_files_df(spark)
    factory = lambda: FilesystemS3Client(s3_root)  # noqa: E731
    upload_batch_to_s3(df, BUCKET, "topic", factory)
    upload_batch_to_s3(df, BUCKET, "topic", factory)  # replay
    assert _n_puts(s3_root, "topic/c.txt") == 1  # skipped, not re-uploaded
    # changed content under the same key → re-uploaded (hash differs)
    changed = df.withColumn("file_bytes", F.lit(b"NEW")).withColumn(
        "file_hash", F.lit(hashlib.sha512(b"NEW").digest())
    )
    upload_batch_to_s3(changed, BUCKET, "topic", factory)
    assert _n_puts(s3_root, "topic/c.txt") == 2


def test_read_back_verify_raises_on_mismatch(spark, s3_root):
    """A row whose bytes don't hash to its declared file_hash fails the
    post-upload read-back compare (corrupt payload never lands
    silently)."""
    df = spark.createDataFrame(
        [("bad.bin", b"actual bytes", hashlib.sha512(b"expected bytes").digest())],
        "rel_path string, file_bytes binary, file_hash binary",
    )
    with pytest.raises(Exception, match="read-back hash mismatch"):
        upload_batch_to_s3(df, BUCKET, "topic", lambda: FilesystemS3Client(s3_root))


def test_only_reconstructed_rows_upload(spark, s3_root):
    """IN_PROGRESS (null bytes) and HASH_MISMATCH rows never reach the
    store — the reference only hands verified completed files to S3."""
    rows = [
        ("good.bin", b"ok", hashlib.sha512(b"ok").digest(),
         CODE_SUCCESSFULLY_RECONSTRUCTED),
        ("partial.bin", None, hashlib.sha512(b"x").digest(), CODE_IN_PROGRESS),
        ("corrupt.bin", b"bad", hashlib.sha512(b"bad").digest(), "HASH_MISMATCH"),
    ]
    df = spark.createDataFrame(
        rows, "rel_path string, file_bytes binary, file_hash binary, status string"
    )
    upload_batch_to_s3(df, BUCKET, "t", lambda: FilesystemS3Client(s3_root))
    assert os.path.isfile(os.path.join(s3_root, BUCKET, "t/good.bin"))
    assert not os.path.exists(os.path.join(s3_root, BUCKET, "t/partial.bin"))
    assert not os.path.exists(os.path.join(s3_root, BUCKET, "t/corrupt.bin"))


def test_streaming_sink_checkpointed_replay(spark, s3_root, tmp_path):
    """availableNow writeStream over completed rows; a restart with the
    same checkpoint re-reads nothing, and a fresh checkpoint over the
    same input hits the checksum skip — no duplicate uploads either
    way."""
    in_dir = str(tmp_path / "completed_in")
    ckpt = str(tmp_path / "ckpt")
    _completed_files_df(spark).write.parquet(in_dir)
    factory = lambda: FilesystemS3Client(s3_root)  # noqa: E731

    def run(checkpoint):
        src = spark.readStream.schema(
            "rel_path string, file_bytes binary, file_hash binary"
        ).parquet(in_dir)
        q = (
            s3_object_sink(src, BUCKET, "topic", checkpoint, factory)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run(ckpt)
    assert _n_puts(s3_root, "topic/c.txt") == 1
    run(ckpt)  # restart, same checkpoint: source replays nothing
    assert _n_puts(s3_root, "topic/c.txt") == 1
    run(str(tmp_path / "ckpt2"))  # fresh checkpoint: rows reprocess, skip
    assert _n_puts(s3_root, "topic/c.txt") == 1

"""K5 Girder-shaped sink tests against an in-process fake REST backend.

The fake persists its state on the local filesystem (ids are paths) so
assertions survive the executor↔driver process boundary."""

import hashlib
import json
import os

import pytest
from pyspark.sql import functions as F

from openmsistream_spark.streaming.girder import (
    FilesystemGirderClient as FakeGirderClient,
    ensure_root_folder,
    upload_batch_to_girder,
)


def _completed_files_df(spark):
    rows = [
        ("sub/dir/a.csv", b"alpha,beta\n1,2\n"),
        ("sub/b.bin", b"\x00\x01\x02"),
        ("c.txt", b"hello girder"),
    ]
    return spark.createDataFrame(
        [(rp, p, hashlib.sha512(p).digest()) for rp, p in rows],
        "rel_path string, file_bytes binary, file_hash binary",
    )


@pytest.fixture()
def fake_root(tmp_path):
    return str(tmp_path / "girder_state")


def test_root_folder_chain(fake_root):
    client = FakeGirderClient(fake_root)
    meta = {"KafkaTopic": "t1"}
    rid = ensure_root_folder(client, "coll", "coll/root/sub", "t1", meta)
    assert rid.endswith("collections/coll/root/sub")
    assert os.path.isdir(rid)
    with open(os.path.join(rid, "_folder_meta.json")) as fh:
        assert json.load(fh)["KafkaTopic"] == "t1"
    # no path given → folder named after the topic
    rid2 = ensure_root_folder(client, "coll", None, "topicX")
    assert rid2.endswith("collections/coll/topicX")


def test_upload_mirrors_hierarchy_with_checksums(spark, fake_root):
    client = FakeGirderClient(fake_root)
    root_id = ensure_root_folder(client, "coll", None, "topic")
    df = _completed_files_df(spark)
    meta = {"KafkaTopic": "topic"}
    upload_batch_to_girder(
        df, lambda: FakeGirderClient(fake_root), root_id, base_metadata=meta
    )

    # folder hierarchy mirrors producer-side subdirectories
    assert os.path.isfile(os.path.join(root_id, "sub/dir/a.csv.bin"))
    assert os.path.isfile(os.path.join(root_id, "sub/b.bin.bin"))
    assert os.path.isfile(os.path.join(root_id, "c.txt.bin"))
    with open(os.path.join(root_id, "sub/dir/a.csv.bin"), "rb") as fh:
        assert fh.read() == b"alpha,beta\n1,2\n"

    # checksum metadata attached to the item
    _, item = client.find_item(os.path.join(root_id, "sub/dir"), "a.csv")
    expect = hashlib.sha256(b"alpha,beta\n1,2\n").hexdigest()
    assert item["meta"]["checksum"]["sha256"] == expect
    assert item["meta"]["KafkaTopic"] == "topic"
    assert item["mimetype"] == "text/csv"
    # folder metadata present on intermediate folders
    with open(os.path.join(root_id, "sub", "_folder_meta.json")) as fh:
        assert json.load(fh)["KafkaTopic"] == "topic"


def test_path_normalization_and_traversal_guard(spark, fake_root):
    """Benign ''/'.' segments (double slashes, trailing '/') normalize
    away — same tolerance as the disk sink — while '..' still raises."""
    client = FakeGirderClient(fake_root)
    root_id = ensure_root_folder(client, "coll", None, "topic")
    payload = b"double slash ok"
    benign = spark.createDataFrame(
        [("sub//./d.bin/", payload, hashlib.sha512(payload).digest())],
        "rel_path string, file_bytes binary, file_hash binary",
    )
    upload_batch_to_girder(benign, lambda: FakeGirderClient(fake_root), root_id)
    assert os.path.isfile(os.path.join(root_id, "sub/d.bin.bin"))

    evil = spark.createDataFrame(
        [("../escape.bin", payload, hashlib.sha512(payload).digest())],
        "rel_path string, file_bytes binary, file_hash binary",
    )
    with pytest.raises(Exception, match="unsafe rel_path"):
        upload_batch_to_girder(evil, lambda: FakeGirderClient(fake_root), root_id)


def test_streaming_sink_checkpointed_replay(spark, fake_root, tmp_path):
    """girder_sink as an actual writeStream (availableNow) over streaming
    assembly output: only the hash-verified completed file uploads (the
    IN_PROGRESS row has null bytes and must not crash the batch), a
    restart on the same checkpoint replays nothing, and a fresh
    checkpoint hits the same-checksum skip — no duplicate uploads."""
    import hashlib as _hl

    from openmsistream_spark.operators.chunking import chunk_binary_column
    from openmsistream_spark.streaming.assembly import streaming_assemble
    from openmsistream_spark.streaming.girder import girder_sink

    payload = b"streaming girder payload " * 40
    files = spark.createDataFrame(
        [("sub/stream.bin", payload, 1.0), ("sub/partial.bin", b"x" * 96, 1.0)],
        "rel_path string, content binary, file_mtime double",
    )
    chunks = chunk_binary_column(files, chunk_size=32, keep=["rel_path", "file_mtime"])
    # drop one chunk of partial.bin so it stays IN_PROGRESS
    chunks = chunks.filter(
        ~((F.col("rel_path") == "sub/partial.bin") & (F.col("chunk_i") == 2))
    )
    in_dir = str(tmp_path / "chunks_in")
    chunks.write.parquet(in_dir)

    client = FakeGirderClient(fake_root)
    root_id = ensure_root_folder(client, "coll", None, "topic")
    factory = lambda: FakeGirderClient(fake_root)  # noqa: E731

    def run(checkpoint):
        schema = (
            "rel_path string, file_mtime double, n_total_chunks bigint, "
            "file_hash binary, chunk_i bigint, chunk_offset_write bigint, data binary"
        )
        src = spark.readStream.schema(schema).parquet(in_dir)
        q = (
            girder_sink(streaming_assemble(src), factory, root_id, checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    ckpt = str(tmp_path / "ckpt")
    run(ckpt)
    target = os.path.join(root_id, "sub/stream.bin.bin")
    assert os.path.isfile(target)
    with open(target, "rb") as fh:
        assert fh.read() == payload
    assert not os.path.exists(os.path.join(root_id, "sub/partial.bin.bin"))
    _, item = client.find_item(os.path.join(root_id, "sub"), "stream.bin")
    assert item["n_uploads"] == 1
    assert item["meta"]["checksum"]["sha256"] == _hl.sha256(payload).hexdigest()

    run(ckpt)  # restart, same checkpoint — source replays nothing
    _, item = client.find_item(os.path.join(root_id, "sub"), "stream.bin")
    assert item["n_uploads"] == 1
    run(str(tmp_path / "ckpt2"))  # fresh checkpoint — checksum skip
    _, item = client.find_item(os.path.join(root_id, "sub"), "stream.bin")
    assert item["n_uploads"] == 1


def test_replay_is_idempotent_and_replace_gated(spark, fake_root):
    client = FakeGirderClient(fake_root)
    root_id = ensure_root_folder(client, "coll", None, "topic")
    df = _completed_files_df(spark)
    factory = lambda: FakeGirderClient(fake_root)  # noqa: E731

    upload_batch_to_girder(df, factory, root_id)
    upload_batch_to_girder(df, factory, root_id)  # replay — same checksums
    _, item = client.find_item(root_id, "c.txt")
    assert item["n_uploads"] == 1  # skipped, not re-uploaded

    # changed content, replace_existing=False → existing file untouched
    changed = df.withColumn(
        "file_bytes", F.lit(b"NEW CONTENT")
    ).withColumn("file_hash", F.lit(hashlib.sha512(b"NEW CONTENT").digest()))
    upload_batch_to_girder(changed, factory, root_id, replace_existing=False)
    with open(os.path.join(root_id, "c.txt.bin"), "rb") as fh:
        assert fh.read() == b"hello girder"

    # replace_existing=True → replaced and checksum metadata refreshed
    upload_batch_to_girder(changed, factory, root_id, replace_existing=True)
    with open(os.path.join(root_id, "c.txt.bin"), "rb") as fh:
        assert fh.read() == b"NEW CONTENT"
    _, item = client.find_item(root_id, "c.txt")
    assert item["n_uploads"] == 2
    assert item["meta"]["checksum"]["sha256"] == hashlib.sha256(b"NEW CONTENT").hexdigest()

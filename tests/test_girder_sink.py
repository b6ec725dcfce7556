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

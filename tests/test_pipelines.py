"""E2E pipeline tests — the Spark restatement of the reference's
directory round-trip and stream-processor suites
(test_data_file_directories.py:230, test_data_file_stream_processor.py:66-118):
upload a directory through the wire format to a topic, download and
verify byte equality; run processor/reproducer hooks with success and
failure registry bookkeeping; corrupt a message and see it in the DLQ."""

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from openmsistream_spark.pipelines import (
    MetadataJSONReproducer,
    StreamProcessor,
    download_directory,
    upload_directory,
)

CS = 64

FILES = {
    "a.bin": os.urandom(3 * CS + 17),
    "sub/dir/b.bin": os.urandom(2 * CS),
    "sub/c.txt": b"[Measurement conditions]\nAnode,Cu\nK-Alpha1,1.5406\n\ndata,1,2\n",
    ".hidden": b"should never upload",  # dotfile — excluded by S3 predicate
}


@pytest.fixture()
def env(tmp_path):
    watch = tmp_path / "watch"
    for rel, payload in FILES.items():
        p = watch / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(payload)
    return {
        "watch": str(watch),
        "topic": str(tmp_path / "topic"),
        "out": str(tmp_path / "out"),
        "dlq": str(tmp_path / "dlq"),
        "reg": str(tmp_path / "registry"),
        "topic_b": str(tmp_path / "topic_b"),
    }


def test_upload_download_roundtrip(spark, env):
    n = upload_directory(
        spark, env["watch"], env["topic"], chunk_size=CS, registry_dir=env["reg"]
    )
    expected_chunks = sum(
        -(-len(v) // CS) for k, v in FILES.items() if not k.startswith(".")
    )
    assert n == expected_chunks

    statuses = download_directory(spark, env["topic"], env["out"]).collect()
    by_path = {r.rel_path: r.status for r in statuses}
    visible = {k for k in FILES if not k.startswith(".")}
    assert set(by_path) == visible
    assert all(s == "SUCCESSFULLY_RECONSTRUCTED" for s in by_path.values())
    for rel in visible:
        with open(os.path.join(env["out"], rel), "rb") as fh:
            assert fh.read() == FILES[rel], rel
    assert not os.path.exists(os.path.join(env["out"], ".hidden"))

    # R4 upload ledger recorded every file as completed
    reg = spark.read.parquet(env["reg"])
    assert {r.rel_path: r.status for r in reg.collect()} == {
        p: "completed" for p in visible
    }


def test_download_filters(spark, env):
    upload_directory(spark, env["watch"], env["topic"], chunk_size=CS)
    # F2: only files under sub/
    statuses = download_directory(
        spark, env["topic"], env["out"], filepath_regex=r"^sub/"
    ).collect()
    assert {r.rel_path for r in statuses} == {"sub/dir/b.bin", "sub/c.txt"}
    # F1: key regex — chunk keys embed the flattened path prefix
    statuses = download_directory(
        spark, env["topic"], env["out"] + "2", key_regex=r"^a\.bin_chunk"
    ).collect()
    assert {r.rel_path for r in statuses} == {"a.bin"}


def test_dlq_on_corrupt_message(spark, env):
    upload_directory(spark, env["watch"], env["topic"], chunk_size=CS)
    # corrupt one message: truncate its wire bytes
    msgs = spark.read.parquet(env["topic"]).collect()
    corrupt = [(bytes(msgs[0].key), bytes(msgs[0].value)[: len(msgs[0].value) // 2])]
    spark.createDataFrame(corrupt, "key binary, value binary").write.mode(
        "append"
    ).parquet(env["topic"])

    download_directory(spark, env["topic"], env["out"], dlq_dir=env["dlq"])
    dlq = spark.read.parquet(env["dlq"]).collect()
    assert len(dlq) == 1
    assert dlq[0].deser_error is not None
    # the good copy of the same chunk still reconstructed everything
    for rel in (k for k in FILES if not k.startswith(".")):
        with open(os.path.join(env["out"], rel), "rb") as fh:
            assert fh.read() == FILES[rel]


class _CountingProcessor(StreamProcessor):
    def process_file(self, rel_path: str, content: bytes) -> None:
        if rel_path.endswith(".txt"):
            raise ValueError("txt files unsupported in this processor")
        assert len(content) > 0


def test_stream_processor_registry(spark, env):
    upload_directory(spark, env["watch"], env["topic"], chunk_size=CS)
    reg = _CountingProcessor().run(
        spark, env["topic"], registry_dir=env["reg"]
    )
    got = {r.rel_path: (r.status, r.error) for r in reg.collect()}
    assert got["a.bin"][0] == "succeeded"
    assert got["sub/dir/b.bin"][0] == "succeeded"
    assert got["sub/c.txt"][0] == "failed"
    assert "unsupported" in got["sub/c.txt"][1]


def test_metadata_reproducer_roundtrip(spark, env):
    upload_directory(spark, env["watch"], env["topic"], chunk_size=CS)
    reg = MetadataJSONReproducer().run(
        spark,
        env["topic"],
        env["topic_b"],
        registry_dir=env["reg"],
        filepath_regex=r"\.txt$",
    )
    assert {r.status for r in reg.collect()} == {"results_produced"}

    msgs = spark.read.parquet(env["topic_b"]).collect()
    assert len(msgs) == 1
    assert bytes(msgs[0].key).decode() == "sub/c.txt_metadata"
    meta = json.loads(bytes(msgs[0].value).decode())
    assert meta["Measurement conditions.Anode"] == "Cu"
    assert meta["Measurement conditions.K-Alpha1"] == "1.5406"

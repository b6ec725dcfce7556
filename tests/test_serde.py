"""Wire-format serde tests, mirroring the reference's round-trip and
9-field backward-compat golden tests (test_serialization.py:121-299)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from openmsistream_spark.functions import serde
from openmsistream_spark.operators.chunking import chunk_files


def make_wire_row(payload: bytes, filename="f.dat", n=1, i=1, offset=0, mtime=123.5,
                  nine_field=False):
    fields = [
        filename,
        hashlib.sha512(payload).digest(),
        hashlib.sha512(payload).digest(),
        offset,
        i,
        n,
        "sub",
        "",
        payload,
        mtime,
    ]
    if nine_field:
        fields = fields[:9]
    return serde.packb(fields)


def test_pure_python_codec_roundtrip():
    cases = [
        "hello", "", "x" * 300, b"", b"bytes", b"y" * 70000,
        0, 127, 128, 65535, 2**40, -1, -32, -33, -(2**40),
        1.5, 0.0, None, True, False,
        ["nested", [1, 2.5, b"b"], None],
    ]
    for c in cases:
        assert serde.unpackb(serde.packb(c)) == c, c


def test_chunk_serde_roundtrip_spark(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    files = docs.select(
        F.concat(F.lit("d/doc_"), "doc_id").alias("rel_path"),
        F.concat(F.lit("doc_"), "doc_id").alias("filename"),
        F.lit("d").alias("subdir_str"),
        F.current_timestamp().alias("modification_time"),
        F.encode("text", "utf-8").alias("content"),
    )
    chunks = chunk_files(files, chunk_size=100)
    wire = serde.serialize_chunks(chunks).select("value")
    decoded = serde.deserialize_chunks(wire)
    good, dlq = serde.dlq_split(decoded)
    assert dlq.count() == 0
    orig = {
        (r.filename, r.chunk_i): bytes(r.data) for r in chunks.collect()
    }
    for r in good.collect():
        assert bytes(r.data) == orig[(r.filename, r.chunk_i)]
        assert r.subdir_str == "d"
        assert r.file_mtime is not None


def test_nine_field_backward_compat(spark):
    payload = b"legacy-wire-format"
    rows = [
        (make_wire_row(payload, nine_field=True),),
        (make_wire_row(payload, nine_field=False),),
    ]
    df = spark.createDataFrame(rows, "value binary")
    decoded = serde.deserialize_chunks(df).collect()
    assert all(r.hash_ok for r in decoded)
    mtimes = sorted((r.file_mtime is None for r in decoded))
    assert mtimes == [False, True]  # 10-field keeps mtime, 9-field null


def test_corrupt_message_goes_to_dlq(spark):
    good = make_wire_row(b"fine")
    bad_payload = serde.packb(["f", b"h", b"h", 0, 1, 1, "", "", b"tampered", 0.0])
    garbage = b"\xde\xad\xbe\xef"
    df = spark.createDataFrame([(good,), (bad_payload,), (garbage,)], "value binary")
    goodf, dlq = serde.dlq_split(serde.deserialize_chunks(df))
    assert goodf.count() == 1
    rows = dlq.collect()
    assert len(rows) == 2
    assert any(r.deser_error is not None for r in rows)  # undecodable
    assert any(r.deser_error is None and not r.hash_ok for r in rows)  # hash fail

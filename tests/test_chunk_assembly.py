"""End-to-end slice: chunk → (shuffle/dup/mutate) → assemble → verify.

Spark restatement of the reference's byte-equality round-trip test
(reference: test/test_scripts/test_data_file_directories.py:230) plus the
generation-policy cases of download_data_file.py:160-272.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from openmsistream_spark.operators.assembly import (
    assemble_files,
    pick_latest_generation,
)
from openmsistream_spark.operators.chunking import chunk_binary_column, chunk_files
from openmsistream_spark.schemas import (
    CODE_CORRUPTION,
    CODE_HASH_MISMATCH,
    CODE_IN_PROGRESS,
    CODE_SUCCESSFULLY_RECONSTRUCTED,
)

CHUNK_SIZE = 64


@pytest.fixture(scope="module")
def files_df(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    return docs.select(
        F.concat(F.lit("docs/doc_"), F.col("doc_id")).alias("rel_path"),
        F.concat(F.lit("doc_"), F.col("doc_id")).alias("filename"),
        F.lit("docs").alias("subdir_str"),
        F.current_timestamp().alias("modification_time"),
        F.encode("text", "utf-8").alias("content"),
    )


def test_roundtrip_byte_equality(spark, files_df):
    chunks = chunk_files(files_df, chunk_size=CHUNK_SIZE)
    # shuffle arrival order + duplicate some chunks (at-least-once delivery)
    arrived = chunks.orderBy(F.rand(seed=7)).union(chunks.filter("chunk_i % 3 = 0"))
    out = assemble_files(arrived)
    rows = out.collect()
    assert len(rows) == files_df.count()
    assert all(r.status == CODE_SUCCESSFULLY_RECONSTRUCTED for r in rows)

    orig = {r.rel_path: bytes(r.content) for r in files_df.collect()}
    for r in rows:
        assert bytes(r.file_bytes) == orig[r.rel_path]
        assert hashlib.sha512(bytes(r.file_bytes)).digest() == bytes(r.file_hash)


def test_join_and_window_strategies_agree(spark, files_df):
    """The metadata-join path and the one-pass window path are two
    physical plans for the same semantics — identical output on a
    shuffled, duplicated, multi-generation input."""
    chunks = chunk_files(files_df, chunk_size=CHUNK_SIZE)
    # stale generation rows for one file + duplicates + shuffled order
    stale = (
        chunks.filter("chunk_i = 1")
        .withColumn("n_total_chunks", F.lit(1).cast("long"))
        .withColumn("file_hash", F.unhex(F.sha2(F.col("data"), 512)))
    )
    # re-send some chunks of the CURRENT generation with a newer mtime
    # (same hash, same n_total): mtime orders generations but must not
    # split one generation — both strategies must keep the older-mtime rows
    resent = chunks.filter("chunk_i = 0").withColumn(
        "file_mtime", F.col("file_mtime") + F.lit(100.0)
    )
    arrived = (
        chunks.unionByName(stale)
        .unionByName(resent)
        .orderBy(F.rand(seed=11))
        .union(chunks.filter("chunk_i % 2 = 0"))
    )

    def snap(df):
        return sorted(
            (
                r.rel_path,
                r.status,
                r.n_total_chunks,
                r.n_chunks_received,
                None if r.file_bytes is None else bytes(r.file_bytes),
            )
            for r in df.collect()
        )

    a = snap(assemble_files(arrived, generation_strategy="join"))
    b = snap(assemble_files(arrived, generation_strategy="window"))
    assert a == b
    # and the mixed-mtime generation still fully reconstructs
    assert all(s == CODE_SUCCESSFULLY_RECONSTRUCTED for (_, s, *_rest) in a)

    pa = snap_gen(pick_latest_generation(arrived, strategy="join"))
    pb = snap_gen(pick_latest_generation(arrived, strategy="window"))
    assert pa == pb


def snap_gen(df):
    return sorted(
        (r.rel_path, r.chunk_i, r.n_total_chunks, bytes(r.file_hash))
        for r in df.collect()
    )


def test_incomplete_and_corrupt(spark, files_df):
    chunks = chunk_files(files_df, chunk_size=CHUNK_SIZE)
    multi = chunks.filter("n_total_chunks >= 3")
    # drop one chunk of each file -> IN_PROGRESS
    partial = multi.filter("chunk_i != 2")
    out = assemble_files(partial).collect()
    assert out and all(r.status == CODE_IN_PROGRESS for r in out)
    assert all(r.file_bytes is None for r in out)

    # corrupt one chunk's payload (keep stale file_hash) -> HASH_MISMATCH
    corrupt = multi.withColumn(
        "data",
        F.when(F.col("chunk_i") == 1, F.encode(F.lit("XXX-corrupted"), "utf-8")).otherwise(
            F.col("data")
        ),
    )
    out2 = assemble_files(corrupt).collect()
    assert out2 and all(r.status == CODE_HASH_MISMATCH for r in out2)


def test_generation_policy(spark):
    # file v1: 2 chunks; file v2: 3 chunks (adopt: more chunks);
    # file w: same chunk count, newer mtime wins; older generation discarded
    rows = []

    def gen(rel, payload, mtime):
        df = spark.createDataFrame(
            [(rel, payload, mtime)], "rel_path string, content binary, file_mtime double"
        )
        return chunk_binary_column(
            df.withColumn("mt", F.col("file_mtime")).drop("file_mtime").withColumnRenamed("mt", "file_mtime"),
            content="content",
            chunk_size=4,
            keep=["rel_path", "file_mtime"],
        )

    v1 = gen("f", b"aaaabbbb", 100.0)  # 2 chunks
    v2 = gen("f", b"ccccddddeeee", 50.0)  # 3 chunks, older mtime — still adopted
    w_old = gen("w", b"11112222", 10.0)
    w_new = gen("w", b"33334444", 20.0)  # same count, newer mtime — adopted

    all_chunks = v1.union(v2).union(w_old).union(w_new)
    picked = pick_latest_generation(all_chunks)
    f_n = picked.filter("rel_path='f'").select("n_total_chunks").distinct().collect()
    assert [r.n_total_chunks for r in f_n] == [3]
    w_mt = picked.filter("rel_path='w'").select("file_mtime").distinct().collect()
    assert [r.file_mtime for r in w_mt] == [20.0]

    out = {r.rel_path: bytes(r.file_bytes) for r in assemble_files(all_chunks).collect()}
    assert out == {"f": b"ccccddddeeee", "w": b"33334444"}


def test_same_hash_different_count_is_corruption(spark):
    """Reference semantics (download_data_file.py:160-272): one file_hash
    seen with two different n_total_chunks is corruption, not adoption —
    the file must surface status CORRUPTION with null bytes."""
    df = spark.createDataFrame(
        [("f", b"aaaabbbb"), ("ok", b"ccccdddd")],
        "rel_path string, content binary",
    ).withColumn("file_mtime", F.lit(1.0))
    chunks = chunk_binary_column(df, chunk_size=4, keep=["rel_path", "file_mtime"])
    # forge a chunk of f claiming the SAME hash but a different count
    forged = chunks.filter("rel_path='f' AND chunk_i=1").withColumn(
        "n_total_chunks", F.lit(5).cast("long")
    )
    out = {r.rel_path: r for r in assemble_files(chunks.union(forged)).collect()}
    assert out["f"].status == CODE_CORRUPTION
    assert out["f"].file_bytes is None
    assert out["ok"].status == CODE_SUCCESSFULLY_RECONSTRUCTED
    assert bytes(out["ok"].file_bytes) == b"ccccdddd"


def test_many_chunk_assembly_is_linear(spark):
    """5k-chunk file assembles without the O(n²) concat blowup (a 5000-
    chunk file under F.aggregate+concat does ~12.5M byte-copies of the
    running prefix; the Arrow b''.join path is one pass)."""
    import time

    cs = 256
    payload = bytes(range(256)) * (5000 * cs // 256)  # exactly 5000 chunks
    df = spark.createDataFrame(
        [("big", payload)], "rel_path string, content binary"
    ).withColumn("file_mtime", F.lit(1.0))
    chunks = chunk_binary_column(df, chunk_size=cs, keep=["rel_path", "file_mtime"])
    t0 = time.monotonic()
    rows = assemble_files(chunks).collect()
    elapsed = time.monotonic() - t0
    assert rows[0].status == CODE_SUCCESSFULLY_RECONSTRUCTED
    assert bytes(rows[0].file_bytes) == payload
    assert rows[0].n_total_chunks == 5000
    assert elapsed < 60  # generous; the quadratic path takes minutes


def test_zero_and_boundary_sizes(spark):
    # sizes straddling chunk_size multiples: 0, 1, cs-1, cs, cs+1, 5*cs
    cs = 8
    payloads = [b"", b"x", b"y" * (cs - 1), b"z" * cs, b"q" * (cs + 1), b"m" * (5 * cs)]
    df = spark.createDataFrame(
        [(f"f{i}", p) for i, p in enumerate(payloads)],
        "rel_path string, content binary",
    ).withColumn("file_mtime", F.lit(1.0))
    chunks = chunk_binary_column(df, chunk_size=cs, keep=["rel_path", "file_mtime"])
    got_n = {
        r.rel_path: r.n_total_chunks
        for r in chunks.select("rel_path", "n_total_chunks").distinct().collect()
    }
    # zero-byte file produces no chunks (reference chunker semantics)
    assert got_n == {"f1": 1, "f2": 1, "f3": 1, "f4": 2, "f5": 5}
    out = {r.rel_path: bytes(r.file_bytes) for r in assemble_files(chunks).collect()}
    for i, p in enumerate(payloads):
        if p:
            assert out[f"f{i}"] == p

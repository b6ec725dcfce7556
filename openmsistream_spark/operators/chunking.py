"""P1/P2 — file chunker as a declarative Spark plan.

The reference slices each file into ``chunk_size`` byte pieces with a
running sha512 per chunk and per file
(reference: data_file_io/entity/upload_data_file.py:230-304, default size
utilities/config.py:33). Here the slice is ``posexplode(sequence(...))``
+ ``substring`` on the binary column and hashes are ``sha2`` — all
JVM-side, whole-stage-codegen'd, no Python in the hot path.

Scale note: one input row per file fans out to N chunk rows; Spark
repartitions the exploded output by its natural parallelism, so a single
huge file still parallelizes downstream (each chunk row is independent).
The explode is pipelined — no shuffle is introduced until a downstream
groupBy/join asks for one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashes import sha512_digest
from ..functions.keys import msg_key
from ..schemas import DEFAULT_CHUNK_SIZE


def chunk_binary_column(
    df: DataFrame,
    content: str = "content",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    keep: list[str] | None = None,
) -> DataFrame:
    """Explode a binary column into (chunk_i, chunk_offset_write, data) rows.

    ``keep`` — passthrough columns (file identity, mtime, ...).
    A zero-byte file produces zero chunks, matching the reference chunker
    (upload_data_file.py:230-246 iterates an empty chunk list).
    """
    keep = keep or [c for c in df.columns if c != content]
    n_chunks = F.ceil(F.length(F.col(content)) / F.lit(chunk_size)).cast("long")
    return (
        df.withColumn("n_total_chunks", n_chunks)
        .withColumn("file_hash", sha512_digest(F.col(content)))
        .select(
            *keep,
            "n_total_chunks",
            "file_hash",
            # guard: Spark's sequence(0, -1) counts DOWN, so an empty file
            # must map to an explicit empty array (zero chunk rows)
            F.posexplode(
                F.when(
                    F.col("n_total_chunks") > 0,
                    F.sequence(F.lit(0), F.col("n_total_chunks") - 1),
                ).otherwise(F.array().cast("array<bigint>"))
            ).alias("_pos", "_i"),
            F.col(content).alias("_content"),
        )
        .select(
            *keep,
            "n_total_chunks",
            "file_hash",
            (F.col("_i") + 1).alias("chunk_i"),  # 1-based, per the wire format
            (F.col("_i") * chunk_size).alias("chunk_offset_write"),
            F.substring(
                F.col("_content"), (F.col("_i") * chunk_size + 1).cast("int"), chunk_size
            ).alias("data"),
        )
        .withColumn("chunk_hash", sha512_digest(F.col("data")))
    )


def chunk_files(
    files: DataFrame,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    select_bytes: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """Chunk a ``files`` DataFrame (FILE_SCHEMA) into wire-format chunk rows.

    ``select_bytes`` — optional list of (start, stop) byte ranges; only
    those ranges are chunked and hashed, and write offsets are compacted
    to be contiguous (reference semantics: upload_data_file.py:236-292 —
    read offsets differ from write offsets when ranges are selected).
    """
    df = files
    if select_bytes:
        ranges = sorted(select_bytes)
        pieces = [
            F.substring(F.col("content"), start + 1, stop - start)
            for start, stop in ranges
        ]
        df = df.withColumn("content", F.concat(*pieces))
    chunks = chunk_binary_column(
        df.select(
            "rel_path",
            "filename",
            F.coalesce(F.col("subdir_str"), F.lit("")).alias("subdir_str"),
            F.lit("").alias("filename_append"),
            F.col("modification_time").cast("double").alias("file_mtime"),
            "content",
        ),
        content="content",
        chunk_size=chunk_size,
        keep=["rel_path", "filename", "subdir_str", "filename_append", "file_mtime"],
    )
    return chunks.withColumn("msg_key", msg_key())


def verify_chunk_hashes(chunks: DataFrame) -> DataFrame:
    """Append ``hash_ok`` — re-verify sha512(data)==chunk_hash, the check the
    reference runs on every deserialize (serialization.py:245-253)."""
    return chunks.withColumn(
        "hash_ok", sha512_digest(F.col("data")) == F.col("chunk_hash")
    )

"""Kafka message-key construction/parsing.

Key format: ``{subdir with '/'->'_'}_{filename}_chunk_{i}_of_{N}``
(reference: data_file_io/entity/data_file_chunk.py:102-107,
data_file_io/utilities.py:59-64). Pure column expressions — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def msg_key(
    subdir_str: Column | str = "subdir_str",
    filename: Column | str = "filename",
    chunk_i: Column | str = "chunk_i",
    n_total_chunks: Column | str = "n_total_chunks",
) -> Column:
    """Build the message key column."""
    sub = F.col(subdir_str) if isinstance(subdir_str, str) else subdir_str
    fn = F.col(filename) if isinstance(filename, str) else filename
    i = F.col(chunk_i) if isinstance(chunk_i, str) else chunk_i
    n = F.col(n_total_chunks) if isinstance(n_total_chunks, str) else n_total_chunks
    prefix = F.when(
        (sub.isNull()) | (sub == ""), fn
    ).otherwise(F.concat_ws("_", F.regexp_replace(sub, "/", "_"), fn))
    return F.concat(
        prefix,
        F.lit("_chunk_"),
        i.cast("string"),
        F.lit("_of_"),
        n.cast("string"),
    )


def parse_msg_key(key: Column | str = "msg_key") -> Column:
    """Extract (prefix, chunk_i, n_total_chunks) from a message key."""
    k = F.col(key) if isinstance(key, str) else key
    rx = r"^(.*)_chunk_(\d+)_of_(\d+)$"
    return F.struct(
        F.regexp_extract(k, rx, 1).alias("key_prefix"),
        F.regexp_extract(k, rx, 2).cast("long").alias("chunk_i"),
        F.regexp_extract(k, rx, 3).cast("long").alias("n_total_chunks"),
    )

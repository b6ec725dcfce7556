"""Hash helpers.

The reference hashes every chunk and file with sha512 and compares raw
digest bytes (reference: kafka_wrapper/serialization.py:245-253,
data_file_io/entity/data_file_chunk.py:259-268). Spark's ``sha2`` returns
a hex string; ``unhex`` recovers the raw digest so byte-level wire parity
holds without a Python UDF — the whole hash path stays inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sha512_hex(col: Column | str) -> Column:
    """Hex-string sha512 of a binary/string column (JVM-side)."""
    return F.sha2(F.col(col) if isinstance(col, str) else col, 512)


def sha512_digest(col: Column | str) -> Column:
    """Raw 64-byte sha512 digest (wire parity with the reference)."""
    return F.unhex(sha512_hex(col))


def portable_hash64(col: Column | str, bits: int = 60) -> Column:
    """Deterministic, engine-portable non-negative int hash.

    Derived from md5 hex so the identical value is computable in any SQL
    engine (DuckDB oracle parity: ``hash()`` differs between engines, md5
    does not). Used for minhash/simhash/LSH bucketing where the *same*
    hash family must be reproducible everywhere.
    """
    c = F.col(col) if isinstance(col, str) else col
    # 15 hex chars = 60 bits, fits a signed 64-bit int without overflow
    nchars = bits // 4
    return F.conv(F.substring(F.md5(c), 1, nchars), 16, 10).cast("long")

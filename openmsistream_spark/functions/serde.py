"""P3/P4/P5 — wire-format serde: chunk struct ⇄ msgpack bytes.

The reference's wire format is an ordered msgpack 10-list
[filename, file_hash, chunk_hash, chunk_offset_write, chunk_i,
 n_total_chunks, subdir_str, filename_append, data, file_mtime]
(reference: kafka_wrapper/serialization.py:184-199); the deserializer
accepts 9 or 10 fields (mtime optional, backward compat,
serialization.py:217-237) and re-verifies sha512(data) == chunk_hash on
every deserialize (serialization.py:245-253).

Spark-first shape: serde runs as Arrow-batched Pandas UDFs (the only
Python in the pipeline — everything before/after stays JVM-side), and
the sha512 verification is re-checked with JVM ``sha2`` so a corrupt
message routes to the DLQ split instead of raising mid-task.

``msgpack`` is preferred when installed; otherwise a minimal pure-Python
codec covering exactly the wire subset (fixarray, str, bin, int, float64,
nil) keeps byte-for-byte compatibility.
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # real msgpack when available
    import msgpack as _msgpack
except ImportError:  # pragma: no cover - env-dependent
    _msgpack = None


# --------------------------------------------------------------------------
# Minimal msgpack subset codec (wire-compatible for the chunk record)
# --------------------------------------------------------------------------

def _pack_one(obj, out: bytearray) -> None:
    if obj is None:
        out.append(0xC0)
    elif isinstance(obj, bool):
        out.append(0xC3 if obj else 0xC2)
    elif isinstance(obj, int):
        if 0 <= obj <= 0x7F:
            out.append(obj)
        elif -32 <= obj < 0:
            out.append(0x100 + obj)
        elif 0 <= obj <= 0xFF:
            out += bytes([0xCC, obj])
        elif 0 <= obj <= 0xFFFF:
            out += b"\xcd" + struct.pack(">H", obj)
        elif 0 <= obj <= 0xFFFFFFFF:
            out += b"\xce" + struct.pack(">I", obj)
        elif 0 <= obj:
            out += b"\xcf" + struct.pack(">Q", obj)
        elif obj >= -(2**31):
            out += b"\xd2" + struct.pack(">i", obj)
        else:
            out += b"\xd3" + struct.pack(">q", obj)
    elif isinstance(obj, float):
        out += b"\xcb" + struct.pack(">d", obj)
    elif isinstance(obj, str):
        b = obj.encode("utf-8")
        n = len(b)
        if n <= 31:
            out.append(0xA0 | n)
        elif n <= 0xFF:
            out += bytes([0xD9, n])
        elif n <= 0xFFFF:
            out += b"\xda" + struct.pack(">H", n)
        else:
            out += b"\xdb" + struct.pack(">I", n)
        out += b
    elif isinstance(obj, (bytes, bytearray, memoryview)):
        b = bytes(obj)
        n = len(b)
        if n <= 0xFF:
            out += bytes([0xC4, n])
        elif n <= 0xFFFF:
            out += b"\xc5" + struct.pack(">H", n)
        else:
            out += b"\xc6" + struct.pack(">I", n)
        out += b
    elif isinstance(obj, (list, tuple)):
        n = len(obj)
        if n <= 15:
            out.append(0x90 | n)
        elif n <= 0xFFFF:
            out += b"\xdc" + struct.pack(">H", n)
        else:
            out += b"\xdd" + struct.pack(">I", n)
        for item in obj:
            _pack_one(item, out)
    else:
        raise TypeError(f"unsupported type for wire format: {type(obj)}")


def _unpack_one(buf: memoryview, pos: int):
    tag = buf[pos]
    pos += 1
    if tag <= 0x7F:
        return tag, pos
    if tag >= 0xE0:
        return tag - 0x100, pos
    if 0x90 <= tag <= 0x9F:
        return _unpack_seq(buf, pos, tag & 0x0F)
    if 0xA0 <= tag <= 0xBF:
        n = tag & 0x1F
        return bytes(buf[pos : pos + n]).decode("utf-8"), pos + n
    if tag == 0xC0:
        return None, pos
    if tag == 0xC2:
        return False, pos
    if tag == 0xC3:
        return True, pos
    if tag == 0xC4:
        n = buf[pos]
        return bytes(buf[pos + 1 : pos + 1 + n]), pos + 1 + n
    if tag == 0xC5:
        (n,) = struct.unpack_from(">H", buf, pos)
        return bytes(buf[pos + 2 : pos + 2 + n]), pos + 2 + n
    if tag == 0xC6:
        (n,) = struct.unpack_from(">I", buf, pos)
        return bytes(buf[pos + 4 : pos + 4 + n]), pos + 4 + n
    if tag == 0xCB:
        (v,) = struct.unpack_from(">d", buf, pos)
        return v, pos + 8
    if tag == 0xCC:
        return buf[pos], pos + 1
    if tag == 0xCD:
        (v,) = struct.unpack_from(">H", buf, pos)
        return v, pos + 2
    if tag == 0xCE:
        (v,) = struct.unpack_from(">I", buf, pos)
        return v, pos + 4
    if tag == 0xCF:
        (v,) = struct.unpack_from(">Q", buf, pos)
        return v, pos + 8
    if tag == 0xD2:
        (v,) = struct.unpack_from(">i", buf, pos)
        return v, pos + 4
    if tag == 0xD3:
        (v,) = struct.unpack_from(">q", buf, pos)
        return v, pos + 8
    if tag == 0xD9:
        n = buf[pos]
        return bytes(buf[pos + 1 : pos + 1 + n]).decode("utf-8"), pos + 1 + n
    if tag == 0xDA:
        (n,) = struct.unpack_from(">H", buf, pos)
        return bytes(buf[pos + 2 : pos + 2 + n]).decode("utf-8"), pos + 2 + n
    if tag == 0xDB:
        (n,) = struct.unpack_from(">I", buf, pos)
        return bytes(buf[pos + 4 : pos + 4 + n]).decode("utf-8"), pos + 4 + n
    if tag == 0xDC:
        (n,) = struct.unpack_from(">H", buf, pos)
        return _unpack_seq(buf, pos + 2, n)
    raise ValueError(f"unsupported msgpack tag 0x{tag:02x}")


def _unpack_seq(buf: memoryview, pos: int, n: int):
    items = []
    for _ in range(n):
        item, pos = _unpack_one(buf, pos)
        items.append(item)
    return items, pos


def packb(obj) -> bytes:
    if _msgpack is not None:
        return _msgpack.packb(obj, use_bin_type=True)
    out = bytearray()
    _pack_one(obj, out)
    return bytes(out)


def unpackb(data: bytes):
    if _msgpack is not None:
        return _msgpack.unpackb(data, raw=False)
    obj, pos = _unpack_one(memoryview(data), 0)
    if pos != len(data):
        raise ValueError("trailing bytes in msgpack payload")
    return obj


# --------------------------------------------------------------------------
# Spark serde operators
# --------------------------------------------------------------------------

WIRE_FIELDS = [
    "filename", "file_hash", "chunk_hash", "chunk_offset_write", "chunk_i",
    "n_total_chunks", "subdir_str", "filename_append", "data", "file_mtime",
]

_DESER_SCHEMA = T.StructType(
    [
        T.StructField("filename", T.StringType()),
        T.StructField("file_hash", T.BinaryType()),
        T.StructField("chunk_hash", T.BinaryType()),
        T.StructField("chunk_offset_write", T.LongType()),
        T.StructField("chunk_i", T.LongType()),
        T.StructField("n_total_chunks", T.LongType()),
        T.StructField("subdir_str", T.StringType()),
        T.StructField("filename_append", T.StringType()),
        T.StructField("data", T.BinaryType()),
        T.StructField("file_mtime", T.DoubleType()),
        T.StructField("deser_error", T.StringType()),
    ]
)


@F.pandas_udf(T.BinaryType())
def _serialize_udf(
    filename: pd.Series, file_hash: pd.Series, chunk_hash: pd.Series,
    chunk_offset_write: pd.Series, chunk_i: pd.Series, n_total_chunks: pd.Series,
    subdir_str: pd.Series, filename_append: pd.Series, data: pd.Series,
    file_mtime: pd.Series,
) -> pd.Series:
    # zip over python lists — per-element Series.iloc would dominate the
    # codec cost ~10× at tens of thousands of rows per Arrow batch
    out = [
        packb(
            [
                fn,
                bytes(fh),
                bytes(ch),
                int(off),
                int(ci),
                int(nt),
                sd or "",
                fa or "",
                bytes(d) if d is not None else b"",
                # wire sentinel: null mtime travels as 0.0 (serialization.py:194-198)
                0.0 if mt is None or pd.isna(mt) else float(mt),
            ]
        )
        for fn, fh, ch, off, ci, nt, sd, fa, d, mt in zip(
            filename.tolist(), file_hash.tolist(), chunk_hash.tolist(),
            chunk_offset_write.tolist(), chunk_i.tolist(), n_total_chunks.tolist(),
            subdir_str.tolist(), filename_append.tolist(), data.tolist(),
            file_mtime.tolist(),
        )
    ]
    return pd.Series(out)


def serialize_chunks(chunks: DataFrame, value_col: str = "value") -> DataFrame:
    """P3 — chunk struct rows → msgpack wire bytes column."""
    return chunks.withColumn(
        value_col,
        _serialize_udf(
            "filename", "file_hash", "chunk_hash", "chunk_offset_write", "chunk_i",
            "n_total_chunks", "subdir_str", "filename_append", "data", "file_mtime",
        ),
    )


@F.pandas_udf(_DESER_SCHEMA)
def _deserialize_udf(value: pd.Series) -> pd.DataFrame:
    # column-wise accumulation: building a DataFrame from dict-of-lists is
    # far cheaper than list-of-dicts at Arrow-batch row counts
    names = [c.name for c in _DESER_SCHEMA]
    cols: dict[str, list] = {n: [] for n in names}

    def emit(fields, err):
        cols["filename"].append(fields[0])
        cols["file_hash"].append(fields[1])
        cols["chunk_hash"].append(fields[2])
        cols["chunk_offset_write"].append(fields[3])
        cols["chunk_i"].append(fields[4])
        cols["n_total_chunks"].append(fields[5])
        cols["subdir_str"].append(fields[6])
        cols["filename_append"].append(fields[7])
        cols["data"].append(fields[8])
        cols["file_mtime"].append(fields[9])
        cols["deser_error"].append(err)

    for raw in value.tolist():
        try:
            fields = unpackb(bytes(raw))
            if not isinstance(fields, list) or len(fields) not in (9, 10):
                raise ValueError(f"expected 9 or 10 wire fields, got {fields!r:.60}")
            if len(fields) == 9:  # pre-mtime wire format, backward compat
                fields = fields + [None]
            mtime = fields[9]
            emit(
                [
                    fields[0], bytes(fields[1]), bytes(fields[2]), int(fields[3]),
                    int(fields[4]), int(fields[5]), fields[6], fields[7],
                    bytes(fields[8]),
                    # 0.0 is the wire's null sentinel
                    None if mtime in (None, 0.0) else float(mtime),
                ],
                None,
            )
        except Exception as exc:  # malformed message → DLQ row, not a crash
            emit([None] * 10, str(exc)[:200])
    return pd.DataFrame(cols)


def deserialize_chunks(
    messages: DataFrame, value_col: str = "value", verify: bool = True
) -> DataFrame:
    """P4 — wire bytes → chunk struct columns (+ ``hash_ok`` when
    ``verify``). The sha512 re-check runs JVM-side (sha2) so corrupt
    payloads become filterable rows (DLQ split K6), mirroring the
    reference's verify-on-deserialize (serialization.py:245-253)."""
    out = messages.withColumn("_chunk", _deserialize_udf(F.col(value_col))).select(
        *[c for c in messages.columns], "_chunk.*"
    )
    if verify:
        out = out.withColumn(
            "hash_ok",
            F.col("deser_error").isNull()
            & (F.unhex(F.sha2(F.col("data"), 512)) == F.col("chunk_hash")),
        )
    return out


def dlq_split(decoded: DataFrame) -> tuple[DataFrame, DataFrame]:
    """K6 — split a deserialized stream into (good, dead-letter).
    Splits on the hash verify too when present (deserialize verify=True),
    else on deserialization errors alone."""
    ok = F.col("deser_error").isNull()
    if "hash_ok" in decoded.columns:
        ok = ok & F.col("hash_ok")
    return decoded.filter(ok), decoded.filter(~ok)

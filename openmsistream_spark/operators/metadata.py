"""P7/P8 — per-file metadata extraction and analytics over completed files.

The reference's extension hook is `_get_metadata_dict_for_file(datafile)
-> dict`, JSON-serialized to a derived topic (reference:
metadata_extraction/metadata_json_reproducer.py:55-93); its example
parses a `[Measurement conditions]` header block from instrument CSV
text (examples/extracting_metadata/xrd_csv_metadata_reproducer.py:16-68).

Spark form: an Arrow-batched ``mapInPandas`` over completed-file rows
producing MAP<STRING,STRING> + the JSON wire column — the UDF tier the
reference's subclass hook maps to (SURVEY §2.9).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MetadataFn = Callable[[str, bytes], dict[str, str]]

_OUT_FIELDS = [
    T.StructField("rel_path", T.StringType()),
    T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
]
METADATA_SCHEMA = T.StructType(_OUT_FIELDS)


def header_block_metadata(rel_path: str, content: bytes) -> dict[str, str]:
    """Default extractor: parse `[Section]` / `key,value[,value2...]`
    header blocks from text files (the shape of the reference's XRD CSV
    example). Multi-valued keys join with ';'; blank values → ''."""
    meta: dict[str, str] = {}
    section = None
    try:
        text = content.decode("utf-8", errors="replace")
    except Exception:
        return meta
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        if line.startswith("[") and line.endswith("]"):
            section = line[1:-1]
            continue
        if section and "," in line:
            key, *vals = line.split(",")
            meta[f"{section}.{key.strip()}"] = ";".join(v.strip() for v in vals)
    return meta


def extract_metadata(
    completed: DataFrame,
    fn: MetadataFn = header_block_metadata,
    content_col: str = "file_bytes",
) -> DataFrame:
    """Run the metadata hook over completed files; returns
    (rel_path, metadata MAP, metadata_json STRING) rows ready for a
    derived-topic sink (the Reproducer shape, A5)."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                content = bytes(getattr(row, content_col))
                out.append(
                    {"rel_path": row.rel_path, "metadata": fn(row.rel_path, content)}
                )
            yield pd.DataFrame(out, columns=["rel_path", "metadata"])

    extracted = completed.select("rel_path", content_col).mapInPandas(
        _run, METADATA_SCHEMA
    )
    return extracted.withColumn(
        "metadata_json", F.to_json(F.col("metadata"))
    )

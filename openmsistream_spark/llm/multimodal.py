"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partition-parallel
``mapInPandas`` batch shape, Arrow transfer, metadata structs. The codec
step itself is pluggable: real decoders (PIL/librosa/av) register via
``set_decoder`` when their libraries exist; this container has none, so
the default is a deterministic fake decoder (for plumbing tests) and
``strict`` mode raises NotImplementedError, clearly marking the stub.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_sha256", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

Decoder = Callable[[str, bytes], dict]
_DECODER: Decoder | None = None


def set_decoder(fn: Decoder) -> None:
    """Plug in a real decode/feature-extract step (e.g. PIL-based)."""
    global _DECODER
    _DECODER = fn


def fake_decoder(media_type: str, content: bytes) -> dict:
    """Deterministic stand-in for the codec step: derives pseudo
    dimensions and an 8-dim feature vector from the content hash, so the
    distributed plumbing is fully exercisable without codec libraries."""
    digest = hashlib.sha256(content).digest()
    return {
        "width": 16 + digest[0],
        "height": 16 + digest[1],
        "n_frames": 1 if media_type == "image" else 1 + digest[2] % 32,
        "features": [b / 255.0 for b in digest[:8]],
    }


def decode_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode/feature-extract media rows via partition-parallel
    ``mapInPandas`` (one Arrow batch per call — the batch shape a real
    GPU/codec stage needs). ``strict=True`` refuses to run without a
    real decoder registered."""

    decoder = _DECODER
    if decoder is None:
        if strict:
            raise NotImplementedError(
                "no media decoder registered: install codec libraries and call "
                "set_decoder(); the container image ships none (stub by design)"
            )
        decoder = fake_decoder

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                content = bytes(row.content) if row.content is not None else b""
                d = decoder(row.media_type, content)
                out.append(
                    {
                        "media_id": row.media_id,
                        "media_type": row.media_type,
                        "n_bytes": len(content),
                        "content_sha256": hashlib.sha256(content).hexdigest(),
                        "width": d.get("width"),
                        "height": d.get("height"),
                        "n_frames": d.get("n_frames"),
                        "features": d.get("features"),
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.select("media_id", "media_type", "content").mapInPandas(
        _run, FEATURE_SCHEMA
    )


def resize_media(
    media: DataFrame, target_width: int, strict: bool = False
) -> DataFrame:
    """Resize plumbing: decode → compute target dimensions (aspect-ratio
    preserving) → re-encode. With a real codec registered the content
    bytes are resampled; the deterministic fake keeps the plumbing
    testable by deriving the resized content hash from (source hash,
    target dims). Dimension math runs JVM-side after the decode stage."""
    feats = decode_features(media, strict=strict)
    new_h = F.greatest(
        F.lit(1),
        F.round(F.col("height") * F.lit(target_width) / F.col("width")).cast("int"),
    )
    return feats.select(
        "media_id",
        "media_type",
        F.col("width").alias("orig_width"),
        F.col("height").alias("orig_height"),
        F.lit(target_width).cast("int").alias("width"),
        new_h.alias("height"),
        F.md5(
            F.concat_ws(
                ":",
                F.col("content_sha256"),
                F.lit(str(target_width)),
                new_h.cast("string"),
            )
        ).alias("resized_content_id"),
    )


def sample_frames(media: DataFrame, every_nth: int = 10) -> DataFrame:
    """Frame-sampling plumbing: explode decoded frame indices and keep
    every n-th — the plan shape of video frame extraction (the decode of
    each frame goes through the same mapInPandas stage)."""
    feats = decode_features(media)
    return (
        feats.withColumn(
            "frame_i",
            F.explode(F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)))),
        )
        .filter(F.col("frame_i") % every_nth == 0)
        .select("media_id", "media_type", "frame_i", "content_sha256")
    )

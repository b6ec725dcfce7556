"""Video keyframe near-dup — the third leg of the multimodal dedup
treatment (images: llm/phash.py, audio: llm/audiofp.py).

A "video" here is a dependency-free container the sandbox can
actually decode: a multi-image PNM stream (the PNM spec permits
concatenating images in one file — ffmpeg's image2pipe emits exactly
this), each image one frame, or an animated GIF (round 14 — frames
composited onto the logical screen by ``llm/gif.py``). The operator family is the published
video-dedup recipe: sample keyframes, perceptual-hash each sampled
frame (dHash, llm/phash.py — integer-exact), then call two videos
near-duplicates when enough TEMPORALLY ALIGNED keyframes match within
a Hamming budget.

Scale shape: ONE Arrow ``mapInPandas`` decode+sample+hash stage per
corpus (the multimodal codec batch shape) emitting (media_id, frame_i,
fingerprint) — 24 bytes per sampled frame; then banding, join, and
aggregation are pure JVM codegen. The banded candidate join carries
``frame_i`` in its key, so only aligned frames ever pair — candidates
scale with per-(frame, band-value) bucket sizes, never all-pairs of
frames or of videos. The reference engine has no video path (lab files
only); this derives from the public perceptual-hash / keyframe-dedup
literature per the driver's brief ("multimodal columns": frame-sample
as a first-class op).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .multimodal import video_frames
from .phash import dhash_int, gray_pixels, phash_int

FRAME_FINGERPRINT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_i", T.LongType()),
        T.StructField("fingerprint", T.LongType()),
    ]
)


def video_frame_fingerprints(
    media: DataFrame,
    every_nth: int = 1,
    algo: str = "dhash",
    strict: bool = True,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Keyframe fingerprints for a video media frame → (media_id,
    frame_i, fingerprint): decode the PNM stream, keep every
    ``every_nth``-th frame (frame_i is the index in the FULL stream —
    the multimodal.sample_frames rule), dHash/pHash each kept frame.
    One Arrow stage; the same strictness policy as the image/audio
    families (strict raises on undecodable bytes, non-strict skips the
    row — no fake fallback)."""
    if algo not in ("dhash", "phash"):
        raise ValueError(f"unknown perceptual hash algo {algo!r}")
    if every_nth < 1:
        raise ValueError("every_nth must be >= 1")
    hash_fn = dhash_int if algo == "dhash" else phash_int

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, fps = [], [], []
            for row in pdf.itertuples(index=False):
                content = bytes(row.content) if row.content is not None else b""
                # decode AND hash inside the guard: a stream can parse
                # fine yet contain a frame smaller than the hash grid —
                # that row must raise-with-context / skip like any other
                # undecodable one, not abort the whole Arrow stage
                try:
                    px_frames = video_frames(content)
                    row_frames = [
                        (i, hash_fn(gray_pixels(px)))
                        for i, px in enumerate(px_frames)
                        if i % every_nth == 0
                    ]
                except ValueError as exc:
                    if strict:
                        raise ValueError(
                            "video_frame_fingerprints: unusable media "
                            f"bytes for media_id={row.media_id} ({exc}; "
                            "built-ins cover multi-image binary PNM "
                            "streams and animated GIF, frames at least "
                            "the hash grid; pass strict=False to skip "
                            "such rows)"
                        )
                    continue
                for i, fp in row_frames:
                    ids.append(row.media_id)
                    frames.append(i)
                    fps.append(fp)
            yield pd.DataFrame(
                {"media_id": ids, "frame_i": frames, "fingerprint": fps}
            )

    return media.select(
        F.col(id_col).alias("media_id"), F.col(content_col).alias("content")
    ).mapInPandas(_run, FRAME_FINGERPRINT_SCHEMA)


def frame_aligned_band_pairs(
    fps: DataFrame,
    bits: int = 64,
    bands: int = 8,
    max_hamming: int = 7,
    persist_fingerprints: bool = True,
) -> DataFrame:
    """Aligned frame-pair report over (media_id, frame_i, fingerprint):
    the phash.hamming_band_pairs pigeonhole device with ``frame_i``
    threaded through the band join key, so frame k of one video only
    ever pairs with frame k of another (temporal alignment). Returns
    (id_a, id_b, frame_i, hamming), id_a < id_b, one row per aligned
    frame pair within the budget; max_hamming < bands keeps the sweep
    complete."""
    if bits % bands != 0:
        raise ValueError(f"bits={bits} not divisible by bands={bands}")
    width = bits // bands
    mask = (1 << width) - 1
    fp = fps.select("media_id", "frame_i", "fingerprint")
    if persist_fingerprints:
        from pyspark import StorageLevel

        fp = fp.persist(StorageLevel.MEMORY_AND_DISK)
    banded = fp.select(
        "media_id",
        "frame_i",
        "fingerprint",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("fingerprint", b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_val"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_bk"),
    ).select("media_id", "frame_i", "fingerprint", "_bk.band", "_bk.band_val")
    a = banded.select(
        F.col("media_id").alias("id_a"),
        F.col("fingerprint").alias("fp_a"),
        "frame_i",
        "band",
        "band_val",
    )
    b = banded.select(
        F.col("media_id").alias("id_b"),
        F.col("fingerprint").alias("fp_b"),
        "frame_i",
        "band",
        "band_val",
    )
    return (
        a.join(b, ["frame_i", "band", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "frame_i")
        .agg(F.min(F.expr("bit_count(fp_a ^ fp_b)")).cast("bigint").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def video_scene_changes(
    media: DataFrame,
    every_nth: int = 1,
    algo: str = "dhash",
    threshold: int = 10,
    strict: bool = True,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Shot-boundary detection by perceptual-hash jump (the published
    keyframe-selection device: a scene cut is a consecutive-frame pair
    whose fingerprints differ by MORE than ``threshold`` Hamming bits;
    within a shot, frames drift only a few bits). Returns (media_id,
    n_frames, n_scene_changes).

    Scale shape: the one Arrow decode+hash stage, then a per-video lag
    window (hash-partitioned by media_id, ordered by frame_i — state
    scales with frames per video, never corpus-wide) and one grouped
    count. The curation use: sample one keyframe per detected scene
    instead of every n-th frame."""
    from pyspark.sql import Window

    fps = video_frame_fingerprints(
        media,
        every_nth=every_nth,
        algo=algo,
        strict=strict,
        id_col=id_col,
        content_col=content_col,
    )
    w = Window.partitionBy("media_id").orderBy("frame_i")
    prev = F.lag("fingerprint").over(w)
    jump = F.expr("bit_count(fingerprint ^ _prev)")
    return (
        fps.withColumn("_prev", prev)
        .withColumn(
            "_cut",
            F.when(F.col("_prev").isNull(), F.lit(0)).otherwise(
                (jump > threshold).cast("int")
            ),
        )
        .groupBy("media_id")
        .agg(
            F.count("*").cast("bigint").alias("n_frames"),
            F.sum("_cut").cast("bigint").alias("n_scene_changes"),
        )
    )


def video_neardup_pairs(
    media: DataFrame,
    every_nth: int = 1,
    algo: str = "dhash",
    bands: int = 8,
    max_hamming: int = 7,
    min_frames: int = 1,
    strict: bool = True,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """decode → keyframe fingerprints → aligned banded frame pairs →
    per-video-pair rollup: (id_a, id_b, n_frames_matched, min_hamming),
    keeping pairs with at least ``min_frames`` aligned keyframes inside
    the Hamming budget. The video analogue of image/audio
    ``*_neardup_pairs``."""
    fps = video_frame_fingerprints(
        media,
        every_nth=every_nth,
        algo=algo,
        strict=strict,
        id_col=id_col,
        content_col=content_col,
    )
    frame_pairs = frame_aligned_band_pairs(
        fps, bands=bands, max_hamming=max_hamming
    )
    return (
        frame_pairs.groupBy("id_a", "id_b")
        .agg(
            F.count("*").cast("bigint").alias("n_frames_matched"),
            F.min("hamming").cast("bigint").alias("min_hamming"),
        )
        .filter(F.col("n_frames_matched") >= min_frames)
    )


def video_representative_fingerprint(
    frame_fps: DataFrame,
    id_col: str = "media_id",
    fp_col: str = "fingerprint",
) -> DataFrame:
    """Reduce per-frame fingerprints to ONE representative 64-bit
    fingerprint per video: per-bit MAJORITY vote across the sampled
    frames (bit k of the result is set iff set in strictly more than
    half of the frames; exact ties clear the bit — deterministic,
    order-independent). Returns (media_id, fingerprint, n_frames) —
    one row per media_id, exactly the shape
    ``phash.incremental_fingerprint_neardup`` and the streaming media
    sink's ledger require (their upsert is media_id-keyed and refuses
    raw multi-frame input).

    Why majority and not the first keyframe: intros/logos are SHARED
    across unrelated videos, so a first-frame representative
    manufactures false bridges; the majority fold instead needs a bit
    to agree across half the video. And it degrades gracefully — a
    re-encoded copy whose per-frame hashes each drift a few bits still
    folds to a nearby representative unless some bit flips in half the
    frames (the same centroid-of-bits device simhash itself applies to
    feature hashes). The trade, documented honestly: two videos
    sharing only a SUBSEQUENCE (one clip inside another) fold to
    distant representatives — subsequence matching is what the aligned
    per-frame report (``frame_aligned_band_pairs``) is for; the
    representative serves the one-row-per-item ledger contract.

    Scale shape: one map-side-combinable groupBy over media_id with 65
    codegen aggregates (count + one per bit) — 24 bytes in per sampled
    frame, 16 bytes out per video, no Python, no window, no second
    shuffle.
    """
    one = F.lit(1).cast("bigint")
    aggs = [F.count("*").cast("bigint").alias("n_frames")] + [
        F.sum(F.shiftrightunsigned(F.col(fp_col), k).bitwiseAND(one)).alias(
            f"_c{k}"
        )
        for k in range(64)
    ]
    counted = frame_fps.groupBy(F.col(id_col).alias("media_id")).agg(*aggs)
    fp = F.lit(0).cast("bigint")
    for k in range(64):
        fp = fp.bitwiseOR(
            F.when(
                F.col(f"_c{k}") * 2 > F.col("n_frames"),
                # Java shiftleft wraps k=63 to Long.MIN_VALUE — the
                # two's-complement fold, same as phash._to_signed64
                F.shiftleft(one, k),
            ).otherwise(F.lit(0).cast("bigint"))
        )
    return counted.select("media_id", fp.alias("fingerprint"), "n_frames")

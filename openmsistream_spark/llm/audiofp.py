"""Audio perceptual fingerprint + Hamming-banded near-dup — the dedup
treatment for the audio modality, completing the multimodal axis
(images got dHash/pHash in llm/phash.py; every text modality already
had one: exact / MinHash / SimHash / span / embedding).

The fingerprint is a 64-bit **temporal-envelope hash**: the
sign-of-difference construction of the published robust-audio-hash
family (Haitsma & Kalker 2002, "A Highly Robust Audio Fingerprinting
System") applied to the time-domain energy envelope instead of spectral
bands — no FFT needed, which keeps every step EXACT INTEGER arithmetic:

- decode WAV to raw centered integer PCM (llm/multimodal.wav_pcm —
  8-bit unsigned gets 128 subtracted, 16-bit is already signed; fold
  multichannel to channel 0),
- partition the samples into 65 equal-measure frames at boundaries
  floor(i*n/65) (the llm/phash block-pooling rule, 1-D),
- frame energy = sum of |sample| (int64 via cumsum; compared as Python
  ints so no width limit),
- bit k (0..63) is set iff frame k's MEAN energy is LESS THAN frame
  k+1's, compared cross-multiplied (sum_l * len_r < sum_r * len_l) so
  no float ever enters — a DuckDB oracle reproduces every bit.

Robustness shape: one changed sample changes one frame sum, which can
flip at most its two adjacent comparison bits — so k perturbed samples
move the hash at most 2k bits (property-tested), while any global gain
change (multiplying every sample by a positive constant) leaves every
bit untouched (volume invariance, the analogue of pHash's brightness
invariance).

Near-dup pairs reuse llm/phash.hamming_band_pairs verbatim (the
fingerprint column is modality-agnostic): 8 bands x 8 bits with
max_hamming = 7 < bands gives a guaranteed-complete banded sweep.

Scale shape: ONE Arrow ``mapInPandas`` decode+hash stage (same batch
shape as multimodal.decode_features), then a 16-byte/clip fingerprint
table and JVM-only banding/join/bit_count. The reference engine has no
audio path (lab files only — nothing to cite); this derives from the
public audio-fingerprinting literature per the driver's brief
("multimodal columns" as first-class).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .multimodal import wav_pcm
from .phash import FINGERPRINT_SCHEMA, _to_signed64, hamming_band_pairs

#: 65 envelope frames -> 64 adjacent-frame comparisons.
_ENV_FRAMES = 65


def envelope_hash_int(samples: "np.ndarray", frames: int = _ENV_FRAMES) -> int:
    """64-bit temporal-envelope hash of a centered integer sample array,
    as signed int. ``samples`` must be 1-D int64 (one channel) with at
    least ``frames`` samples; frame boundaries are floor(i*n/frames) and
    the comparison is cross-multiplied integer sums — exact for any
    clip length (Python-int products, no overflow)."""
    n = len(samples)
    if n < frames:
        raise ValueError(f"clip of {n} samples shorter than the {frames}-frame grid")
    cum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.abs(samples), out=cum[1:])
    bounds = (np.arange(frames + 1) * n) // frames
    sums = [int(v) for v in cum[bounds[1:]] - cum[bounds[:-1]]]
    lens = [int(v) for v in bounds[1:] - bounds[:-1]]
    fp = 0
    for k in range(frames - 1):
        if sums[k] * lens[k + 1] < sums[k + 1] * lens[k]:
            fp |= 1 << k
    return _to_signed64(fp)


def wav_envelope_int(content: bytes, frames: int = _ENV_FRAMES) -> int:
    """WAV bytes -> envelope hash: decode raw centered PCM, fold
    multichannel to channel 0 (deterministic — never a float mixdown),
    hash."""
    samples, n_channels, _rate, _bits = wav_pcm(content)
    if n_channels > 1:
        samples = samples[0::n_channels]
    return envelope_hash_int(samples, frames=frames)


def audio_fingerprints(
    media: DataFrame,
    strict: bool = True,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Envelope fingerprints for an audio media frame → (media_id,
    fingerprint BIGINT), one Arrow ``mapInPandas`` stage — the audio
    twin of phash.image_fingerprints, with the same strictness policy:
    ``strict=True`` raises on bytes that are not decodable PCM WAV (a
    fake fingerprint would manufacture false near-dup/non-dup verdicts),
    ``strict=False`` skips such rows (mixed-corpus mode). There is
    deliberately no fake fallback."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for row in pdf.itertuples(index=False):
                content = bytes(row.content) if row.content is not None else b""
                try:
                    fps.append(wav_envelope_int(content))
                except ValueError:
                    if strict:
                        raise ValueError(
                            "audio_fingerprints: undecodable media bytes for "
                            f"media_id={row.media_id} (built-in covers 8/16-bit "
                            "integer PCM WAV; pass strict=False to skip "
                            "non-audio rows)"
                        )
                    continue
                ids.append(row.media_id)
            yield pd.DataFrame({"media_id": ids, "fingerprint": fps})

    return media.select(
        F.col(id_col).alias("media_id"), F.col(content_col).alias("content")
    ).mapInPandas(_run, FINGERPRINT_SCHEMA)


QUALITY_SCHEMA_FIELDS = [
    ("media_id", "long"),
    ("n_samples", "long"),
    ("n_silent", "long"),
    ("n_clipped", "long"),
    ("n_zero_cross", "long"),
    ("sum_abs", "long"),
]


def audio_quality_counts(
    samples: "np.ndarray", silence_max: int, clip_min: int
) -> tuple:
    """Integer-exact quality counters over one centered sample array:
    (n_samples, n_silent, n_clipped, n_zero_cross, sum_abs) where
    silent = |s| <= silence_max, clipped = |s| >= clip_min, and a zero
    crossing is a strict sign change (s[i] * s[i+1] < 0). All exact
    integers — the audio analogue of the text quality heuristics
    (llm/textstats.py), and like them designed so ratios/thresholds are
    the CALLER's policy while the engine emits auditable counts."""
    a = np.abs(samples)
    return (
        int(len(samples)),
        int((a <= silence_max).sum()),
        int((a >= clip_min).sum()),
        int(((samples[:-1].astype(np.int64) * samples[1:]) < 0).sum())
        if len(samples) > 1
        else 0,
        int(a.sum()),
    )


def audio_quality_stats(
    media: DataFrame,
    silence_max: int = 40,
    clip_min: int = 60,
    strict: bool = True,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Per-clip audio quality counters → (media_id, n_samples, n_silent,
    n_clipped, n_zero_cross, sum_abs), one Arrow stage over the same
    decode as ``audio_fingerprints`` (channel-0 fold). Counts, not
    ratios, so every column is an exact integer both engines reproduce;
    silence/clipping thresholds are in raw centered-sample units (8-bit
    full scale 128, 16-bit 32768). The published curation use: drop
    clips that are mostly silence or mostly clipped before expensive
    downstream featurization."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField(n, T.LongType()) for n, _ in QUALITY_SCHEMA_FIELDS]
    )

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {n: [] for n, _ in QUALITY_SCHEMA_FIELDS}
            for row in pdf.itertuples(index=False):
                content = bytes(row.content) if row.content is not None else b""
                try:
                    samples, n_channels, _rate, _bits = wav_pcm(content)
                except ValueError:
                    if strict:
                        raise ValueError(
                            "audio_quality_stats: undecodable media bytes for "
                            f"media_id={row.media_id} (pass strict=False to "
                            "skip non-audio rows)"
                        )
                    continue
                if n_channels > 1:
                    samples = samples[0::n_channels]
                vals = audio_quality_counts(samples, silence_max, clip_min)
                out["media_id"].append(row.media_id)
                for (name, _), v in zip(QUALITY_SCHEMA_FIELDS[1:], vals):
                    out[name].append(v)
            yield pd.DataFrame(out)

    return media.select(
        F.col(id_col).alias("media_id"), F.col(content_col).alias("content")
    ).mapInPandas(_run, schema)


def audio_neardup_pairs(
    media: DataFrame,
    bands: int = 8,
    max_hamming: int = 7,
    strict: bool = True,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """decode → envelope fingerprint → Hamming-banded pairs, in one
    call: (id_a, id_b, hamming). The audio analogue of
    phash.image_neardup_pairs — same pigeonhole banding device, same
    completeness bound (max_hamming < bands ⇒ the banded sweep finds
    every qualifying pair)."""
    fps = audio_fingerprints(
        media, strict=strict, id_col=id_col, content_col=content_col
    )
    return hamming_band_pairs(fps, bands=bands, max_hamming=max_hamming)

"""Audio perceptual hashing (llm/audiofp.py): envelope-hash integer
exactness against a naive reference, the 2-bits-per-perturbed-sample
bound, volume invariance, 8-vs-16-bit and multichannel decode paths,
strict-mode policy, and planted near-dup recall through the full
distributed path (the test_phash.py treatment, one modality over)."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from openmsistream_spark.llm.audiofp import (
    audio_fingerprints,
    audio_neardup_pairs,
    envelope_hash_int,
    wav_envelope_int,
)
from openmsistream_spark.llm.multimodal import wav_pcm
from openmsistream_spark.llm.phash import _to_signed64


def _wav8(samples_u8: bytes, channels: int = 1, rate: int = 8000) -> bytes:
    """Minimal 8-bit unsigned PCM WAV."""
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels, channels, 8)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(samples_u8))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(samples_u8))
        + samples_u8
    )


def _wav16(samples_i16: np.ndarray, channels: int = 1, rate: int = 8000) -> bytes:
    data = samples_i16.astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _naive_envelope(samples: np.ndarray, frames: int = 65) -> int:
    """Straight-from-the-definition reference: float mean of |sample|
    per floor-boundary frame, bit k set iff mean k < mean k+1."""
    n = len(samples)
    b = [(i * n) // frames for i in range(frames + 1)]
    means = [np.abs(samples[b[i] : b[i + 1]]).mean() for i in range(frames)]
    fp = 0
    for k in range(frames - 1):
        if means[k] < means[k + 1]:
            fp |= 1 << k
    return _to_signed64(fp)


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


@given(st.integers(65, 4000), st.integers(0, 2**32 - 1))
@settings(max_examples=40, deadline=None)
def test_envelope_matches_naive_reference(n, seed):
    """Cross-multiplied integer compare equals the float-mean definition
    (ties resolve identically through strict <)."""
    s = np.random.RandomState(seed).randint(-32768, 32768, size=n).astype(np.int64)
    assert envelope_hash_int(s) == _naive_envelope(s)


def test_short_clip_raises():
    with pytest.raises(ValueError, match="shorter than"):
        envelope_hash_int(np.ones(64, dtype=np.int64))


def test_volume_invariance_and_perturbation_bound():
    rng = np.random.RandomState(7)
    s = rng.randint(-30000, 30000, size=2600).astype(np.int64)
    base = envelope_hash_int(s)
    # integer gain leaves every bit untouched (cross-multiplied compare)
    assert envelope_hash_int(s * 3) == base
    # k perturbed samples flip at most 2k bits (each touches one frame
    # sum; a frame participates in exactly 2 adjacent comparisons)
    for k in (1, 3, 10):
        noisy = s.copy()
        idx = rng.choice(len(s), k, replace=False)
        noisy[idx] = rng.randint(-30000, 30000, size=k)
        assert _hamming(base, envelope_hash_int(noisy)) <= 2 * k
    # an unrelated clip is far (expected ~32 of 64 bits)
    other = rng.randint(-30000, 30000, size=2600).astype(np.int64)
    assert _hamming(base, envelope_hash_int(other)) >= 16


def test_wav_decode_paths_agree():
    """The SAME waveform through 8-bit and 16-bit containers yields the
    identical fingerprint when sample values are proportional (8-bit
    centered v-128 vs 16-bit 256*(v-128): pure gain, hash-invariant)."""
    rng = np.random.RandomState(3)
    u8 = rng.randint(0, 256, size=650).astype(np.uint8)
    fp8 = wav_envelope_int(_wav8(u8.tobytes()))
    i16 = (u8.astype(np.int64) - 128) * 256
    fp16 = wav_envelope_int(_wav16(i16))
    assert fp8 == fp16 == envelope_hash_int(u8.astype(np.int64) - 128)


def test_multichannel_folds_to_channel0():
    rng = np.random.RandomState(5)
    left = rng.randint(-30000, 30000, size=400).astype(np.int64)
    right = rng.randint(-30000, 30000, size=400).astype(np.int64)
    inter = np.empty(800, dtype=np.int64)
    inter[0::2], inter[1::2] = left, right
    assert wav_envelope_int(_wav16(inter, channels=2)) == envelope_hash_int(left)
    samples, ch, rate, bits = wav_pcm(_wav16(inter, channels=2))
    assert (ch, bits) == (2, 16) and len(samples) == 800


def test_audio_quality_counts_exact():
    from openmsistream_spark.llm.audiofp import audio_quality_counts

    s = np.array([0, 5, -5, 100, -100, 30, -31, 0, 2], dtype=np.int64)
    n, silent, clipped, zc, sa = audio_quality_counts(s, silence_max=10, clip_min=90)
    assert n == 9
    assert silent == 5  # 0, 5, -5, 0, 2
    assert clipped == 2  # 100, -100
    # strict sign changes: (5,-5), (-5,100), (100,-100), (-100,30),
    # (30,-31) = 5 (zeros never cross — product is 0, not < 0)
    assert zc == 5
    assert sa == sum(abs(int(x)) for x in s)


def test_audio_quality_stats_distributed(spark):
    from openmsistream_spark.llm.audiofp import audio_quality_counts, audio_quality_stats

    rng = np.random.RandomState(9)
    u8 = rng.randint(0, 256, size=300).astype(np.uint8)
    media = spark.createDataFrame(
        [(5, bytearray(_wav8(u8.tobytes())))], "media_id long, content binary"
    )
    row = audio_quality_stats(media, silence_max=40, clip_min=60).collect()[0]
    want = audio_quality_counts(u8.astype(np.int64) - 128, 40, 60)
    assert (
        row.n_samples,
        row.n_silent,
        row.n_clipped,
        row.n_zero_cross,
        row.sum_abs,
    ) == want
    assert row.n_zero_cross > 0  # real signed audio does cross zero


def test_truncated_fmt_chunk_is_valueerror():
    """A RIFF/WAVE container whose fmt chunk is shorter than its header
    promises must raise ValueError (the decoder family's type), not
    struct.error — the skip-mode handlers catch ValueError only."""
    bad = b"RIFF" + struct.pack("<I", 20) + b"WAVE" + b"fmt " + struct.pack("<I", 16) + b"\x01\x00"
    with pytest.raises(ValueError, match="truncated WAV fmt"):
        wav_pcm(bad)


def test_strict_raises_skip_mode_skips(spark):
    trunc = (
        b"RIFF" + struct.pack("<I", 20) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + b"\x01\x00"
    )
    media = spark.createDataFrame(
        [
            (0, bytearray(_wav8(bytes(range(65, 65 + 130)) * 2))),
            (1, bytearray(b"not audio at all")),
            (2, bytearray(trunc)),  # parses as RIFF, fmt chunk truncated
        ],
        "media_id long, content binary",
    )
    with pytest.raises(Exception, match="undecodable"):
        audio_fingerprints(media, strict=True).collect()
    got = audio_fingerprints(media, strict=False).collect()
    assert [r.media_id for r in got] == [0]


def test_planted_neardup_recall_end_to_end(spark):
    """30 distinct random clips, each with a 3-sample-perturbed twin
    (hamming <= 6 by the perturbation bound): every planted pair must
    return from the banded sweep, and no pair may bridge two different
    base clips."""
    rng = np.random.RandomState(42)
    rows, planted = [], set()
    for i in range(30):
        u8 = rng.randint(0, 256, size=650).astype(np.uint8)
        twin = u8.copy()
        idx = rng.choice(len(u8), 3, replace=False)
        twin[idx] = rng.randint(0, 256, size=3)
        assert (
            _hamming(
                wav_envelope_int(_wav8(u8.tobytes())),
                wav_envelope_int(_wav8(twin.tobytes())),
            )
            <= 6
        )
        rows.append((2 * i, bytearray(_wav8(u8.tobytes()))))
        rows.append((2 * i + 1, bytearray(_wav8(twin.tobytes()))))
        planted.add((2 * i, 2 * i + 1))
    media = spark.createDataFrame(rows, "media_id long, content binary")
    pairs = {
        (r.id_a, r.id_b)
        for r in audio_neardup_pairs(media, max_hamming=7).collect()
    }
    assert planted <= pairs, f"missed planted pairs: {planted - pairs}"
    assert not {(a, b) for a, b in pairs if a // 2 != b // 2}

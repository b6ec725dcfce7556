"""Video keyframe near-dup (llm/videofp.py): PNM stream decode,
sampling rule, aligned banding vs brute force, rollup semantics, and
planted recall through the full distributed path."""

import numpy as np
import pytest

from openmsistream_spark.llm.multimodal import pnm_stream_frames, ppm_pixels
from openmsistream_spark.llm.phash import dhash_int, gray_pixels
from openmsistream_spark.llm.videofp import (
    frame_aligned_band_pairs,
    video_frame_fingerprints,
    video_neardup_pairs,
)


def _pgm(gray2d: np.ndarray) -> bytes:
    h, w = gray2d.shape
    return f"P5 {w} {h} 255\n".encode() + gray2d.astype(np.uint8).tobytes()


def _stream(frames) -> bytes:
    return b"".join(_pgm(f) for f in frames)


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_pnm_stream_roundtrip():
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 256, size=(16, 18)).astype(np.uint8) for _ in range(4)]
    got = pnm_stream_frames(_stream(frames))
    assert len(got) == 4
    for want, have in zip(frames, got):
        assert (have[:, :, 0] == want).all()
    # single-image parse unchanged; whitespace between images tolerated
    assert (ppm_pixels(_pgm(frames[0]))[:, :, 0] == frames[0]).all()
    spaced = _pgm(frames[0]) + b"\n\n" + _pgm(frames[1])
    assert len(pnm_stream_frames(spaced)) == 2
    with pytest.raises(ValueError, match="empty"):
        pnm_stream_frames(b"")
    with pytest.raises(ValueError):
        pnm_stream_frames(_pgm(frames[0]) + b"garbage")


def test_sampling_rule_and_hashes(spark):
    rng = np.random.RandomState(1)
    frames = [rng.randint(0, 256, size=(16, 18)).astype(np.uint8) for _ in range(5)]
    media = spark.createDataFrame(
        [(7, bytearray(_stream(frames)))], "media_id long, content binary"
    )
    got = {
        r.frame_i: r.fingerprint
        for r in video_frame_fingerprints(media, every_nth=2).collect()
    }
    assert set(got) == {0, 2, 4}  # every 2nd of 5 frames
    for i in (0, 2, 4):
        assert got[i] == dhash_int(gray_pixels(frames[i][:, :, None]))


def test_strict_raises_skip_mode_skips(spark):
    ok = _stream([np.zeros((16, 18), dtype=np.uint8)])
    media = spark.createDataFrame(
        [(0, bytearray(ok)), (1, bytearray(b"not a video"))],
        "media_id long, content binary",
    )
    with pytest.raises(Exception, match="unusable"):
        video_frame_fingerprints(media, strict=True).collect()
    got = video_frame_fingerprints(media, strict=False).collect()
    assert [r.media_id for r in got] == [0]


def test_tiny_frame_skips_not_aborts(spark):
    """A PARSEABLE stream whose frame is smaller than the hash grid
    must behave like any undecodable row: skip under strict=False,
    raise with media_id context under strict=True — never abort the
    whole Arrow stage."""
    ok = _stream([np.zeros((16, 18), dtype=np.uint8)])
    tiny = _stream([np.zeros((4, 4), dtype=np.uint8)])  # parses, unhashable
    media = spark.createDataFrame(
        [(0, bytearray(ok)), (1, bytearray(tiny))],
        "media_id long, content binary",
    )
    got = video_frame_fingerprints(media, strict=False).collect()
    assert [r.media_id for r in got] == [0]
    with pytest.raises(Exception, match="media_id=1"):
        video_frame_fingerprints(media, strict=True).collect()


def test_aligned_banding_vs_bruteforce(spark):
    """Alignment: identical fingerprints on DIFFERENT frame indices must
    NOT pair; the banded sweep equals brute force per frame index."""
    rng = np.random.RandomState(2)
    rows = []
    fps = {}
    for vid in range(8):
        for fi in (0, 1):
            fp = int(rng.randint(-(2**62), 2**62))
            rows.append((vid, fi, fp))
            fps[(vid, fi)] = fp
    # vid 0 frame 0 == vid 1 frame 1 exactly: aligned sweep must skip it
    rows.append((6, 0, fps[(7, 1)]))
    df = spark.createDataFrame(rows, "media_id long, frame_i long, fingerprint long")
    got = {
        (r.id_a, r.id_b, r.frame_i, r.hamming)
        for r in frame_aligned_band_pairs(df, bands=8, max_hamming=7).collect()
    }
    want = set()
    by_frame = {}
    for mid, fi, fp in rows:
        by_frame.setdefault(fi, []).append((mid, fp))
    for fi, members in by_frame.items():
        for i in range(len(members)):
            for j in range(len(members)):
                a, fa = members[i]
                b, fb = members[j]
                if a < b and _hamming(fa, fb) <= 7:
                    want.add((a, b, fi, _hamming(fa, fb)))
    assert got == want
    assert not any(r[0] == 6 and r[1] == 7 for r in got)  # cross-frame blocked


def test_scene_changes_drift_vs_cut(spark):
    """Within-shot drift (few perturbed pixels, <= threshold bits) is
    never counted; a hard cut (unrelated frame) always is; the first
    frame of a video is never a cut."""
    from openmsistream_spark.llm.videofp import video_scene_changes

    rng = np.random.RandomState(3)
    base = rng.randint(0, 256, size=(16, 18)).astype(np.uint8)
    drift1, drift2 = base.copy(), base.copy()
    drift1[0, 0] ^= 3
    drift2[5, 7] ^= 5
    cut = rng.randint(0, 256, size=(16, 18)).astype(np.uint8)
    assert _hamming(
        dhash_int(gray_pixels(base[:, :, None])),
        dhash_int(gray_pixels(cut[:, :, None])),
    ) > 10
    media = spark.createDataFrame(
        [
            (1, bytearray(_stream([base, drift1, drift2]))),  # one shot
            (2, bytearray(_stream([base, drift1, cut, cut]))),  # one cut
        ],
        "media_id long, content binary",
    )
    got = {
        r.media_id: (r.n_frames, r.n_scene_changes)
        for r in video_scene_changes(media, threshold=10).collect()
    }
    assert got[1] == (3, 0)
    assert got[2] == (4, 1)


def test_planted_video_neardup_end_to_end(spark):
    """20 random 3-frame videos, each with a twin whose middle frame is
    replaced by noise and whose sampled frames (0, 2) get 2 perturbed
    pixels each: with every_nth=2 and min_frames=2 every planted pair
    returns (middle frame never sampled), and no pair bridges bases."""
    rng = np.random.RandomState(42)
    rows, planted = [], set()
    for i in range(20):
        frames = [
            rng.randint(0, 256, size=(16, 18)).astype(np.uint8) for _ in range(3)
        ]
        twin = [f.copy() for f in frames]
        twin[1] = rng.randint(0, 256, size=(16, 18)).astype(np.uint8)
        for fi in (0, 2):
            idx = rng.choice(frames[fi].size, 2, replace=False)
            twin[fi].reshape(-1)[idx] = rng.randint(0, 256, size=2)
            assert (
                _hamming(
                    dhash_int(gray_pixels(frames[fi][:, :, None])),
                    dhash_int(gray_pixels(twin[fi][:, :, None])),
                )
                <= 7
            )
        rows.append((2 * i, bytearray(_stream(frames))))
        rows.append((2 * i + 1, bytearray(_stream(twin))))
        planted.add((2 * i, 2 * i + 1))
    media = spark.createDataFrame(rows, "media_id long, content binary")
    out = video_neardup_pairs(media, every_nth=2, min_frames=2).collect()
    pairs = {(r.id_a, r.id_b) for r in out}
    assert planted <= pairs, f"missed planted pairs: {planted - pairs}"
    assert not {(a, b) for a, b in pairs if a // 2 != b // 2}
    assert all(r.n_frames_matched == 2 for r in out if (r.id_a, r.id_b) in planted)


def _majority_ref(fps: list[int]) -> int:
    """Pure-python reference for the majority-bit fold (signed in/out)."""
    n = len(fps)
    u = 0
    for k in range(64):
        cnt = sum((f >> k) & 1 if f >= 0 else ((f + (1 << 64)) >> k) & 1 for f in fps)
        if 2 * cnt > n:
            u |= 1 << k
    return u - (1 << 64) if u >= (1 << 63) else u


def test_representative_fingerprint_majority_fold(spark):
    """Bit-exact vs the pure-python reference, including sign-bit
    handling and the tie->0 rule (even frame counts)."""
    from openmsistream_spark.llm.videofp import video_representative_fingerprint

    cases = {
        # odd count, sign bits present
        10: [-1, -1, 0x0123456789ABCDEF],
        # even count with exact ties on every differing bit -> tie bits clear
        11: [0, -1],
        # single frame: identity
        12: [0x7EDCBA9876543210],
        # mixed
        13: [5, 7, 13, -9223372036854775808],
    }
    rows = [(vid, fp, i) for vid, fps in cases.items() for i, fp in enumerate(fps)]
    df = spark.createDataFrame(rows, "media_id long, fingerprint long, frame_i long")
    got = {
        r.media_id: (r.fingerprint, r.n_frames)
        for r in video_representative_fingerprint(df).collect()
    }
    assert got == {
        vid: (_majority_ref(fps), len(fps)) for vid, fps in cases.items()
    }


def test_representative_robust_to_single_frame_noise(spark):
    """The ledger-contract property the majority fold is chosen for: a
    copy whose hashes drift in ONE of three frames folds to a
    representative at most that drift away (per-bit counts move by <= 1
    so only previously-threshold bits flip)."""
    from openmsistream_spark.llm.videofp import video_representative_fingerprint

    rng = np.random.RandomState(5)
    frames = [rng.randint(0, 256, size=(16, 18)).astype(np.uint8) for _ in range(3)]
    noisy0 = frames[0].copy()
    noisy0[2, 2] ^= 7
    fps_a = [dhash_int(gray_pixels(f[:, :, None])) for f in frames]
    fps_b = [dhash_int(gray_pixels(noisy0[:, :, None]))] + fps_a[1:]
    df = spark.createDataFrame(
        [(1, fp, i) for i, fp in enumerate(fps_a)]
        + [(2, fp, i) for i, fp in enumerate(fps_b)],
        "media_id long, fingerprint long, frame_i long",
    )
    got = {
        r.media_id: r.fingerprint
        for r in video_representative_fingerprint(df).collect()
    }
    frame_drift = _hamming(fps_a[0], fps_b[0])
    assert _hamming(got[1], got[2]) <= frame_drift

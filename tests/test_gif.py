"""Dependency-free GIF decode (llm/gif.py): LZW, interlacing, local
color tables, multi-frame compositing with disposal + transparency —
fixtures built by an INDEPENDENT forward LZW encoder in this file,
never by the code under test."""

import struct

import numpy as np
import pytest

from openmsistream_spark.llm.gif import gif_frames, gif_pixels


def _lzw_encode(mcs: int, indices) -> bytes:
    """Forward GIF-LZW on the standard GIFCOMPR schedule: the width
    bump is checked after each emitted code against the PRE-add free
    slot count (free_ent >= 2^code_size), exactly one add later than a
    post-add check — the synchronization real encoders use."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    code_size = mcs + 1
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code):
        nonlocal acc, nbits, code_size
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        # GIFCOMPR's output(): widen AFTER writing, before the add
        if next_code >= (1 << code_size) and code_size < 12:
            code_size += 1

    emit(clear)
    w = ()
    for k in indices:
        wk = w + (int(k),)
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
        w = (int(k),)
    if w:
        emit(table[w])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _color_table(colors) -> tuple[bytes, int]:
    """Pad a color list to the next power of two >= 2; returns (bytes,
    size_field)."""
    n = 2
    while n < len(colors):
        n *= 2
    padded = list(colors) + [(0, 0, 0)] * (n - len(colors))
    field = n.bit_length() - 2  # 2 << field == n
    return bytes(v for c in padded for v in c), field


def _gif(
    w,
    h,
    frames,  # list of (left, top, fw, fh, indices(fh,fw), opts)
    colors,
    bg=0,
    local_colors=None,
) -> bytes:
    table, field = _color_table(colors)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | field, bg, 0)
    out += table
    for left, top, fw, fh, idx, opts in frames:
        opts = opts or {}
        if "transparent" in opts or "disposal" in opts:
            flags = (opts.get("disposal", 0) & 7) << 2
            tr = opts.get("transparent")
            if tr is not None:
                flags |= 1
            out += b"\x21\xf9" + _blocks(
                struct.pack("<BHB", flags, 0, tr if tr is not None else 0)
            )
        ipacked = 0
        if opts.get("interlace"):
            ipacked |= 0x40
        lct = opts.get("lct")
        if lct is not None:
            ltab, lfield = _color_table(lct)
            ipacked |= 0x80 | lfield
        out += b"\x2c" + struct.pack("<HHHHB", left, top, fw, fh, ipacked)
        if lct is not None:
            out += ltab
        mcs = max(2, (len(opts.get("lct", colors)) - 1).bit_length())
        flat = [int(v) for row in idx for v in row]
        if opts.get("interlace"):
            order = []
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                order.extend(range(start, fh, step))
            flat = [int(v) for y in order for v in idx[y]]
        out.append(mcs)
        out += _blocks(_lzw_encode(mcs, flat))
    out.append(0x3B)
    return bytes(out)


PAL4 = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]


def test_gif_single_frame_roundtrip():
    rng = np.random.RandomState(0)
    idx = rng.randint(0, 4, size=(7, 9))
    gif = _gif(9, 7, [(0, 0, 9, 7, idx, None)], PAL4)
    px = gif_pixels(gif)
    want = np.array(PAL4, np.uint8)[idx]
    assert (px == want).all()


def test_gif_lzw_compressible_and_long_runs():
    # long runs force real dictionary growth (multi-byte entries,
    # width increases) — the LZW path beyond literal codes
    idx = np.zeros((16, 64), dtype=np.int64)
    idx[:, 32:] = 1
    idx[5] = np.arange(64) % 4
    gif = _gif(64, 16, [(0, 0, 64, 16, idx, None)], PAL4)
    assert (gif_pixels(gif) == np.array(PAL4, np.uint8)[idx]).all()


def test_gif_interlaced():
    rng = np.random.RandomState(1)
    idx = rng.randint(0, 4, size=(11, 5))
    gif = _gif(5, 11, [(0, 0, 5, 11, idx, {"interlace": True})], PAL4)
    assert (gif_pixels(gif) == np.array(PAL4, np.uint8)[idx]).all()


def test_gif_animation_composite_disposal_transparency():
    # frame 1: full screen of color 0; frame 2: sub-rect painting color
    # 1 with a transparent hole (underlying frame-1 pixel shows);
    # frame 3 after disposal 2 of frame 2's rect -> rect restored to
    # background (bg color), frame 3 paints elsewhere
    f1 = np.zeros((6, 6), dtype=np.int64)
    f2 = np.full((2, 2), 1, dtype=np.int64)
    f2[0, 0] = 3  # transparent index
    f3 = np.full((1, 1), 2, dtype=np.int64)
    gif = _gif(
        6,
        6,
        [
            (0, 0, 6, 6, f1, None),
            (2, 2, 2, 2, f2, {"transparent": 3, "disposal": 2}),
            (0, 0, 1, 1, f3, None),
        ],
        PAL4,
        bg=3,
    )
    frames = gif_frames(gif)
    assert len(frames) == 3
    pal = np.array(PAL4, np.uint8)
    assert (frames[0] == pal[0]).all()
    # frame 2: rect painted color 1 except the transparent hole (color 0)
    assert (frames[1][2, 2] == pal[0]).all()
    assert (frames[1][2, 3] == pal[1]).all()
    assert (frames[1][0, 0] == pal[0]).all()
    # frame 3: frame 2's rect restored to BACKGROUND (bg=3), new pixel at 0,0
    assert (frames[2][2, 3] == pal[3]).all()
    assert (frames[2][0, 0] == pal[2]).all()


def test_gif_real_encoder_fixtures():
    """GIFs produced by REAL encoders (CPython-distribution icons:
    Lib/test/imghdrdata/python.gif and idlelib/Icons/idle_48.gif, PSF
    license) — the encoder/decoder can no longer share a width-bump
    off-by-one. Pins decode success, header-consistent shape, and a
    regression checksum of the decoded pixels."""
    import hashlib
    import pathlib

    fixtures = pathlib.Path(__file__).parent / "fixtures"
    want = {
        "python_logo.gif": ((16, 16, 3), "455a278521605c0c"),
        "idle_48.gif": ((48, 48, 3), "a03b8830ae43149a"),
    }
    for name, (shape, digest) in want.items():
        frames = gif_frames((fixtures / name).read_bytes())
        assert len(frames) == 1
        assert frames[0].shape == shape
        assert hashlib.sha256(frames[0].tobytes()).hexdigest()[:16] == digest


def test_gif_disposal_restore_previous():
    """Disposal 3 (restore to previous): the frame after a disposal-3
    frame composites onto the PRE-disposal-3 canvas, not onto the
    disposal-3 frame's paint."""
    f1 = np.zeros((4, 4), dtype=np.int64)  # full screen color 0
    f2 = np.full((2, 2), 1, dtype=np.int64)  # rect color 1, disposal 3
    f3 = np.full((1, 1), 2, dtype=np.int64)  # paints one corner pixel
    gif = _gif(
        4,
        4,
        [
            (0, 0, 4, 4, f1, None),
            (1, 1, 2, 2, f2, {"disposal": 3}),
            (0, 0, 1, 1, f3, None),
        ],
        PAL4,
    )
    frames = gif_frames(gif)
    assert len(frames) == 3
    pal = np.array(PAL4, np.uint8)
    assert (frames[1][1, 1] == pal[1]).all()
    # frame 3: disposal-3 rect restored to frame-1 paint (color 0)
    assert (frames[2][1, 1] == pal[0]).all()
    assert (frames[2][2, 2] == pal[0]).all()
    assert (frames[2][0, 0] == pal[2]).all()


def test_gif_local_color_table_overrides_global():
    lct = [(9, 9, 9), (200, 100, 50)]
    idx = np.array([[0, 1]], dtype=np.int64)
    gif = _gif(2, 1, [(0, 0, 2, 1, idx, {"lct": lct})], PAL4)
    assert (gif_pixels(gif) == np.array(lct, np.uint8)[idx]).all()


def test_gif_rejects_malformed():
    with pytest.raises(ValueError, match="not a GIF"):
        gif_pixels(b"PNG nope")
    idx = np.zeros((2, 2), dtype=np.int64)
    good = _gif(2, 2, [(0, 0, 2, 2, idx, None)], PAL4)
    with pytest.raises(ValueError):
        gif_pixels(good[:20])  # truncated mid-stream
    with pytest.raises(ValueError, match="outside the logical screen"):
        gif_pixels(_gif(2, 2, [(1, 1, 2, 2, idx, None)], PAL4))
    with pytest.raises(ValueError, match="no image frames"):
        gif_pixels(b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0, 0, 0) + b"\x3b")


def test_gif_sniff_and_perceptual_hash(spark):
    """GIF is a first-class perceptual-hash input via sniff_pixels, and
    an animated GIF feeds the VIDEO keyframe family: format
    independence vs the same pixels as PGM frames."""
    from openmsistream_spark.llm.multimodal import sniff_pixels
    from openmsistream_spark.llm.phash import image_fingerprints

    rng = np.random.RandomState(3)
    idx = rng.randint(0, 4, size=(16, 18))
    gif = _gif(18, 16, [(0, 0, 18, 16, idx, None)], PAL4)
    assert sniff_pixels(gif) is not None
    pal = np.array(PAL4, np.uint8)
    px = pal[idx]
    # grayscale the RGB the same way the decoder pipeline will
    pgm = b"P5 18 16 255\n" + (
        (299 * px[:, :, 0].astype(np.int64)
         + 587 * px[:, :, 1].astype(np.int64)
         + 114 * px[:, :, 2].astype(np.int64) + 500) // 1000
    ).astype(np.uint8).tobytes()
    df = spark.createDataFrame(
        [(1, bytearray(pgm)), (2, bytearray(gif))], "media_id long, content binary"
    )
    got = {r.media_id: r.fingerprint for r in image_fingerprints(df).collect()}
    assert got[1] == got[2]


def test_gif_video_frames_through_videofp(spark):
    """Animated GIF through video_frame_fingerprints: one fingerprint
    per composited frame, matching per-frame dHash of the composited
    canvases."""
    from openmsistream_spark.llm.gif import gif_frames as _gf
    from openmsistream_spark.llm.phash import dhash_int, gray_pixels
    from openmsistream_spark.llm.videofp import video_frame_fingerprints

    rng = np.random.RandomState(4)
    f1 = rng.randint(0, 4, size=(16, 18))
    f2 = rng.randint(0, 4, size=(16, 18))
    gif = _gif(
        18, 16, [(0, 0, 18, 16, f1, None), (0, 0, 18, 16, f2, None)], PAL4
    )
    df = spark.createDataFrame([(5, bytearray(gif))], "media_id long, content binary")
    got = {
        (r.media_id, r.frame_i): r.fingerprint
        for r in video_frame_fingerprints(df).collect()
    }
    want = {
        (5, i): dhash_int(gray_pixels(fr)) for i, fr in enumerate(_gf(gif))
    }
    assert got == want

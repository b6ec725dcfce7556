"""Real dependency-free media decode (round-8): uncompressed BMP,
binary PPM/PGM, and PCM WAV parsed in pure Python/numpy, verified
against HAND-COMPUTED oracles (fixtures built byte-by-byte in the test,
expected features derived with plain-Python arithmetic, never by
calling the code under test)."""

import math
import struct

import pytest

from openmsistream_spark.llm.multimodal import (
    decode_bmp,
    decode_ppm,
    decode_wav,
    default_decoder,
    fake_decoder,
)


def _bmp(width, height, pixels_rgb_topdown, bpp=24, top_down=False):
    """Build an uncompressed BMP byte string. ``pixels_rgb_topdown`` is
    row-major top-down [(r, g, b), ...]; storage converts to the file's
    bottom-up BGR rows with 4-byte padding unless ``top_down``."""
    channels = bpp // 8
    row_bytes = (width * channels + 3) & ~3
    rows = [
        pixels_rgb_topdown[r * width : (r + 1) * width] for r in range(height)
    ]
    if not top_down:
        rows = rows[::-1]
    body = b""
    for row in rows:
        raw = b""
        for px in row:
            if channels == 1:
                raw += bytes([px])
            else:
                r, g, b = px[:3]
                raw += bytes([b, g, r]) + (b"\xff" if channels == 4 else b"")
        body += raw + b"\x00" * (row_bytes - len(raw))
    stored_h = -height if top_down else height
    info = struct.pack("<IiiHHIIiiII", 40, width, stored_h, 1, bpp, 0, 0, 0, 0, 0, 0)
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    return hdr + info + body


RED, GREEN, BLUE, WHITE = (255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)


def test_bmp_24bpp_hand_oracle():
    # 2x2: [red green / blue white] — 6 of 12 samples are 255, rest 0
    content = _bmp(2, 2, [RED, GREEN, BLUE, WHITE])
    d = decode_bmp(content)
    assert (d["width"], d["height"], d["n_frames"]) == (2, 2, 1)
    w, h, c, mean, std, lo, hi, aspect = d["features"]
    assert (w, h, c) == (2.0, 2.0, 3.0)
    assert mean == pytest.approx(0.5)  # 6 ones, 6 zeros
    assert std == pytest.approx(0.5)  # Bernoulli(1/2) spread
    assert (lo, hi, aspect) == (0.0, 1.0, 1.0)


def test_bmp_row_padding_and_rgb_order():
    # 3x1 24bpp: raw row is 9 bytes, padded to 12 — padding must NOT
    # leak into the stats; an asymmetric pixel proves BGR→RGB swap
    content = _bmp(3, 1, [(255, 0, 0), (0, 0, 0), (0, 0, 0)])
    d = decode_bmp(content)
    assert d["features"][3] == pytest.approx(1.0 / 9.0)  # one 255 of 9
    assert len(content) == 54 + 12


def test_bmp_topdown_equals_bottomup():
    px = [RED, GREEN, BLUE, WHITE]
    assert decode_bmp(_bmp(2, 2, px)) == decode_bmp(_bmp(2, 2, px, top_down=True))


def test_bmp_8bpp_grayscale():
    content = _bmp(2, 1, [0, 255], bpp=8)
    d = decode_bmp(content)
    assert d["features"][2] == 1.0  # single channel
    assert d["features"][3] == pytest.approx(0.5)


def test_bmp_rejects_compressed_and_truncated():
    good = _bmp(2, 2, [RED, GREEN, BLUE, WHITE])
    compressed = good[:30] + struct.pack("<I", 1) + good[34:]
    with pytest.raises(ValueError, match="compressed"):
        decode_bmp(compressed)
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(good[:-4])


def test_pgm_with_comment_header():
    content = b"P5 # a comment\n3 1 255\n" + bytes([0, 128, 255])
    d = decode_ppm(content)
    assert (d["width"], d["height"]) == (3, 1)
    expect_mean = (0 / 255 + 128 / 255 + 255 / 255) / 3
    assert d["features"][3] == pytest.approx(expect_mean)


def test_ppm_p6_rgb():
    content = b"P6\n2 1\n255\n" + bytes([255, 0, 0, 0, 255, 0])
    d = decode_ppm(content)
    assert d["features"][2] == 3.0
    assert d["features"][3] == pytest.approx(2 / 6)


def _wav(samples, rate=8000, channels=1):
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * 2 * channels, 2 * channels, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_wav_pcm16_hand_oracle():
    samples = [0, 16384, -32768, 32767]
    d = decode_wav(_wav(samples))
    norm = [s / 32768.0 for s in samples]
    assert d["n_frames"] == 4
    ch, rate, nf, dur, mean, rms, lo, hi = d["features"]
    assert (ch, rate, nf) == (1.0, 8000.0, 4.0)
    assert dur == pytest.approx(4 / 8000)
    assert mean == pytest.approx(sum(norm) / 4)
    assert rms == pytest.approx(math.sqrt(sum(v * v for v in norm) / 4))
    assert (lo, hi) == (-1.0, norm[3])


def test_wav_stereo_frames_are_per_channel():
    d = decode_wav(_wav([0, 0, 1000, -1000], channels=2))
    assert d["n_frames"] == 2
    assert d["features"][0] == 2.0


def test_wav_rejects_float_format():
    wav = bytearray(_wav([0, 1]))
    wav[20:22] = struct.pack("<H", 3)  # IEEE float format code
    with pytest.raises(ValueError, match="non-PCM"):
        decode_wav(bytes(wav))


def test_default_decoder_sniffs_and_falls_back():
    bmp = _bmp(2, 2, [RED, GREEN, BLUE, WHITE])
    assert default_decoder("image", bmp) == decode_bmp(bmp)
    wav = _wav([0, 100])
    assert default_decoder("audio", wav) == decode_wav(wav)
    # unknown magic → deterministic fake (plumbing path), never raises
    blob = b"\x89PNG\r\n\x1a\nnot-actually-decodable"
    assert default_decoder("image", blob) == fake_decoder("image", blob)
    # malformed header of a known magic also falls back instead of dying
    assert default_decoder("image", b"BMgarbage") == fake_decoder(
        "image", b"BMgarbage"
    )


def test_decode_features_end_to_end_real_formats(spark):
    """The Spark mapInPandas stage carries real decodes: features arrive
    as float32, so compare with relative tolerance."""
    from openmsistream_spark.llm.multimodal import decode_features

    bmp = _bmp(2, 2, [RED, GREEN, BLUE, WHITE])
    wav = _wav([0, 16384, -32768, 32767])
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(bmp), None),
            (2, "audio", bytearray(wav), None),
        ],
        "media_id long, media_type string, content binary, meta map<string,string>",
    )
    rows = {r.media_id: r for r in decode_features(media).collect()}
    assert (rows[1].width, rows[1].height, rows[1].n_frames) == (2, 2, 1)
    assert rows[1].features[3] == pytest.approx(0.5, rel=1e-6)
    assert rows[2].width is None and rows[2].n_frames == 4
    assert rows[2].features[1] == pytest.approx(8000.0)


# --------------------------------------------------------------------------
# property tests: random fixtures, plain-Python independent oracles
# --------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

rgb = st.tuples(
    st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
)


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 9),
    h=st.integers(1, 7),
    data=st.data(),
    top_down=st.booleans(),
)
def test_bmp_decode_matches_plain_python(w, h, data, top_down):
    px = data.draw(st.lists(rgb, min_size=w * h, max_size=w * h))
    d = decode_bmp(_bmp(w, h, px, top_down=top_down))
    flat = [c / 255.0 for p in px for c in p]
    mean = sum(flat) / len(flat)
    var = sum((x - mean) ** 2 for x in flat) / len(flat)
    f = d["features"]
    assert (d["width"], d["height"]) == (w, h)
    assert f[3] == pytest.approx(mean, abs=1e-12)
    assert f[4] == pytest.approx(math.sqrt(var), abs=1e-9)
    assert f[5] == min(flat) and f[6] == max(flat)


@settings(max_examples=40, deadline=None)
@given(
    samples=st.lists(st.integers(-32768, 32767), min_size=1, max_size=64),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_decode_matches_plain_python(samples, rate):
    d = decode_wav(_wav(samples, rate=rate))
    norm = [s / 32768.0 for s in samples]
    f = d["features"]
    assert d["n_frames"] == len(samples)
    assert f[4] == pytest.approx(sum(norm) / len(norm), abs=1e-12)
    assert f[5] == pytest.approx(
        math.sqrt(sum(v * v for v in norm) / len(norm)), abs=1e-12
    )
    assert f[6] == min(norm) and f[7] == max(norm)


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 16),
    h=st.integers(1, 8),
    data=st.data(),
)
def test_pgm_decode_matches_plain_python(w, h, data):
    pix = bytes(data.draw(st.lists(st.integers(0, 255), min_size=w * h, max_size=w * h)))
    content = f"P5\n{w} {h}\n255\n".encode() + pix
    d = decode_ppm(content)
    flat = [b / 255.0 for b in pix]
    assert (d["width"], d["height"]) == (w, h)
    assert d["features"][3] == pytest.approx(sum(flat) / len(flat), abs=1e-12)


def test_strict_mode_raises_on_malformed_known_format(spark):
    """Round-8 review finding: strict must refuse EVERY fake path — a
    corrupt BMP under strict surfaces the decode error instead of
    silently shipping sha256-derived features."""
    from pyspark.errors import PythonException

    from openmsistream_spark.llm.multimodal import decode_features

    media = spark.createDataFrame(
        [(1, "image", bytearray(b"BMgarbage-not-a-real-header"), None)],
        "media_id long, media_type string, content binary, meta map<string,string>",
    )
    with pytest.raises(PythonException, match="not a BMP|truncated|unpack"):
        decode_features(media, strict=True).collect()


def test_default_decoder_survives_struct_error():
    """A WAV truncated inside its fmt chunk raises ValueError (the
    decoder family's one error type — normalized from struct.error so
    every skip-mode handler catches it); the non-strict path must fall
    back to the fake decoder, not crash the Spark task."""
    bad = b"RIFF" + struct.pack("<I", 20) + b"WAVE" + b"fmt " + struct.pack("<I", 2) + b"ab"
    with pytest.raises(ValueError, match="truncated WAV fmt"):
        decode_wav(bad)  # the parser itself raises
    assert default_decoder("audio", bad) == fake_decoder("audio", bad)


def test_resize_and_frames_on_real_media(spark):
    """resize_media / sample_frames over REALLY decoded content: the
    dimension math runs on true decoded width/height, and a WAV's frame
    count drives the sampling explode."""
    from openmsistream_spark.llm.multimodal import resize_media, sample_frames

    bmp = _bmp(4, 2, [RED, GREEN, BLUE, WHITE, RED, GREEN, BLUE, WHITE])
    wav = _wav(list(range(0, 25)))  # 25 frames
    media = spark.createDataFrame(
        [(1, "image", bytearray(bmp), None), (2, "audio", bytearray(wav), None)],
        "media_id long, media_type string, content binary, meta map<string,string>",
    )
    rs = {r.media_id: r for r in resize_media(media, target_width=128).collect()}
    assert (rs[1].orig_width, rs[1].orig_height) == (4, 2)
    assert (rs[1].width, rs[1].height) == (128, 64)  # aspect preserved

    frames = [r for r in sample_frames(media, every_nth=10).collect() if r.media_id == 2]
    assert sorted(r.frame_i for r in frames) == [0, 10, 20]


def test_pgm_catalog_entry_skips_non_ascii_prefix(spark, tmp_path):
    """The catalog query frames a doc's first 8 BYTES as pixels while its
    oracle enumerates the first 8 characters' CODE POINTS — the two agree
    only for ASCII prefixes, so both sides filter to them (round-8
    advisory). A multi-byte char inside the prefix must drop the doc on
    BOTH engines; one after the prefix must not."""
    import duckdb

    from openmsistream_spark.queries import QUERIES

    docs = spark.createDataFrame(
        [
            (1, "plainasciidoc body"),
            (2, "café latte brewed"),  # é inside the 8-char prefix
            (3, "ascii hdr then café"),  # non-ASCII after the prefix
            (4, "short"),  # < 8 chars
        ],
        "doc_id long, text string",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    spec = QUERIES["multimodal_pgm_decode"]
    got = {r.media_id: r for r in spec.fn(spark, str(tmp_path)).collect()}
    assert set(got) == {1, 3}

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    want = {
        r[0]: r
        for r in con.execute(
            spec.oracle + " ORDER BY media_id"
        ).fetchall()
    }
    assert set(want) == {1, 3}
    for mid in (1, 3):
        g = got[mid]
        # (n_bytes, sha, pixel stats) bit-identical across engines
        assert (
            g.n_bytes, g.content_sha256, g.pixel_sum, g.px_min, g.px_max
        ) == (want[mid][1], want[mid][2], want[mid][6], want[mid][7], want[mid][8])


# ------------------------------------------------ PNG (round 14)

import zlib

import numpy as np

from openmsistream_spark.llm.multimodal import png_pixels


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def _png(px: "np.ndarray", color_type: int, filters=None, plte=None,
         depth=8, interlace=0) -> bytes:
    """Build a PNG byte string with a CHOSEN filter type per row,
    applying the spec's FORWARD filter (so the decoder's unfilter is
    verified against an independent construction, not itself)."""
    h, w = px.shape[:2]
    bpp = 1 if px.ndim == 2 else px.shape[2]
    flat = px.reshape(h, w * bpp).astype(np.int64)
    filters = filters if filters is not None else [0] * h
    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.int64)
    for y in range(h):
        f = filters[y]
        cur = flat[y]
        if f == 0:
            enc = cur.copy()
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, np.int64), cur[:-bpp]])
            enc = (cur - left) % 256
        elif f == 2:  # Up
            enc = (cur - prev) % 256
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(bpp, np.int64), cur[:-bpp]])
            enc = (cur - (left + prev) // 2) % 256
        elif f == 4:  # Paeth
            left = np.concatenate([np.zeros(bpp, np.int64), cur[:-bpp]])
            upleft = np.concatenate([np.zeros(bpp, np.int64), prev[:-bpp]])
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = (cur - pred) % 256
        raw.append(f)
        raw += enc.astype(np.uint8).tobytes()
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    out += _chunk(b"IDAT", zlib.compress(bytes(raw)))
    return out + _chunk(b"IEND", b"")


def test_png_gray_all_filter_types():
    rng = np.random.RandomState(0)
    px = rng.randint(0, 256, size=(5, 7)).astype(np.uint8)
    for filters in ([0] * 5, [1] * 5, [0, 2, 2, 2, 2], [3] * 5, [4] * 5,
                    [0, 1, 2, 3, 4]):
        got = png_pixels(_png(px, 0, filters=filters))
        assert got.shape == (5, 7, 1)
        assert (got[:, :, 0] == px).all(), f"filters={filters}"


def test_png_rgb_and_rgba_roundtrip():
    rng = np.random.RandomState(1)
    rgb = rng.randint(0, 256, size=(4, 6, 3)).astype(np.uint8)
    assert (png_pixels(_png(rgb, 2, filters=[4, 1, 3, 2])) == rgb).all()
    rgba = rng.randint(0, 256, size=(3, 5, 4)).astype(np.uint8)
    assert (png_pixels(_png(rgba, 6, filters=[0, 4, 4])) == rgba).all()


def test_png_palette_and_gray_alpha():
    plte = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    got = png_pixels(_png(idx, 3, plte=plte))
    assert (got == plte[idx]).all()
    # gray+alpha: alpha dropped, (h, w, 1) out (documented)
    ga = np.dstack(
        [np.arange(6, dtype=np.uint8).reshape(2, 3), np.full((2, 3), 9, np.uint8)]
    )
    got = png_pixels(_png(ga, 4))
    assert got.shape == (2, 3, 1)
    assert (got[:, :, 0] == ga[:, :, 0]).all()


def test_png_rejects_unsupported_and_malformed():
    px = np.zeros((2, 2), dtype=np.uint8)
    with pytest.raises(ValueError, match="interlaced"):
        png_pixels(_png(px, 0, interlace=1))
    with pytest.raises(ValueError, match="16-bit"):
        png_pixels(_png(px, 0, depth=16))
    with pytest.raises(ValueError, match="not a PNG"):
        png_pixels(b"GIF89a")
    good = _png(px, 0)
    with pytest.raises(ValueError):  # corrupt IDAT -> zlib error -> ValueError
        png_pixels(good[:40] + b"\x00\x00\x00\x00" + good[44:])
    with pytest.raises(ValueError, match="missing PLTE"):
        png_pixels(_png(px, 3))
    with pytest.raises(ValueError, match="out of range"):
        png_pixels(_png(np.full((2, 2), 5, np.uint8), 3,
                        plte=np.zeros((2, 3), np.uint8)))


def test_png_fingerprint_format_independence(spark):
    """The dHash of a PNG equals the dHash of the same pixels as PGM —
    the decoder registry makes the perceptual-hash family
    format-independent (PNG now a first-class input)."""
    from openmsistream_spark.llm.phash import image_fingerprints

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(16, 18)).astype(np.uint8)
    pgm = f"P5 18 16 255\n".encode() + px.tobytes()
    png = _png(px, 0, filters=[4] * 16)
    df = spark.createDataFrame(
        [(1, bytearray(pgm)), (2, bytearray(png))], "media_id long, content binary"
    )
    got = {r.media_id: r.fingerprint for r in image_fingerprints(df).collect()}
    assert got[1] == got[2]


def test_default_decoder_real_parses_png():
    rng = np.random.RandomState(2)
    px = rng.randint(0, 256, size=(4, 4, 3)).astype(np.uint8)
    out = default_decoder("image", _png(px, 2, filters=[1, 2, 3, 4]))
    assert out["width"] == 4 and out["height"] == 4
    flat = px.astype(float) / 255.0
    assert math.isclose(out["features"][3], float(flat.mean()), rel_tol=1e-9)

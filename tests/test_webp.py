"""WebP container + VP8L lossless decode (llm/webp.py).

Conformance discipline: pixels are round-tripped through the REAL
system libwebp encoder (``WebPEncodeLosslessRGB[A]`` via ctypes from
``libwebp.so``) and the repo decoder must reproduce them byte-exactly
— a fully independent producer, so encoder and decoder cannot share a
misread of the spec (the GIF-round lesson). A hand-written bitstream
test pins the simple-prefix-code path without any library, and the
checked-in ``python_lossy.webp`` (CPython test-suite data, PSF
license — a REAL-encoder lossy file) pins container parsing and the
lossy refusal."""

import ctypes
import ctypes.util
import pathlib

import numpy as np
import pytest

from openmsistream_spark.llm.webp import webp_pixels

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


def _libwebp():
    for name in ("libwebp.so.7", "libwebp.so", ctypes.util.find_library("webp")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        for fn in (
            "WebPEncodeLosslessRGB",
            "WebPEncodeLosslessRGBA",
        ):
            f = getattr(lib, fn)
            f.restype = ctypes.c_size_t
            f.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_void_p),
            ]
        lib.WebPFree.restype = None
        lib.WebPFree.argtypes = [ctypes.c_void_p]
        lib.WebPDecodeRGB.restype = ctypes.c_void_p
        lib.WebPDecodeRGB.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        return lib
    return None


_LIB = _libwebp()
needs_libwebp = pytest.mark.skipif(
    _LIB is None, reason="system libwebp not available for conformance fixtures"
)


def _encode(px: np.ndarray, rgba: bool = False) -> bytes:
    h, w, c = px.shape
    out = ctypes.c_void_p()
    fn = _LIB.WebPEncodeLosslessRGBA if rgba else _LIB.WebPEncodeLosslessRGB
    size = fn(np.ascontiguousarray(px).tobytes(), w, h, w * c, ctypes.byref(out))
    assert size > 0, "libwebp encode failed"
    data = ctypes.string_at(out, size)
    _LIB.WebPFree(ctypes.c_void_p(out.value))
    return data


def _lib_decode_rgb(data: bytes) -> np.ndarray:
    w = ctypes.c_int()
    h = ctypes.c_int()
    buf = _LIB.WebPDecodeRGB(data, len(data), ctypes.byref(w), ctypes.byref(h))
    assert buf, "libwebp decode failed"
    px = np.frombuffer(
        ctypes.string_at(buf, w.value * h.value * 3), dtype=np.uint8
    ).reshape(h.value, w.value, 3).copy()
    _LIB.WebPFree(ctypes.c_void_p(buf))
    return px


def _cases():
    rng = np.random.default_rng(7)
    grad = np.zeros((31, 48, 3), np.uint8)
    grad[:, :, 0] = (np.arange(48) * 5 % 256)[None, :]
    grad[:, :, 1] = (np.arange(31) * 7 % 256)[:, None]
    grad[:, :, 2] = grad[:, :, 0]
    return {
        # exercises: literals + color cache
        "noise8x8": rng.integers(0, 256, (8, 8, 3), dtype=np.uint8),
        # LZ77 run + one-symbol codes
        "const": np.full((16, 16, 3), 77, dtype=np.uint8),
        # 1-bit palette with 8-pixel bundling
        "twocolor": (rng.integers(0, 2, (13, 37, 1), dtype=np.uint8) * 255)
        .repeat(3, axis=2),
        # spatial predictors
        "gradient": grad,
        # 2D distance codes (the 120-entry plane map)
        "tiles": np.tile(rng.integers(0, 256, (4, 4, 3), dtype=np.uint8), (8, 8, 1)),
        # dense literals at scale
        "noise64": rng.integers(0, 256, (64, 64, 3), dtype=np.uint8),
        # 4-bit palette bundling
        "fewcolors": np.take(
            rng.integers(0, 256, (12, 3), dtype=np.uint8),
            rng.integers(0, 12, (40, 40)),
            axis=0,
        ),
        "1x1": np.array([[[1, 2, 3]]], dtype=np.uint8),
        "wide1": rng.integers(0, 256, (1, 300, 3), dtype=np.uint8),
        "tall1": rng.integers(0, 256, (300, 1, 3), dtype=np.uint8),
    }


@needs_libwebp
@pytest.mark.parametrize("name", sorted(_cases()))
def test_roundtrip_real_encoder(name):
    """Real-libwebp lossless encode → repo decode must be
    pixel-identical to the input (lossless) for every structural
    regime: palette/bundling, predictors, LZ77 2D distances, cache."""
    px = _cases()[name]
    data = _encode(px)
    got = webp_pixels(data)
    assert got.shape == px.shape
    assert (got == px).all()


@needs_libwebp
def test_roundtrip_complex_image_matches_libwebp_decoder():
    """A mixed-statistics image large enough to engage the entropy
    image (meta prefix codes) and cross-color paths — the repo decode
    must equal BOTH the input and libwebp's own decode."""
    rng = np.random.default_rng(42)
    h, w = 160, 240
    img = np.zeros((h, w, 3), dtype=np.uint8)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img[:, :, 0] = (xx * 255 // w).astype(np.uint8)
    img[:, :, 1] = ((xx + yy) % 256).astype(np.uint8)
    img[:, :, 2] = (img[:, :, 0] * 0.7 + 30).astype(np.uint8)
    img[40:90, 60:180] = rng.integers(0, 256, (50, 120, 3), dtype=np.uint8)
    img[100:150, 20:100] = np.tile(
        rng.integers(0, 256, (5, 5, 3), dtype=np.uint8), (10, 16, 1)
    )
    data = _encode(img)
    got = webp_pixels(data)
    assert (got == img).all()
    assert (got == _lib_decode_rgb(data)).all()


@needs_libwebp
def test_roundtrip_rgba_matches_libwebp_decoder():
    """RGBA input: libwebp's encoder may canonicalize RGB under fully
    transparent pixels, so the ground truth is decoder-vs-decoder
    equality (plus input equality wherever alpha > 0)."""
    rng = np.random.default_rng(3)
    rgba = np.dstack(
        [
            rng.integers(0, 256, (60, 80, 3), dtype=np.uint8),
            rng.integers(0, 256, (60, 80), dtype=np.uint8),
        ]
    )
    data = _encode(rgba, rgba=True)
    got = webp_pixels(data)
    assert (got == _lib_decode_rgb(data)).all()
    opaque = rgba[:, :, 3] > 0
    assert (got[opaque] == rgba[:, :, :3][opaque]).all()


def test_handwritten_vp8l_simple_codes():
    """A VP8L stream hand-assembled bit by bit from the spec (no
    library, no shared code with the decoder): 2x2 two-tone gray via
    simple 2-symbol prefix codes — pins the LSB-first field order,
    the simple-code layout, and ARGB channel order."""
    bits = []

    def put(v, n):
        bits.extend((v >> i) & 1 for i in range(n))

    put(0x2F, 8)  # signature
    put(1, 14)  # width - 1 = 1
    put(1, 14)  # height - 1 = 1
    put(0, 1)  # alpha hint
    put(0, 3)  # version
    put(0, 1)  # no transforms
    put(0, 1)  # no color cache
    put(0, 1)  # no meta prefix codes
    # green: simple, 2 symbols, 8-bit first: 40, then 200
    put(1, 1); put(1, 1); put(1, 1); put(40, 8); put(200, 8)
    # red: simple, 1 symbol, 8-bit: 40 (reads zero bits per symbol)
    put(1, 1); put(0, 1); put(1, 1); put(40, 8)
    # blue: simple, 2 symbols: 40, 200
    put(1, 1); put(1, 1); put(1, 1); put(40, 8); put(200, 8)
    # alpha: simple, 1 symbol: 255
    put(1, 1); put(0, 1); put(1, 1); put(255, 8)
    # distance: simple, 1 symbol: 0 (never used)
    put(1, 1); put(0, 1); put(1, 1); put(0, 8)
    # pixels: greens 40,200,200,40 -> green code 0/1; blue follows green
    for g in (0, 1, 1, 0):
        put(g, 1)  # green symbol
        put(g, 1)  # blue symbol (same simple code shape)
    payload = bytearray()
    for i in range(0, len(bits), 8):
        payload.append(sum(b << j for j, b in enumerate(bits[i : i + 8])))
    data = (
        b"RIFF"
        + (4 + 8 + len(payload) + (len(payload) & 1)).to_bytes(4, "little")
        + b"WEBP"
        + b"VP8L"
        + len(payload).to_bytes(4, "little")
        + bytes(payload)
    )
    px = webp_pixels(data)
    assert px.shape == (2, 2, 3)
    assert (px[0, 0] == (40, 40, 40)).all()
    assert (px[0, 1] == (40, 200, 200)).all()
    assert (px[1, 0] == (40, 200, 200)).all()
    assert (px[1, 1] == (40, 40, 40)).all()


@needs_libwebp
def test_vp8x_wrapped_vp8l_decodes():
    """A VP8L chunk inside a VP8X extended container (still image, no
    animation flag) must decode identically to the bare stream."""
    px = _cases()["gradient"]
    data = _encode(px)
    chunks = data[12:]
    w, h = px.shape[1], px.shape[0]
    vp8x = (
        b"VP8X"
        + (10).to_bytes(4, "little")
        + bytes([0, 0, 0, 0])
        + (w - 1).to_bytes(3, "little")
        + (h - 1).to_bytes(3, "little")
    )
    wrapped = (
        b"RIFF"
        + (4 + len(vp8x) + len(chunks)).to_bytes(4, "little")
        + b"WEBP"
        + vp8x
        + chunks
    )
    assert (webp_pixels(wrapped) == px).all()


def test_animated_webp_refuses():
    vp8x = (
        b"VP8X"
        + (10).to_bytes(4, "little")
        + bytes([0x02, 0, 0, 0])  # animation flag
        + (15).to_bytes(3, "little")
        + (15).to_bytes(3, "little")
    )
    data = b"RIFF" + (4 + len(vp8x)).to_bytes(4, "little") + b"WEBP" + vp8x
    with pytest.raises(ValueError, match="animated"):
        webp_pixels(data)


def test_real_lossy_webp_refuses_with_set_decoder_pointer():
    """python_lossy.webp (CPython test data, PSF license): a REAL
    lossy VP8X+ALPH+VP8 file — container parses, and the refusal names
    the set_decoder escape hatch instead of mis-decoding."""
    data = (FIXTURES / "python_lossy.webp").read_bytes()
    with pytest.raises(ValueError, match="set_decoder"):
        webp_pixels(data)


@needs_libwebp
def test_sniff_and_feature_decode_integration(spark):
    """Both sniff registries route RIFF....WEBP: decode_features yields
    real byte-derived features, and the dHash fingerprint of a
    WebP-encoded image equals the BMP fingerprint of the same pixels —
    format independence through the one Arrow stage."""
    from openmsistream_spark.llm.multimodal import _sniff
    from openmsistream_spark.llm.phash import image_fingerprints
    from openmsistream_spark.llm.webp import decode_webp

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    data = _encode(px)
    assert _sniff(data) is not None
    feats = decode_webp(data)
    assert (feats["width"], feats["height"]) == (24, 24)

    # BMP twin (bottom-up 24-bit, rows padded to 4 bytes)
    h, w, _ = px.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    body = b"".join(
        bytes(px[y, :, ::-1].tobytes()) + b"\x00" * pad
        for y in range(h - 1, -1, -1)
    )
    bmp = (
        b"BM"
        + (54 + len(body)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + b"\x00" * 24
        + body
    )
    media = spark.createDataFrame(
        [(1, bytearray(data)), (2, bytearray(bmp))],
        "media_id long, content binary",
    )
    fps = {r.media_id: r.fingerprint for r in image_fingerprints(media).collect()}
    assert fps[1] == fps[2]

"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partition-parallel
``mapInPandas`` batch shape, Arrow transfer, metadata structs. The codec
step is layered:

- **Real decode, no dependencies**: uncompressed BMP (8/24/32-bpp),
  binary PPM/PGM, PNG (8-bit gray/RGB/palette/gray-alpha/RGBA,
  non-interlaced — stdlib zlib inflate + all five spec filters), GIF
  (87a/89a, pure-Python LZW, interlacing, animation compositing —
  ``llm/gif.py``), baseline AND progressive JPEG (SOF0 sequential +
  SOF2 spectral-selection/successive-approximation DCT, 4:4:4/4:2:2/
  4:2:0, restart markers — ``llm/jpeg.py``; float-tier pixels, see its
  determinism note), lossless WebP (the full VP8L bitstream —
  ``llm/webp.py``), and PCM WAV are parsed in pure Python/numpy
  (``decode_bmp``/``decode_ppm``/``decode_png``/``decode_gif``/
  ``decode_jpeg``/``decode_webp``/``decode_wav``) — headers, row
  padding, filters, and sample widths per the published format specs.
  The default decoder sniffs magic bytes and uses these.
- **Heavyweight codecs** (MP3/AAC, H.264, lossy-VP8/animated WebP,
  arithmetic-coded or 12-bit JPEG …) need external libraries this
  container does not ship: register one via ``set_decoder``.
- **Unknown formats** fall back to the deterministic fake decoder
  (plumbing stays exercisable); ``strict=True`` raises instead, so a
  production pipeline cannot silently ship hash-derived features.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable, Iterator

import numpy as np
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


def _pixel_features(px: "np.ndarray", width: int, height: int, channels: int) -> dict:
    """8-dim feature vector over a (h, w, c) uint8 pixel array — plain
    summary statistics, each hand-computable for oracle tests."""
    flat = px.astype(np.float64) / 255.0
    return {
        "width": int(width),
        "height": int(height),
        "n_frames": 1,
        "features": [
            float(width),
            float(height),
            float(channels),
            float(flat.mean()),
            float(flat.std()),
            float(flat.min()),
            float(flat.max()),
            float(width) / float(height),
        ],
    }


def bmp_pixels(content: bytes) -> "np.ndarray":
    """Uncompressed BMP (BITMAPINFOHEADER, 8/24/32 bpp) → (h, w, c)
    uint8 pixel array: 14-byte file header ('BM', pixel-data offset at
    byte 10), 40-byte info header (width/height int32 — negative height
    = top-down), rows padded to 4-byte boundaries. Palette indices
    (8 bpp) are treated as grayscale values; 24/32 bpp rows are BGR(A)
    order per the spec."""
    if len(content) < 54 or content[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack_from("<I", content, 10)
    hdr_size, width, height = struct.unpack_from("<Iii", content, 14)
    planes, bpp = struct.unpack_from("<HH", content, 26)
    (compression,) = struct.unpack_from("<I", content, 30)
    if compression != 0:
        raise ValueError(f"compressed BMP (method {compression}) unsupported")
    if bpp not in (8, 24, 32):
        raise ValueError(f"{bpp}-bpp BMP unsupported")
    top_down = height < 0
    height = abs(height)
    channels = bpp // 8
    row_bytes = (width * channels + 3) & ~3  # pad to 4-byte boundary
    need = data_off + row_bytes * height
    if len(content) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(
        content, dtype=np.uint8, count=row_bytes * height, offset=data_off
    ).reshape(height, row_bytes)[:, : width * channels]
    px = rows.reshape(height, width, channels)
    if not top_down:
        px = px[::-1]  # bottom-up storage → top-down array
    if channels >= 3:
        px = px[:, :, [2, 1, 0] + ([3] if channels == 4 else [])]  # BGR(A)→RGB(A)
    return px


def decode_bmp(content: bytes) -> dict:
    """Feature form of ``bmp_pixels`` (the decode_features contract)."""
    px = bmp_pixels(content)
    h, w, c = px.shape
    return _pixel_features(px, w, h, c)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: bytes, w: int, h: int, bpp: int) -> "np.ndarray":
    """Reverse the PNG per-row filters (spec §6: None/Sub/Up/Average/
    Paeth) over the decompressed scanline stream → (h, w*bpp) uint8.
    Sub is vectorized as a per-channel mod-256 cumsum; Up is one wrapped
    row add; Average/Paeth carry a left-pixel dependency, so those rows
    run a per-pixel loop (vectorized across channels) — fine for the
    test-grade corpora this dependency-free decoder family serves."""
    stride = w * bpp
    if len(raw) != h * (1 + stride):
        raise ValueError(
            f"PNG scanline stream is {len(raw)} bytes, expected {h * (1 + stride)}"
        )
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(arr[y, 0])
        cur = arr[y, 1:].copy()
        if f == 0:
            row = cur
        elif f == 1:  # Sub: recon[x] = cur[x] + recon[x-bpp]
            row = (
                (np.cumsum(cur.reshape(w, bpp).astype(np.int64), axis=0) % 256)
                .astype(np.uint8)
                .reshape(stride)
            )
        elif f == 2:  # Up: recon[x] = cur[x] + prev[x]  (uint8 wraps)
            row = cur + prev
        elif f in (3, 4):  # Average / Paeth: left dependency -> loop
            c2 = cur.reshape(w, bpp).astype(np.int64)
            up = prev.reshape(w, bpp).astype(np.int64)
            rec = np.zeros((w, bpp), dtype=np.int64)
            left = np.zeros(bpp, dtype=np.int64)
            upleft = np.zeros(bpp, dtype=np.int64)
            for x in range(w):
                if f == 3:
                    pred = (left + up[x]) // 2
                else:
                    p = left + up[x] - upleft
                    pa = np.abs(p - left)
                    pb = np.abs(p - up[x])
                    pc = np.abs(p - upleft)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc),
                        left,
                        np.where(pb <= pc, up[x], upleft),
                    )
                rec[x] = (c2[x] + pred) % 256
                left = rec[x]
                upleft = up[x]
            row = rec.astype(np.uint8).reshape(stride)
        else:
            raise ValueError(f"unknown PNG filter type {f} on row {y}")
        out[y] = row
        prev = out[y]
    return out


def png_pixels(content: bytes) -> "np.ndarray":
    """PNG (ISO/IEC 15948) → (h, w, c) uint8 pixel array, pure stdlib
    ``zlib`` + numpy — no codec library. Supported: 8-bit depth, color
    types 0 (gray), 2 (RGB), 3 (palette → RGB), 4 (gray+alpha — alpha
    DROPPED, returns (h, w, 1); this is a pixel decoder for the
    perceptual/feature family, which ignores alpha) and 6 (RGBA),
    non-interlaced. 1/2/4/16-bit depths and Adam7 interlacing raise
    ValueError — register a full codec via ``set_decoder`` for those."""
    import zlib

    if content[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = len(_PNG_SIG)
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(content):
        (length,) = struct.unpack_from(">I", content, pos)
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype_n, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"{depth}-bit PNG unsupported (8-bit only)")
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard PNG compression/filter method")
    if interlace != 0:
        raise ValueError("Adam7-interlaced PNG unsupported")
    if ctype_n not in (0, 2, 3, 4, 6):
        raise ValueError(f"PNG color type {ctype_n} unsupported")
    if w < 1 or h < 1:
        raise ValueError("empty PNG")
    if not idat:
        raise ValueError("PNG missing IDAT")
    bpp = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype_n]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:  # normalize to the family's error type
        raise ValueError(f"bad PNG IDAT stream: {exc}") from exc
    flat = _png_unfilter(raw, w, h, bpp)
    if ctype_n == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        idx = flat.reshape(h, w)
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("PNG palette index out of range")
        return plte[idx]  # (h, w, 3)
    px = flat.reshape(h, w, bpp)
    if ctype_n == 4:  # gray+alpha -> drop alpha (documented)
        return px[:, :, :1]
    return px


def decode_png(content: bytes) -> dict:
    """Feature form of ``png_pixels`` (the decode_features contract)."""
    px = png_pixels(content)
    h, w, c = px.shape
    return _pixel_features(px, w, h, c)


def decode_gif(content: bytes) -> dict:
    """Feature form of the GIF decoder (the decode_features contract):
    features from the first composited frame, ``n_frames`` from the
    full animation."""
    from .gif import gif_frames

    frames = gif_frames(content)
    h, w, c = frames[0].shape
    out = _pixel_features(frames[0], w, h, c)
    out["n_frames"] = len(frames)
    return out


def decode_jpeg(content: bytes) -> dict:
    """Feature form of the baseline JPEG decoder (the decode_features
    contract). Float-tier pixels (IDCT + color convert) — see
    llm/jpeg.py's determinism note."""
    from .jpeg import jpeg_pixels

    px = jpeg_pixels(content)
    h, w, c = px.shape
    return _pixel_features(px, w, h, c)


def _pnm_one(content: bytes, pos: int):
    """Parse ONE binary PPM (P6, RGB) / PGM (P5, gray) image starting at
    byte ``pos``: ASCII header of magic, width, height, maxval
    (whitespace/comment separated), then raw samples, one or three bytes
    per pixel (maxval <= 255). Returns ((h, w, c) uint8 array, position
    just past the pixel data) — the PNM spec allows images to be
    concatenated in one stream, which ``pnm_stream_frames`` uses as the
    dependency-free video container."""
    if content[pos : pos + 2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PPM/PGM")
    channels = 3 if content[pos : pos + 2] == b"P6" else 1
    # tokenize the header: magic + 3 ints, '#' comments run to newline
    pos, vals = pos + 2, []
    while len(vals) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":
            while pos < len(content) and content[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(content[start:pos]))
    width, height, maxval = vals
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    pos += 1  # single whitespace after maxval, per spec
    need = width * height * channels
    if len(content) < pos + need:
        raise ValueError("truncated PPM pixel data")
    px = np.frombuffer(content, dtype=np.uint8, count=need, offset=pos).reshape(
        height, width, channels
    )
    return px, pos + need


def ppm_pixels(content: bytes) -> "np.ndarray":
    """Single binary PPM/PGM → (h, w, c) uint8 pixel array."""
    px, _end = _pnm_one(content, 0)
    return px


def pnm_stream_frames(content: bytes) -> "list[np.ndarray]":
    """Multi-image PNM stream → ordered list of (h, w, c) uint8 frames.
    The PNM spec permits concatenating images in one file; this is the
    repo's dependency-free VIDEO container (each image = one frame).
    Frames may differ in size/depth; raises on an empty or malformed
    stream."""
    frames, pos = [], 0
    while pos < len(content):
        if content[pos : pos + 1].isspace():
            pos += 1  # optional whitespace between concatenated images
            continue
        px, pos = _pnm_one(content, pos)
        frames.append(px)
    if not frames:
        raise ValueError("empty PNM stream")
    return frames


def decode_ppm(content: bytes) -> dict:
    """Feature form of ``ppm_pixels`` (the decode_features contract)."""
    px = ppm_pixels(content)
    h, w, c = px.shape
    return _pixel_features(px, w, h, c)


def wav_pcm(content: bytes):
    """Raw integer PCM view of a WAV: (samples, n_channels, sample_rate,
    bits) where ``samples`` is the interleaved int64 array CENTERED at
    zero (8-bit unsigned gets 128 subtracted; 16-bit is already signed)
    but NOT rescaled — the exact-integer form the perceptual audio hash
    (llm/audiofp.py) needs. Raises ValueError on anything that is not
    8/16-bit integer PCM."""
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content):
        cid, size = content[pos : pos + 4], struct.unpack_from("<I", content, pos + 4)[0]
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            try:
                fmt = struct.unpack_from("<HHIIHH", body, 0)
            except struct.error as exc:
                # normalize to the decoder family's error type: callers
                # (audio_fingerprints/audio_quality_stats skip mode)
                # catch ValueError only
                raise ValueError(f"truncated WAV fmt chunk: {exc}") from exc
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_channels, sample_rate, _byte_rate, _align, bits = fmt
    if audio_fmt != 1 or bits not in (8, 16):
        raise ValueError(f"non-PCM or {bits}-bit WAV unsupported")
    if bits == 16:
        samples = np.frombuffer(data, dtype="<i2", count=len(data) // 2).astype(
            np.int64
        )
    else:  # 8-bit WAV is unsigned, midpoint 128
        samples = np.frombuffer(data, dtype=np.uint8).astype(np.int64) - 128
    return samples, n_channels, sample_rate, bits


def decode_wav(content: bytes) -> dict:
    """PCM WAV: RIFF/WAVE container, 'fmt ' chunk (format 1 = integer
    PCM, 8- or 16-bit), 'data' chunk of interleaved little-endian
    samples. Features are summary statistics over samples normalized to
    [-1, 1]; ``n_frames`` is the per-channel sample count."""
    raw, n_channels, sample_rate, bits = wav_pcm(content)
    samples = raw.astype(np.float64) / (32768.0 if bits == 16 else 128.0)
    n_frames = len(samples) // max(1, n_channels)
    rms = float(np.sqrt((samples**2).mean())) if len(samples) else 0.0
    return {
        "width": None,
        "height": None,
        "n_frames": int(n_frames),
        "features": [
            float(n_channels),
            float(sample_rate),
            float(n_frames),
            float(n_frames) / float(sample_rate) if sample_rate else 0.0,
            float(samples.mean()) if len(samples) else 0.0,
            rms,
            float(samples.min()) if len(samples) else 0.0,
            float(samples.max()) if len(samples) else 0.0,
        ],
    }


def sniff_pixels(content: bytes):
    """Image-pixel twin of ``_sniff`` for the perceptual-hash family
    (llm/phash.py): the matching pixel decoder (bytes → (h, w, c) uint8
    array) for the dependency-free image formats, or None for non-image
    bytes (the audio perceptual-hash path sniffs WAV itself —
    llm/audiofp.py)."""
    if content[:2] == b"BM":
        return bmp_pixels
    if content[:2] in (b"P5", b"P6"):
        return ppm_pixels
    if content[: len(_PNG_SIG)] == _PNG_SIG:
        return png_pixels
    if content[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import gif_pixels

        return gif_pixels
    if content[:2] == b"\xff\xd8":
        from .jpeg import jpeg_pixels

        return jpeg_pixels
    if content[:4] == b"RIFF" and content[8:12] == b"WEBP":
        from .webp import webp_pixels

        return webp_pixels
    return None


def video_frames(content: bytes) -> "list[np.ndarray]":
    """Multi-frame pixel decode for the video family (llm/videofp.py):
    a multi-image PNM stream (the image2pipe convention) or an animated
    GIF (frames composited onto the logical screen). Raises ValueError
    for anything else — the video fingerprint path's strictness policy
    handles it."""
    if content[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import gif_frames

        return gif_frames(content)
    if content[:2] in (b"P5", b"P6"):
        return pnm_stream_frames(content)
    raise ValueError(
        "unknown video container (built-ins: multi-image binary PNM "
        "stream, animated GIF)"
    )


def _sniff(content: bytes):
    """The one magic-byte dispatch both the strict and non-strict paths
    share (a single source of truth, so adding a codec cannot diverge
    them): the matching built-in decoder, or None for unknown bytes."""
    if content[:2] == b"BM":
        return decode_bmp
    if content[:2] in (b"P5", b"P6"):
        return decode_ppm
    if content[: len(_PNG_SIG)] == _PNG_SIG:
        return decode_png
    if content[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif
    if content[:2] == b"\xff\xd8":
        return decode_jpeg
    if content[:4] == b"RIFF" and content[8:12] == b"WEBP":
        from .webp import decode_webp

        return decode_webp
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return decode_wav
    return None


def default_decoder(media_type: str, content: bytes) -> dict:
    """Magic-byte-sniffing decoder: real parse for the dependency-free
    formats (BMP, PPM/PGM, PNG, GIF, baseline+progressive JPEG, VP8L
    WebP, PCM WAV), deterministic fake for anything
    else — so known formats always yield REAL byte-derived features
    while exotic codecs keep the plumbing testable. ``strict`` mode in
    ``decode_features`` refuses every fake path instead (unknown format
    AND malformed known format)."""
    dec = _sniff(content)
    if dec is not None:
        try:
            return dec(content)
        except (ValueError, struct.error):
            pass  # malformed/truncated header → fall through to the fake
    return fake_decoder(media_type, content)


def decode_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode/feature-extract media rows via partition-parallel
    ``mapInPandas`` (one Arrow batch per call — the batch shape a real
    GPU/codec stage needs). ``strict=True`` refuses to run without a
    real decoder registered."""

    decoder = _DECODER
    if decoder is None:
        if strict:
            # built-ins really decode the sniffed formats; strict mode
            # refuses EVERY hash-derived fake path: unknown formats
            # raise NotImplementedError, and malformed known-format
            # content lets the decoder's own ValueError/struct.error
            # surface instead of silently shipping fake features
            def decoder(media_type: str, content: bytes) -> dict:
                dec = _sniff(content)
                if dec is None:
                    raise NotImplementedError(
                        "no decoder for this format: built-ins cover "
                        "BMP/PPM/PGM/PNG/GIF/JPEG/VP8L-WebP/PCM-WAV; "
                        "install codec libraries and "
                        "call set_decoder() for others (stub by design)"
                    )
                return dec(content)

        else:
            decoder = default_decoder

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

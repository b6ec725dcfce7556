"""Dependency-free GIF decode (GIF87a/GIF89a, CompuServe spec /
RFC-adjacent public documentation): pure-Python LZW + numpy palette
mapping — no codec library, same tier as the BMP/PNM/PNG/WAV decoders
in ``llm/multimodal.py``.

Supported: global/local color tables, interlaced images (the 4-pass
row order), multi-frame animations with disposal methods 0/1 (leave in
place), 2 (restore to background), and 3 (restore to the pre-frame
canvas), frame sub-rectangles composited
onto the logical screen, transparency treated as "previous pixel shows
through" (the animation meaning; the returned pixels are RGB — the
perceptual/feature family ignores alpha). Out of scope (ValueError):
truncated streams, oversized LZW codes, missing color tables.

Why it matters here: an animated GIF is a REAL multi-frame container,
so ``gif_frames`` feeds the video perceptual-hash family
(``llm/videofp.py``) exactly like the multi-image PNM streams — a web
crawl's media corpus is full of them.
"""

from __future__ import annotations

import struct

import numpy as np

_GIF_SIGS = (b"GIF87a", b"GIF89a")


def _lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> list[int]:
    """GIF-variant LZW: variable-width codes (LSB-first bit packing),
    clear/end codes, dictionary capped at 4096 entries. Returns palette
    indices; stops at the end code or when ``max_pixels`` are decoded
    (some encoders omit the end code)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad GIF LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1

    def fresh():
        return {i: (i,) for i in range(clear)}

    table = fresh()
    code_size = min_code_size + 1
    next_code = end + 1
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table = fresh()
                code_size = min_code_size + 1
                next_code = end + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                entry = table.get(code)
                if entry is None:
                    raise ValueError(f"bad first GIF LZW code {code}")
            elif code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + (prev[0],)  # the KwKwK case
            else:
                raise ValueError(f"GIF LZW code {code} out of range")
            out.extend(entry)
            if prev is not None and next_code < 4096:
                table[next_code] = prev + (entry[0],)
                next_code += 1
            # GIF-LZW width rule (GIF89a appendix F / GIFCOMPR.C): the
            # encoder emits the NEXT code wider once the slot count
            # reaches 2^size, so the decoder widens when its next free
            # slot reaches 2^size — not one early (that is the TIFF
            # "EarlyChange" schedule, which desyncs on real GIFs)
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            prev = entry
            if len(out) >= max_pixels:
                return out
    raise ValueError("truncated GIF LZW stream (no end code, pixels short)")


def _deinterlace(rows: "np.ndarray") -> "np.ndarray":
    """Reorder the 4-pass interlaced row sequence back to top-down."""
    h = rows.shape[0]
    order: list[int] = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, h, step))
    out = np.empty_like(rows)
    out[order] = rows
    return out


def gif_frames(content: bytes) -> "list[np.ndarray]":
    """GIF bytes → list of (h, w, 3) uint8 RGB frames, each the FULL
    logical screen after compositing that frame (sub-rectangles painted
    over the prior canvas; disposal 2 restores the touched rect to
    background; transparent pixels leave the underlying canvas)."""
    if content[:6] not in _GIF_SIGS:
        raise ValueError("not a GIF")
    if len(content) < 13:
        raise ValueError("truncated GIF header")
    width, height, packed, bg_idx, _ = struct.unpack_from("<HHBBB", content, 6)
    if width < 1 or height < 1:
        raise ValueError("empty GIF logical screen")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(content, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3

    canvas = np.zeros((height, width, 3), dtype=np.uint8)
    if gct is not None and bg_idx < len(gct):
        canvas[:, :] = gct[bg_idx]
    background = canvas.copy()
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0

    def sub_blocks(p: int) -> tuple[bytes, int]:
        chunks = []
        while True:
            if p >= len(content):
                raise ValueError("truncated GIF sub-blocks")
            n = content[p]
            p += 1
            if n == 0:
                return b"".join(chunks), p
            chunks.append(content[p : p + n])
            if len(chunks[-1]) < n:
                raise ValueError("truncated GIF sub-block")
            p += n

    while pos < len(content):
        b = content[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            if pos >= len(content):
                raise ValueError("truncated GIF extension")
            label = content[pos]
            pos += 1
            data, pos = sub_blocks(pos)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                flags = data[0]
                disposal = (flags >> 2) & 0x07
                transparent = data[3] if flags & 1 else None
            continue
        if b != 0x2C:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
        if pos + 9 > len(content):
            raise ValueError("truncated GIF image descriptor")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", content, pos)
        pos += 9
        if left + w > width or top + h > height or w < 1 or h < 1:
            raise ValueError("GIF frame rect outside the logical screen")
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = np.frombuffer(content, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        else:
            ct = gct
        if ct is None:
            raise ValueError("GIF frame has no color table")
        if pos >= len(content):
            raise ValueError("truncated GIF image data")
        mcs = content[pos]
        pos += 1
        data, pos = sub_blocks(pos)
        idx = _lzw_decode(mcs, data, w * h)
        if len(idx) < w * h:
            raise ValueError("GIF frame pixel data short")
        rows = np.asarray(idx[: w * h], dtype=np.int64).reshape(h, w)
        if ipacked & 0x40:
            rows = _deinterlace(rows)
        if int(rows.max(initial=0)) >= len(ct):
            raise ValueError("GIF palette index out of range")
        rect = canvas[top : top + h, left : left + w]
        saved = rect.copy() if disposal == 3 else None
        painted = ct[rows]
        if transparent is not None:
            mask = rows == transparent
            painted = np.where(mask[:, :, None], rect, painted)
        canvas[top : top + h, left : left + w] = painted
        frames.append(canvas.copy())
        if disposal == 2:  # restore touched rect to background
            canvas[top : top + h, left : left + w] = background[
                top : top + h, left : left + w
            ]
        elif disposal == 3:  # restore touched rect to pre-frame canvas
            canvas[top : top + h, left : left + w] = saved
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image frames")
    return frames


def gif_pixels(content: bytes) -> "np.ndarray":
    """First composited frame of a GIF as (h, w, 3) uint8 — the
    single-image pixel-decoder contract (``sniff_pixels``)."""
    return gif_frames(content)[0]

"""WebP container + VP8L (lossless) still-image decode — pure
Python/numpy, no codec libraries, like the sibling GIF (llm/gif.py)
and JPEG (llm/jpeg.py) decoders.

Scope (the round-15 verdict's residual-codec slice): VP8L — the
WebP LOSSLESS bitstream (spec: "WebP Lossless Bitstream
Specification", a.k.a. RFC 9649 §3; container: "WebP Container
Specification") — is decoded fully: LSB-first bit stream, canonical
prefix codes (simple + code-length-coded), optional color cache,
meta prefix (entropy image), LZ77 with the 120-entry 2D distance
map, and all four transforms (predictor ×14 modes, cross-color,
subtract-green, color-indexing with pixel bundling), inverted in
reverse stream order. Lossy VP8 and animated WebP stay a documented
``set_decoder`` boundary (like MP3/AAC/H.264): a full VP8 intra
decoder (boolean arithmetic coding + loop filter) is a codec-library
job, and silently approximating it would poison perceptual hashes.

Reference parity note: the reference pipeline has no media path at
all — this module serves the LLM-curation stack's image near-dup
operators (llm/phash.py), which fingerprint whatever the crawl
yields; WebP is the largest real-crawl image format that was
previously unrecognized by the sniffers (llm/multimodal.py).

Conformance: tests/test_webp.py round-trips pixels through the REAL
system libwebp encoder (``WebPEncodeLosslessRGB`` via ctypes, when
the shared library is present) and asserts this decoder reproduces
them byte-exactly — covering predictor/color/palette/LZ77 paths with
an independent producer, the same fixture discipline as the GIF and
progressive-JPEG rounds. The 2D distance map below is the spec's
120-entry table.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- bits


class _Bits:
    """LSB-first bit reader over little-endian bytes (the VP8L
    convention). Bounded accumulator — refills a byte at a time, so
    cost is linear in stream size (the jpeg.py round's lesson: never
    shift one ever-growing integer)."""

    def __init__(self, data: bytes):
        self.d = data
        self.i = 0
        self.acc = 0
        self.n = 0

    def read(self, k: int) -> int:
        while self.n < k:
            if self.i >= len(self.d):
                raise ValueError("VP8L: bit stream truncated")
            self.acc |= self.d[self.i] << self.n
            self.i += 1
            self.n += 8
        v = self.acc & ((1 << k) - 1)
        self.acc >>= k
        self.n -= k
        return v


# ------------------------------------------------------- prefix codes

#: code-length-code read order (spec §6.2.2 — differs from DEFLATE's)
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


class _Prefix:
    """Canonical prefix decoder. Codes are canonical DEFLATE-style
    (shorter lengths first, ties by symbol order) and the stream
    presents each code MSB-first, one bit per read — decoded with the
    accumulate-and-compare walk (same shape as the JPEG Huffman
    reader). A one-symbol code reads zero bits (spec: simple code with
    a single symbol, or a length assignment with one live symbol)."""

    MAX_LEN = 15

    def __init__(self, lengths: list[int]):
        live = [(s, l) for s, l in enumerate(lengths) if l > 0]
        if not live:
            raise ValueError("VP8L: empty prefix code")
        if len(live) == 1:
            self.single = live[0][0]
            return
        self.single = None
        # canonical assignment: ascending (length, symbol)
        by_len: dict[int, list[int]] = {}
        for s, l in live:
            if l > self.MAX_LEN:
                raise ValueError("VP8L: code length > 15")
            by_len.setdefault(l, []).append(s)
        self.table: list[dict[int, int] | None] = [None] * (self.MAX_LEN + 1)
        code = 0
        for l in range(1, self.MAX_LEN + 1):
            syms = sorted(by_len.get(l, []))
            if syms:
                self.table[l] = {code + i: s for i, s in enumerate(syms)}
                code += len(syms)
            code <<= 1
        if code != 1 << (self.MAX_LEN + 1):
            # over/under-subscribed length sets cannot decode uniquely
            raise ValueError("VP8L: invalid prefix code length set")

    @classmethod
    def explicit(cls, pairs: list[tuple[int, int, int]]) -> "_Prefix":
        """Build from explicit (symbol, code, length) triples — the
        'simple' two-symbol code, whose codes are 0/1 in READ order,
        not canonical order."""
        obj = cls.__new__(cls)
        obj.single = None
        obj.table = [None] * (cls.MAX_LEN + 1)
        for sym, code, length in pairs:
            if obj.table[length] is None:
                obj.table[length] = {}
            obj.table[length][code] = sym
        return obj

    def decode(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for l in range(1, self.MAX_LEN + 1):
            code = (code << 1) | br.read(1)
            row = self.table[l]
            if row is not None:
                sym = row.get(code)
                if sym is not None:
                    return sym
        raise ValueError("VP8L: invalid prefix code word")


def _read_prefix_code(br: _Bits, alphabet_size: int) -> _Prefix:
    """One prefix code (spec §6.2.2): 'simple' (1-2 symbols, explicit)
    or 'normal' (code lengths themselves prefix-coded, with 16/17/18
    repeat symbols and the optional max-symbol budget)."""
    if br.read(1):  # simple
        nsym = br.read(1) + 1
        sym0 = br.read(8 if br.read(1) else 1)
        if nsym == 1:
            return _single(sym0)
        sym1 = br.read(8)
        return _Prefix.explicit([(sym0, 0, 1), (sym1, 1, 1)])
    num_codes = br.read(4) + 4
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _Prefix(cl_lengths)
    if br.read(1):  # explicit max-symbol budget
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8  # spec default
    sym = 0
    while sym < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = cl_code.decode(br)
        if code_len < 16:
            lengths[sym] = code_len
            sym += 1
            if code_len:
                prev_len = code_len
        else:
            if code_len == 16:
                repeat, fill = 3 + br.read(2), prev_len
            elif code_len == 17:
                repeat, fill = 3 + br.read(3), 0
            else:
                repeat, fill = 11 + br.read(7), 0
            if sym + repeat > alphabet_size:
                raise ValueError("VP8L: code length repeat overflows alphabet")
            for _ in range(repeat):
                lengths[sym] = fill
                sym += 1
    return _Prefix(lengths)


def _single(sym: int) -> _Prefix:
    p = _Prefix.__new__(_Prefix)
    p.single = sym
    return p


# ------------------------------------------------------------- LZ77

#: spec's 120-entry distance map: codes 1..120 are 2D offsets (x, y)
#: on the 8-neighborhood fan, dist = y*width + x (min 1); codes >120
#: are literal distances minus 120
_CODE_TO_PLANE = bytes.fromhex(
    "1807171928062729161a262a38053739151b363a252b48044749141c353b464a"
    "242c58454b343c035759131d565a232d444c555b333d68026769121e666a222e"
    "545c434d656b323e78017779535d111f646c424e767a212f757b313f636d525e"
    "00747c414f1020626e30737d515f40727e616f50717f6070"
)


def _plane_to_dist(code: int, width: int) -> int:
    if code > 120:
        return code - 120
    b = _CODE_TO_PLANE[code - 1]
    y, x = b >> 4, 8 - (b & 0xF)
    return max(1, y * width + x)


def _lz77_value(prefix_code: int, br: _Bits) -> int:
    """Length/distance prefix coding (spec §5.2.3)."""
    if prefix_code < 4:
        return prefix_code + 1
    extra = (prefix_code - 2) >> 1
    offset = (2 + (prefix_code & 1)) << extra
    return offset + br.read(extra) + 1


# ------------------------------------------------- image stream decode


def _subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _read_groups(br: _Bits, n: int, cache_bits: int) -> list[tuple]:
    groups = []
    green_size = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    for _ in range(n):
        g = _read_prefix_code(br, green_size)
        r = _read_prefix_code(br, 256)
        b = _read_prefix_code(br, 256)
        a = _read_prefix_code(br, 256)
        d = _read_prefix_code(br, 40)
        groups.append((g, r, b, a, d))
    return groups


def _decode_pixels(
    br: _Bits,
    w: int,
    h: int,
    groups: list[tuple],
    meta: "np.ndarray | None",
    meta_bits: int,
    cache_bits: int,
) -> "np.ndarray":
    """The LZ77-over-ARGB main loop → uint32[h*w] (a<<24|r<<16|g<<8|b).
    One Python iteration per SYMBOL (not per pixel): backward copies
    and cache hits emit pixel runs without re-entering the entropy
    decoder — the decoder the spec intends."""
    n = w * h
    out = np.zeros(n, dtype=np.uint32)
    cache = (
        np.zeros(1 << cache_bits, dtype=np.uint32) if cache_bits else None
    )
    cache_shift = 32 - cache_bits if cache_bits else 0
    meta_w = _subsample(w, meta_bits) if meta is not None else 0
    pos = 0
    gcode = rcode = bcode = acode = dcode = None
    cur_group = -1
    while pos < n:
        if meta is not None:
            x, y = pos % w, pos // w
            gi = int(meta[(y >> meta_bits) * meta_w + (x >> meta_bits)])
        else:
            gi = 0
        if gi != cur_group:
            gcode, rcode, bcode, acode, dcode = groups[gi]
            cur_group = gi
        s = gcode.decode(br)
        if s < 256:
            r = rcode.decode(br)
            b = bcode.decode(br)
            a = acode.decode(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = px
            if cache is not None:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> cache_shift] = px
            pos += 1
        elif s < 256 + 24:
            length = _lz77_value(s - 256, br)
            dist = _plane_to_dist(_lz77_value(dcode.decode(br), br), w)
            if dist > pos or pos + length > n:
                raise ValueError("VP8L: backward reference out of range")
            for _ in range(length):  # may overlap (dist < length)
                px = out[pos - dist]
                out[pos] = px
                if cache is not None:
                    cache[(0x1E35A7BD * int(px) & 0xFFFFFFFF) >> cache_shift] = px
                pos += 1
        else:
            if cache is None:
                raise ValueError("VP8L: cache symbol without color cache")
            out[pos] = cache[s - 256 - 24]
            pos += 1
    return out


def _decode_stream(br: _Bits, w: int, h: int, level0: bool) -> "np.ndarray":
    """spec §7: image-stream ::= (optional-transform)* spatially-coded
    image. Sub-streams (entropy image, predictor/color tiles, palette)
    recurse with level0=False: no transforms, no meta prefix."""
    transforms = []
    if level0:
        seen = set()
        while br.read(1):
            t = br.read(2)
            if t in seen:
                raise ValueError("VP8L: duplicate transform")
            seen.add(t)
            if t == 0:  # predictor
                bits = br.read(3) + 2
                tiles = _decode_stream(
                    br, _subsample(w, bits), _subsample(h, bits), False
                )
                transforms.append(("pred", bits, tiles))
            elif t == 1:  # cross-color
                bits = br.read(3) + 2
                tiles = _decode_stream(
                    br, _subsample(w, bits), _subsample(h, bits), False
                )
                transforms.append(("color", bits, tiles))
            elif t == 2:  # subtract green
                transforms.append(("subg",))
            else:  # color indexing (palette) — reduces the coded width
                n_colors = br.read(8) + 1
                deltas = _decode_stream(br, n_colors, 1, False)
                palette = np.cumsum(
                    deltas.view(np.uint8).reshape(-1, 4).astype(np.uint32),
                    axis=0,
                    dtype=np.uint32,
                ) & 0xFF
                palette = (
                    palette.astype(np.uint8).copy().view(np.uint32).ravel()
                )
                if n_colors <= 2:
                    wbits = 3
                elif n_colors <= 4:
                    wbits = 2
                elif n_colors <= 16:
                    wbits = 1
                else:
                    wbits = 0
                transforms.append(("palette", wbits, palette, w))
                w = _subsample(w, wbits)  # bundled width for ALL later reads
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"VP8L: color cache bits {cache_bits}")
    meta = None
    meta_bits = 0
    n_groups = 1
    if level0 and br.read(1):  # meta prefix codes (entropy image)
        meta_bits = br.read(3) + 2
        ent = _decode_stream(
            br, _subsample(w, meta_bits), _subsample(h, meta_bits), False
        )
        meta = ((ent >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(meta.max()) + 1
    groups = _read_groups(br, n_groups, cache_bits)
    argb = _decode_pixels(br, w, h, groups, meta, meta_bits, cache_bits)
    for tf in reversed(transforms):
        if tf[0] == "palette":
            _, wbits, palette, full_w = tf
            argb = _inv_palette(argb, w, h, wbits, palette, full_w)
            w = full_w
        elif tf[0] == "subg":
            argb = _inv_subtract_green(argb)
        elif tf[0] == "color":
            argb = _inv_color_transform(argb, w, h, tf[1], tf[2])
        else:
            argb = _inv_predictor(argb, w, h, tf[1], tf[2])
    return argb


# ------------------------------------------------- inverse transforms


def _inv_subtract_green(argb: "np.ndarray") -> "np.ndarray":
    g = (argb >> 8) & 0xFF
    r = ((argb >> 16) & 0xFF) + g
    b = (argb & 0xFF) + g
    return (
        (argb & 0xFF00FF00)
        | ((r & 0xFF) << 16).astype(np.uint32)
        | (b & 0xFF).astype(np.uint32)
    )


def _inv_palette(
    argb: "np.ndarray",
    bundled_w: int,
    h: int,
    wbits: int,
    palette: "np.ndarray",
    full_w: int,
) -> "np.ndarray":
    idx_bits = 8 >> wbits  # bits per packed index
    per = 1 << wbits  # indices per bundled pixel
    green = ((argb >> 8) & 0xFF).reshape(h, bundled_w).astype(np.uint32)
    xs = np.arange(full_w)
    shift = ((xs % per) * idx_bits).astype(np.uint32)
    packed = green[:, xs // per]
    idx = (packed >> shift[None, :]) & ((1 << idx_bits) - 1)
    # out-of-range palette indices decode as transparent black (the
    # defined behavior — keeps truncated-palette streams total)
    safe = np.where(idx < len(palette), idx, 0)
    out = palette[safe]
    out[idx >= len(palette)] = 0
    return out.astype(np.uint32).ravel()


def _inv_color_transform(
    argb: "np.ndarray", w: int, h: int, bits: int, tiles: "np.ndarray"
) -> "np.ndarray":
    tw = _subsample(w, bits)
    out = argb.copy()
    px = out.view(np.uint8).reshape(h, w, 4)  # little-endian: b, g, r, a
    t8 = tiles.view(np.uint8).reshape(-1, 4)  # per tile: b=g2r, g=g2b, r=r2b
    def s8(v: int) -> int:  # uint8 -> int8 (the spec's casts)
        return v - 256 if v > 127 else v

    for y in range(h):
        trow = (y >> bits) * tw
        for x in range(w):
            te = t8[trow + (x >> bits)]
            g2r, g2b, r2b = s8(int(te[0])), s8(int(te[1])), s8(int(te[2]))
            g = s8(int(px[y, x, 1]))
            red = (int(px[y, x, 2]) + ((g2r * g) >> 5)) & 0xFF
            blue = int(px[y, x, 0]) + ((g2b * g) >> 5)
            blue = (blue + ((r2b * s8(red)) >> 5)) & 0xFF
            px[y, x, 2] = red
            px[y, x, 0] = blue
    return out


def _avg2(a: tuple, b: tuple) -> tuple:
    return tuple((x + y) >> 1 for x, y in zip(a, b))


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _inv_predictor(
    argb: "np.ndarray", w: int, h: int, bits: int, tiles: "np.ndarray"
) -> "np.ndarray":
    """Spatial predictor inverse (spec §4.4.2): pixel += predicted
    (mod 256 per channel), scan order. Fixed edge rules: (0,0) uses
    opaque black, the rest of row 0 uses L, column 0 uses T. The
    top-right neighbor of the last column wraps to the CURRENT row's
    first pixel — the contiguous-array addressing the spec defines."""
    tw = _subsample(w, bits)
    tmodes = ((tiles >> 8) & 0xFF).astype(np.int64)
    out = argb.astype(np.uint32).copy()
    ch = out.view(np.uint8).reshape(-1, 4)  # b, g, r, a per pixel

    def px(i: int) -> tuple:
        c = ch[i]
        return (int(c[0]), int(c[1]), int(c[2]), int(c[3]))

    for i in range(w * h):
        y, x = divmod(i, w)
        if x == 0 and y == 0:
            pred = (0, 0, 0, 255)  # b, g, r, a
        elif y == 0:
            pred = px(i - 1)
        elif x == 0:
            pred = px(i - w)
        else:
            mode = int(tmodes[(y >> bits) * tw + (x >> bits)])
            L = px(i - 1)
            T = px(i - w)
            if mode == 0:
                pred = (0, 0, 0, 255)
            elif mode == 1:
                pred = L
            elif mode == 2:
                pred = T
            elif mode == 3:
                pred = px(i - w + 1)
            elif mode == 4:
                pred = px(i - w - 1)
            elif mode == 5:
                pred = _avg2(_avg2(L, px(i - w + 1)), T)
            elif mode == 6:
                pred = _avg2(L, px(i - w - 1))
            elif mode == 7:
                pred = _avg2(L, T)
            elif mode == 8:
                pred = _avg2(px(i - w - 1), T)
            elif mode == 9:
                pred = _avg2(T, px(i - w + 1))
            elif mode == 10:
                pred = _avg2(
                    _avg2(L, px(i - w - 1)), _avg2(T, px(i - w + 1))
                )
            elif mode == 11:
                TL = px(i - w - 1)
                est = tuple(l + t - tl for l, t, tl in zip(L, T, TL))
                pl = sum(abs(e - l) for e, l in zip(est, L))
                pt = sum(abs(e - t) for e, t in zip(est, T))
                pred = L if pl < pt else T
            elif mode == 12:
                TL = px(i - w - 1)
                pred = tuple(
                    _clamp(l + t - tl) for l, t, tl in zip(L, T, TL)
                )
            elif mode == 13:
                TL = px(i - w - 1)
                ave = _avg2(L, T)
                pred = tuple(
                    _clamp(a + (a - tl) // 2 if a >= tl else a - (tl - a) // 2)
                    for a, tl in zip(ave, TL)
                )
            else:
                raise ValueError(f"VP8L: predictor mode {mode}")
        c = ch[i]
        c[0] = (int(c[0]) + pred[0]) & 0xFF
        c[1] = (int(c[1]) + pred[1]) & 0xFF
        c[2] = (int(c[2]) + pred[2]) & 0xFF
        c[3] = (int(c[3]) + pred[3]) & 0xFF
    return out


# ------------------------------------------------------ entry points


def _vp8l_pixels(payload: bytes) -> "np.ndarray":
    br = _Bits(payload)
    if br.read(8) != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha-is-used hint
    if br.read(3) != 0:
        raise ValueError("VP8L: unknown bitstream version")
    argb = _decode_stream(br, w, h, True)
    ch = argb.view(np.uint8).reshape(h, w, 4)  # b, g, r, a
    return np.stack([ch[:, :, 2], ch[:, :, 1], ch[:, :, 0]], axis=2).copy()


def _chunks(content: bytes):
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WEBP":
        raise ValueError("not a WebP file (RIFF....WEBP)")
    pos = 12
    while pos + 8 <= len(content):
        tag = content[pos : pos + 4]
        size = int.from_bytes(content[pos + 4 : pos + 8], "little")
        yield tag, content[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)


def webp_pixels(content: bytes) -> "np.ndarray":
    """WebP → (h, w, 3) uint8 RGB. Full decode for VP8L (lossless);
    ValueError for lossy VP8 and animated WebP — register a full codec
    via ``multimodal.set_decoder`` for those (strict-mode discipline:
    never a silently-wrong fingerprint)."""
    chunks = dict(_chunks(content))
    if b"VP8X" in chunks:
        flags = chunks[b"VP8X"][0] if chunks[b"VP8X"] else 0
        if flags & 0x02:
            raise ValueError(
                "animated WebP is not decoded built-in — register a "
                "codec via set_decoder()"
            )
    if b"VP8L" in chunks:
        return _vp8l_pixels(chunks[b"VP8L"])
    if b"VP8 " in chunks:
        raise ValueError(
            "lossy (VP8) WebP is not decoded built-in — register a "
            "codec via set_decoder(); built-in WebP support is VP8L "
            "(lossless)"
        )
    raise ValueError("WebP container without a VP8/VP8L image chunk")


def decode_webp(content: bytes) -> dict:
    """Feature form of ``webp_pixels`` (the decode_features contract)."""
    from .multimodal import _pixel_features

    px = webp_pixels(content)
    h, w, c = px.shape
    return _pixel_features(px, w, h, c)

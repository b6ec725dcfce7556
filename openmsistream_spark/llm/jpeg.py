"""Dependency-free baseline JPEG decode (ITU-T T.81 / JFIF, public
spec): pure-Python marker/Huffman parsing + numpy dequantize/IDCT/
upsample/color-convert — no codec library, the same tier as the
BMP/PNM/PNG/GIF/WAV decoders in ``llm/multimodal.py``.

Supported: baseline sequential DCT (SOF0) AND progressive DCT (SOF2 —
spectral selection + successive approximation, DC/AC first and
refinement scans, EOB runs, interleaved DC scans and non-interleaved
per-component scans, T.81 annex G), 8-bit precision, grayscale
(1 component) and YCbCr (3 components) with sampling factors 1 or 2 in
each axis (4:4:4, 4:2:2, 4:2:0), multiple DQT/DHT segments, restart
intervals (DRI + RSTn), byte stuffing. Out of scope (ValueError, the
``set_decoder`` boundary): extended sequential (SOF1), arithmetic
coding, 12-bit precision, CMYK/4-component, and lossless modes.

Honesty note on determinism: the IDCT and YCbCr→RGB steps are float
(rounded and clamped at the end), so JPEG pixels are NOT in the
integer-exact oracle tier the PNM/PNG paths occupy — decode is
pytest-tier (verified against an independent forward encoder written
in the tests, plus flat-field exactness), which is also true of every
real-world JPEG library; downstream fingerprint math on the decoded
pixels stays exact.
"""

from __future__ import annotations

import struct

import numpy as np

#: zig-zag order: index i of the scan -> (row, col) in the 8x8 block
ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]


def _dct_basis() -> "np.ndarray":
    k = np.arange(8)[:, None]
    i = np.arange(8)[None, :]
    m = np.cos(np.pi * k * (2 * i + 1) / 16.0)
    m[0] *= np.sqrt(1.0 / 8.0)
    m[1:] *= np.sqrt(2.0 / 8.0)
    return m


_DCT8 = _dct_basis()


def idct2(block: "np.ndarray") -> "np.ndarray":
    """2-D inverse DCT-II (orthonormal) of an 8x8 coefficient block."""
    return _DCT8.T @ block @ _DCT8


class _Huff:
    """Canonical Huffman table from a DHT segment's BITS/HUFFVAL."""

    __slots__ = ("lookup",)

    def __init__(self, bits: list[int], vals: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                if k >= len(vals):
                    raise ValueError("JPEG DHT values short")
                self.lookup[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with FF00 byte
    stuffing; stops at any non-stuffed marker (caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("JPEG entropy stream truncated")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                raise ValueError("JPEG entropy stream hit a marker mid-symbol")
        else:
            self.pos += 1
        # _fill only runs when n == 0, so the old accumulator bits are
        # dead — REPLACE rather than shift-or, or acc grows 8 bits per
        # consumed byte and every bit() shift copies an ever-larger
        # bigint (quadratic decode time in entropy-stream size)
        self.acc = b
        self.n = 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: _Huff) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def align_to_marker(self) -> None:
        """Drop partial bits and leave pos at the next marker byte."""
        self.acc = 0
        self.n = 0


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map a t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def jpeg_pixels(content: bytes) -> "np.ndarray":
    """JPEG bytes → (h, w, c) uint8 (c = 1 gray, 3 RGB). Baseline
    (SOF0) decodes in one scan pass; progressive (SOF2) accumulates
    DCT coefficients across its scans and reconstructs at EOI."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    frame = None
    prog_state = None  # per-component coefficient arrays (SOF2)
    restart_interval = 0
    n = len(content)
    while pos + 2 <= n:
        if content[pos] != 0xFF:
            raise ValueError(f"expected JPEG marker at byte {pos}")
        marker = content[pos + 1]
        pos += 2
        while marker == 0xFF and pos < n:  # FF fill bytes (spec B.1.1.2)
            marker = content[pos]
            pos += 1
        if marker == 0xD9:  # EOI
            if prog_state is not None:
                return _reconstruct_progressive(frame, prog_state, qt)
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if pos + 2 > n:
            raise ValueError("truncated JPEG segment header")
        (seg_len,) = struct.unpack_from(">H", content, pos)
        seg = content[pos + 2 : pos + seg_len]
        if len(seg) < seg_len - 2:
            raise ValueError("truncated JPEG segment")
        body_end = pos + seg_len
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq != 0:
                    raise ValueError("16-bit JPEG quant tables unsupported")
                if p + 64 > len(seg):
                    raise ValueError("JPEG DQT short")
                tbl = np.zeros((8, 8), dtype=np.int64)
                for i, (r, c) in enumerate(ZIGZAG):
                    tbl[r, c] = seg[p + i]
                qt[tq] = tbl
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                cnt = sum(bits)
                vals = seg[p + 17 : p + 17 + cnt]
                (huff_dc if tc == 0 else huff_ac)[th] = _Huff(bits, vals)
                p += 17 + cnt
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise ValueError(f"{prec}-bit JPEG unsupported")
            if nc not in (1, 3):
                raise ValueError(f"{nc}-component JPEG unsupported")
            comps = []
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i : 9 + 3 * i]
                hs, vs = samp >> 4, samp & 0x0F
                if hs not in (1, 2) or vs not in (1, 2):
                    raise ValueError(f"JPEG sampling factor {hs}x{vs} unsupported")
                comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps, "progressive": marker == 0xC2}
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG coding process (SOF marker 0xFF{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                ci, comp = next(
                    (
                        (j, c)
                        for j, c in enumerate(frame["comps"])
                        if c["id"] == cs
                    ),
                    (None, None),
                )
                if comp is None:
                    raise ValueError("JPEG scan references unknown component")
                scan.append((ci, comp, tabs >> 4, tabs & 0x0F))
            if frame.get("progressive"):
                if prog_state is None:
                    prog_state = _init_progressive(frame)
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                pos = _progressive_scan(
                    content, body_end, frame, scan, prog_state,
                    huff_dc, huff_ac, restart_interval,
                    ss, se, ahal >> 4, ahal & 0x0F,
                )
                continue
            if len(scan) != len(frame["comps"]):
                raise ValueError(
                    "JPEG non-interleaved sequential scan unsupported"
                )
            return _decode_scan(
                content, body_end, frame,
                [(c, tdc, tac) for _, c, tdc, tac in scan],
                qt, huff_dc, huff_ac, restart_interval,
            )
        # APPn / COM / others: skipped
        pos = body_end
    raise ValueError("JPEG has no scan data")


def _decode_scan(
    data, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval
) -> "np.ndarray":
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    planes = []
    for c in comps:
        if c["tq"] not in qt:
            raise ValueError("JPEG quant table missing")
        planes.append(
            np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        )
    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                reader.align_to_marker()
                p = reader.pos
                if p + 2 > len(data) or data[p] != 0xFF or not (
                    0xD0 <= data[p + 1] <= 0xD7
                ):
                    raise ValueError("JPEG missing expected restart marker")
                reader.pos = p + 2
                pred = [0] * len(comps)
            for ci, (comp, tdc, tac) in enumerate(scan):
                if tdc not in huff_dc or tac not in huff_ac:
                    raise ValueError("JPEG Huffman table missing")
                q = qt[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        block = np.zeros((8, 8), dtype=np.int64)
                        t = reader.huff(huff_dc[tdc])
                        diff = _extend(reader.bits(t), t)
                        pred[ci] += diff
                        block[0, 0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.huff(huff_ac[tac])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run past block end")
                            zr, zc = ZIGZAG[k]
                            block[zr, zc] = _extend(reader.bits(s), s)
                            k += 1
                        px = idct2((block * q).astype(np.float64)) + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_i += 1
    return _assemble(frame, planes, hmax, vmax)


def _mcu_geometry(frame) -> tuple[int, int, int, int]:
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, mcus_x, mcus_y


def _nonint_dims(frame, comp) -> tuple[int, int]:
    """(blocks_wide, blocks_high) of one component's OWN block grid —
    the traversal order of a non-interleaved scan (T.81 A.2.2: data
    unit raster over ceil(comp_size/8), NOT the padded MCU grid)."""
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    cw = -(-(frame["w"] * comp["h"]) // hmax)
    ch = -(-(frame["h"] * comp["v"]) // vmax)
    return -(-cw // 8), -(-ch // 8)


def _init_progressive(frame) -> dict:
    """Per-component DCT coefficient store, zigzag order, sized to the
    padded MCU grid (interleaved DC scans write the padding blocks)."""
    _, _, mcus_x, mcus_y = _mcu_geometry(frame)
    return {
        "coefs": [
            np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32)
            for c in frame["comps"]
        ]
    }


def _expect_rst(reader: _BitReader, data: bytes) -> None:
    reader.align_to_marker()
    p = reader.pos
    if p + 2 > len(data) or data[p] != 0xFF or not (0xD0 <= data[p + 1] <= 0xD7):
        raise ValueError("JPEG missing expected restart marker")
    reader.pos = p + 2


def _next_marker(data: bytes, pos: int) -> int:
    """Position of the next non-RST marker at/after ``pos`` (skips any
    trailing entropy bytes and stray RSTn)."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] == 0xFF and data[pos + 1] != 0x00:
            if 0xD0 <= data[pos + 1] <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    raise ValueError("JPEG truncated after scan data")


def _progressive_scan(
    data, pos, frame, scan, state, huff_dc, huff_ac, ri, ss, se, ah, al
) -> int:
    """Decode ONE progressive scan (T.81 annex G) into the coefficient
    store; returns the byte position of the next marker. ``ss``/``se``
    bound the spectral band; ``ah``/``al`` are the successive-
    approximation bit positions (ah == 0 -> first scan of the band)."""
    if ss == 0:
        if se != 0:
            raise ValueError("JPEG progressive DC scan must have Se=0")
    else:
        if len(scan) != 1:
            raise ValueError("JPEG progressive AC scan must be non-interleaved")
        if not (ss <= se <= 63):
            raise ValueError("JPEG progressive spectral band out of range")
    if ah not in (0, al + 1):
        raise ValueError("JPEG successive approximation Ah must be 0 or Al+1")
    reader = _BitReader(data, pos)
    coefs = state["coefs"]
    if ss == 0:
        _dc_prog_scan(reader, data, frame, scan, coefs, huff_dc, ri, ah, al)
    else:
        _ac_prog_scan(
            reader, data, frame, scan, coefs, huff_ac, ri, ss, se, ah, al
        )
    return _next_marker(data, reader.pos)


def _dc_prog_scan(reader, data, frame, scan, coefs, huff_dc, ri, ah, al) -> None:
    def dc_block(block, si, pred):
        if ah == 0:
            _ci, _comp, tdc, _ = scan[si]
            if tdc not in huff_dc:
                raise ValueError("JPEG Huffman table missing")
            t = reader.huff(huff_dc[tdc])
            pred[si] += _extend(reader.bits(t), t)
            block[0] = pred[si] << al
        elif reader.bit():  # refinement: one bit, no Huffman
            block[0] |= 1 << al

    if len(scan) > 1:  # interleaved MCU order over the frame grid
        _, _, mcus_x, mcus_y = _mcu_geometry(frame)
        pred = [0] * len(scan)
        mcu_i = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if ri and mcu_i and mcu_i % ri == 0:
                    _expect_rst(reader, data)
                    pred = [0] * len(scan)
                for si, (ci, comp, _, _) in enumerate(scan):
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            dc_block(
                                coefs[ci][my * comp["v"] + by, mx * comp["h"] + bx],
                                si,
                                pred,
                            )
                mcu_i += 1
    else:  # single component: raster over its own block grid
        ci, comp, _, _ = scan[0]
        bw, bh = _nonint_dims(frame, comp)
        pred = [0]
        blk_i = 0
        for row in range(bh):
            for col in range(bw):
                if ri and blk_i and blk_i % ri == 0:
                    _expect_rst(reader, data)
                    pred = [0]
                dc_block(coefs[ci][row, col], 0, pred)
                blk_i += 1


def _ac_prog_scan(
    reader, data, frame, scan, coefs, huff_ac, ri, ss, se, ah, al
) -> None:
    ci, comp, _, tac = scan[0]
    if tac not in huff_ac:
        raise ValueError("JPEG Huffman table missing")
    table = huff_ac[tac]
    bw, bh = _nonint_dims(frame, comp)
    eobrun = 0
    blk_i = 0
    for row in range(bh):
        for col in range(bw):
            if ri and blk_i and blk_i % ri == 0:
                _expect_rst(reader, data)
                eobrun = 0
            block = coefs[ci][row, col]
            if ah == 0:
                eobrun = _ac_first(reader, block, table, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine(reader, block, table, ss, se, al, eobrun)
            blk_i += 1


def _ac_first(reader, block, table, ss, se, al, eobrun) -> int:
    """First AC scan of a band: coefficients land shifted left by
    ``al``; EOBn codes start a run of all-zero bands (T.81 G.1.2.2).
    Returns the remaining EOB run (counting FUTURE blocks)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.huff(table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.bits(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("JPEG AC run past band end")
        block[k] = _extend(reader.bits(s), s) << al
        k += 1
    return 0


def _ac_refine(reader, block, table, ss, se, al, eobrun) -> int:
    """AC refinement scan (T.81 G.1.2.3): each already-nonzero
    coefficient in the band takes one correction bit; new coefficients
    arrive as ±(1<<al). The signed-representation bit test and the
    sign-directed append mirror the spec's decoder model."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.huff(table)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r  # includes THIS block's tail
                    if r:
                        eobrun += reader.bits(r)
                    break
            else:
                if s != 1:
                    raise ValueError("JPEG AC refinement magnitude must be 1")
                val = p1 if reader.bit() else m1
            # advance over r zero-history coefficients, emitting
            # correction bits for nonzero-history ones passed over
            while k <= se:
                if block[k] != 0:
                    if reader.bit() and (block[k] & p1) == 0:
                        block[k] += p1 if block[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                block[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if block[k] != 0:
                if reader.bit() and (block[k] & p1) == 0:
                    block[k] += p1 if block[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct_progressive(frame, state, qt) -> "np.ndarray":
    """Dequantize + IDCT the accumulated coefficient store (vectorized
    over all blocks of each component) and assemble/color-convert."""
    comps = frame["comps"]
    hmax, vmax, _, _ = _mcu_geometry(frame)
    zz_r = np.array([r for r, _ in ZIGZAG])
    zz_c = np.array([c for _, c in ZIGZAG])
    planes = []
    for ci, comp in enumerate(comps):
        if comp["tq"] not in qt:
            raise ValueError("JPEG quant table missing")
        q = qt[comp["tq"]]
        deq = state["coefs"][ci].astype(np.float64) * q[zz_r, zz_c]
        bh, bw = deq.shape[:2]
        blocks = np.zeros((bh, bw, 8, 8), dtype=np.float64)
        blocks[:, :, zz_r, zz_c] = deq
        px = np.einsum("ab,mnbc,cd->mnad", _DCT8.T, blocks, _DCT8) + 128.0
        planes.append(px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
    return _assemble(frame, planes, hmax, vmax)


def _assemble(frame, planes, hmax, vmax) -> "np.ndarray":
    """Upsample each component plane to full resolution (sample
    replication — the T.81 suggestion; real libs interpolate, both are
    in-spec) and color-convert. Shared by the baseline and progressive
    reconstruction paths."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    full = []
    for ci, comp in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // comp["v"], 0), hmax // comp["h"], 1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return out[:, :, None]
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)

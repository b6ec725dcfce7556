"""Baseline JPEG decode (llm/jpeg.py): fixtures built by an
INDEPENDENT forward encoder in this file (FDCT, quantize, zigzag,
canonical Huffman, byte stuffing, optional 4:2:0 subsampling and
restart markers) — never by the code under test. JPEG is lossy, so
roundtrips assert tight tolerances; flat fields decode exactly."""

import struct

import numpy as np
import pytest

from openmsistream_spark.llm.jpeg import ZIGZAG, jpeg_pixels

_D = None


def _dct():
    global _D
    if _D is None:
        k = np.arange(8)[:, None]
        i = np.arange(8)[None, :]
        m = np.cos(np.pi * k * (2 * i + 1) / 16.0)
        m[0] *= np.sqrt(1.0 / 8.0)
        m[1:] *= np.sqrt(2.0 / 8.0)
        _D = m
    return _D


def _fdct(block):  # forward of the decoder's idct2
    d = _dct()
    return d @ block @ d.T


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _mag_bits(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


class _Writer:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, value: int, count: int):
        for i in range(count - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                b = self.acc & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def pad(self):
        if self.n:
            self.bits((1 << (8 - self.n)) - 1, 8 - self.n)


def _huff_tables(symbol_sets):
    """One canonical all-8-bit-length table per symbol set: (DHT bits,
    vals, code map)."""
    tables = []
    for syms in symbol_sets:
        vals = sorted(syms)
        assert len(vals) <= 200
        bits = [0] * 16
        bits[7] = len(vals)  # all codes 8 bits long
        code = {s: (i, 8) for i, s in enumerate(vals)}
        tables.append((bits, vals, code))
    return tables


def _rgb_to_ycbcr(px):
    r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _blocks_and_symbols(plane, q):
    """plane (H, W) multiple of 8 -> list of quantized zigzag blocks."""
    H, W = plane.shape
    out = []
    for y0 in range(0, H, 8):
        for x0 in range(0, W, 8):
            coef = _fdct(plane[y0 : y0 + 8, x0 : x0 + 8] - 128.0)
            qz = np.round(coef / q).astype(np.int64)
            out.append(qz)
    return out


def _encode_block(w, qz, pred, dc_code, ac_code):
    dc = int(qz[0, 0])
    diff = dc - pred
    t = _category(diff)
    code, ln = dc_code[t]
    w.bits(code, ln)
    w.bits(_mag_bits(diff, t), t)
    zz = [int(qz[r, c]) for (r, c) in ZIGZAG[1:]]
    run = 0
    last_nz = max((i for i, v in enumerate(zz) if v), default=-1)
    for i, v in enumerate(zz):
        if i > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_code[0xF0]
            w.bits(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_code[(run << 4) | s]
        w.bits(code, ln)
        w.bits(_mag_bits(v, s), s)
        run = 0
    if last_nz < 62:  # EOB only when the final AC position is zero
        code, ln = ac_code[0x00]
        w.bits(code, ln)
    return dc


def _collect_symbols(comp_of_block):
    dc_syms = [set(), set()]
    ac_syms = [set(), set()]
    preds = {}
    for ci, qz in comp_of_block:
        t_id = 0 if ci == 0 else 1
        pred = preds.get(ci, 0)
        dc = int(qz[0, 0])
        dc_syms[t_id].add(_category(dc - pred))
        preds[ci] = dc
        zz = [int(qz[r, c]) for (r, c) in ZIGZAG[1:]]
        run = 0
        last_nz = max((i for i, v in enumerate(zz) if v), default=-1)
        for i, v in enumerate(zz):
            if i > last_nz:
                break
            if v == 0:
                run += 1
                continue
            while run > 15:
                ac_syms[t_id].add(0xF0)
                run -= 16
            ac_syms[t_id].add((run << 4) | _category(v))
            run = 0
        if last_nz < 62:
            ac_syms[t_id].add(0x00)
    for s in dc_syms:
        s.add(0)
    for s in ac_syms:
        s.add(0x00)
    return dc_syms, ac_syms


def _pad_to(plane, mult):
    H, W = plane.shape
    ph = (mult - H % mult) % mult
    pw = (mult - W % mult) % mult
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _jpeg(px, q_val=1, subsample=False, restart=0):
    """Encode (h, w, 3) RGB or (h, w) gray uint8 as baseline JFIF."""
    gray = px.ndim == 2
    h, w = px.shape[:2]
    q = np.full((8, 8), q_val, dtype=np.int64)
    if gray:
        planes = [_pad_to(px.astype(np.float64), 8)]
        samps = [(1, 1)]
    else:
        y, cb, cr = _rgb_to_ycbcr(px)
        if subsample:
            y = _pad_to(y, 16)
            cbp = _pad_to(cb, 16)
            crp = _pad_to(cr, 16)
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean((1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean((1, 3))
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            y, cb, cr = (_pad_to(p, 8) for p in (y, cb, cr))
            samps = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcus_x = planes[0].shape[1] // (8 * hmax) if not gray else planes[0].shape[1] // 8
    mcus_y = planes[0].shape[0] // (8 * vmax) if not gray else planes[0].shape[0] // 8
    if gray:
        mcus_x = planes[0].shape[1] // 8
        mcus_y = planes[0].shape[0] // 8

    # MCU-ordered block stream: (component_index, quantized zigzag block)
    stream = []
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (hs, vs) in enumerate(samps):
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        blk = planes[ci][y0 : y0 + 8, x0 : x0 + 8]
                        coef = _fdct(blk - 128.0)
                        stream.append((ci, np.round(coef / q).astype(np.int64)))

    dc_syms, ac_syms = _collect_symbols(stream)
    (dcb0, dcv0, dcc0), (dcb1, dcv1, dcc1) = _huff_tables(dc_syms)
    (acb0, acv0, acc0), (acb1, acv1, acc1) = _huff_tables(ac_syms)

    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(marker)
        out.extend(struct.pack(">H", len(body) + 2))
        out.extend(body)

    dqt = bytes([0]) + bytes(int(q[r, c]) for (r, c) in ZIGZAG)
    seg(b"\xff\xdb", dqt)
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for i in range(ncomp):
        hs, vs = samps[i]
        sof += bytes([i + 1, (hs << 4) | vs, 0])
    seg(b"\xff\xc0", sof)
    for tc_th, (bits, vals) in (
        ((0x00), (dcb0, dcv0)),
        ((0x01), (dcb1, dcv1)),
        ((0x10), (acb0, acv0)),
        ((0x11), (acb1, acv1)),
    ):
        seg(b"\xff\xc4", bytes([tc_th]) + bytes(bits) + bytes(vals))
    if restart:
        seg(b"\xff\xdd", struct.pack(">H", restart))
    sos = bytes([ncomp])
    for i in range(ncomp):
        t = 0 if i == 0 else 1
        sos += bytes([i + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    seg(b"\xff\xda", sos)

    wtr = _Writer()
    preds = [0] * ncomp
    blocks_per_mcu = sum(hs * vs for hs, vs in samps)
    mcu_count = 0
    rst = 0
    i = 0
    while i < len(stream):
        if restart and mcu_count and mcu_count % restart == 0:
            wtr.pad()
            out.extend(wtr.out)
            wtr = _Writer()
            out.extend(bytes([0xFF, 0xD0 + rst % 8]))
            rst += 1
            preds = [0] * ncomp
        for _ in range(blocks_per_mcu):
            ci, qz = stream[i]
            t = 0 if ci == 0 else 1
            preds[ci] = _encode_block(
                wtr, qz, preds[ci], (dcc0 if t == 0 else dcc1),
                (acc0 if t == 0 else acc1),
            )
            i += 1
        mcu_count += 1
    wtr.pad()
    out.extend(wtr.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


def test_jpeg_flat_field_exact():
    px = np.full((24, 16), 119, dtype=np.uint8)
    got = jpeg_pixels(_jpeg(px))
    assert got.shape == (24, 16, 1)
    assert (got[:, :, 0] == 119).all()


def test_jpeg_gray_gradient_tight():
    x = np.linspace(0, 255, 32)
    px = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    got = jpeg_pixels(_jpeg(px))[:, :, 0].astype(np.int64)
    assert np.abs(got - px.astype(np.int64)).max() <= 2


def test_jpeg_rgb_444_noise_roundtrip():
    rng = np.random.RandomState(0)
    px = rng.randint(0, 256, size=(16, 24, 3)).astype(np.uint8)
    got = jpeg_pixels(_jpeg(px)).astype(np.int64)
    # q=1: only FDCT-quantize rounding + color-space rounding remain
    assert got.shape == px.shape
    assert np.abs(got - px.astype(np.int64)).max() <= 8


def test_jpeg_420_subsampled_blockwise_chroma():
    # chroma constant per 2x2 so subsampling averages losslessly
    rng = np.random.RandomState(1)
    y = rng.randint(40, 216, size=(16, 16))
    tint = np.repeat(np.repeat(rng.randint(-20, 20, (8, 8)), 2, 0), 2, 1)
    px = np.stack(
        [np.clip(y + tint, 0, 255), np.clip(y, 0, 255),
         np.clip(y - tint, 0, 255)], axis=2
    ).astype(np.uint8)
    got = jpeg_pixels(_jpeg(px, subsample=True)).astype(np.int64)
    assert np.abs(got - px.astype(np.int64)).max() <= 10


def test_jpeg_nonmultiple_dimensions_cropped():
    rng = np.random.RandomState(2)
    px = rng.randint(0, 256, size=(11, 13)).astype(np.uint8)
    got = jpeg_pixels(_jpeg(px))
    assert got.shape == (11, 13, 1)
    assert np.abs(got[:, :, 0].astype(np.int64) - px.astype(np.int64)).max() <= 8


def test_jpeg_restart_markers():
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(8, 48)).astype(np.uint8)  # 6 MCUs
    got = jpeg_pixels(_jpeg(px, restart=2))
    assert np.abs(got[:, :, 0].astype(np.int64) - px.astype(np.int64)).max() <= 8


def test_jpeg_coarse_quant_still_decodes():
    x = np.linspace(0, 255, 64)
    px = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    got = jpeg_pixels(_jpeg(px, q_val=8))[:, :, 0].astype(np.int64)
    assert np.abs(got - px.astype(np.int64)).max() <= 16


def test_jpeg_rejects_unsupported():
    with pytest.raises(ValueError, match="not a JPEG"):
        jpeg_pixels(b"\x89PNG")
    good = _jpeg(np.full((8, 8), 100, dtype=np.uint8))
    # SOF1 (extended sequential) stays out of scope; SOF2 (progressive)
    # is supported since round 15 — see tests/test_jpeg_progressive.py
    ext = good.replace(b"\xff\xc0", b"\xff\xc1", 1)
    with pytest.raises(ValueError, match="unsupported JPEG coding process"):
        jpeg_pixels(ext)
    with pytest.raises(ValueError):
        jpeg_pixels(good[: len(good) // 2])


def test_jpeg_sniffed_and_fingerprinted(spark):
    """JPEG is a first-class perceptual-hash input: a smooth-gradient
    JPEG's dHash lands within a couple of bits of the source pixels'
    dHash (decode is float-tier, not bit-exact — documented)."""
    from openmsistream_spark.llm.multimodal import sniff_pixels
    from openmsistream_spark.llm.phash import dhash_int, gray_pixels, image_fingerprints

    x = np.linspace(10, 240, 18)
    ygrid = np.linspace(0, 30, 16)
    px = np.clip(np.add.outer(ygrid, x), 0, 255).astype(np.uint8)
    jpg = _jpeg(px)
    assert sniff_pixels(jpg) is not None
    df = spark.createDataFrame([(1, bytearray(jpg))], "media_id long, content binary")
    got = image_fingerprints(df).collect()[0].fingerprint
    want = dhash_int(gray_pixels(px[:, :, None]))
    assert bin((got ^ want) & ((1 << 64) - 1)).count("1") <= 4

"""Progressive JPEG decode (llm/jpeg.py, SOF2 / T.81 annex G):
fixtures built by an INDEPENDENT forward progressive encoder in this
file — spectral selection, successive approximation (DC+AC first and
refinement scans), EOB runs, refinement correction-bit buffering,
per-scan Huffman tables, optional restart intervals — never by the
code under test.

The strongest oracle here is exactness against the BASELINE path: a
progressive script refined all the way to Al=0 recovers the quantized
coefficients bit-for-bit, so its decode must be pixel-IDENTICAL to the
baseline encoding of the same blocks (and the baseline path is itself
verified against tests/test_jpeg.py's independent encoder).
"""

import struct

import numpy as np
import pytest

from openmsistream_spark.llm.jpeg import ZIGZAG, jpeg_pixels

from test_jpeg import (  # the baseline test encoder's shared machinery
    _Writer,
    _category,
    _fdct,
    _huff_tables,
    _jpeg,
    _mag_bits,
    _pad_to,
    _rgb_to_ycbcr,
)


def _shift(v: int, s: int) -> int:
    """Sign-magnitude point transform: sign(v) * (|v| >> s) — the T.81
    successive-approximation division (rounds toward zero)."""
    return (abs(v) >> s) * (1 if v >= 0 else -1)


def _comp_blocks(px, q_val, subsample):
    """Quantized zigzag-order coefficient grids, one padded-to-MCU grid
    per component; returns (grids, samps, h, w)."""
    gray = px.ndim == 2
    h, w = px.shape[:2]
    q = np.full((8, 8), float(q_val))
    if gray:
        planes = [px.astype(np.float64)]
        samps = [(1, 1)]
    else:
        y, cb, cr = _rgb_to_ycbcr(px)
        if subsample:
            y = _pad_to(y, 16)
            cbp, crp = _pad_to(cb, 16), _pad_to(cr, 16)
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean((1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean((1, 3))
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            samps = [(1, 1)] * 3
        planes = [y, cb, cr]
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    grids = []
    for ci, (hs, vs) in enumerate(samps):
        ph, pw = mcus_y * vs * 8, mcus_x * hs * 8
        p = planes[ci]
        p = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")
        grid = []
        for by in range(ph // 8):
            row = []
            for bx in range(pw // 8):
                coef = _fdct(p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0)
                qz = np.round(coef / q).astype(np.int64)
                row.append([int(qz[r, c]) for (r, c) in ZIGZAG])
            grid.append(row)
        grids.append(grid)
    return grids, samps, h, w


def _nonint_dims(h, w, samps, ci):
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    cw = -(-(w * samps[ci][0]) // hmax)
    ch = -(-(h * samps[ci][1]) // vmax)
    return -(-cw // 8), -(-ch // 8)


# ---- per-scan encoders, written against T.81 G.1.2 (not the decoder) ----


def _enc_dc_first_mcu(emit, put, grids, samps, h, w, al, restart, rst_cb):
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    preds = [0] * len(samps)
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_i and mcu_i % restart == 0:
                rst_cb()
                preds = [0] * len(samps)
            for ci, (hs, vs) in enumerate(samps):
                for by in range(vs):
                    for bx in range(hs):
                        dc = grids[ci][my * vs + by][mx * hs + bx][0]
                        # DC point transform is an ARITHMETIC shift in
                        # real encoders (not sign-magnitude like AC)
                        v = dc >> al
                        diff = v - preds[ci]
                        preds[ci] = v
                        t = _category(diff)
                        emit(ci, t)
                        if t:
                            put(_mag_bits(diff, t), t)
            mcu_i += 1


def _enc_dc_refine(put, grids, samps, h, w, al, restart, rst_cb):
    """One raw bit per block, MCU order (no Huffman)."""
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_i and mcu_i % restart == 0:
                rst_cb()
            for ci, (hs, vs) in enumerate(samps):
                for by in range(vs):
                    for bx in range(hs):
                        dc = grids[ci][my * vs + by][mx * hs + bx][0]
                        put((dc >> al) & 1, 1)
            mcu_i += 1


def _flush_eob_first(emit, put, state):
    n = state["eob"]
    if n:
        r = n.bit_length() - 1
        emit(r << 4)
        if r:
            put(n - (1 << r), r)
        state["eob"] = 0


def _enc_ac_first_block(emit, put, zz, ss, se, al, state):
    tnow = [_shift(v, al) for v in zz]
    last = max((k for k in range(ss, se + 1) if tnow[k]), default=None)
    if last is None:
        state["eob"] += 1
        if state["eob"] == 0x7FFF:
            _flush_eob_first(emit, put, state)
        return
    _flush_eob_first(emit, put, state)
    run = 0
    for k in range(ss, last + 1):
        v = tnow[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            emit(0xF0)
            run -= 16
        s = _category(v)
        emit((run << 4) | s)
        put(_mag_bits(v, s), s)
        run = 0
    if last < se:
        state["eob"] += 1
        if state["eob"] == 0x7FFF:
            _flush_eob_first(emit, put, state)


def _flush_eob_refine(emit, put, state):
    n = state["eob"]
    if n:
        r = n.bit_length() - 1
        emit(r << 4)
        if r:
            put(n - (1 << r), r)
        for b in state["bits"]:
            put(b, 1)
        state["eob"] = 0
        state["bits"] = []


def _enc_ac_refine_block(emit, put, zz, ss, se, ah, al, state):
    hist = [_shift(v, ah) != 0 for v in zz]
    tnow = [_shift(v, al) for v in zz]
    corr = lambda k: abs(tnow[k]) & 1  # noqa: E731
    news = [k for k in range(ss, se + 1) if not hist[k] and tnow[k] != 0]
    if not news:
        state["eob"] += 1
        state["bits"].extend(corr(k) for k in range(ss, se + 1) if hist[k])
        if state["eob"] == 0x7FFF:
            _flush_eob_refine(emit, put, state)
        return
    k = ss
    for nxt in news:
        nz = sum(1 for j in range(k, nxt) if not hist[j])
        while nz >= 16:
            _flush_eob_refine(emit, put, state)
            emit(0xF0)
            cnt = 0
            while cnt < 16:
                if hist[k]:
                    put(corr(k), 1)
                else:
                    cnt += 1
                k += 1
            nz -= 16
        _flush_eob_refine(emit, put, state)
        emit((nz << 4) | 1)
        put(1 if tnow[nxt] > 0 else 0, 1)
        while k < nxt:
            if hist[k]:
                put(corr(k), 1)
            k += 1
        k = nxt + 1
    if k <= se:  # tail joins (or starts) an EOB run
        state["eob"] += 1
        state["bits"].extend(corr(j) for j in range(k, se + 1) if hist[j])
        if state["eob"] == 0x7FFF:
            _flush_eob_refine(emit, put, state)


# ---- scan assembly (two passes: symbol collection, then emission) ----


def _run_ac_scan(emit, put, grid, bw, bh, ss, se, ah, al, restart, rst_cb):
    state = {"eob": 0, "bits": []}
    blk_i = 0
    for row in range(bh):
        for col in range(bw):
            if restart and blk_i and blk_i % restart == 0:
                if ah:
                    _flush_eob_refine(emit, put, state)
                else:
                    _flush_eob_first(emit, put, state)
                rst_cb()
                state = {"eob": 0, "bits": []}
            if ah:
                _enc_ac_refine_block(emit, put, grid[row][col], ss, se, ah, al, state)
            else:
                _enc_ac_first_block(emit, put, grid[row][col], ss, se, al, state)
            blk_i += 1
    if ah:
        _flush_eob_refine(emit, put, state)
    else:
        _flush_eob_first(emit, put, state)


def _jpeg_progressive(px, q_val=1, subsample=False, restart=0, script=None):
    """Encode (h, w[, 3]) uint8 as a progressive (SOF2) JFIF stream.

    ``script`` is a list of scan tuples:
      ("dc", ah, al)                 — all components, interleaved
      ("ac", ci, ss, se, ah, al)     — one component, non-interleaved
    Default: a full successive-approximation pyramid down to Al=0
    (exact coefficient recovery)."""
    grids, samps, h, w = _comp_blocks(px, q_val, subsample)
    nc = len(samps)
    if script is None:
        script = [("dc", 0, 1), ("ac", 0, 1, 5, 0, 2), ("ac", 0, 6, 63, 0, 2)]
        script += [("ac", ci, 1, 63, 0, 2) for ci in range(1, nc)]
        script += [("dc", 1, 0)]
        script += [("ac", ci, 1, 63, 2, 1) for ci in range(nc)]
        script += [("ac", ci, 1, 63, 1, 0) for ci in range(nc)]

    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(marker)
        out.extend(struct.pack(">H", len(body) + 2))
        out.extend(body)

    q = np.full((8, 8), int(q_val), dtype=np.int64)
    seg(b"\xff\xdb", bytes([0]) + bytes(int(q[r, c]) for (r, c) in ZIGZAG))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for i in range(nc):
        hs, vs = samps[i]
        sof += bytes([i + 1, (hs << 4) | vs, 0])
    seg(b"\xff\xc2", sof)
    if restart:
        seg(b"\xff\xdd", struct.pack(">H", restart))

    for entry in script:
        # pass 1: collect symbols per table id
        syms = {}
        if entry[0] == "dc":
            _, ah, al = entry
            if ah == 0:
                _enc_dc_first_mcu(
                    lambda ci, s: syms.setdefault(0 if ci == 0 else 1, set()).add(s),
                    lambda v, n: None,
                    grids, samps, h, w, al, restart, lambda: None,
                )
        else:
            _, ci, ss, se, ah, al = entry
            bw, bh = _nonint_dims(h, w, samps, ci)
            _run_ac_scan(
                lambda s: syms.setdefault(0, set()).add(s),
                lambda v, n: None,
                grids[ci], bw, bh, ss, se, ah, al, restart, lambda: None,
            )
        # DHT per table actually used this scan (refinement DC has none)
        tabs = {}
        for tid, ss_ in sorted(syms.items()):
            ss_ = ss_ or {0}
            (bits, vals, code) = _huff_tables([ss_])[0]
            tc = 0 if entry[0] == "dc" else 1
            seg(b"\xff\xc4", bytes([(tc << 4) | tid]) + bytes(bits) + bytes(vals))
            tabs[tid] = code

        # pass 2: emit
        wtr = _Writer()
        rst_n = [0]

        def rst_cb():
            wtr.pad()
            out_scan.extend(wtr.out)
            wtr.out = bytearray()
            out_scan.extend(bytes([0xFF, 0xD0 + rst_n[0] % 8]))
            rst_n[0] += 1

        out_scan = bytearray()
        if entry[0] == "dc":
            _, ah, al = entry
            sos = bytes([nc])
            for i in range(nc):
                tid = 0 if i == 0 else 1
                sos += bytes([i + 1, tid << 4])
            sos += bytes([0, 0, (ah << 4) | al])
            seg(b"\xff\xda", sos)
            if ah == 0:
                _enc_dc_first_mcu(
                    lambda ci, s: wtr.bits(*tabs[0 if ci == 0 else 1][s]),
                    wtr.bits,
                    grids, samps, h, w, al, restart, rst_cb,
                )
            else:
                _enc_dc_refine(wtr.bits, grids, samps, h, w, al, restart, rst_cb)
        else:
            _, ci, ss, se, ah, al = entry
            sos = bytes([1, ci + 1, 0x00])
            sos += bytes([ss, se, (ah << 4) | al])
            seg(b"\xff\xda", sos)
            bw, bh = _nonint_dims(h, w, samps, ci)
            _run_ac_scan(
                lambda s: wtr.bits(*tabs[0][s]),
                wtr.bits,
                grids[ci], bw, bh, ss, se, ah, al, restart, rst_cb,
            )
        wtr.pad()
        out_scan.extend(wtr.out)
        out.extend(out_scan)
    out.extend(b"\xff\xd9")
    return bytes(out)


# ---- tests ----


def test_progressive_equals_baseline_gray():
    """Full successive-approximation pyramid recovers the quantized
    coefficients exactly -> pixel-identical to the baseline encoding
    of the same image."""
    rng = np.random.RandomState(0)
    px = rng.randint(0, 256, size=(24, 16)).astype(np.uint8)
    assert (jpeg_pixels(_jpeg_progressive(px)) == jpeg_pixels(_jpeg(px))).all()


def test_progressive_equals_baseline_rgb_444():
    rng = np.random.RandomState(1)
    px = rng.randint(0, 256, size=(16, 24, 3)).astype(np.uint8)
    assert (jpeg_pixels(_jpeg_progressive(px)) == jpeg_pixels(_jpeg(px))).all()


def test_progressive_equals_baseline_rgb_420():
    """4:2:0: interleaved DC over the padded MCU grid + non-interleaved
    AC over each component's own (smaller) block grid."""
    rng = np.random.RandomState(2)
    px = rng.randint(0, 256, size=(24, 40, 3)).astype(np.uint8)
    got = jpeg_pixels(_jpeg_progressive(px, subsample=True))
    want = jpeg_pixels(_jpeg(px, subsample=True))
    assert (got == want).all()


def test_progressive_nonmultiple_dimensions():
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(11, 13)).astype(np.uint8)
    got = jpeg_pixels(_jpeg_progressive(px))
    assert got.shape == (11, 13, 1)
    assert (got == jpeg_pixels(_jpeg(px))).all()


def test_progressive_coarse_quant_and_many_eob_runs():
    """Coarse quantization zeroes most AC coefficients -> long EOB runs
    in both first and refinement scans."""
    x = np.linspace(0, 255, 64)
    px = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    got = jpeg_pixels(_jpeg_progressive(px, q_val=8))
    assert (got == jpeg_pixels(_jpeg(px, q_val=8))).all()


def test_progressive_restart_intervals():
    rng = np.random.RandomState(4)
    px = rng.randint(0, 256, size=(16, 48)).astype(np.uint8)
    got = jpeg_pixels(_jpeg_progressive(px, restart=2))
    assert (got == jpeg_pixels(_jpeg(px))).all()


def test_progressive_partial_script_is_lossy_but_decodes():
    """Stopping above Al=0 (a truncated-quality pyramid) still decodes;
    values approximate the full decode."""
    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, size=(16, 16)).astype(np.uint8)
    script = [("dc", 0, 1), ("ac", 0, 1, 63, 0, 1)]
    got = jpeg_pixels(_jpeg_progressive(px, script=script))
    assert got.shape == (16, 16, 1)
    full = jpeg_pixels(_jpeg(px)).astype(np.int64)
    # each coefficient is within 1<<1 of exact -> bounded pixel error
    assert np.abs(got.astype(np.int64) - full).mean() < 24


def test_progressive_spectral_only_script():
    """Spectral selection WITHOUT successive approximation (Al=0
    everywhere, bands split) is exact."""
    rng = np.random.RandomState(6)
    px = rng.randint(0, 256, size=(16, 16)).astype(np.uint8)
    script = [
        ("dc", 0, 0),
        ("ac", 0, 1, 2, 0, 0),
        ("ac", 0, 3, 20, 0, 0),
        ("ac", 0, 21, 63, 0, 0),
    ]
    got = jpeg_pixels(_jpeg_progressive(px, script=script))
    assert (got == jpeg_pixels(_jpeg(px))).all()


def test_progressive_rejects_malformed():
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(8, 8)).astype(np.uint8)
    good = _jpeg_progressive(px)
    with pytest.raises(ValueError):
        jpeg_pixels(good[: len(good) - 4])  # truncated: no EOI
    # a baseline-shaped scan header (Ss=0, Se=63) is invalid under SOF2
    bad = _jpeg(px).replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="Se=0"):
        jpeg_pixels(bad)


def test_progressive_through_spark_fingerprints(spark):
    """Format independence through the Arrow stage: a progressive and a
    baseline encoding of the same pixels land on (near-)identical
    dHash fingerprints."""
    from openmsistream_spark.llm.phash import image_fingerprints

    x = np.linspace(10, 240, 18)
    ygrid = np.linspace(0, 30, 16)
    px = np.clip(np.add.outer(ygrid, x), 0, 255).astype(np.uint8)
    base = _jpeg(px)
    prog = _jpeg_progressive(px)
    df = spark.createDataFrame(
        [(1, bytearray(base)), (2, bytearray(prog))],
        "media_id long, content binary",
    )
    got = {r.media_id: r.fingerprint for r in image_fingerprints(df).collect()}
    assert got[1] == got[2]  # same quantized pipeline -> identical pixels

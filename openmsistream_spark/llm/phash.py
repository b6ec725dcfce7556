"""Image perceptual hashing + Hamming-banded near-dup — the dedup
treatment for the multimodal axis (every text modality already has
one: exact / MinHash / SimHash / span / embedding).

Two public fingerprint algorithms, both 64-bit, both computed from REAL
decoded pixels (llm/multimodal.py's dependency-free decoders —
BMP/PPM/PGM/PNG/GIF/JPEG/VP8L-WebP, no codec libraries needed):

- **dHash** (difference hash, the gradient member of the average-hash
  family — public algorithm, Krawetz 2013 "Kind of Like That"):
  grayscale → 8x9 area-average grid → bit (r, c) compares horizontally
  adjacent cell means. This implementation is EXACT-INTEGER end to end:
  grayscale uses the integer Rec.601 luma (299R+587G+114B, rounded),
  grid cells are integral-image block sums, and the mean comparison is
  cross-multiplied (sum_l * area_r < sum_r * area_l) so no float ever
  enters — the DuckDB oracle reproduces every bit.
- **pHash** (DCT hash, same lineage): grayscale → 32x32 area-resize →
  2-D DCT-II → low-frequency 8x8 block → bit = coefficient > median of
  the 63 AC coefficients. Float DCT (numpy matmul) — property-tested
  (noise robustness, brightness invariance) rather than oracle-paired.

Near-dup pairs reuse the repo's Hamming banding device
(llm/dedup.py:simhash_band_pairs, the pigeonhole construction): split
the 64-bit fingerprint into ``bands`` equal ranges; two fingerprints
within hamming < bands agree exactly on at least one band, so an
equi-join on (band, band_val) generates every such pair — never
all-pairs. Candidates verify exactly with bit_count(a ^ b).

Scale shape: one Arrow ``mapInPandas`` decode+hash stage (the only
Python — same batch shape as multimodal.decode_features), then the
fingerprint table is 16 bytes/image and everything downstream (banding
explode, equi-join, bit_count) is JVM codegen. The reference engine has
no image path (lab files only — nothing to cite there); this derives
from the public perceptual-hash literature per the driver's brief
("multimodal columns" as first-class).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .multimodal import sniff_pixels

FINGERPRINT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("fingerprint", T.LongType()),
    ]
)

#: dHash grid: 8 rows x 9 cols -> 8x8 = 64 horizontal comparisons.
_DH_ROWS, _DH_COLS = 8, 9


def gray_pixels(px: "np.ndarray") -> "np.ndarray":
    """(h, w, c) uint8 → (h, w) int64 grayscale. Single-channel passes
    through; RGB(A) uses integer Rec.601 luma, half-up rounded —
    (299R + 587G + 114B + 500) // 1000 — so the result is exact and
    engine-independent (no float weights)."""
    p = px.astype(np.int64)
    if p.shape[2] == 1:
        return p[:, :, 0]
    r, g, b = p[:, :, 0], p[:, :, 1], p[:, :, 2]
    return (299 * r + 587 * g + 114 * b + 500) // 1000


def _block_sums(gray: "np.ndarray", gh: int, gw: int):
    """Exact integer area pooling: partition the (h, w) grayscale into a
    gh x gw grid at boundaries floor(i*h/gh) / floor(j*w/gw) and return
    (block pixel sums, block areas), both int64 — the integral-image
    form, O(h*w) regardless of grid size."""
    h, w = gray.shape
    if h < gh or w < gw:
        raise ValueError(f"image {h}x{w} smaller than the {gh}x{gw} hash grid")
    s = np.zeros((h + 1, w + 1), dtype=np.int64)
    s[1:, 1:] = gray.cumsum(axis=0).cumsum(axis=1)
    rb = (np.arange(gh + 1) * h) // gh
    cb = (np.arange(gw + 1) * w) // gw
    corners = s[np.ix_(rb, cb)]
    sums = (
        corners[1:, 1:] - corners[:-1, 1:] - corners[1:, :-1] + corners[:-1, :-1]
    )
    areas = np.outer(np.diff(rb), np.diff(cb)).astype(np.int64)
    return sums, areas


def _to_signed64(fp: int) -> int:
    """Two's-complement fold of a 64-bit unsigned fingerprint into the
    signed BIGINT both Spark and parquet carry (DuckDB mirror:
    CASE WHEN u >= 2^63 THEN u - 2^64 ELSE u END)."""
    return fp - (1 << 64) if fp >= (1 << 63) else fp


def dhash_int(gray: "np.ndarray") -> int:
    """64-bit dHash of an integer grayscale array, as signed int.

    Bit k = r*8 + c (r in 0..7, c in 0..7) is set iff the 8x9 grid
    cell (r, c)'s mean is LESS THAN cell (r, c+1)'s — compared as
    cross-multiplied integer block sums (sum_l * area_r < sum_r *
    area_l), exact for any image size: values <= 255 * h * w * area
    stay far below 2^63 for any image this decoder family produces."""
    sums, areas = _block_sums(gray, _DH_ROWS, _DH_COLS)
    left_s, right_s = sums[:, :-1], sums[:, 1:]
    left_a, right_a = areas[:, :-1], areas[:, 1:]
    bits = (left_s * right_a) < (right_s * left_a)  # (8, 8) bool
    fp = 0
    for k in np.nonzero(bits.reshape(-1))[0]:
        fp |= 1 << int(k)
    return _to_signed64(fp)


#: pHash intermediate resize (standard parameterization).
_PH_SIZE = 32


def _dct_matrix(n: int) -> "np.ndarray":
    """Orthonormal DCT-II basis (the scipy.fft.dct(norm='ortho')
    matrix), built from first principles — no scipy in this container."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * k * (2 * i + 1) / (2 * n))
    m[0] *= np.sqrt(1.0 / n)
    m[1:] *= np.sqrt(2.0 / n)
    return m


_DCT32 = _dct_matrix(_PH_SIZE)


def phash_int(gray: "np.ndarray") -> int:
    """64-bit DCT pHash of an integer grayscale array, as signed int:
    area-resize to 32x32 (exact block means, then float), 2-D DCT-II,
    keep the low-frequency 8x8 corner, bit k set iff coefficient k
    exceeds the MEDIAN of the 63 AC coefficients (DC participates in
    the bits but not the median — the standard brightness-invariance
    construction)."""
    sums, areas = _block_sums(gray, _PH_SIZE, _PH_SIZE)
    small = sums / areas  # float block means
    coefs = (_DCT32 @ small @ _DCT32.T)[:8, :8].reshape(-1)
    med = float(np.median(coefs[1:]))
    fp = 0
    for k in np.nonzero(coefs > med)[0]:
        fp |= 1 << int(k)
    return _to_signed64(fp)


def image_fingerprints(
    media: DataFrame,
    algo: str = "dhash",
    strict: bool = True,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Perceptual fingerprints for an image media frame → (media_id,
    fingerprint BIGINT), one Arrow ``mapInPandas`` stage (decode + hash
    per batch — the multimodal.decode_features shape).

    ``strict=True`` (default — stricter than decode_features, on
    purpose) raises on bytes the dependency-free decoders can't parse:
    a hash-derived FAKE fingerprint would manufacture false
    near-dup/non-dup verdicts, which is worse than failing.
    ``strict=False`` instead SKIPS undecodable rows (emits nothing for
    them) — the mixed-corpus mode where non-image blobs share the
    column. There is deliberately no fake fallback here.
    """
    if algo not in ("dhash", "phash"):
        raise ValueError(f"unknown perceptual hash algo {algo!r}")
    hash_fn = dhash_int if algo == "dhash" else phash_int

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for row in pdf.itertuples(index=False):
                content = bytes(row.content) if row.content is not None else b""
                dec = sniff_pixels(content)
                if dec is None:
                    if strict:
                        raise ValueError(
                            "image_fingerprints: undecodable media bytes "
                            f"for media_id={row.media_id} (built-ins "
                            "cover BMP/PPM/PGM/PNG/GIF/JPEG/VP8L-WebP; "
                            "register a pixel decoder or pass "
                            "strict=False to skip non-image rows)"
                        )
                    continue
                fps.append(hash_fn(gray_pixels(dec(content))))
                ids.append(row.media_id)
            yield pd.DataFrame({"media_id": ids, "fingerprint": fps})

    return media.select(
        F.col(id_col).alias("media_id"), F.col(content_col).alias("content")
    ).mapInPandas(_run, FINGERPRINT_SCHEMA)


def hamming_band_pairs(
    fps: DataFrame,
    bits: int = 64,
    bands: int = 8,
    max_hamming: int = 7,
    id_col: str = "media_id",
    fp_col: str = "fingerprint",
    persist_fingerprints: bool = True,
) -> DataFrame:
    """Near-dup pairs over a fingerprint column via banded candidate
    generation — the generic-fingerprint twin of
    ``dedup.simhash_band_pairs`` (same pigeonhole device, same skew
    notes; that one derives its fingerprint from text, this one takes
    any precomputed ``bits``-bit BIGINT).

    Keep ``max_hamming < bands`` for a guaranteed-complete sweep (two
    fingerprints within hamming < bands agree on >= 1 band). Returns
    (id_a, id_b, hamming) with id_a < id_b, one row per pair. All
    JVM-side: shiftrightunsigned + mask banding, equi-join, one
    bit_count verify; per-pair band multiplicity collapses in the same
    groupBy that carries the hamming value.
    """
    if bits % bands != 0:
        raise ValueError(f"bits={bits} not divisible by bands={bands}")
    width = bits // bands
    mask = (1 << width) - 1
    fp = fps.select(F.col(id_col).alias("_id"), F.col(fp_col).alias("_fp"))
    if persist_fingerprints:
        # both self-join branches hang off the fingerprint table and
        # exchange reuse does not bridge them (the simhash_band_pairs
        # finding) — 16 bytes/image, caller may unpersist
        from pyspark import StorageLevel

        fp = fp.persist(StorageLevel.MEMORY_AND_DISK)
    banded = fp.select(
        "_id",
        "_fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        # logical shift: the sign bit must not smear
                        # into high bands (mask kills it for low ones)
                        F.shiftrightunsigned("_fp", b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_val"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_bk"),
    ).select("_id", "_fp", "_bk.band", "_bk.band_val")
    a = banded.select(
        F.col("_id").alias("id_a"), F.col("_fp").alias("fp_a"), "band", "band_val"
    )
    b = banded.select(
        F.col("_id").alias("id_b"), F.col("_fp").alias("fp_b"), "band", "band_val"
    )
    return (
        a.join(b, ["band", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.min(F.expr("bit_count(fp_a ^ fp_b)")).cast("bigint").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def _combo_params(bits: int, blocks: int, max_hamming: int):
    """Validate the combination-blocking parameterization and return
    (width, mask, combos) — called BEFORE any frame is touched so bad
    params fail fast regardless of input."""
    untouched = blocks - max_hamming
    if untouched < 1:
        raise ValueError(
            f"max_hamming={max_hamming} needs more than {blocks} blocks "
            "(at least one block must be guaranteed untouched)"
        )
    if bits % blocks != 0:
        raise ValueError(f"bits={bits} not divisible by blocks={blocks}")
    width = bits // blocks
    if untouched * width > 62:
        raise ValueError(
            f"combination key of {untouched}x{width} bits exceeds BIGINT"
        )
    from itertools import combinations

    return width, (1 << width) - 1, list(combinations(range(blocks), untouched))


def _combo_keyed(
    fp: DataFrame, bits: int, blocks: int, max_hamming: int
) -> DataFrame:
    """(_id, _fp) → exploded (_id, _fp, combo, combo_key): one row per
    C(blocks, blocks-max_hamming) block combination, the selected block
    values packed into one BIGINT key. Shared by the self-join pair
    sweep and the cross-run ledger probe."""
    width, mask, combos = _combo_params(bits, blocks, max_hamming)

    def _key(combo) -> "F.Column":
        key = F.lit(0).cast("bigint")
        for j, b in enumerate(combo):
            block = F.shiftrightunsigned("_fp", b * width).bitwiseAND(F.lit(mask))
            key = key.bitwiseOR(F.shiftleft(block, j * width))
        return key

    return fp.select(
        "_id",
        "_fp",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(ci).alias("combo"), _key(c).alias("combo_key"))
                    for ci, c in enumerate(combos)
                ]
            )
        ).alias("_ck"),
    ).select("_id", "_fp", "_ck.combo", "_ck.combo_key")


def hamming_combo_pairs(
    fps: DataFrame,
    bits: int = 64,
    blocks: int = 8,
    max_hamming: int = 3,
    id_col: str = "media_id",
    fp_col: str = "fingerprint",
    persist_fingerprints: bool = True,
) -> DataFrame:
    """Near-dup pairs via COMBINATION blocking — the construction that
    survives 100 TB (Manku, Jain & Das Sarma 2007, "Detecting
    Near-Duplicates for Web Crawling", the simhash dedup run at 8B
    pages). Pigeonhole: a pair within ``max_hamming`` leaves at least
    ``blocks - max_hamming`` of the ``blocks`` bit-blocks untouched, so
    joining on every C(blocks, blocks-max_hamming) combination of
    block values finds EVERY such pair — like ``hamming_band_pairs``,
    but the join key is the CONCATENATION of several blocks.

    Why it matters at scale: simple banding's key width is
    bits/bands < bits/max_hamming — at max_hamming=7 that is 8 bits =
    256 buckets, so candidates grow ~n^2/256 and the join melts around
    10^5 items (measured: STRESS_MEDIAFP). Combination keys are
    (blocks-max_hamming) x width bits wide — 40 bits at the default
    (8 equal 8-bit blocks, h=3) — so buckets stay near-singleton into
    the billions; the price is C(blocks, untouched) explode rows per
    item (56 at 8/3) and a LOWER hamming budget. Manku's paper splits
    64 bits into UNEQUAL blocks (their worked example uses 6); this
    implementation requires bits % blocks == 0, so the 64-bit default
    is blocks=8 — same pigeonhole, same near-singleton buckets. The
    published trade: crawl-scale near-dup runs at h<=3; wide budgets
    (h=7) are a small-corpus / verification device.

    Returns (id_a, id_b, hamming) like hamming_band_pairs; the
    candidate keys pack the selected block values into one BIGINT
    (selected widths always sum to < 63 bits here), all JVM codegen.
    """
    _combo_params(bits, blocks, max_hamming)  # fail fast on bad params
    fp = fps.select(F.col(id_col).alias("_id"), F.col(fp_col).alias("_fp"))
    if persist_fingerprints:
        from pyspark import StorageLevel

        fp = fp.persist(StorageLevel.MEMORY_AND_DISK)
    keyed = _combo_keyed(fp, bits, blocks, max_hamming)
    a = keyed.select(
        F.col("_id").alias("id_a"), F.col("_fp").alias("fp_a"), "combo", "combo_key"
    )
    b = keyed.select(
        F.col("_id").alias("id_b"), F.col("_fp").alias("fp_b"), "combo", "combo_key"
    )
    return (
        a.join(b, ["combo", "combo_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.min(F.expr("bit_count(fp_a ^ fp_b)")).cast("bigint").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


#: ledger size (bytes on disk, cheap driver-side listing — no job) past
#: which ``sidecar="auto"`` switches the probe from the exact
#: O(ledger) explode+join to the bloom-gated write-time index. Below
#: it the exact probe is CHEAPER: the sidecar's per-batch constant
#: (meta read/write, 2 bloom builds, index append ≈ 6 extra jobs) buys
#: nothing while the whole ledger fits a few shuffle partitions —
#: measured in STRESS_MEDIA_LEDGER (exact probe wall grows ~+7 s per
#: 190k rows; the gated path is flat but pays its constant at every
#: size). ~4 MiB of ledger parquet ≈ 10^5 fingerprint rows, the
#: measured crossover region; past it the gate wins at every size and
#: the one-time repair that builds the index is a single old-style
#: probe's worth of work (amortized O(1)/row).
SIDECAR_AUTO_MIN_BYTES = 4 << 20


def incremental_fingerprint_neardup(
    fps: DataFrame,
    registry,
    bits: int = 64,
    blocks: int = 8,
    max_hamming: int = 3,
    id_col: str = "media_id",
    fp_col: str = "fingerprint",
    run_id: str | None = None,
    sidecar: bool | str = "auto",
    sidecar_opts: dict | None = None,
) -> DataFrame:
    """Cross-run perceptual near-dup against a durable fingerprint
    ledger — the media twin of ``dedup.incremental_exact_dedup`` /
    the sign-LSH embedding ledger: each ingest run admits only media
    whose fingerprint is not within ``max_hamming`` of ANY prior run's
    admitted fingerprint (nor of a smaller-id admit in the same batch),
    then records the new fingerprints. Works for any modality's 64-bit
    (or ``bits``-bit) fingerprint column carrying ONE ROW PER media_id:
    image dHash, audio envelope, or a per-video representative frame.
    Raw ``video_frame_fingerprints`` output (multiple frames per
    media_id) must be reduced to one row first — the media_id-keyed
    ledger upsert would otherwise keep an arbitrary frame, and the
    within-batch sweep would pair unaligned frames.

    The ledger holds (media_id, fingerprint, run_id) — 24 bytes/item,
    never content. Both the ledger probe and the within-batch sweep use
    Manku combination keys (``_combo_keyed``), so the probe is an
    equi-join on near-singleton buckets at any ledger size — the
    crawl-scale shape, with the h <= blocks-1 budget bound.

    A media_id must not be re-ingested with DIFFERENT content across
    runs: the ledger upsert is keyed on media_id, and re-tagging an
    existing row's run_id would shrink the earlier run's replayed set.
    The upsert therefore REFUSES (ValueError) when an admitted id
    already exists in the ledger under another run — unchanged content
    is naturally blocked by the hamming-0 probe, so the refusal only
    fires on genuine content churn, which needs a new media_id.

    Within-batch rule: an item matching a SMALLER id in the batch is
    dropped (greedy keep-first, deterministic; not a transitive-closure
    clustering — a~b and b~c drops both b and c even if a!~c, the
    conservative choice for an admission gate).

    Recovery/replay: the ledger upsert is the only materialization.
    Re-running with the SAME ``run_id`` short-circuits — if the ledger
    already holds rows tagged ``run_id``, they ARE the committed
    decision and are returned verbatim (exactly-once replay, even for
    non-transitive Hamming chains where recomputing against the
    post-upsert ledger would diverge: with a~b, b~c, a!~c the first
    run's greedy sweep drops both b and c, but a post-upsert recompute
    would re-admit c since only a is in the ledger). A crash BEFORE the
    upsert leaves no run_id rows, so the replay recomputes from the
    identical pre-batch ledger state — deterministic, hence the same
    set; a crash after the (atomic) upsert returns the committed rows.
    A FRESH uuid per call re-admits nothing that is within budget of an
    ADMITTED item; an item the original run dropped only via a chain
    through another dropped item (the b~c case) is not near any
    admitted item and IS re-admitted — the honest near-dup analogue of
    incremental_exact_dedup's "admits nothing on replay" (which holds
    exactly there because exact equality is transitive).

    ``sidecar=True`` maintains a bloom sidecar plus a write-time combo
    index next to the ledger
    (``<path>.probeidx`` — see ``phash_index``), making the common
    per-batch probe O(batch) instead of O(ledger): the ledger is never
    re-exploded at probe time; bloom-negative keys skip the index
    entirely and bloom-positive keys are verified EXACTLY against the
    write-time index (membership is never decided by the bloom alone).
    A lost/stale/pre-existing-ledger sidecar triggers one exact
    O(ledger) repair, then probes are gated again. Semantics —
    admitted sets, replay identity, the churn refusal — are identical
    to ``sidecar=False`` (the original exact probe, kept as the
    fallback path). ``sidecar_opts`` forwards sizing/policy knobs to
    ``FingerprintProbeSidecar`` (``combo_m_bits``, ``k``,
    ``max_pushdown_keys``, ``resize="auto"|"manual"``, ``max_m_bits``,
    …): pre-size ``combo_m_bits`` for the expected ledger scale and/or
    set ``resize="manual"`` + schedule
    ``FingerprintProbeSidecar.rebuild_now()`` off the ingest path to
    keep the amortized mask-rebuild pause out of ``foreachBatch``
    (SCALING.md recipe).

    ``sidecar="auto"`` (default) picks by ledger size: the exact probe
    while the ledger is below ``SIDECAR_AUTO_MIN_BYTES`` on disk (its
    whole-ledger explode is cheaper than the sidecar's per-batch
    constant there), the gated path past it — and always the gated
    path once a sidecar exists (keeping an existing index current is
    cheaper than abandoning it). The switchover builds the index via
    the normal repair path: one exact probe's worth of work, once.
    Both paths produce identical admitted sets, so "auto" is a pure
    cost policy (guide §2: scale-adaptive, not tuned to either end).
    """
    import uuid

    run_id = run_id if run_id is not None else uuid.uuid4().hex
    batch = fps.select(F.col(id_col).alias("_id"), F.col(fp_col).alias("_fp"))
    if sidecar == "auto":
        from ..operators.registry import HadoopFS

        fs = HadoopFS(batch.sparkSession, registry.path)
        base = registry.path.rstrip("/") + ".probeidx"
        sidecar = fs.exists(f"{base}/meta") or (
            registry.exists()
            and fs.size_bytes(registry.path) >= SIDECAR_AUTO_MIN_BYTES
        )
    if sidecar:
        return _incremental_neardup_gated(
            batch, registry, bits, blocks, max_hamming, run_id, sidecar_opts or {}
        )

    from pyspark import StorageLevel

    seen = registry.read()
    if seen is not None:
        # a compact ledger reads as FEW partitions (a one-file delta
        # segment is one), which would serialize the 56x combo explode
        # of the probe onto one core — measured 20.7 s single-partition
        # vs 5.3 s at session parallelism on a 190k-row ledger. The
        # repartition shuffle moves only 24-byte rows, orders of
        # magnitude cheaper than the serial explode it prevents.
        par = seen.sparkSession.sparkContext.defaultParallelism
        if seen.rdd.getNumPartitions() < par:
            seen = seen.repartition(par)
        # the ledger frame feeds THREE actions per batch (short-circuit
        # check, combo probe, collision-guard probe) — persist so the
        # backend's read plan (a multi-segment union/fold on the log
        # backend, a scan on parquet) executes once, not three times;
        # ledger rows are 24 bytes each, so this spills gracefully
        seen = seen.persist(StorageLevel.MEMORY_AND_DISK)
        # same-run_id short-circuit: committed decisions are the result
        mine = seen.filter(F.col("run_id") == run_id)
        if mine.limit(1).count() > 0:
            seen.unpersist()
            return (
                registry.read()
                .filter(F.col("run_id") == run_id)
                .select("media_id", "fingerprint")
            )

    # the batch fingerprints feed the probe, the self-join (both sides)
    # and the admitted anti-join — without a persist the upstream Arrow
    # decode+hash stage would re-execute in each branch
    pinned = batch.persist(StorageLevel.MEMORY_AND_DISK)
    batch = pinned
    # pin the batch's 56× combo explode too: the ledger probe and BOTH
    # sides of the within-batch sweep consume it — re-deriving it from
    # the post-anti-join survivors (the previous shape) re-ran the
    # explode + key packing once per consumer (guide §1.2 per-task
    # work; an anti-join of the already-exploded rows on _id yields
    # the identical rowset, explode is per-row deterministic)
    keyed_full = _combo_keyed(batch, bits, blocks, max_hamming).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    keyed = keyed_full

    # vs-ledger probe: any prior fingerprint within budget blocks the id
    if seen is not None:
        seen_keyed = _combo_keyed(
            seen.select(
                F.col("media_id").alias("_id"), F.col("fingerprint").alias("_fp")
            ),
            bits,
            blocks,
            max_hamming,
        ).select(
            "combo", "combo_key", F.col("_fp").alias("_ledger_fp")
        )
        # merge hint on the LEDGER explode: its true size is unbounded
        # (56× ledger rows) but Catalyst's Generate stats under-estimate
        # it, so size-based planning can pick it as a broadcast side —
        # reproduced at a 1.3M-row ledger (8.9 GiB built relation vs
        # the 8 GiB cap) once the batch explode gained accurate cached
        # stats. Guide §3.1: never broadcast the side that grows without
        # bound; the shuffle this forces moves 40-byte key rows.
        blocked = (
            keyed_full.join(seen_keyed.hint("merge"), ["combo", "combo_key"])
            .filter(F.expr("bit_count(_fp ^ _ledger_fp)") <= max_hamming)
            .select("_id")
            .distinct()
        )
        batch = batch.join(blocked, "_id", "left_anti")
        keyed = keyed_full.join(blocked, "_id", "left_anti")

    # within-batch keep-first: drop ids matching a smaller surviving id
    a = keyed.select(
        F.col("_id").alias("id_a"), F.col("_fp").alias("fp_a"), "combo", "combo_key"
    )
    b = keyed.select(
        F.col("_id").alias("id_b"), F.col("_fp").alias("fp_b"), "combo", "combo_key"
    )
    dup_ids = (
        a.join(b, ["combo", "combo_key"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.expr("bit_count(fp_a ^ fp_b)") <= max_hamming)
        )
        .select(F.col("id_b").alias("_id"))
        .distinct()
    )
    admitted = batch.join(dup_ids, "_id", "left_anti")
    # the collision guard below and the upsert both consume `admitted`
    # (two actions): persist so the probe + within-batch sweep joins
    # execute once — the pinned decode output alone doesn't cover the
    # join work
    admitted = admitted.persist(StorageLevel.MEMORY_AND_DISK)

    try:
        if seen is not None:
            # media_id collision guard: the upsert is keyed on media_id,
            # so re-ingesting an already-ledgered media_id with DIFFERENT
            # content would silently re-tag that row's run_id — an
            # earlier run's "returned verbatim" replay would then yield
            # fewer rows than it committed, breaking exactly-once.
            # (Unchanged content never reaches here: its fingerprint is
            # hamming-0 from its own ledger row, so the probe blocks it;
            # and same-run_id rows short-circuited above.) Two tiers so
            # the common case stays cheap: a key-only equi-join first
            # (pinned batch vs 16-byte ledger rows — no combo explode,
            # no sweep); only a batch that actually shares media_ids
            # with the ledger pays the precise admitted-side check.
            # gate on the PINNED pre-probe batch: evaluating the
            # post-anti-join `batch` would run the combo probe chain,
            # which is exactly the cost the gate exists to avoid
            seen_ids = seen.select(F.col("media_id").alias("_id"))
            if pinned.join(seen_ids, "_id", "left_semi").limit(1).count() > 0:
                hit = admitted.join(seen_ids, "_id", "left_semi").limit(1).collect()
                if hit:
                    raise ValueError(
                        "incremental_fingerprint_neardup: media_id "
                        f"{hit[0]._id} is already in the ledger from a "
                        "prior run with a different fingerprint; "
                        "upserting would re-tag that row's run_id and "
                        "break the prior run's exactly-once replay — "
                        "ingest changed content under a NEW media_id "
                        "(or rebuild the ledger)"
                    )
        registry.upsert(
            admitted.select(
                F.col("_id").alias("media_id"),
                F.col("_fp").alias("fingerprint"),
                F.lit(run_id).alias("run_id"),
            )
        )
    finally:
        pinned.unpersist()
        keyed_full.unpersist()
        admitted.unpersist()
        if seen is not None:
            seen.unpersist()
    # re-derive from the committed ledger (durable; replay-identical)
    return (
        registry.read()
        .filter(F.col("run_id") == run_id)
        .select("media_id", "fingerprint")
    )


def _incremental_neardup_gated(
    batch: DataFrame,
    registry,
    bits: int,
    blocks: int,
    max_hamming: int,
    run_id: str,
    opts: dict,
) -> DataFrame:
    """The sidecar-gated probe path of
    ``incremental_fingerprint_neardup`` — same admitted sets, O(batch)
    common cost. Per micro-batch:

    1. replay short-circuit: ledger rows tagged ``run_id`` ARE the
       committed decision (a pushed run_id-column scan — the only
       whole-ledger touch on the common path, and it reads one column);
    2. coverage check: sidecar row count vs ledger row count (a
       footer-only count); mismatch (crash window, lost sidecar,
       pre-sidecar ledger, out-of-band append) triggers an exact
       repair of exactly the uncovered rows;
    3. gated probe: batch combo keys marked against the broadcast
       bloom; negatives skip; positives verified exactly against the
       write-time combo index (pushed IN filter on sorted segments);
    4. within-batch keep-first sweep (unchanged from the exact path);
    5. collision guard, gated by the media_id bloom (a no-overlap
       batch pays one row-local mark pass, no ledger join);
    6. commit: ledger upsert FIRST (the commit point), then the
       sidecar records the batch (index append + mask OR + meta swap).
       A crash between 6a and 6b is healed by step 2 next call.
    """
    from pyspark import StorageLevel

    from .phash_index import FingerprintProbeSidecar

    spark = batch.sparkSession
    ledger = registry.read()
    if ledger is not None:
        if ledger.filter(F.col("run_id") == run_id).limit(1).count() > 0:
            return (
                registry.read()
                .filter(F.col("run_id") == run_id)
                .select("media_id", "fingerprint")
            )
    sc_state = FingerprintProbeSidecar(
        spark, registry.path, bits, blocks, max_hamming, **opts
    )
    sc_state.load_or_init()
    ledger_count = ledger.count() if ledger is not None else 0
    if sc_state.n_items != ledger_count:
        sc_state.repair(ledger, ledger_count)

    pinned = batch.persist(StorageLevel.MEMORY_AND_DISK)
    # pin the batch's 56× combo explode: the gated probe's mark pass,
    # BOTH sides of the within-batch sweep, and the sidecar's index
    # append all consume the same rows — the previous shape re-ran the
    # explode + key packing from the survivors once per consumer
    # (guide §1.2; the anti-joins below on _id yield rowsets identical
    # to re-exploding the surviving rows)
    keyed_full = _combo_keyed(pinned, bits, blocks, max_hamming).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    keyed = keyed_full
    surv = pinned
    if ledger_count:
        blocked = sc_state.blocked_ids(keyed_full)
        surv = pinned.join(blocked, "_id", "left_anti")
        keyed = keyed_full.join(blocked, "_id", "left_anti")

    # within-batch keep-first: drop ids matching a smaller surviving id
    a = keyed.select(
        F.col("_id").alias("id_a"), F.col("_fp").alias("fp_a"), "combo", "combo_key"
    )
    b = keyed.select(
        F.col("_id").alias("id_b"), F.col("_fp").alias("fp_b"), "combo", "combo_key"
    )
    dup_ids = (
        a.join(b, ["combo", "combo_key"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.expr("bit_count(fp_a ^ fp_b)") <= max_hamming)
        )
        .select(F.col("id_b").alias("_id"))
        .distinct()
    )
    admitted = surv.join(dup_ids, "_id", "left_anti")
    admitted = admitted.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        # media_id collision guard (same contract as the exact path) —
        # gated by the id bloom: no false negatives for covered rows,
        # so a bloom-all-negative batch cannot contain a ledgered id
        if ledger_count and sc_state.any_id_maybe_seen(pinned):
            seen_ids = ledger.select(F.col("media_id").alias("_id"))
            if pinned.join(seen_ids, "_id", "left_semi").limit(1).count() > 0:
                hit = admitted.join(seen_ids, "_id", "left_semi").limit(1).collect()
                if hit:
                    raise ValueError(
                        "incremental_fingerprint_neardup: media_id "
                        f"{hit[0]._id} is already in the ledger from a "
                        "prior run with a different fingerprint; "
                        "upserting would re-tag that row's run_id and "
                        "break the prior run's exactly-once replay — "
                        "ingest changed content under a NEW media_id "
                        "(or rebuild the ledger)"
                    )
        n_admitted = admitted.count()
        if n_admitted:
            registry.upsert(
                admitted.select(
                    F.col("_id").alias("media_id"),
                    F.col("_fp").alias("fingerprint"),
                    F.lit(run_id).alias("run_id"),
                )
            )
        # ledger committed — cover it in the sidecar (crash here =
        # count mismatch = exact repair next call). An empty admit
        # skips both writes: replaying it recomputes from the same
        # ledger state and re-derives the same empty set. The admitted
        # rows' combo explode is derived from the pinned keyed_full
        # (sweep survivors minus within-batch dups) so record() does
        # not re-explode + re-hash the admitted rows from scratch.
        sc_state.record(
            admitted.select(
                F.col("_id").alias("media_id"), F.col("_fp").alias("fingerprint")
            ),
            run_id,
            n_admitted,
            exploded=keyed.join(dup_ids, "_id", "left_anti").select(
                "combo",
                "combo_key",
                F.col("_id").alias("media_id"),
                F.col("_fp").alias("fingerprint"),
            ),
        )
    finally:
        pinned.unpersist()
        keyed_full.unpersist()
        admitted.unpersist()
    out = registry.read()
    if out is None:  # first-ever batch admitted nothing
        return batch.select(
            F.col("_id").alias("media_id"), F.col("_fp").alias("fingerprint")
        ).limit(0)
    return out.filter(F.col("run_id") == run_id).select("media_id", "fingerprint")


def image_neardup_pairs(
    media: DataFrame,
    algo: str = "dhash",
    bands: int = 8,
    max_hamming: int = 7,
    strict: bool = True,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """decode → perceptual fingerprint → Hamming-banded pairs, in one
    call: (id_a, id_b, hamming). The image analogue of the text
    ``simhash_band_pairs`` entry point."""
    fps = image_fingerprints(
        media, algo=algo, strict=strict, id_col=id_col, content_col=content_col
    )
    return hamming_band_pairs(fps, bands=bands, max_hamming=max_hamming)

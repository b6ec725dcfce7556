"""Bloom-filter membership at corpus scale — the broadcast-bitmask
alternative to a gram/key shuffle join (the Dolma pipeline's dedupe
device: build a bloom over the reference set once, then every probe
partition answers membership locally).

Why this exists at 100 TB: the exact decontamination / novelty scan
(``contamination_8gram``) joins probe shingles to reference shingles —
both sides shuffle on the gram key. With a bloom filter the reference
side collapses to an ``m``-bit mask built in one scan (per-partition
bitmasks OR-combined, ≤ m/8 bytes each), and the probe side becomes
scan -> project -> one Arrow stage against the BROADCAST mask -> per-doc
counts computed row-locally — ZERO probe-side shuffle. A 2^30-bit mask
(128 MiB, ~10^8 reference grams at 1% fp) broadcasts like any dimension
table; the probe corpus never moves.

Engine-exactness: positions are pure md5 arithmetic —
``pos_i(key) = int(md5(key + '#' + i)[:15 hex], 16) % m_bits`` — the
repo's portable-hash convention (``functions/hashes.py:27``), so a SQL
oracle reproduces every membership verdict exactly: "all k positions
set in the mask" is equivalent to "all k positions present in the
DISTINCT position set of the build side". False positives are part of
the (deterministic) semantics, not an approximation gap.

Reference parity: generalizes the reference's content-addressed
already-written check (F4, download_data_file.py:98-107) to set
membership that fits in one broadcast at corpus scale.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    LongType,
    StructField,
    StructType,
)


#: bits set per byte value, for mask fill accounting
_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint16)


@dataclass(frozen=True)
class BloomFilter:
    """An immutable bloom filter value: ``m_bits`` bits in ``mask``
    (LSB-first within each byte), ``k`` hash probes per key."""

    m_bits: int
    k: int
    mask: bytes

    def __contains__(self, key: str) -> bool:
        arr = np.frombuffer(self.mask, dtype=np.uint8)
        return all(
            arr[p >> 3] & (1 << (p & 7)) for p in positions(key, self.k, self.m_bits)
        )

    @property
    def fill_ratio(self) -> float:
        # per-byte popcount via a 256-entry lookup — np.unpackbits
        # materializes an 8x bool array and measures ~10 s on an
        # 8 MiB mask in this environment; the table gather is ~50 ms
        arr = np.frombuffer(self.mask, dtype=np.uint8)
        return float(_POPCOUNT8[arr].sum()) / self.m_bits

    def fp_rate(self) -> float:
        """Expected false-positive probability at the current fill."""
        return float(self.fill_ratio**self.k)


def positions(key: str, k: int, m_bits: int) -> list[int]:
    """The k bit positions of ``key`` — 60-bit md5-prefix integers mod
    ``m_bits``, one per salt ``#i``. Identical in any engine that has
    md5 (Spark: ``conv(substring(md5(..),1,15),16,10) % m``; DuckDB:
    ``('0x' || substr(md5(..),1,15))::UBIGINT % m``)."""
    return [
        int(hashlib.md5(f"{key}#{i}".encode()).hexdigest()[:15], 16) % m_bits
        for i in range(k)
    ]


def positions_col(key: F.Column, k: int, m_bits: int) -> F.Column:
    """The same k positions as a JVM-side array<bigint> expression —
    this IS the hash path of the mask operators below (whole-stage
    codegen md5; the Arrow stages only do vectorized bit arithmetic)."""
    return F.array(
        *[
            (
                F.conv(
                    F.substring(F.md5(F.concat(key, F.lit(f"#{i}"))), 1, 15), 16, 10
                ).cast("long")
                % m_bits
            )
            for i in range(k)
        ]
    )


def _flat_batch_positions(pos_series) -> np.ndarray:
    """Concatenate a pandas series of per-row position arrays into one
    int64 vector (empty-safe)."""
    arrs = [np.asarray(a, dtype=np.int64) for a in pos_series if a is not None]
    if not arrs:
        return np.empty(0, dtype=np.int64)
    return np.concatenate(arrs)


def _mask_builder(nbytes: int, extract):
    """The shared per-partition mask accumulator for ``mapInPandas``:
    OR every position ``extract(pdf)`` yields into one local bitmask,
    emit a single mask row per non-empty partition (both mask-building
    paths share this closure so they cannot drift)."""

    def build(batches):
        local = np.zeros(nbytes, dtype=np.uint8)
        any_rows = False
        for pdf in batches:
            flat = extract(pdf)
            if not flat.size:
                continue
            any_rows = True
            np.bitwise_or.at(
                local, flat >> 3, (1 << (flat & 7)).astype(np.uint8)
            )
        if any_rows:
            import pandas as pd

            yield pd.DataFrame({"mask": [local.tobytes()]})

    return build


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k: int = 4,
    build_partitions: int | None = None,
) -> BloomFilter:
    """Build a bloom filter over every value of ``df[key_col]`` (string).

    ONE corpus scan: the k md5 probe positions per key are computed
    JVM-side (whole-stage codegen, ``positions_col``); each task then
    ORs its whole partition into a local ``m/8``-byte bitmask with one
    vectorized ``np.bitwise_or.at`` inside ``mapInPandas`` and emits a
    single mask row; the partition masks fold together in a
    ``treeReduce`` (depth 2) — all partitions evaluate in PARALLEL (an
    earlier ``toLocalIterator`` draft ran one job per partition,
    serializing the whole build), executors pre-combine masks, and the
    driver only ever holds the reduction fan-in, never one mask per
    partition. No shuffle anywhere, no per-key Python hashing.

    Sizing (measured, SCALING.md): the build's transient footprint is
    ``n_partitions x m/8`` bytes of mask rows crossing Arrow at once —
    at m=2^30 a 32-partition build is 32 x 128 MiB and OOMs a 16 GiB
    local heap; ``build_partitions=8`` caps it (wider inputs pay a
    narrow coalesce, not a shuffle). Past ~2^30 the mask also exceeds
    any sane broadcast — switch to ``llm/bloom_sharded.py``, which
    never assembles the full mask anywhere.
    """
    if m_bits % 8:
        raise ValueError("m_bits must be a multiple of 8")
    nbytes = m_bits // 8
    schema = StructType([StructField("mask", BinaryType())])
    build = _mask_builder(nbytes, lambda pdf: _flat_batch_positions(pdf["_pos"]))
    pos = df.filter(F.col(key_col).isNotNull()).select(
        positions_col(F.col(key_col), k, m_bits).alias("_pos")
    )
    if build_partitions:
        pos = pos.coalesce(build_partitions)
    masks = pos.mapInPandas(build, schema=schema)
    return BloomFilter(m_bits=m_bits, k=k, mask=_fold_masks(masks, nbytes))


def _fold_masks(masks: DataFrame, nbytes: int) -> bytes:
    """OR per-partition mask rows into one mask via ``treeReduce``
    (parallel; executors pre-combine, driver holds only the fan-in)."""

    def _or(a: bytes, b: bytes) -> bytes:
        return (
            np.frombuffer(a, dtype=np.uint8) | np.frombuffer(b, dtype=np.uint8)
        ).tobytes()

    rdd = masks.rdd.map(lambda r: bytes(r["mask"]))
    try:
        return rdd.treeReduce(_or, depth=2)
    except ValueError:  # empty input: no partition emitted a mask
        return bytes(nbytes)


def bloom_build_chunked(
    df: DataFrame,
    key_col: str,
    m_bits: int,
    k: int = 4,
    chunk_bits: int = 1 << 25,
    delegate_below: int | None = None,
) -> BloomFilter:
    """Build the same filter as :func:`bloom_build`, but without ever
    materializing a full ``m/8``-byte mask in ANY task or result row:
    the k positions per key are exploded (JVM md5 arithmetic), shuffled
    by mask CHUNK (``chunk_bits`` bits ≈ 4 MiB of mask per chunk), each
    task ORs only the whole chunks it owns, and the driver assembles
    the chunk rows (``m/8`` bytes total, through Arrow).

    Why it exists: ``bloom_build``'s transient footprint is
    ``n_partitions × m/8`` bytes of per-partition masks crossing Arrow
    plus the treeReduce fan-in — measured to OOM a 16 GiB heap at the
    2^30→2^31 mask transition (STRESS_MEDIA_LEDGER_XL). Here the worst
    task holds ``O(chunk)`` and the shuffle moves ``keys × k × 16`` B
    of positions — O(keys), independent of ``m``.

    Below ``delegate_below`` bits this DELEGATES to ``bloom_build``
    (8-partition build ≤ 512 MiB transient at the 2^29 boundary): for
    small masks the chunk shuffle degenerates to few reduce tasks and
    would serialize the upstream key hashing onto them (measured 132 s
    single-tasked vs ~20 s delegated at a 56M-key build over a 2^22
    mask). Past ~2^33 the assembled mask itself outgrows a sane
    driver/broadcast — switch to ``llm/bloom_sharded.py``."""
    if m_bits % 8:
        raise ValueError("m_bits must be a multiple of 8")
    if delegate_below is None:
        delegate_below = 1 << 30
    if m_bits < delegate_below:
        return bloom_build(df, key_col, m_bits, k, build_partitions=8)
    chunk_bits = min(chunk_bits, m_bits)
    if m_bits % chunk_bits:
        raise ValueError("chunk_bits must divide m_bits")
    n_chunks = m_bits // chunk_bits
    cb = chunk_bits

    pos = (
        df.filter(F.col(key_col).isNotNull())
        .select(
            F.explode(positions_col(F.col(key_col), k, m_bits)).alias("_pos")
        )
        .withColumn("_chunk", (F.col("_pos") / cb).cast("long"))
        .repartition(n_chunks, "_chunk")
    )

    def build(batches):
        import pandas as pd

        local: dict[int, np.ndarray] = {}
        for pdf in batches:
            p = pdf["_pos"].to_numpy(dtype=np.int64)
            c = pdf["_chunk"].to_numpy(dtype=np.int64)
            for ch in np.unique(c):
                m = local.setdefault(int(ch), np.zeros(cb // 8, dtype=np.uint8))
                rel = p[c == ch] - ch * cb
                np.bitwise_or.at(m, rel >> 3, (1 << (rel & 7)).astype(np.uint8))
        for ch, m in local.items():
            yield pd.DataFrame({"chunk": [ch], "mask": [m.tobytes()]})

    rows = pos.mapInPandas(build, schema="chunk long, mask binary").toPandas()
    full = np.zeros(m_bits // 8, dtype=np.uint8)
    for ch, mb in zip(rows["chunk"], rows["mask"]):
        off = int(ch) * (cb // 8)
        full[off : off + cb // 8] |= np.frombuffer(bytes(mb), dtype=np.uint8)
    return BloomFilter(m_bits=m_bits, k=k, mask=full.tobytes())


def pack_positions(pos: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Fold raw bit positions into (unique byte index, OR value)
    arrays, so applying them to a mask is one vectorized
    ``arr[idx] |= val`` (unique indices — safe fancy indexing) instead
    of a ``np.bitwise_or.at`` scatter, which is ~20× slower at tens of
    millions of positions. Computed ONCE on the driver per delta; every
    worker then applies the packed form."""
    if not pos.size:
        e = np.empty(0, dtype=np.int64)
        return e, np.empty(0, dtype=np.uint8)
    b = pos >> 3
    v = (1 << (pos & 7)).astype(np.uint8)
    order = np.argsort(b, kind="stable")
    b, v = b[order], v[order]
    edge = np.empty(len(b), dtype=bool)
    edge[0] = True
    np.not_equal(b[1:], b[:-1], out=edge[1:])
    return b[edge], np.bitwise_or.reduceat(v, np.flatnonzero(edge))


def apply_packed(arr: np.ndarray, idx: np.ndarray, val: np.ndarray) -> None:
    if idx.size:
        arr[idx] |= val


#: worker-process cache for :func:`bloom_mark_layered`:
#: (owner, epoch) -> [n_deltas_applied, union mask ndarray]. Lives in
#: this importable module so a reused Python worker keeps the
#: materialized union mask across tasks and batches (guide §4.5);
#: deltas are append-only within an epoch, so the cached mask is grown
#: strictly in place — no copy after the first task of an epoch.
_LAYER_CACHE: dict = {}


def _apply_delta_bc(arr: np.ndarray, bc) -> None:
    idx_b, val_b = bc.value  # pack_positions output, driver-packed
    apply_packed(
        arr,
        np.frombuffer(idx_b, dtype=np.int64),
        np.frombuffer(val_b, dtype=np.uint8),
    )


def _layered_mask(token, base_bc, delta_bcs, parent=None) -> np.ndarray:
    ent = _LAYER_CACHE.get(token)
    if ent is None:
        owner = token[0]
        if parent is not None:
            # epoch lineage handoff: the new base equals (old base |
            # old deltas[0:n]) bit-exactly, so a worker holding the
            # parent epoch's union mask ADOPTS it in place of
            # re-loading the full base broadcast (the O(mask)
            # per-worker reload that otherwise follows every rebase)
            p_epoch, n, p_bcs = parent
            pent = _LAYER_CACHE.pop((owner, p_epoch), None)
            if pent is not None and pent[0] <= n:
                for bc in p_bcs[pent[0] : n]:
                    _apply_delta_bc(pent[1], bc)
                ent = [0, pent[1]]
        for stale in [t for t in _LAYER_CACHE if t[0] == owner]:
            del _LAYER_CACHE[stale]
        if ent is None:
            ent = [0, np.frombuffer(base_bc.value, dtype=np.uint8).copy()]
        _LAYER_CACHE[token] = ent
    applied, arr = ent
    for bc in delta_bcs[applied:]:
        _apply_delta_bc(arr, bc)
    ent[0] = len(delta_bcs)
    return arr


def bloom_mark_layered(
    df: DataFrame,
    key_col: str,
    k: int,
    m_bits: int,
    base_bc,
    delta_bcs,
    token,
    out_col: str = "maybe_seen",
    parent=None,
) -> DataFrame:
    """:func:`bloom_mark` against a LAYERED mask: an already-broadcast
    base (``base_bc``, the mask bytes at the last rebase) plus an
    ordered list of delta broadcasts (``delta_bcs``, each the
    driver-packed ``(idx_bytes, val_bytes)`` pair of
    :func:`pack_positions` for the bits added since). Verdicts are
    identical to marking against the union mask — the layers
    reconstruct it bit-exactly.

    Why: a per-micro-batch probe against a GROWING mask would otherwise
    re-broadcast (and re-unpickle in every Python worker) the full
    ``m/8`` bytes every batch — O(mask) per batch, 128 MiB at a 2^30
    mask. Layering ships only the NEW positions per batch (O(batch));
    executors fetch each older layer once (broadcast blocks are
    cached), and the worker-side union mask is materialized once per
    process per epoch and grown in place (``_LAYER_CACHE``).
    ``token`` must change whenever the base changes (rebase/resize) and
    be stable otherwise — (owner-path, epoch-uuid). ``parent``, when
    given as ``(parent_epoch, n, parent_delta_bcs)``, asserts that this
    base equals the parent epoch's base OR its first ``n`` deltas —
    warm workers then adopt their cached parent union mask instead of
    re-loading ``base_bc`` (O(batch) handoff instead of O(mask)).

    Unlike ``bloom_mark``'s ``mapInPandas`` (whole-row round trip),
    the test is a vectorized ``pandas_udf`` over ONLY the position
    array — every other column stays JVM-side (guide §4.1: an opaque
    whole-partition stage would ship, and copy back, all of a 56×
    combo explode's columns; measured ~600 MB/100k-item batch vs
    ~200 MB one-way for the positions alone)."""
    deltas = list(delta_bcs)
    kk = k

    @F.pandas_udf(BooleanType())
    def _test(pos_series):
        import pandas as pd

        arr = _layered_mask(token, base_bc, deltas, parent)
        ok = np.zeros(len(pos_series), dtype=bool)
        notnull = pos_series.notna().to_numpy()
        if notnull.any():
            flat = _flat_batch_positions(pos_series[notnull])
            bits = (arr[flat >> 3] >> (flat & 7).astype(np.uint8)) & 1
            ok[notnull] = bits.reshape(-1, kk).all(axis=1)
        return pd.Series(ok)

    # callers filter on the output column; without this the optimizer
    # pushes the filter below the projection and evaluates the UDF
    # TWICE (guide §4.4) — the verdicts are deterministic, the flag
    # only forbids re-evaluation/reordering
    _test = _test.asNondeterministic()

    return df.withColumn(
        out_col,
        _test(
            F.when(
                F.col(key_col).isNotNull(),
                positions_col(F.col(key_col), k, m_bits),
            )
        ),
    )


def bloom_from_positions(
    pos_df: DataFrame | None,
    m_bits: int,
    k: int,
    pos_col: str = "pos",
) -> BloomFilter:
    """Rebuild a :class:`BloomFilter` from already-computed bit
    positions (e.g. a durable position ledger — the streaming sink's
    state): same parallel mask fold as :func:`bloom_build`, no hashing.
    ``None`` (or an empty frame) yields the empty filter."""
    if m_bits % 8:
        raise ValueError("m_bits must be a multiple of 8")
    nbytes = m_bits // 8
    if pos_df is None:
        return BloomFilter(m_bits=m_bits, k=k, mask=bytes(nbytes))
    schema = StructType([StructField("mask", BinaryType())])

    def _checked(pdf) -> np.ndarray:
        # positions come from OUTSIDE (a durable ledger) — a ledger
        # written under a larger m_bits would otherwise fail deep in
        # numpy indexing; surface the parameter mismatch by name instead
        flat = pdf[pos_col].to_numpy(dtype=np.int64)
        if flat.size and (flat.min() < 0 or flat.max() >= m_bits):
            raise ValueError(
                f"bloom_from_positions: position {int(flat.max())} out of "
                f"range for m_bits={m_bits} — the position source was "
                "built with different bloom parameters"
            )
        return flat

    build = _mask_builder(nbytes, _checked)
    masks = pos_df.select(pos_col).mapInPandas(build, schema=schema)
    return BloomFilter(m_bits=m_bits, k=k, mask=_fold_masks(masks, nbytes))


def bloom_mark(
    df: DataFrame,
    key_col: str,
    bloom: BloomFilter,
    out_col: str = "maybe_seen",
) -> DataFrame:
    """Append ``out_col``: true iff all k positions of ``df[key_col]``
    are set in ``bloom`` ("possibly in the build set" — bloom semantics:
    no false negatives, deterministic false positives). The mask ships
    once per executor via ``SparkContext.broadcast``; positions are
    JVM-side md5 arithmetic and the check is one vectorized numpy
    bit-test per Arrow batch — row-local, zero shuffle."""
    bc = df.sparkSession.sparkContext.broadcast((bloom.mask, bloom.k))
    schema = StructType(list(df.schema.fields) + [StructField(out_col, BooleanType())])
    cols = [f.name for f in df.schema.fields]
    inp = df.withColumn(
        "_pos",
        F.when(
            F.col(key_col).isNotNull(),
            positions_col(F.col(key_col), bloom.k, bloom.m_bits),
        ),
    )

    def mark(batches):
        mask_b, kk = bc.value
        arr = np.frombuffer(mask_b, dtype=np.uint8)
        for pdf in batches:
            out = pdf[cols].copy()
            if not len(pdf):
                out[out_col] = np.empty(0, dtype=bool)
                yield out
                continue
            ok = np.zeros(len(pdf), dtype=bool)
            notnull = pdf["_pos"].notna().to_numpy()
            if notnull.any():
                flat = _flat_batch_positions(pdf["_pos"][notnull])
                bits = (arr[flat >> 3] >> (flat & 7).astype(np.uint8)) & 1
                ok[notnull] = bits.reshape(-1, kk).all(axis=1)
            out[out_col] = ok
            yield out

    return inp.mapInPandas(mark, schema=schema)


def gram_novelty(
    docs: DataFrame,
    bloom: BloomFilter,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document novelty against a reference bloom: how many of the
    doc's DISTINCT word n-grams are definitely NOT in the reference set
    (novel), vs possibly seen. Grams are the ``word_shingles``
    convention — md5-16-hex over the space-joined lowercase n-gram —
    and docs with fewer than ``n`` words drop out (no grams).

    The whole probe is scan -> project (JVM split/lower/trim — cheap
    codegen) -> one Arrow stage against the broadcast mask emitting one
    row per doc — ZERO shuffle; compare ``contamination_8gram``, whose
    exact join shuffles every gram of both corpora. Gram + probe hashes
    run inside the Arrow stage via C-speed ``hashlib`` with a
    short-circuit on the first unset bit (a novel gram usually pays ONE
    salted md5, not k). An earlier draft built the gram/position arrays
    JVM-side with ``transform(...)`` lambdas — Spark evaluates
    higher-order functions interpreted, outside codegen, and the
    per-gram md5 chain benched ~10x slower than hashlib here (the same
    interpreted-HOF tax class the centroid argmax hit in round 8).
    Output: (id, n_grams, n_novel)."""
    bc = docs.sparkSession.sparkContext.broadcast(
        (bloom.mask, bloom.k, bloom.m_bits)
    )
    schema = StructType(
        [
            StructField(id_col, docs.schema[id_col].dataType),
            StructField("n_grams", LongType()),
            StructField("n_novel", LongType()),
        ]
    )
    inp = docs.select(
        F.col(id_col),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("_toks"),
    ).filter(F.size("_toks") >= n)

    def count_novel(batches):
        mask_b, kk, mm = bc.value
        arr = np.frombuffer(mask_b, dtype=np.uint8)
        import pandas as pd

        md5 = hashlib.md5
        for pdf in batches:
            if not len(pdf):
                continue
            ids, n_grams, n_novel = [], [], []
            for rid, toks in zip(pdf[id_col], pdf["_toks"]):
                toks = list(toks)
                grams = {
                    md5(" ".join(toks[i : i + n]).encode()).hexdigest()[:16]
                    for i in range(len(toks) - n + 1)
                }
                novel = 0
                for g in grams:
                    for i in range(kk):
                        p = int(md5(f"{g}#{i}".encode()).hexdigest()[:15], 16) % mm
                        if not arr[p >> 3] & (1 << (p & 7)):
                            novel += 1
                            break
                ids.append(rid)
                n_grams.append(len(grams))
                n_novel.append(novel)
            yield pd.DataFrame(
                {id_col: ids, "n_grams": n_grams, "n_novel": n_novel}
            )

    return inp.mapInPandas(count_novel, schema=schema)

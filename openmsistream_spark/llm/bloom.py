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

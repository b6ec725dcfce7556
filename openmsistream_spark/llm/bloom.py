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
        return float(
            np.unpackbits(np.frombuffer(self.mask, dtype=np.uint8)).sum()
        ) / self.m_bits

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
    """The same k positions as a JVM-side array<bigint> expression (for
    consumers that want the positions relationally, e.g. a position
    ledger; the mask paths below hash Python-side inside Arrow stages)."""
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


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k: int = 4,
) -> BloomFilter:
    """Build a bloom filter over every value of ``df[key_col]`` (string).

    ONE corpus scan: each task accumulates a local ``m/8``-byte bitmask
    across its whole partition inside ``mapInPandas`` and emits a single
    mask row; the driver ORs the partition masks as they stream in
    (``toLocalIterator`` — peak driver memory is 2 masks, independent of
    partition count). No shuffle anywhere.
    """
    if m_bits % 8:
        raise ValueError("m_bits must be a multiple of 8")
    nbytes = m_bits // 8
    schema = StructType([StructField("mask", BinaryType())])

    def build(batches):
        local = np.zeros(nbytes, dtype=np.uint8)
        any_rows = False
        for pdf in batches:
            for key in pdf[key_col]:
                if key is None:
                    continue
                any_rows = True
                for p in positions(str(key), k, m_bits):
                    local[p >> 3] |= 1 << (p & 7)
        if any_rows:
            import pandas as pd

            yield pd.DataFrame({"mask": [local.tobytes()]})

    masks = df.select(key_col).mapInPandas(build, schema=schema)
    acc = np.zeros(nbytes, dtype=np.uint8)
    for row in masks.toLocalIterator():
        acc |= np.frombuffer(row["mask"], dtype=np.uint8)
    return BloomFilter(m_bits=m_bits, k=k, mask=acc.tobytes())


def bloom_mark(
    df: DataFrame,
    key_col: str,
    bloom: BloomFilter,
    out_col: str = "maybe_seen",
) -> DataFrame:
    """Append ``out_col``: true iff all k positions of ``df[key_col]``
    are set in ``bloom`` ("possibly in the build set" — bloom semantics:
    no false negatives, deterministic false positives). The mask ships
    once per executor via ``SparkContext.broadcast``; the check is
    row-local — zero shuffle."""
    bc = df.sparkSession.sparkContext.broadcast((bloom.mask, bloom.k, bloom.m_bits))
    schema = StructType(list(df.schema.fields) + [StructField(out_col, BooleanType())])
    cols = [f.name for f in df.schema.fields]

    def mark(batches):
        mask_b, kk, mm = bc.value
        arr = np.frombuffer(mask_b, dtype=np.uint8)
        for pdf in batches:
            out = pdf[cols].copy()
            out[out_col] = [
                key is not None
                and all(
                    arr[p >> 3] & (1 << (p & 7))
                    for p in positions(str(key), kk, mm)
                )
                for key in pdf[key_col]
            ]
            yield out

    return df.mapInPandas(mark, schema=schema)


# word-shingle expression: same tokenizer + hashed-16-hex convention as
# llm.dedup.word_shingles (kept textually independent so landing this
# module does not touch that function's source closure)
def _gram_array(text_col: str, n: int) -> F.Column:
    parts = ", ".join(f"element_at(_toks, CAST(i+{j} AS INT))" for j in range(n))
    mk = f"substring(md5(concat_ws(' ', {parts})), 1, 16)"
    return F.expr(
        f"CASE WHEN size(_toks) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size(_toks)-{n - 1}), i -> {mk})) "
        f"ELSE array() END"
    )


def gram_novelty(
    docs: DataFrame,
    bloom: BloomFilter,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document novelty against a reference bloom: how many of the
    doc's DISTINCT word n-grams are definitely NOT in the reference set
    (novel), vs possibly seen. Docs with fewer than ``n`` words drop out
    (no grams — mirrors the shingle-CTE convention).

    The whole probe is scan -> project (doc-local distinct gram array)
    -> one Arrow stage against the broadcast mask emitting one row per
    doc — ZERO shuffle; compare ``contamination_8gram``, whose exact
    join shuffles every gram of both corpora. Output: (id, n_grams,
    n_novel)."""
    bc = docs.sparkSession.sparkContext.broadcast((bloom.mask, bloom.k, bloom.m_bits))
    schema = StructType(
        [
            StructField(id_col, docs.schema[id_col].dataType),
            StructField("n_grams", LongType()),
            StructField("n_novel", LongType()),
        ]
    )
    inp = (
        docs.withColumn("_toks", F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
        .select(F.col(id_col), _gram_array(text_col, n).alias("_grams"))
        .filter(F.size("_grams") >= 1)
    )

    def count_novel(batches):
        mask_b, kk, mm = bc.value
        arr = np.frombuffer(mask_b, dtype=np.uint8)
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids, n_grams, n_novel = [], [], []
            for rid, grams in zip(pdf[id_col], pdf["_grams"]):
                novel = 0
                for g in grams:
                    if not all(
                        arr[p >> 3] & (1 << (p & 7))
                        for p in positions(g, kk, mm)
                    ):
                        novel += 1
                ids.append(rid)
                n_grams.append(len(grams))
                n_novel.append(novel)
            yield pd.DataFrame(
                {id_col: ids, "n_grams": n_grams, "n_novel": n_novel}
            )

    return inp.mapInPandas(count_novel, schema=schema)

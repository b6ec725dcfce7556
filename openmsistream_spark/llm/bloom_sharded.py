"""Sharded bloom masks — the big-``m`` scale path past the broadcast
ceiling of ``llm/bloom.py``.

The broadcast mask is the right design up to ~2^30 bits (128 MiB ships
like a dimension table; measured numbers in SCALING.md). A 100 TB
novelty scan wants m ≈ 2^33–2^36 (1–8 GiB) — too big to broadcast to
every executor and too big to OR per-partition copies of during the
build. This module splits the key space into ``n_shards`` INDEPENDENT
blooms of ``m_bits / n_shards`` bits each:

- ``shard(key) = md5(key + '#shard') % n_shards`` picks the shard; all
  k probe positions of a key live INSIDE its shard's mask, so any
  operation on a key touches exactly one shard.
- **Build**: keys → (shard, in-shard positions) → ONE shuffle keyed by
  shard into ``n_shards`` partitions (narrow position rows — the price
  of shardedness) → per-task partial masks → per-shard OR-fold. A build
  task holds the masks of the shards hash-colliding into its partition
  (a handful at worst — balls-in-bins), each ``m/n_shards`` bytes; the
  full mask never exists in one place.
- **Probe**: keys cogroup with the mask table on shard — each task gets
  one shard's probe rows plus that shard's mask ONLY. One probe-side
  shuffle (vs zero for the broadcast path) in exchange for masks that
  never broadcast — the honest trade, documented in SCALING.md.

Statistically a sharded bloom IS a bloom of ``m_bits`` total: keys
spread uniformly over shards, so bits-per-key — and therefore the
false-positive rate — match the monolithic filter with the same total
``m_bits`` and ``k``.

Sizing: ``n_shards`` bounds BOTH the per-task mask (m/n_shards/8 bytes)
and the per-task probe group (≈ probes/n_shards rows — cogroup
materializes a shard's probe rows per task), so pick it from executor
memory: at m=2^36 and 4 GiB tasks, n_shards=1024 gives 8 MiB masks and
~0.1% of the probe volume per task.

Engine-exactness: positions and shard choice are the same portable md5
arithmetic as ``llm/bloom.py`` (``functions/hashes.py:27`` convention),
so a SQL oracle reproduces every verdict: "maybe seen" ≡ "all k
(shard-local) positions present in the build side's distinct
(shard, pos) set".

Reference parity: same F4 lineage as ``llm/bloom.py``
(download_data_file.py:98-107), extended to reference sets whose mask
exceeds the broadcast budget.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    StructField,
    StructType,
)

from ..functions.hashes import portable_hash64
from .bloom import _flat_batch_positions, positions_col

_MASK_SCHEMA = StructType(
    [StructField("shard", IntegerType()), StructField("mask", BinaryType())]
)


def bloom_sizing(n_keys: int, fp_rate: float) -> tuple[int, int]:
    """The standard bloom dimensioning (Bloom 1970): optimal
    ``m = -n ln(p) / ln(2)^2`` bits and ``k = (m/n) ln(2)`` probes for
    ``n_keys`` at target ``fp_rate``. Returns (m_bits rounded up to a
    multiple of 8, k >= 1). 10^10 grams at 1% -> m ~= 2^36.5, k = 7 —
    the sharded path's home turf."""
    if not 0 < fp_rate < 1:
        raise ValueError("fp_rate must be in (0, 1)")
    if n_keys <= 0:
        raise ValueError("n_keys must be positive")
    m = -n_keys * math.log(fp_rate) / (math.log(2) ** 2)
    m_bits = int(math.ceil(m / 8)) * 8
    k = max(1, round(m_bits / n_keys * math.log(2)))
    return m_bits, k


def shard_col(key: F.Column, n_shards: int) -> F.Column:
    """Shard choice for ``key`` — ``functions/hashes.portable_hash64``
    (the repo's one md5-prefix convention) with its own salt so the
    shard hash is independent of the position hashes."""
    return (portable_hash64(F.concat(key, F.lit("#shard"))) % n_shards).cast("int")


def _shard_geometry(m_bits: int, k: int, n_shards: int) -> int:
    if n_shards <= 0 or m_bits % n_shards:
        raise ValueError(f"m_bits={m_bits} not divisible into {n_shards} shards")
    shard_bits = m_bits // n_shards
    if shard_bits % 8:
        raise ValueError("shard size must be a multiple of 8 bits")
    if k <= 0:
        raise ValueError("k must be positive")
    return shard_bits


def bloom_build_sharded(
    df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 33,
    k: int = 4,
    n_shards: int = 64,
) -> DataFrame:
    """Build the sharded mask table (shard, mask) over every value of
    ``df[key_col]`` — one row per non-empty shard, each
    ``m_bits/n_shards`` bits.

    Plan: positions JVM-side (codegen md5) → repartition BY SHARD (the
    one corpus-sized shuffle of narrow (shard, positions) rows) → each
    task ORs its rows into per-shard partial masks → per-shard OR-fold
    of the partials (sketch-sized). Persist the result as parquet and
    every future probe run skips the build."""
    shard_bits = _shard_geometry(m_bits, k, n_shards)
    nbytes = shard_bits // 8
    key = F.col(key_col)
    pos_rows = (
        df.filter(key.isNotNull())
        .select(
            shard_col(key, n_shards).alias("shard"),
            positions_col(key, k, shard_bits).alias("_pos"),
        )
        # n_shards partitions, NOT the session shuffle default: with
        # fewer partitions than shards each build task would hold
        # several shard masks at once and the per-task memory bound the
        # sizing guidance promises would be off by that multiplier. At
        # n_shards partitions, hash collisions still co-locate a few
        # shards per task (balls-in-bins: worst task ~O(ln n / ln ln n)
        # shards, ~4-5 at 1024) — the honest bound documented below.
        .repartition(n_shards, F.col("shard"))
    )

    def partials(batches):
        import pandas as pd

        local: dict[int, np.ndarray] = {}
        for pdf in batches:
            for shard, grp in pdf.groupby("shard"):
                mask = local.setdefault(
                    int(shard), np.zeros(nbytes, dtype=np.uint8)
                )
                flat = _flat_batch_positions(grp["_pos"])
                np.bitwise_or.at(mask, flat >> 3, (1 << (flat & 7)).astype(np.uint8))
        if local:
            yield pd.DataFrame(
                {
                    "shard": list(local),
                    "mask": [m.tobytes() for m in local.values()],
                }
            )

    def fold(pdf):
        import pandas as pd

        acc = np.zeros(nbytes, dtype=np.uint8)
        for b in pdf["mask"]:
            acc |= np.frombuffer(b, dtype=np.uint8)
        return pd.DataFrame({"shard": [int(pdf["shard"].iloc[0])], "mask": [acc.tobytes()]})

    return (
        pos_rows.mapInPandas(partials, schema=_MASK_SCHEMA)
        .groupBy("shard")
        .applyInPandas(fold, schema=_MASK_SCHEMA)
    )


def bloom_mark_sharded(
    df: DataFrame,
    key_col: str,
    masks: DataFrame,
    m_bits: int,
    k: int,
    n_shards: int,
    out_col: str = "maybe_seen",
) -> DataFrame:
    """Append ``out_col``: true iff all k shard-local positions of
    ``df[key_col]`` are set in the key's shard mask (bloom semantics —
    no false negatives, deterministic false positives; null keys are
    false). ``masks`` must come from ``bloom_build_sharded`` with the
    SAME (m_bits, k, n_shards).

    The probe side shuffles ONCE on the shard key (cogroup); each task
    sees one shard's probe rows + that shard's mask only — the full
    mask never assembles anywhere. A shard with no mask row (nothing
    hashed there at build time) answers all-false, which is exact."""
    shard_bits = _shard_geometry(m_bits, k, n_shards)
    nbytes = shard_bits // 8
    key = F.col(key_col)
    cols = [f.name for f in df.schema.fields]
    inp = df.select(
        *cols,
        F.when(key.isNotNull(), shard_col(key, n_shards))
        .otherwise(F.lit(-1))
        .alias("_shard"),
        F.when(key.isNotNull(), positions_col(key, k, shard_bits)).alias("_pos"),
    )
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, BooleanType())]
    )

    def mark(left, right):
        if not len(left):
            return left[cols].assign(**{out_col: np.empty(0, dtype=bool)})
        # OR every mask row for the shard: a masks table appended or
        # unioned across several builds is a set UNION, and silently
        # probing only the first row would break the no-false-negative
        # guarantee for keys present only in the ignored rows
        arr = np.zeros(nbytes, dtype=np.uint8)
        for b in right["mask"]:
            m = np.frombuffer(bytes(b), dtype=np.uint8)
            if len(m) != nbytes:
                raise ValueError(
                    f"bloom_mark_sharded: mask of {len(m)} bytes does not "
                    f"match m_bits={m_bits}/n_shards={n_shards} — masks built "
                    "with different parameters"
                )
            arr = arr | m
        ok = np.zeros(len(left), dtype=bool)
        notnull = left["_pos"].notna().to_numpy()
        if notnull.any():
            flat = _flat_batch_positions(left["_pos"][notnull])
            if flat.size and (flat.min() < 0 or flat.max() >= shard_bits):
                raise ValueError(
                    "bloom_mark_sharded: probe position out of range — "
                    "(m_bits, n_shards) differ from the build"
                )
            bits = (arr[flat >> 3] >> (flat & 7).astype(np.uint8)) & 1
            ok[notnull] = bits.reshape(-1, k).all(axis=1)
        out = left[cols].copy()
        out[out_col] = ok
        return out

    return (
        inp.groupBy("_shard")
        .cogroup(masks.groupBy("shard"))
        .applyInPandas(mark, schema=out_schema)
    )

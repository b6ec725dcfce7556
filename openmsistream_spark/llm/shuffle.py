"""Seeded deterministic corpus shuffle + stable shard writer — the
last mile before training: a trainer wants the curated corpus in a
pseudo-random GLOBAL order, split into N shard files it can stream
sequentially, and it wants the exact same order on every re-run (so a
resumed/re-launched data pipeline feeds the model the identical token
stream).

The shuffle is a pure function of (salt, doc id) — the repo's
md5-portability convention (``functions.hashes.portable_hash64``), so
any engine, any rerun, and any partitioning produce the identical
permutation, with no coordinated RNG state (the property every other
sampling operator here shares; changing ``salt`` is a fresh epoch-level
reshuffle, the standard seeded-shuffle device of training data loaders).

Global order without a global sort: order key h = hash(salt|id); shard
= h % n_shards, position = rank of h within the shard. Reading shards
0..N-1 each in position order IS the global h-order restricted to a
uniform random partition — and since h is uniform, interleaving or
concatenating shards both yield well-shuffled streams. The plan is ONE
hash shuffle + per-shard sort (row_number over the shard partition) —
embarrassingly parallel at any corpus size, vs. the total sort a naive
ORDER BY hash would schedule.

Composes with the packing family: shuffle first, then
``packing.pack_sequences`` / ``shard_by_token_budget`` pack the
shuffled order (their within-bucket order is id-driven, so feed them
``pos`` as the id, or write shards and pack per shard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashes import portable_hash64


def shuffle_assignment(
    docs: DataFrame,
    n_shards: int = 16,
    salt: str = "shuf",
    id_col: str = "doc_id",
    keep_cols: "tuple[str, ...] | list[str]" = (),
) -> DataFrame:
    """(id, [keep_cols...], shard, pos): the seeded shuffle as a pure
    assignment — shard = hash(salt|id) % n_shards (60-bit md5 prefix,
    DuckDB mirror: ``('0x' || substr(md5(...), 1, 15))::UBIGINT``),
    pos = 1-based rank of the hash within the shard (ties impossible in
    practice; broken on id for determinism anyway). One shuffle, one
    per-shard sort."""
    reserved = {"shard", "pos", "_h"}
    clash = reserved.intersection(keep_cols) | (reserved & {id_col})
    if clash:
        raise ValueError(
            f"shuffle_assignment: column(s) {sorted(clash)} collide with "
            "the operator's output columns (shard, pos, _h) — rename or "
            "drop them first"
        )
    h = portable_hash64(
        F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string"))
    )
    base = docs.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        h.alias("_h"),
        (h % n_shards).cast("bigint").alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("_h", id_col)
    return base.withColumn(
        "pos", F.row_number().over(w).cast("bigint")
    ).drop("_h")


def write_shuffled_shards(
    docs: DataFrame,
    out_dir: str,
    n_shards: int = 16,
    salt: str = "shuf",
    id_col: str = "doc_id",
    mode: str = "overwrite",
) -> DataFrame:
    """Materialize the seeded shuffle as ``{out_dir}/shard=S/*.parquet``
    — one file per shard (each shard is repartitioned to exactly one
    task), rows stored in position order, every non-id column riding
    through. Deterministic: the same corpus + salt always produce the
    identical shard membership and row order, so a failed write re-run
    converges (mode='overwrite') and a trainer's resume re-reads the
    same stream. Returns the (id, shard, pos) manifest."""
    assigned = shuffle_assignment(
        docs,
        n_shards=n_shards,
        salt=salt,
        id_col=id_col,
        keep_cols=[c for c in docs.columns if c != id_col],
    )
    (
        assigned.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(out_dir)
    )
    return assigned.select(id_col, "shard", "pos")

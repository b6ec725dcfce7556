"""Corpus packing / mixing operators: token-budget sharding and
weighted mixture sampling — the steps between a curated corpus and the
training shards an LLM data loader reads.

Both are pure functions of the data (every random choice derives from
md5 of the document key), so any engine, any rerun, and any worker
produce the identical shard layout / mixture — reproducibility without
coordinated RNG state, and the exactness the DuckDB oracle validates.

Scale design:
  - sharding packs independently inside hash buckets, so the cumsum
    window parallelizes across buckets (a single global packing order
    would serialize the corpus into one task);
  - mixture sampling is projection + explode only — zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 16^15 — the denominator turning a 15-hex-char (60-bit) md5 prefix into
# a uniform fraction in [0, 1)
_HEX15_SPAN = float(16**15)


def _hash_u60(col: Column, salt: str = "") -> Column:
    """First 60 bits of md5(salt|key) as a BIGINT — portable (DuckDB:
    ('0x' || substr(md5(...), 1, 15))::UBIGINT)."""
    keyed = F.concat(F.lit(salt), col.cast("string")) if salt else col.cast("string")
    return F.conv(F.substring(F.md5(keyed), 1, 15), 16, 10).cast("bigint")


def shard_by_token_budget(
    docs: DataFrame,
    budget_tokens: int,
    n_buckets: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: "tuple[str, ...] | list[str]" = (),
) -> DataFrame:
    """Greedy token-budget sharding: assign each document to a training
    shard such that consecutive documents (in a deterministic
    hash-shuffled order) accumulate ~``budget_tokens`` per shard.

    Two-level for scale: documents hash into ``n_buckets`` independent
    packing streams, and the greedy cumsum runs per bucket — the window
    parallelizes across buckets instead of serializing the corpus into
    one global task. Shard identity is (bucket, shard_in_bucket).
    A document larger than the budget gets a shard of its own (the
    greedy rule places it where the running total stood; the next doc
    starts a new shard).

    Token counts use the same whitespace tokenization as
    ``token_histogram`` so corpus stats and shard budgets agree.

    Returns (id, [keep_cols...], n_tokens, bucket, shard) — the
    manifest a shard writer partitions by (``keep_cols`` ride through
    unchanged so a writer needs no join back to the corpus). At 100 TB:
    one shuffle (the per-bucket sort); set ``n_buckets`` to a small
    multiple of cluster parallelism.
    """
    reserved = {"n_tokens", "bucket", "shard", "_ord"}
    clash = reserved.intersection(keep_cols) | (reserved & {id_col})
    if clash:
        raise ValueError(
            f"shard_by_token_budget: column(s) {sorted(clash)} collide with "
            "the operator's output columns (n_tokens, bucket, shard, _ord) — "
            "rename or drop them before packing"
        )
    n_tok = F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).cast("bigint")
    bucket = (_hash_u60(F.col(id_col)) % n_buckets).cast("bigint")
    order_key = F.md5(F.col(id_col).cast("string"))
    base = docs.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        n_tok.alias("n_tokens"),
        bucket.alias("bucket"),
        order_key.alias("_ord"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col("_ord"), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("bigint"))
    return base.select(
        id_col,
        *keep_cols,
        "n_tokens",
        "bucket",
        F.floor(prev / budget_tokens).cast("bigint").alias("shard"),
    )


def write_training_shards(
    docs: DataFrame,
    out_dir: str,
    budget_tokens: int,
    n_buckets: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "overwrite",
) -> DataFrame:
    """Materialize the packed corpus as training shards:
    ``{out_dir}/bucket=B/shard=S/*.parquet`` — the layout a data loader
    streams sequentially, one shard ≈ ``budget_tokens`` tokens.

    The document text rides through the packing projection
    (``keep_cols``), so the write is scan → one per-bucket sort → write:
    no join back to the corpus. Deterministic: the same corpus always
    produces byte-identical shard membership, so re-running a failed
    write converges (mode='overwrite').

    Returns the manifest (id, n_tokens, bucket, shard) for registry/
    bookkeeping use.

    Every non-id input column rides through as a ``keep_col``, so the
    input must not already contain the packing output names (n_tokens,
    bucket, shard, _ord) — ``shard_by_token_budget`` raises a clear
    error on collision rather than producing ambiguous columns.
    """
    packed = shard_by_token_budget(
        docs,
        budget_tokens,
        n_buckets=n_buckets,
        id_col=id_col,
        text_col=text_col,
        keep_cols=[c for c in docs.columns if c != id_col],
    )
    packed.write.mode(mode).partitionBy("bucket", "shard").parquet(out_dir)
    return packed.select(id_col, "n_tokens", "bucket", "shard")


def mixture_sample(
    docs: DataFrame,
    weight: Column,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted mixture sampling: emit each document ``weight`` times in
    expectation — the data-mixing step of an LLM training recipe, where
    high-quality sources run multiple epochs (weight > 1) and bulk
    sources are subsampled (weight < 1).

    ``weight`` is a Column (join a broadcast weights table, or derive
    from source metadata). floor(weight) full copies are always emitted;
    the fractional remainder becomes one extra copy iff the document's
    salted hash fraction falls below it. Pure projection + explode —
    zero shuffles, deterministic, and exact in distribution per
    document (no sampling variance across the integer part).

    Returns the input rows with (copy BIGINT, n_copies BIGINT) added,
    one row per emitted copy (documents with 0 copies drop out).
    """
    frac = F.col("_w") - F.floor(F.col("_w"))
    extra = (
        (_hash_u60(F.col(id_col), salt="mix|") / F.lit(_HEX15_SPAN)) < frac
    ).cast("long")
    n_copies = (F.floor(F.col("_w")) + extra).cast("bigint")
    return (
        docs.withColumn("_w", weight)
        .withColumn("n_copies", n_copies)
        .filter(F.col("n_copies") > 0)
        .withColumn(
            "copy", F.explode(F.sequence(F.lit(1).cast("bigint"), F.col("n_copies")))
        )
        .drop("_w")
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 256,
    n_buckets: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sample packing: concatenate documents (whitespace token counts)
    into fixed ``seq_len``-token training sequences inside hash buckets,
    emitting one (bucket, id, seq, tok_start, tok_end) span row per
    sequence a document overlaps — the attention-mask / provenance map
    a trainer consumes alongside the packed tokens.

    Scale shape: same per-bucket-cumsum lever as
    ``shard_by_token_budget`` — the running-token window parallelizes
    across ``n_buckets`` (thousands at 100 TB) instead of forcing one
    global sort; the crossing-document explode is output-bounded
    (ceil(n_tokens/seq_len) rows max per doc). One shuffle, no UDFs.
    Deterministic: the bucket derives from md5(id); WITHIN a bucket
    documents pack in raw id order (contrast ``shard_by_token_budget``,
    which additionally md5-shuffles the within-bucket order — pre-shuffle
    ids or sort by a hash first if id-adjacent documents must not share
    a training sequence).
    """
    from pyspark.sql import Window

    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    d = docs.select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_tokens"),
        (_hash_u60(F.col(id_col)) % n_buckets).cast("bigint").alias("bucket"),
    ).filter(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = d.withColumn("cum", F.sum("n_tokens").over(w))
    start = F.col("cum") - F.col("n_tokens")
    return c.select(
        "bucket",
        id_col,
        F.explode(
            F.sequence(
                F.floor(start / seq_len).cast("bigint"),
                F.floor((F.col("cum") - 1) / seq_len).cast("bigint"),
            )
        ).alias("seq"),
        start.alias("tok_start"),
        F.col("cum").alias("tok_end"),
    )

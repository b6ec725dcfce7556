"""Round-16 catalog additions, registered OUT-OF-BAND (same discipline
as every ``queries_extras*.py``: imported by the entry points, never
from ``queries.py``, so landing them does not dirty already-verified
entries' source closures).

Content — the batch-oracle twins of this round's scale work:

- ``combo_bloom_gated_probe``: the fingerprint-ledger probe gate
  (``llm/phash_index.py``) in hash-oracle form: a "ledger" and a
  "batch" of 60-bit fingerprints derived via the repo's portable md5
  convention, the batch gated by a REAL bloom over the ledger's Manku
  combination keys (``phash._combo_keyed`` + ``bloom.bloom_build``/
  ``bloom_mark``), bloom-positive candidates verified exactly by
  ``bit_count(xor) <= h``. The DuckDB oracle computes the
  bloom-independent ground truth (exists a ledger fingerprint within
  the budget) — so the hash match PROVES the gate loses nothing
  (bloom false negatives would drop blocked rows) and admits nothing
  on bloom evidence alone (false positives must be filtered by the
  exact verify). The durable sidecar itself is pytest-tier
  (tests/test_phash_index.py); this entry pins the GATE ALGEBRA in
  the oracle tier.
- ``ledger_fold_tiered``: the log backend's MINOR-fold composition
  (``LogStructuredRegistry._fold_to_run``): deltas+tombstones fold
  latest-wins into a run that PRESERVES tombstone rows, then the
  major fold over base+run drops them — and the result must equal
  the direct one-shot fold the oracle computes, including the
  tombstone-then-reinsert resurrection case. Pins the fold-composition
  algebra (fold(fold(S2..S4), S1) == fold(S1..S4)) in the hash tier.

100 TB notes: the gate is the probe's scale story — the mark pass is
row-local against a broadcast mask and the exact verify only sees
bloom-positive candidates (near-singleton combo buckets); the oracle's
quadratic EXISTS is the correctness instrument only. The tiered fold
is two map-side-combinable ``max_by`` aggregates — the minor pause is
O(folded deltas), never O(base) (SCALING.md round-16).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import load, query

# ------------------------------------------------ combo bloom gate

_BITS, _BLOCKS, _H = 60, 6, 2
#: batch perturbation masks: hamming 1 / hamming 2 (blocked at h=2)
#: and hamming 4 (admitted) off the even neighbor's fingerprint
_X1 = 1 << 3
_X2 = (1 << 5) | (1 << 17)
_X4 = (1 << 1) | (1 << 11) | (1 << 21) | (1 << 31)

#: the repo's portable-hash convention (functions/hashes.py): 60-bit
#: md5-prefix integers, identical in any engine with md5
_FP_SPARK = (
    "cast(conv(substring(md5(cast({x} as string)), 1, 15), 16, 10) as bigint)"
)
_FP_DUCK = "(('0x' || substr(md5(cast({x} as varchar)), 1, 15))::UBIGINT)::BIGINT"


def _batch_fp(fp_tpl: str, xor_fn) -> str:
    """Batch fingerprint CASE: odd docs perturb their even neighbor's
    fingerprint by 1/2/4 bits, or carry their own (far) fingerprint."""
    near = fp_tpl.format(x="doc_id - 1")
    own = fp_tpl.format(x="doc_id")
    return (
        f"CASE WHEN doc_id % 8 = 1 THEN {xor_fn(near, _X1)} "
        f"WHEN doc_id % 8 = 3 THEN {xor_fn(near, _X2)} "
        f"WHEN doc_id % 8 = 5 THEN {xor_fn(near, _X4)} "
        f"ELSE {own} END"
    )


_GATE_ORACLE = f"""
WITH ledger AS (
  SELECT doc_id, {_FP_DUCK.format(x="doc_id")} AS fp
  FROM documents WHERE doc_id % 2 = 0
),
batch AS (
  SELECT doc_id, {_batch_fp(_FP_DUCK, lambda e, m: f"xor({e}, {m})")} AS fp
  FROM documents WHERE doc_id % 2 = 1
)
SELECT b.doc_id,
       EXISTS (SELECT 1 FROM ledger l
               WHERE bit_count(xor(b.fp, l.fp)) <= {_H}) AS blocked
FROM batch b
ORDER BY b.doc_id
"""


@query(
    "combo_bloom_gated_probe",
    _GATE_ORACLE,
    doc="bloom-gated combo-key ledger probe == exact hamming truth",
    survey="LLM media dedup: probe sidecar gate (llm/phash_index.py)",
)
def combo_bloom_gated_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm.bloom import bloom_build, bloom_mark
    from .llm.phash import _combo_keyed

    docs = load(spark, sf_dir, "documents").select("doc_id")
    ledger = docs.filter("doc_id % 2 = 0").select(
        F.col("doc_id").alias("_id"),
        F.expr(_FP_SPARK.format(x="doc_id")).alias("_fp"),
    )
    batch = docs.filter("doc_id % 2 = 1").select(
        F.col("doc_id").alias("_id"),
        F.expr(_batch_fp(_FP_SPARK, lambda e, m: f"({e}) ^ {m}")).alias("_fp"),
    )
    key = F.concat_ws(":", F.col("combo"), F.col("combo_key"))
    lk = _combo_keyed(ledger, _BITS, _BLOCKS, _H).withColumn("_bk", key)
    bk = _combo_keyed(batch, _BITS, _BLOCKS, _H).withColumn("_bk", key)
    bloom = bloom_build(lk, "_bk", m_bits=1 << 20, k=4)
    pos = bloom_mark(bk, "_bk", bloom).filter(F.col("maybe_seen"))
    blocked = (
        pos.join(
            lk.select("combo", "combo_key", F.col("_fp").alias("_lfp")),
            ["combo", "combo_key"],
        )
        .filter(F.expr(f"bit_count(_fp ^ _lfp) <= {_H}"))
        .select("_id")
        .distinct()
        .withColumn("_blocked", F.lit(True))
    )
    return (
        batch.join(blocked, "_id", "left")
        .select(
            F.col("_id").alias("doc_id"),
            F.coalesce("_blocked", F.lit(False)).alias("blocked"),
        )
        .orderBy("doc_id")
    )


# -------------------------------------------------- tiered fold

_TIERED_ORACLE = """
WITH segs AS (
  SELECT doc_id AS key, 1 AS seq, n_chars AS val, FALSE AS tomb
  FROM documents
  UNION ALL
  SELECT doc_id, 2, n_chars + 1000, FALSE FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id, 3, NULL, TRUE FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id, 4, n_chars + 2000, FALSE FROM documents WHERE doc_id % 3 = 0
),
ranked AS (
  SELECT key, seq, val, tomb,
         row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
  FROM segs
)
SELECT key AS doc_id, val AS latest_value
FROM ranked WHERE rn = 1 AND NOT tomb
ORDER BY doc_id
"""


@query(
    "ledger_fold_tiered",
    _TIERED_ORACLE,
    doc="minor fold (tombstones preserved) + major fold == direct fold",
    survey="R2/R3 (log backend tiered compaction algebra)",
)
def ledger_fold_tiered(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")

    def seg(cond: str, seq: int, val, tomb: bool) -> DataFrame:
        return docs.filter(F.expr(cond)).select(
            F.col("doc_id").alias("key"),
            F.lit(seq).cast("long").alias("seq"),
            val.cast("long").alias("val"),
            F.lit(tomb).alias("tomb"),
        )

    base = seg("true", 1, F.col("n_chars"), False)
    d2 = seg("doc_id % 5 = 0", 2, F.col("n_chars") + 1000, False)
    t3 = seg("doc_id % 7 = 0", 3, F.lit(None), True)
    d4 = seg("doc_id % 3 = 0", 4, F.col("n_chars") + 2000, False)

    # MINOR fold: deltas+tomb -> one run, latest-wins, tombstone rows
    # PRESERVED (the _fold_to_run shape) — the run re-enters at seq 5
    run = (
        d2.unionByName(t3)
        .unionByName(d4)
        .groupBy("key")
        .agg(F.max_by(F.struct("val", "tomb"), F.col("seq")).alias("v"))
        .select(
            "key",
            F.lit(5).cast("long").alias("seq"),
            F.col("v.val").alias("val"),
            F.col("v.tomb").alias("tomb"),
        )
    )
    # MAJOR fold over base + run: latest-wins, tombstoned keys drop
    folded = (
        base.unionByName(run)
        .groupBy("key")
        .agg(F.max_by(F.struct("val", "tomb"), F.col("seq")).alias("v"))
    )
    return (
        folded.filter(~F.col("v.tomb"))
        .select(F.col("key").alias("doc_id"), F.col("v.val").alias("latest_value"))
        .orderBy("doc_id")
    )

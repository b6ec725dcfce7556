"""Bloom sidecar + write-time combo index for the incremental
fingerprint probe — makes the common per-micro-batch ledger probe
O(batch) instead of O(ledger).

Why: ``phash.incremental_fingerprint_neardup``'s exact probe re-scans
and 56×-explodes the ENTIRE admitted ledger every micro-batch (the
round-15 stress isolation: wall 3.8→17.8 s as the ledger grows
0→190k rows while upserts and the control leg stay flat —
STRESS_MEDIA_LEDGER.json). At a crawl-scale ledger (10^9 rows) that
explode generates TB per batch. This sidecar removes the per-batch
ledger-side work:

- **Write-time combo index**: the 56× combination-key explode of each
  admitted row is computed ONCE, at admit time, and appended to a
  log-structured index (O(batch) one-file segments, sorted by
  ``combo_key`` so parquet row-group min/max statistics serve pushed
  point/IN filters). The probe never re-explodes the ledger.
- **Bloom sidecar**: an m-bit bloom over all admitted combo keys
  (plus a second, smaller bloom over admitted media_ids for the
  collision guard). Bloom maintenance is a bitmap OR — O(batch) per
  upsert. At probe time the micro-batch's combo keys are marked
  against the BROADCAST mask; bloom-NEGATIVE keys are definitively
  absent and skip the index entirely, so a no-hit batch costs one
  row-local mark pass and zero ledger I/O. Bloom-positive keys (real
  matches + a controlled false-positive tail) are verified EXACTLY
  against the index — membership is never decided by the bloom alone.
- **Coverage accounting**: the ledger upsert remains the commit point
  (ledger first, sidecar second). The sidecar records which run_ids
  it covers and how many rows; a probe first compares its row count
  against the ledger's (a parquet-footer count) and, on mismatch
  (crash between ledger commit and sidecar update, a pre-sidecar
  ledger, an out-of-band append), REPAIRS by exploding exactly the
  uncovered rows — the exact-probe fallback. A lost or deleted
  sidecar is the same case with zero covered rows: one full O(ledger)
  repair (the cost of a single old-style probe), then flat again.

False positives in the bloom or duplicate index rows (a crash between
the index append and the meta commit makes the next repair re-append
the same rows) only cause extra exact checks — never a wrong verdict.
False negatives cannot occur for committed rows: a row is only
counted as covered after its keys are in the mask and the index, and
uncovered rows are probed exactly via repair.

Sizing: the combo mask auto-resizes (×4) whenever its fill ratio
crosses ``resize_fill`` — the rebuild scans the index once, amortized
O(1)/row by the same doubling argument as the log backend's
compaction. At ~10.6M combo keys (a 190k-row ledger) the steady-state
mask is ~2^27 bits = 16 MiB — broadcast-size at any ledger the index
itself can hold.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators.registry import LogStructuredRegistry, ParquetRegistry
from .bloom import BloomFilter, bloom_build, bloom_mark

_META_SCHEMA = StructType(
    [
        StructField("kind", StringType()),
        StructField("chunk", LongType()),
        StructField("mask", BinaryType()),
        StructField("run_id", StringType()),
        StructField("n_items", LongType()),
        StructField("m_bits", LongType()),
        StructField("id_m_bits", LongType()),
        StructField("k", LongType()),
        StructField("bits", LongType()),
        StructField("blocks", LongType()),
        StructField("max_hamming", LongType()),
    ]
)

#: mask bytes per meta row — parquet handles large binary cells, but
#: bounded rows keep the writer's row-group memory predictable
_MASK_CHUNK = 4 << 20


def _combo_bloom_key() -> F.Column:
    """The string key hashed into the combo bloom — MUST be derived
    identically at build (admitted rows) and probe (batch rows)."""
    return F.concat_ws(":", F.col("combo"), F.col("combo_key"))


class FingerprintProbeSidecar:
    """Durable sidecar state for one fingerprint ledger, stored next
    to it at ``<ledger_path>.probeidx/{index,meta}``. Single-writer,
    same discipline as the ledger itself (serialize inside the
    stream's foreachBatch)."""

    def __init__(
        self,
        spark: SparkSession,
        ledger_path: str,
        bits: int,
        blocks: int,
        max_hamming: int,
        combo_m_bits: int = 1 << 22,
        id_m_bits: int = 1 << 18,
        k: int = 4,
        resize_fill: float = 0.25,
        max_pushdown_keys: int = 8192,
    ):
        self.spark = spark
        self.bits = bits
        self.blocks = blocks
        self.max_hamming = max_hamming
        self.k = k
        self.resize_fill = resize_fill
        self.max_pushdown_keys = max_pushdown_keys
        base = ledger_path.rstrip("/") + ".probeidx"
        # the index rides the log backend: O(batch) appends, sorted
        # segments for combo_key row-group pruning, insert-only union
        # reads (duplicate rows after a crash-repair are benign here)
        self.index = LogStructuredRegistry(
            spark,
            f"{base}/index",
            ["combo", "combo_key", "media_id"],
            insert_only=True,
            segment_sort_cols=["combo_key"],
        )
        self.meta = ParquetRegistry(spark, f"{base}/meta", ["kind", "chunk"])
        # in-memory state, populated by load_or_init
        self.combo_bloom = BloomFilter(combo_m_bits, k, bytes(combo_m_bits // 8))
        self.id_bloom = BloomFilter(id_m_bits, k, bytes(id_m_bits // 8))
        self.covered: set[str] = set()
        self.n_items = 0
        # frames persisted during one probe→record cycle, released at
        # the end of record() (the gated path's last step)
        self._pins: list[DataFrame] = []

    # ---------------------------------------------------------- state

    def load_or_init(self) -> None:
        """Read the meta table if present; refuse a params mismatch
        (a silently changed combo budget would re-derive different
        probe keys than the index holds — the same refusal discipline
        as the streaming params sidecar)."""
        df = self.meta.read()
        if df is None:
            return
        rows = df.collect()
        meta = next(r for r in rows if r.kind == "meta")
        stored = (meta.bits, meta.blocks, meta.max_hamming)
        if stored != (self.bits, self.blocks, self.max_hamming):
            raise ValueError(
                "fingerprint probe sidecar at "
                f"{self.meta.path} was built with (bits, blocks, "
                f"max_hamming)={stored}, called with "
                f"{(self.bits, self.blocks, self.max_hamming)} — a "
                "changed budget would probe different keys than the "
                "index holds; keep the original params or rebuild the "
                "ledger AND its sidecar"
            )
        self.n_items = meta.n_items
        self.k = meta.k
        self.covered = {r.run_id for r in rows if r.kind == "run"}
        self.combo_bloom = BloomFilter(
            meta.m_bits, meta.k, self._join_mask(rows, "cmask", meta.m_bits)
        )
        self.id_bloom = BloomFilter(
            meta.id_m_bits, meta.k, self._join_mask(rows, "imask", meta.id_m_bits)
        )

    @staticmethod
    def _join_mask(rows, kind: str, m_bits: int) -> bytes:
        chunks = sorted(
            ((r.chunk, bytes(r.mask)) for r in rows if r.kind == kind)
        )
        mask = b"".join(c for _, c in chunks)
        if len(mask) != m_bits // 8:
            raise ValueError(
                f"probe sidecar {kind} mask is {len(mask)} bytes, expected "
                f"{m_bits // 8} — sidecar corrupt; delete it to force a "
                "rebuild from the ledger"
            )
        return mask

    def _persist_meta(self) -> None:
        rows = [
            (
                "meta",
                0,
                None,
                None,
                self.n_items,
                self.combo_bloom.m_bits,
                self.id_bloom.m_bits,
                self.k,
                self.bits,
                self.blocks,
                self.max_hamming,
            )
        ]
        for kind, bloom in (("cmask", self.combo_bloom), ("imask", self.id_bloom)):
            for i in range(0, len(bloom.mask), _MASK_CHUNK):
                rows.append(
                    (kind, i // _MASK_CHUNK, bloom.mask[i : i + _MASK_CHUNK],
                     None, None, None, None, None, None, None, None)
                )
        rows.extend(
            ("run", i, None, rid, None, None, None, None, None, None, None)
            for i, rid in enumerate(sorted(self.covered))
        )
        # ship the mask bytes driver→JVM as ONE Arrow table instead of
        # pickled Row tuples: the py4j row path re-marshals O(mask)
        # bytes per batch, which grows with the ledger's key count
        # (2^30 mask = 128 MiB per meta write) — the Arrow conversion
        # is the guide's driver-transfer rule applied in reverse
        import pandas as pd

        pdf = pd.DataFrame(rows, columns=[f.name for f in _META_SCHEMA.fields])
        self.meta.replace(  # staged rename — atomic, never partial
            self.spark.createDataFrame(pdf, _META_SCHEMA)
        )

    # ---------------------------------------------------------- probe

    def blocked_ids(self, keyed: DataFrame) -> DataFrame:
        """Batch ids whose fingerprint is within the hamming budget of
        a COMMITTED ledger fingerprint. ``keyed`` is ``_combo_keyed``
        output (_id, _fp, combo, combo_key). Bloom-negative keys are
        skipped (no false negatives for covered rows); bloom-positive
        keys are verified exactly against the index — the bloom alone
        never blocks (or admits) anything."""
        from pyspark import StorageLevel

        marked = bloom_mark(
            keyed.withColumn("_bk", _combo_bloom_key()), "_bk", self.combo_bloom
        )
        # persist the (tiny) bloom-positive subset: the candidate-key
        # collect below AND the caller's eventual materialization of the
        # verify join both consume it — without the pin, the full
        # batch-explode + mask-mark pass (which re-ships the broadcast
        # mask to every Python worker) executes once PER consumer
        # (measured 70 s of a 205 s batch at a 2^30 mask, two passes).
        # Released in record(), the gated path's final step.
        pos = (
            marked.filter(F.col("maybe_seen"))
            .select("_id", "_fp", "combo", "combo_key")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        self._pins.append(pos)
        # bounded driver collect: distinct candidate keys, capped — the
        # IN list reaches the index scan as a pushed filter, so parquet
        # row-group stats (segments are combo_key-sorted) prune the
        # read to the touched key ranges; past the cap we keep the
        # plain equi-join (full index scan — exact either way)
        cand = [
            r.combo_key
            for r in pos.select("combo_key")
            .distinct()
            .limit(self.max_pushdown_keys + 1)
            .collect()
        ]
        if not cand:
            return keyed.select("_id").limit(0)
        idx = self.index.read()
        if idx is None:
            return keyed.select("_id").limit(0)
        if len(cand) <= self.max_pushdown_keys:
            idx = idx.filter(F.col("combo_key").isin(cand))
        return (
            pos.join(idx, ["combo", "combo_key"])
            .filter(F.expr("bit_count(_fp ^ fingerprint)") <= self.max_hamming)
            .select("_id")
            .distinct()
        )

    def any_id_maybe_seen(self, batch: DataFrame, id_col: str = "_id") -> bool:
        """Collision-guard gate: False means NO batch media_id can be
        in the ledger (bloom has no false negatives for covered rows),
        so the exact guard join is skipped entirely."""
        marked = bloom_mark(
            batch.withColumn("_ik", F.col(id_col).cast("string")),
            "_ik",
            self.id_bloom,
        )
        return marked.filter(F.col("maybe_seen")).limit(1).count() > 0

    # ---------------------------------------------------------- write

    def _explode(self, rows: DataFrame) -> DataFrame:
        """(media_id, fingerprint) → write-time combo index rows."""
        from .phash import _combo_keyed

        keyed = _combo_keyed(
            rows.select(
                F.col("media_id").alias("_id"), F.col("fingerprint").alias("_fp")
            ),
            self.bits,
            self.blocks,
            self.max_hamming,
        )
        return keyed.select(
            "combo",
            "combo_key",
            F.col("_id").alias("media_id"),
            F.col("_fp").alias("fingerprint"),
        )

    def _or_masks(self, exploded: DataFrame, rows: DataFrame) -> None:
        # REPARTITION the build inputs to a bounded width instead of
        # using bloom_build's coalesce cap: coalesce would collapse the
        # upstream combo explode + md5 hashing onto the same few cores
        # (measured 6-9 s/batch single-cored vs ~2 s repartitioned),
        # while 8 partitions bound the transient Arrow footprint at
        # 8 x m/8 bytes of mask rows (the measured OOM guard from
        # llm/bloom.py)
        cb = bloom_build(
            exploded.withColumn("_bk", _combo_bloom_key()).repartition(8),
            "_bk",
            m_bits=self.combo_bloom.m_bits,
            k=self.k,
        )
        ib = bloom_build(
            rows.withColumn("_ik", F.col("media_id").cast("string")).repartition(8),
            "_ik",
            m_bits=self.id_bloom.m_bits,
            k=self.k,
        )
        self.combo_bloom = BloomFilter(
            self.combo_bloom.m_bits,
            self.k,
            (
                np.frombuffer(self.combo_bloom.mask, dtype=np.uint8)
                | np.frombuffer(cb.mask, dtype=np.uint8)
            ).tobytes(),
        )
        self.id_bloom = BloomFilter(
            self.id_bloom.m_bits,
            self.k,
            (
                np.frombuffer(self.id_bloom.mask, dtype=np.uint8)
                | np.frombuffer(ib.mask, dtype=np.uint8)
            ).tobytes(),
        )

    def _sized_m_bits(self, cur_m: int, n_keys: int) -> int:
        """Smallest power-of-two mask ≥ 4×current whose PREDICTED fill
        (1 - e^(-k·n/m)) sits at or under ``resize_fill`` for ``n_keys``
        distinct keys — one rebuild lands the mask at steady state
        instead of ×4-stepping through several index scans when a large
        batch outgrows a small mask (the defaults start small —
        2^22/2^18 — so a fresh ledger's per-batch constant is KiB-sized
        meta I/O, and growth is paid only when the ledger earns it)."""
        import math

        need = self.k * max(n_keys, 1) / -math.log(1.0 - self.resize_fill)
        m = cur_m * 4
        while m < need:
            m *= 2
        return m

    def _maybe_resize(self) -> None:
        """Grow the combo mask when it saturates — rebuild from the
        index (one scan, amortized O(1)/row by the doubling argument;
        the target size is predicted from the index's key count so one
        rebuild suffices). Saturation only costs false positives
        (extra exact checks), so the threshold trades probe
        selectivity against rebuild frequency."""
        if self.combo_bloom.fill_ratio <= self.resize_fill:
            return
        idx = self.index.read()
        if idx is None:
            return
        idx = idx.persist()
        try:
            n_keys = idx.count()  # combo rows ≈ distinct combo keys
            self.combo_bloom = bloom_build(
                idx.withColumn("_bk", _combo_bloom_key()).repartition(8),
                "_bk",
                m_bits=self._sized_m_bits(self.combo_bloom.m_bits, n_keys),
                k=self.k,
            )
            if self.id_bloom.fill_ratio > self.resize_fill:
                # media_id appears once per combo row — duplicates set
                # the same bits, so the index is a valid id-bloom
                # build source; ids are keys/56, sized accordingly
                self.id_bloom = bloom_build(
                    idx.withColumn("_ik", F.col("media_id").cast("string"))
                    .repartition(8),
                    "_ik",
                    m_bits=self._sized_m_bits(
                        self.id_bloom.m_bits, n_keys // 56 + 1
                    ),
                    k=self.k,
                )
        finally:
            idx.unpersist()

    def record(self, admitted: DataFrame, run_id: str, n_admitted: int) -> None:
        """Cover one committed batch: append its exploded combo rows to
        the index, OR its keys into the masks, then atomically commit
        the meta (counts + covered run). Called AFTER the ledger
        upsert — the ledger is the commit point; a crash in here is
        healed by the next call's repair."""
        from pyspark import StorageLevel

        try:
            if n_admitted:
                # the exploded combo rows feed TWO actions (index append
                # + mask build) — pin so the 56× explode and its md5
                # hashing run once, not per consumer. DISK_ONLY: the
                # explode is 56×batch rows (~1.7 GB at a 500k batch) and
                # the mask build right after it needs execution heap for
                # n_partitions × m/8 mask rows — an in-memory pin here
                # OOM'd a 16 g heap at (500k batch, 2^30 mask); a local
                # sequential disk reread is cheap next to the recompute
                exploded = self._explode(admitted).persist(
                    StorageLevel.DISK_ONLY
                )
                self._pins.append(exploded)
                self.index.upsert(exploded)
                self._or_masks(exploded, admitted)
                self._maybe_resize()
            self.n_items += n_admitted
            self.covered.add(run_id)
            self._persist_meta()
        finally:
            for df in self._pins:
                df.unpersist()
            self._pins.clear()

    def repair(self, ledger: DataFrame | None, ledger_count: int) -> None:
        """Bring the sidecar up to date with the committed ledger: the
        exact-probe fallback path. Explodes only the UNCOVERED rows
        (rows whose run_id the sidecar has not recorded) — after a
        normal crash that is one batch; for a lost sidecar or a
        pre-sidecar ledger it is the whole table, i.e. exactly one
        old-style O(ledger) probe's worth of work, once."""
        if ledger is None or ledger_count == 0:
            self.covered = set()
            self.n_items = 0
            self._persist_meta()
            return
        if self.n_items > ledger_count:
            # the ledger shrank out-of-band (not a flow this operator
            # performs): stale index/mask entries could block on rows
            # no longer committed — rebuild from scratch
            self.covered = set()
            self.n_items = 0
            self.index.replace(
                self._explode(ledger.select("media_id", "fingerprint")).limit(0)
            )
            self.combo_bloom = BloomFilter(
                self.combo_bloom.m_bits, self.k,
                bytes(self.combo_bloom.m_bits // 8),
            )
            self.id_bloom = BloomFilter(
                self.id_bloom.m_bits, self.k, bytes(self.id_bloom.m_bits // 8)
            )
        uncovered = ledger
        if self.covered:
            covered_df = self.spark.createDataFrame(
                [(r,) for r in sorted(self.covered)], "run_id string"
            )
            uncovered = ledger.join(F.broadcast(covered_df), "run_id", "left_anti")
        from pyspark import StorageLevel

        uncovered = uncovered.select("media_id", "fingerprint", "run_id").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        exploded = None
        try:
            new_runs = [r.run_id for r in uncovered.select("run_id").distinct().collect()]
            if new_runs:
                # both repair actions (index append + mask build)
                # consume the explode — pin it for the repair's scope
                # (DISK_ONLY for the same heap-headroom reason as
                # record(): the explode is 56× the uncovered rows)
                exploded = self._explode(uncovered).persist(
                    StorageLevel.DISK_ONLY
                )
                self.index.upsert(exploded)
                self._or_masks(exploded, uncovered)
                self._maybe_resize()
            self.covered.update(new_runs)
            self.n_items = ledger_count
            self._persist_meta()
        finally:
            uncovered.unpersist()
            if exploded is not None:
                exploded.unpersist()

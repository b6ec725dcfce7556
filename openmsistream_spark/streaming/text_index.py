"""Streaming inverted-text-index maintenance — the continuous twin of
``llm/retrieval.write_text_index``: a curated document stream keeps the
on-disk BM25 index fresh, micro-batch by micro-batch, with the same
exactly-once contract as the curation sink (streaming/curation.py).

Layout produced (NOT interchangeable with a static
``write_text_index`` build at the same path — the extra ``ingest=``
partition level means one index directory must be either fully static
or fully streamed; Spark's partition discovery rejects mixed depths):

- ``{path}/postings/ingest=<batch_id>/bucket=B/``: each micro-batch
  owns its ``ingest=`` partition and OVERWRITES it on replay, so a
  restart never double-counts a posting. Partition discovery reads the
  whole tree; searches filter on ``bucket`` exactly as against a static
  index (the bucket predicate prunes across every ingest directory).
- ``{path}/stats_ledger``: one registry row per micro-batch
  (ingest, n_docs, sum_dl), keyed by ingest id — a replayed batch
  upserts its own row.
- ``{path}/stats``: the one-row (n, avgdl) frame
  ``bm25_search_index`` expects, re-derived from the ledger after every
  batch — so searches need no layout-specific code path.

Duplicate documents across batches are NOT collapsed here (their
postings would double-count tf/df): run the stream through the curation
chain's dedup first (``curate_document_stream`` /
``incremental_minhash_dedup``) — the same upstream-dedup contract the
reference's stream processors rely on (registry-driven skip of
already-processed files, data_file_stream_processor.py:85-95).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..llm.retrieval import N_TERM_BUCKETS, _build_postings


def text_index_sink(
    curated: DataFrame,
    path: str,
    stats_registry,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_TERM_BUCKETS,
):
    """foreachBatch sink that appends each micro-batch's postings to the
    index under its own ``ingest=<batch_id>`` partition (overwrite ⇒
    replay-idempotent), upserts the batch's (n_docs, sum_dl) ledger row,
    and refreshes the one-row ``stats`` frame from the ledger.

    ``stats_registry`` must be ``make_registry(spark, f"{path}/
    stats_ledger", ["ingest"])`` (or an equivalent keyed registry).
    Returns the configured ``DataStreamWriter`` — caller picks the
    trigger and calls ``.start()``.
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark import StorageLevel

        from ..operators.registry import ParquetRegistry

        postings, dl = _build_postings(batch_df, id_col, text_col, n_buckets)
        # dl feeds the postings write AND the ledger row — cache it so
        # the batch is tokenized once, not twice
        dl = dl.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            postings.write.mode("overwrite").partitionBy("bucket").parquet(
                f"{path}/postings/ingest={batch_id}"
            )
            spark = batch_df.sparkSession
            batch_stats = dl.agg(
                F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
            ).select(
                F.lit(int(batch_id)).alias("ingest"), "n_docs", "sum_dl"
            )
            stats_registry.upsert(batch_stats)
        finally:
            dl.unpersist()
        ledger = stats_registry.read()
        stats = ledger.agg(
            F.sum("n_docs").alias("n"),
            (F.sum("sum_dl").cast("double") / F.sum("n_docs")).alias("avgdl"),
        )
        # swap the one-row stats frame in via the registry's staged
        # atomic rename — a plain overwrite deletes the directory before
        # committing, so a concurrent bm25_search_index opening stats in
        # that window would crash (serving-while-refreshing is the whole
        # point of this sink)
        ParquetRegistry(spark, f"{path}/stats", []).replace(stats)

    return curated.writeStream.foreachBatch(_write).outputMode("append")

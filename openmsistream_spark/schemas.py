"""Canonical schemas of the engine's data model.

The reference's wire record is an ordered msgpack 10-list
(reference: openmsistream/kafka_wrapper/serialization.py:184-199); here it
is a first-class relational schema so Catalyst can prune/push down and
whole-stage codegen can run over it. See SURVEY.md §1.2.
"""

from __future__ import annotations

from pyspark.sql import types as T

# The unit record: one fixed-size byte slice of a file plus provenance.
# Mirrors DataFileChunk (reference: data_file_io/entity/data_file_chunk.py:11-166).
CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("filename", T.StringType(), False),
        T.StructField("subdir_str", T.StringType(), True),
        T.StructField("filename_append", T.StringType(), True),
        # sha512 digests kept as raw 64-byte binary for wire parity
        # (reference compares raw digests, serialization.py:245-253)
        T.StructField("file_hash", T.BinaryType(), True),
        T.StructField("chunk_hash", T.BinaryType(), True),
        T.StructField("chunk_offset_write", T.LongType(), False),
        T.StructField("chunk_i", T.LongType(), False),  # 1-based
        T.StructField("n_total_chunks", T.LongType(), False),
        T.StructField("data", T.BinaryType(), True),
        # wire sentinel 0.0 == null (serialization.py:194-198)
        T.StructField("file_mtime", T.DoubleType(), True),
    ]
)

# Kafka transport envelope (matches Spark's kafka source/sink columns).
KAFKA_MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("offset", T.LongType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
    ]
)

# Source-file rows (binaryFile source columns + derived relative path).
FILE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("rel_path", T.StringType(), False),
        T.StructField("subdir_str", T.StringType(), True),
        T.StructField("filename", T.StringType(), False),
        T.StructField("modification_time", T.TimestampType(), True),
        T.StructField("length", T.LongType(), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)

# Producer-side ledger row (reference: file_registry/producer_file_registry.py:18-45).
REGISTRY_IN_PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("filename", T.StringType(), False),
        T.StructField("rel_filepath", T.StringType(), False),
        T.StructField("n_chunks", T.LongType(), False),
        T.StructField("n_chunks_delivered", T.LongType(), False),
        T.StructField("n_chunks_to_send", T.LongType(), False),
        T.StructField("started", T.TimestampType(), True),
        T.StructField("chunks_delivered", T.ArrayType(T.LongType()), True),
        T.StructField("chunks_to_send", T.ArrayType(T.LongType()), True),
    ]
)

REGISTRY_COMPLETED_SCHEMA = T.StructType(
    [
        T.StructField("filename", T.StringType(), False),
        T.StructField("rel_filepath", T.StringType(), False),
        T.StructField("n_chunks", T.LongType(), False),
        T.StructField("started", T.TimestampType(), True),
        T.StructField("completed", T.TimestampType(), True),
    ]
)

# Consumer-side stream-handler statuses
# (reference: stream_handler_registries.py:51-52,280,342-343).
STREAM_STATUS_IN_PROGRESS = "in_progress"
STREAM_STATUS_MISMATCHED_HASH = "mismatched_hash"
STREAM_STATUS_FAILED = "failed"
STREAM_STATUS_COMPUTING_RESULT_FAILED = "computing_result_message_failed"
STREAM_STATUS_PRODUCING_FAILED = "producing_message_failed"

STREAM_REGISTRY_SCHEMA = T.StructType(
    [
        T.StructField("filename", T.StringType(), False),
        T.StructField("rel_filepath", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("n_chunks", T.LongType(), False),
        T.StructField("first_message", T.TimestampType(), True),
        T.StructField("most_recent_message", T.TimestampType(), True),
    ]
)

# Completion codes emitted by assembly (reference: data_file_io/config.py:1-16).
CODE_IN_PROGRESS = "IN_PROGRESS"
CODE_ALREADY_WRITTEN = "ALREADY_WRITTEN"
CODE_SUCCESSFULLY_RECONSTRUCTED = "SUCCESSFULLY_RECONSTRUCTED"
CODE_HASH_MISMATCH = "HASH_MISMATCH"
CODE_GENERATION_RESET = "GENERATION_RESET"
# same file_hash seen with two different n_total_chunks — the reference
# raises a corruption error for this (download_data_file.py:160-272);
# we surface it as a status so the pipeline can route it like a DLQ row
CODE_CORRUPTION = "CORRUPTION"
# completion detected with offsets-only state (disk-spill mode): bytes
# reconstruct downstream via batch join against the chunk log
CODE_COMPLETE_OFFSETS_ONLY = "COMPLETE_OFFSETS_ONLY"

# Default payload slice size (reference: utilities/config.py:33).
DEFAULT_CHUNK_SIZE = 524288

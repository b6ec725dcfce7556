"""openmsistream_spark — a PySpark-native engine with the query and
data-processing capabilities of openmsi/openmsistream.

Built from scratch on idiomatic Spark (DataFrame/SQL + Structured
Streaming), not a port: the reference's confluent-kafka/watchdog actor
loops become declarative Spark plans; its msgpack ``DataFileChunk`` wire
record becomes a relational ``chunks`` schema; its threaded in-memory
file reconstruction becomes a stateful streaming operator with a batch
equivalent validated against a DuckDB oracle.

Layout:
    session        SparkSession factory tuned for the workload
    schemas        canonical StructTypes (chunks, kafka envelope, registries)
    functions/     scalar helpers: hashes, message keys, msgpack serde
    operators/     batch operators: chunking, assembly, filters, relational,
                   registry ledgers, heartbeats
    streaming/     Structured Streaming sources/sinks + stateful assembly
    llm/           large-scale pipeline extensions: dedup, similarity
                   search, text analysis, multimodal columns
"""

from .session import get_spark, stop_spark


def __getattr__(name):
    # Lazy top-level API: the pipeline entry points mirror the
    # reference's console scripts without importing pyspark.sql machinery
    # at package-import time.
    _pipeline_api = {
        "upload_directory", "download_directory", "reproduce_dlq",
        "StreamProcessor", "StreamReproducer", "MetadataJSONReproducer",
        "write_topic", "read_topic",
    }
    if name in _pipeline_api:
        from . import pipelines

        return getattr(pipelines, name)
    if name == "curate_corpus":
        from .llm.curate import curate_corpus

        return curate_corpus
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "get_spark",
    "stop_spark",
    "upload_directory",
    "download_directory",
    "reproduce_dlq",
    "StreamProcessor",
    "StreamReproducer",
    "MetadataJSONReproducer",
    "write_topic",
    "read_topic",
    "curate_corpus",
]
__version__ = "0.6.0"

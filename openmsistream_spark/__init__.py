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

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"

"""Named query catalog — the t2 correctness surface.

Every entry pairs a Spark query (built from the package's operators)
with an ANSI-SQL oracle that DuckDB executes over the same parquet
tables. Conventions that make the comparison engine-exact:

  - float aggregates are summed as DECIMAL(28,6), rounded, then cast to
    DOUBLE — identical bit patterns in any engine regardless of
    summation order;
  - every ranking has a total order (unique-key tiebreak);
  - integer-ish outputs are cast to BIGINT on the Spark side (Spark's
    size/length return INT, DuckDB's return BIGINT);
  - hashes are md5 hex (portable), never engine-native hash();
  - double→int conversions go through floor() (Spark casts truncate,
    DuckDB casts round — floor removes the ambiguity).

Raw column passthroughs are always safe; only derived arithmetic needs
the decimal discipline.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .llm.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_dedup,
    simhash,
    word_shingles,
)
from .llm.similarity import cosine_topk, cosine_topk_lsh
from .llm.textstats import doc_fingerprint, language_id, text_stats
from .operators.relational import (
    anti_join,
    dedup_keep_first,
    latest_per_key,
    regex_filter,
    semi_join,
    status_counts,
    top_k,
    windowed_counts,
)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts has shipped in two physical forms across testdata
        # generations: TIMESTAMP(NANOS) parquet (which Spark's vectorized
        # reader rejects — read nanos as long, integer-truncate to micros;
        # going through double would lose precision above 2^53 ns) and
        # plain timestamp[us] (read as TIMESTAMP_NTZ). Detect which form
        # this file uses and normalize both to session-tz TimestampType so
        # downstream queries and the DuckDB oracle (CAST(ts AS TIMESTAMP),
        # UTC session) agree bit-for-bit.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if df.schema["ts"].dataType.simpleString() == "bigint":
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# DuckDB reads events.ts at nanosecond precision; truncate to micros to
# match the Spark loader above.
_EVENTS = (
    "(SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props "
    "FROM events) events"
)


def dsum(col: F.Column, scale: int = 2) -> F.Column:
    """Engine-exact float sum: decimal accumulate → round → double."""
    return F.round(F.sum(col.cast("decimal(28,6)")), scale).cast("double")


def davg(col: F.Column, scale: int = 4) -> F.Column:
    """Engine-exact mean: decimal sum cast to double / count, rounded."""
    return F.round(
        F.sum(col.cast("decimal(28,6)")).cast("double") / F.count("*"), scale
    )


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    survey: str = ""


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, doc: str = "", survey: str = ""):
    def deco(fn):
        sql = oracle.replace("{EV}", _EVENTS) if oracle else None
        QUERIES[name] = QuerySpec(fn=fn, oracle=sql, doc=doc, survey=survey)
        return fn

    return deco


# --------------------------------------------------------------------------
# Relational surface on the TPC-H-ish tables (SURVEY §2.7 + grouped aggs)
# --------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(28,6))), 2) AS DOUBLE) AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,6))), 2) AS DOUBLE) AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))), 2) AS DOUBLE) AS sum_charge,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / count(*), 4) AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / count(*), 4) AS avg_price,
           round(CAST(sum(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / count(*), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary: grouped 8-agg scan",
    survey="§2.7 grouped count/sum; A8",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02 00:00:00")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))), 2) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3: 3-way join + grouped revenue + top-10",
    survey="§2.7 equi-join, sort, top-K",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = "1997-06-01 00:00:00"
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    joined = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )
    return top_k(
        agg.select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority"),
        [F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey")],
        10,
    )


@query(
    "q5_region_revenue",
    """
    SELECT n_name,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    doc="TPC-H Q5: 6-way join, dimension tables broadcast",
    survey="§2.7 equi-join chain",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy("n_name").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


@query(
    "semi_join_building_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
    WHERE EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING')
    """,
    doc="rerun filter as semi join (stream keys ∩ registry)",
    survey="F5; §2.7 semi join (stream_handler_registries.py:84-97)",
)
def semi_join_building_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return semi_join(
        orders, cust.select(F.col("c_custkey").alias("o_custkey")), on="o_custkey"
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@query(
    "anti_join_customers_no_orders",
    """
    SELECT c_custkey, c_name, c_acctbal FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
    doc="skip-already-completed as anti join (customers w/o pending orders)",
    survey="R8; §2.7 anti join (data_file_upload_directory.py:550-572)",
)
def anti_join_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    pending = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return anti_join(
        cust,
        pending.select(F.col("o_custkey").alias("c_custkey")),
        on="c_custkey",
        broadcast_right=False,
    ).select("c_custkey", "c_name", "c_acctbal")


@query(
    "union_except_custkeys",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="registry consolidation set algebra",
    survey="R5/§2.7 union/except (producer_file_registry.py:80-138,261-276)",
)
def union_except_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    c = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return a.union(b).distinct().subtract(c)


@query(
    "distinct_doc_sources",
    "SELECT DISTINCT source, lang FROM documents",
    doc="distinct completed paths",
    survey="R6 (producer_file_registry.py:163-167)",
)
def distinct_doc_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "documents").select("source", "lang").distinct()


@query(
    "top50_recent_events",
    """
    SELECT event_id, ts, user_id, event_type FROM {EV}
    ORDER BY ts DESC, event_id DESC LIMIT 50
    """,
    doc="50-most-recent ring buffer as top-K",
    survey="A7 (data_file_chunk_handlers.py:24)",
)
def top50_recent_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return top_k(
        ev.select("event_id", "ts", "user_id", "event_type"),
        [F.desc("ts"), F.desc("event_id")],
        50,
    )


@query(
    "latest_event_per_user",
    """
    SELECT user_id, event_id, ts, event_type, value FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM {EV}) t
    WHERE rn = 1
    """,
    doc="argmax per key — the generation-adoption shape",
    survey="A2/§2.7 max-by (download_data_file.py:160-272)",
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return latest_per_key(
        ev, ["user_id"], [F.desc("ts"), F.desc("event_id")]
    ).select("user_id", "event_id", "ts", "event_type", "value")


@query(
    "hourly_event_counts",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n_messages,
           CAST(round(sum(CAST(value AS DECIMAL(28,6))), 2) AS DOUBLE) AS n_bytes
    FROM {EV} GROUP BY 1, 2
    """,
    doc="heartbeat counters: tumbling-window message/byte counts",
    survey="A8/K7 (controlled_message_reproducer.py:80-104)",
)
def hourly_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    out = windowed_counts(ev, "ts", "1 hour", extra_keys=["event_type"])
    val = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("window_start"),
        "event_type",
    ).agg(dsum(F.col("value")).alias("n_bytes"))
    return out.join(val, ["window_start", "event_type"])


@query(
    "event_status_counts",
    "SELECT event_type AS status, count(*) AS n FROM {EV} GROUP BY 1",
    doc="files-by-state summary",
    survey="A6/R9 (data_file_upload_directory.py:715-755)",
)
def event_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(F.col("event_type").alias("status"))
    return status_counts(ev, "status")


@query(
    "dedup_first_event",
    """
    SELECT user_id, event_type, min(event_id) AS event_id
    FROM {EV} GROUP BY user_id, event_type
    """,
    doc="offset-dedup: first record per key",
    survey="F4 (download_data_file.py:98-107)",
)
def dedup_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return dedup_keep_first(ev, ["user_id", "event_type"], "event_id")


@query(
    "f1_event_key_regex",
    """
    SELECT event_id, user_id, event_type FROM {EV}
    WHERE regexp_matches(event_type, '^(click|view)$')
    """,
    doc="message-key regex filter",
    survey="F1 (openmsistream_consumer.py:363-386)",
)
def f1_event_key_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return regex_filter(ev, "event_type", "^(click|view)$").select(
        "event_id", "user_id", "event_type"
    )


@query(
    "f3_offset_gate",
    """
    SELECT event_type, count(*) AS n FROM {EV}
    WHERE event_id >= 5000 GROUP BY event_type
    """,
    doc="consumed-before offset gate",
    survey="F3 (openmsistream_consumer.py:412-449)",
)
def f3_offset_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import offset_gate

    ev = load(spark, sf_dir, "events")
    return offset_gate(ev, "event_id", 5000).groupBy("event_type").agg(
        F.count("*").alias("n")
    )


@query(
    "p7_json_props",
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM {EV}
    """,
    doc="metadata JSON extraction",
    survey="P7 (metadata_json_reproducer.py:55-93)",
)
def p7_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.get_json_object("props", "$.k").cast("long").alias("k")
    )


@query(
    "running_balance_per_customer",
    """
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(28,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
           AS running_total
    FROM orders
    """,
    doc="running accumulation per key (per-file byte accumulation shape)",
    survey="A1 accumulation; §2.7 windows",
)
def running_balance_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import running_total

    orders = load(spark, sf_dir, "orders")
    out = running_total(
        orders,
        ["o_custkey"],
        [F.asc("o_orderdate"), F.asc("o_orderkey")],
        F.col("o_totalprice").cast("decimal(28,6)"),
    )
    return out.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.round("running_total", 2).cast("double").alias("running_total"),
    )


@query(
    "rank_orders_per_customer",
    """
    SELECT o_orderkey, o_custkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
    """,
    doc="ranking window — chunk i-of-N bookkeeping shape",
    survey="§2.7 ranking window (data_file_chunk.py:33-36)",
)
def rank_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return orders.select(
        "o_orderkey", "o_custkey", "o_totalprice", F.row_number().over(w).alias("rn")
    )


# --------------------------------------------------------------------------
# Chunk model on documents (P1/P6/A1/R4 in relational form)
# --------------------------------------------------------------------------

CHUNK_CHARS = 64

# DuckDB's generate_series only takes constant parameters (no lateral
# column refs), so cross-join a constant-bound series and filter.
_MAX_CHUNKS = 64

_CHUNK_CTE = f"""
    WITH chunks AS (
      SELECT doc_id,
             g.i AS chunk_i,
             CAST(ceil(length(text) / {CHUNK_CHARS}.0) AS BIGINT) AS n_total_chunks,
             (g.i - 1) * {CHUNK_CHARS} AS chunk_offset_write,
             substr(text, CAST((g.i - 1) * {CHUNK_CHARS} + 1 AS INT), {CHUNK_CHARS}) AS chunk_data
      FROM documents CROSS JOIN generate_series(1, {_MAX_CHUNKS}) g(i)
      WHERE g.i <= CAST(ceil(length(text) / {CHUNK_CHARS}.0) AS BIGINT)
    )
"""


def _doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-typed twin of the binary chunker (operators/chunking.py) so
    the oracle can reproduce it with substr()."""
    docs = load(spark, sf_dir, "documents")
    n = F.ceil(F.length("text") / F.lit(float(CHUNK_CHARS))).cast("long")
    return (
        docs.withColumn("n_total_chunks", n)
        .select(
            "doc_id",
            "n_total_chunks",
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("n_total_chunks"))).alias(
                "chunk_i"
            ),
            F.col("text"),
        )
        .select(
            "doc_id",
            "chunk_i",
            "n_total_chunks",
            ((F.col("chunk_i") - 1) * CHUNK_CHARS).alias("chunk_offset_write"),
            F.expr(
                f"substring(text, CAST((chunk_i-1)*{CHUNK_CHARS}+1 AS INT), {CHUNK_CHARS})"
            ).alias("chunk_data"),
        )
    )


@query(
    "p1_chunk_documents",
    _CHUNK_CTE
    + """
    SELECT doc_id, chunk_i, n_total_chunks, chunk_offset_write,
           md5(chunk_data) AS chunk_hash
    FROM chunks
    """,
    doc="file chunker in relational form: explode + substring + hash",
    survey="P1 (upload_data_file.py:230-304)",
)
def p1_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _doc_chunks(spark, sf_dir).select(
        "doc_id",
        "chunk_i",
        "n_total_chunks",
        "chunk_offset_write",
        F.md5("chunk_data").alias("chunk_hash"),
    )


@query(
    "p6_msg_keys",
    _CHUNK_CTE
    + f"""
    SELECT doc_id, chunk_i,
           'docs_doc' || CAST(doc_id AS VARCHAR) || '_chunk_' || CAST(chunk_i AS VARCHAR)
             || '_of_' || CAST(n_total_chunks AS VARCHAR) AS msg_key
    FROM chunks
    """,
    doc="message-key builder over chunk rows",
    survey="P6 (data_file_chunk.py:102-107)",
)
def p6_msg_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.keys import msg_key

    chunks = _doc_chunks(spark, sf_dir).withColumn(
        "filename", F.concat(F.lit("doc"), F.col("doc_id").cast("string"))
    ).withColumn("subdir_str", F.lit("docs"))
    return chunks.select("doc_id", "chunk_i", msg_key().alias("msg_key"))


@query(
    "a1_reassemble_documents",
    _CHUNK_CTE
    + """
    , asm AS (
      SELECT doc_id, string_agg(chunk_data, '' ORDER BY chunk_offset_write) AS body,
             count(*) AS n_chunks_received
      FROM chunks GROUP BY doc_id
    )
    SELECT a.doc_id, a.n_chunks_received, (md5(a.body) = md5(d.text)) AS ok
    FROM asm a JOIN documents d USING (doc_id)
    """,
    doc="batch reassembly + integrity verification",
    survey="A1/A3 (download_data_file.py:76-156)",
)
def a1_reassemble_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    chunks = _doc_chunks(spark, sf_dir)
    asm = (
        chunks.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks_received"),
            F.array_sort(
                F.collect_list(F.struct("chunk_offset_write", "chunk_data"))
            ).alias("_parts"),
        )
        .withColumn(
            # array_join flattens in one linear pass (F.aggregate+concat
            # would copy the accumulated prefix per chunk — O(n²) bytes)
            "body",
            F.array_join(
                F.transform("_parts", lambda p: p.getField("chunk_data")), ""
            ),
        )
    )
    return asm.join(docs, "doc_id").select(
        "doc_id",
        "n_chunks_received",
        (F.md5("body") == F.md5("text")).alias("ok"),
    )


@query(
    "r4_chunk_ledger",
    _CHUNK_CTE
    + """
    , marked AS (
      SELECT *,
             (instr('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR) || '_' || CAST(chunk_i AS VARCHAR)), 1, 1))
              <= 12) AS delivered
      FROM chunks
    )
    SELECT doc_id AS rel_filepath,
           max(n_total_chunks) AS n_chunks,
           CAST(sum(CASE WHEN delivered THEN 1 ELSE 0 END) AS BIGINT) AS n_chunks_delivered,
           CAST(sum(CASE WHEN delivered THEN 0 ELSE 1 END) AS BIGINT) AS n_chunks_to_send,
           string_agg(CASE WHEN NOT delivered THEN CAST(chunk_i AS VARCHAR) END, ',' ORDER BY chunk_i) AS chunks_to_send,
           CASE WHEN sum(CASE WHEN delivered THEN 0 ELSE 1 END) = 0
                THEN 'completed' ELSE 'in_progress' END AS status
    FROM marked GROUP BY doc_id
    """,
    doc="producer chunk ledger: delivered/to-send bookkeeping + completion",
    survey="R4 (producer_file_registry.py:169-289)",
)
def r4_chunk_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunks = _doc_chunks(spark, sf_dir)
    marked = chunks.withColumn(
        "delivered",
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit("_"),
                        F.col("chunk_i").cast("string"),
                    )
                ),
                1,
                1,
            ),
        )
        <= 12,
    )
    return (
        marked.groupBy(F.col("doc_id").alias("rel_filepath"))
        .agg(
            F.max("n_total_chunks").alias("n_chunks"),
            F.sum(F.when(F.col("delivered"), 1).otherwise(0)).cast("long").alias(
                "n_chunks_delivered"
            ),
            F.sum(F.when(F.col("delivered"), 0).otherwise(1)).cast("long").alias(
                "n_chunks_to_send"
            ),
            F.array_join(
                F.array_sort(
                    F.collect_list(
                        F.when(~F.col("delivered"), F.col("chunk_i"))
                    )
                ).cast("array<string>"),
                ",",
            ).alias("chunks_to_send"),
        )
        .withColumn(
            "status",
            F.when(F.col("n_chunks_to_send") == 0, "completed").otherwise("in_progress"),
        )
        .withColumn(
            "chunks_to_send",
            F.when(F.col("chunks_to_send") == "", None).otherwise(
                F.col("chunks_to_send")
            ),
        )
    )


@query(
    "r7_incomplete_files",
    _CHUNK_CTE
    + """
    , marked AS (
      SELECT *,
             (instr('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR) || '_' || CAST(chunk_i AS VARCHAR)), 1, 1))
              <= 12) AS delivered
      FROM chunks
    )
    SELECT doc_id AS rel_filepath,
           CAST(sum(CASE WHEN delivered THEN 0 ELSE 1 END) AS BIGINT) AS n_chunks_to_send
    FROM marked GROUP BY doc_id
    HAVING sum(CASE WHEN delivered THEN 0 ELSE 1 END) > 0
    """,
    doc="incomplete-files scan over the ledger",
    survey="R7 (producer_file_registry.py:140-150)",
)
def r7_incomplete_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    ledger = r4_chunk_ledger(spark, sf_dir)
    return ledger.filter(F.col("n_chunks_to_send") > 0).select(
        "rel_filepath", "n_chunks_to_send"
    )


# --------------------------------------------------------------------------
# LLM-pipeline extensions (driver north star)
# --------------------------------------------------------------------------

_NORM = "lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))"
_TOKS = "string_split_regex(lower(trim(text)), '\\s+')"


@query(
    "dedup_exact_docs",
    f"""
    SELECT md5({_NORM}) AS content_hash,
           min(doc_id) AS representative_id,
           count(*) AS n_duplicates
    FROM documents GROUP BY 1
    """,
    doc="exact dedup by content hash",
    survey="LLM dedup; generalizes F4 content addressing",
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(load(spark, sf_dir, "documents"))


_SHINGLE_CTE = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS ws FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(CASE WHEN len(ws) >= 3
                      THEN [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, len(ws)-1)]
                      ELSE [] END) AS shingle
        FROM toks) t
    )
"""


@query(
    "ngram_jaccard_pairs",
    _SHINGLE_CTE
    + """
    , sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(n_common / (sa.n_sh + sb.n_sh - n_common), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 4) >= 0.12
    """,
    doc="n-gram Jaccard near-dup pairs via shared-shingle join",
    survey="LLM near-dup",
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = word_shingles(load(spark, sf_dir, "documents"), n=3)
    # explicit hot-shingle cap: the scale-safe form (library default is
    # exact/uncapped); no shingle in the driver corpora approaches the
    # cap, so the exact oracle above still hash-matches
    from .llm.dedup import DEFAULT_MAX_SHINGLE_DF

    return jaccard_pairs(sh, threshold=0.12, max_shingle_df=DEFAULT_MAX_SHINGLE_DF)


# The full MinHash-LSH pair pipeline as oracle SQL (shingle → 8-hash
# signatures → 2-row bands → bucket-join candidates → exact Jaccard on
# candidates), ending with lsh_scored(id_a, id_b, jaccard). An EXACT
# SQL mirror of minhash_lsh_dedup — no recall assumption between Spark
# and oracle. Shared by minhash_lsh_pairs and queries_curation's
# dedup_keep_canonical_lsh so the pipeline definition exists once.
LSH_SCORED_CTE = _SHINGLE_CTE + """
    , sig AS (
      SELECT doc_id, g.h,
             min(md5(CAST(g.h AS VARCHAR) || '|' || shingle)) AS minhash
      FROM sh, generate_series(0, 7) g(h)
      GROUP BY doc_id, g.h
    ),
    bands AS (
      SELECT doc_id, CAST(floor(h / 2) AS INT) AS band,
             md5(string_agg(minhash, ',' ORDER BY h)) AS band_sig
      FROM sig GROUP BY 1, 2
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS n_common
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.id_a
      JOIN sh sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
      GROUP BY 1, 2
    ),
    lsh_scored AS (
      SELECT id_a, id_b,
             round(n_common / (sa.n_sh + sb.n_sh - n_common), 4) AS jaccard
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
    )
"""


@query(
    "minhash_lsh_pairs",
    LSH_SCORED_CTE
    + "SELECT id_a, id_b, jaccard FROM lsh_scored WHERE jaccard >= 0.1",
    doc="MinHash+LSH near-dup: shingle→minhash→band→bucket-join→verify",
    survey="LLM near-dup at scale",
)
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_dedup(
        load(spark, sf_dir, "documents"),
        n=3,
        num_hashes=8,
        rows_per_band=2,
        threshold=0.1,
    )


# 32-bit SimHash as a reusable oracle CTE (ends with sh32(doc_id,
# simhash)) — shared by simhash_docs and the banded-pairs query in
# queries_curation.py so the fingerprint definition exists once.
SIMHASH32_CTE = f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS}) AS token FROM documents
    ),
    tc AS (
      SELECT doc_id, token, count(*) AS cnt, md5(token) AS th
      FROM tok WHERE token <> '' GROUP BY 1, 2
    ),
    votes AS (
      SELECT doc_id, g.j,
             sum(cnt * (2 * (CAST(floor((instr('0123456789abcdef',
                         substr(th, CAST(floor(g.j / 4) AS INT) + 1, 1)) - 1)
                         / pow(2, g.j % 4)) AS BIGINT) % 2) - 1)) AS vote
      FROM tc, generate_series(0, 31) g(j)
      GROUP BY 1, 2
    ),
    sh32 AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN vote > 0 THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
      FROM votes GROUP BY doc_id
    )
"""


@query(
    "simhash_docs",
    SIMHASH32_CTE + "SELECT doc_id, simhash FROM sh32",
    doc="32-bit frequency-weighted SimHash fingerprint",
    survey="LLM near-dup fingerprinting",
)
def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash(load(spark, sf_dir, "documents"), bits=32)


_EMB_QUERY_IDS = [0, 1, 2, 3, 4]

_EMB_CTE = """
    WITH emb AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    normed AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM emb
    )
"""


@query(
    "cosine_topk_bruteforce",
    _EMB_CTE
    + """
    , scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 4) AS cosine
      FROM normed q JOIN normed c ON c.vec_id <> q.vec_id
      WHERE q.vec_id IN (0, 1, 2, 3, 4)
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored) t
    WHERE rank <= 10
    """,
    doc="exact cosine top-k (broadcast queries over corpus scan)",
    survey="LLM similarity search baseline",
)
def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_topk(load(spark, sf_dir, "embeddings"), _EMB_QUERY_IDS, k=10)


@query(
    "cosine_topk_lsh",
    _EMB_CTE
    + """
    , bucketed AS (
      SELECT vec_id, v, nrm,
             (CASE WHEN v[1] > 0 THEN 1 ELSE 0 END)
           + (CASE WHEN v[2] > 0 THEN 2 ELSE 0 END)
           + (CASE WHEN v[3] > 0 THEN 4 ELSE 0 END)
           + (CASE WHEN v[4] > 0 THEN 8 ELSE 0 END) AS bucket
      FROM normed
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 4) AS cosine
      FROM bucketed q JOIN bucketed c ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
      WHERE q.vec_id IN (0, 1, 2, 3, 4)
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored) t
    WHERE rank <= 5
    """,
    doc="LSH-bucketed approximate cosine top-k (scale path)",
    survey="LLM similarity search at scale",
)
def cosine_topk_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_topk_lsh(
        load(spark, sf_dir, "embeddings"), _EMB_QUERY_IDS, k=5, n_bits=4
    )


@query(
    "text_stats_docs",
    f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct({_TOKS})) AS BIGINT) AS n_distinct_tokens,
           round(list_sum(list_transform({_TOKS}, w -> length(w))) * 1.0
                 / len({_TOKS}), 4) AS mean_token_len,
           round(len(list_distinct({_TOKS})) * 1.0 / len({_TOKS}), 4) AS distinct_ratio,
           CAST(length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS BIGINT) AS n_punct
    FROM documents
    """,
    doc="quality-filter features: token counts, ratios, punct density",
    survey="LLM text analysis",
)
def text_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = text_stats(load(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_distinct_tokens").cast("long").alias("n_distinct_tokens"),
        "mean_token_len",
        "distinct_ratio",
        F.col("n_punct").cast("long").alias("n_punct"),
    )


@query(
    "language_id_docs",
    f"""
    SELECT doc_id,
           round(len(list_filter({_TOKS},
                 t -> t IN ('the','a','of','and','to','in','is','it'))) * 1.0
                 / len({_TOKS}), 4) AS stopword_ratio,
           CASE WHEN round(len(list_filter({_TOKS},
                 t -> t IN ('the','a','of','and','to','in','is','it'))) * 1.0
                 / len({_TOKS}), 4) >= 0.05
                THEN 'en' ELSE 'other' END AS predicted_lang
    FROM documents
    """,
    doc="stopword-ratio language heuristic",
    survey="LLM text analysis",
)
def language_id_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return language_id(load(spark, sf_dir, "documents"))


@query(
    "quality_filter_docs",
    f"""
    WITH s AS (
      SELECT doc_id,
             CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
             round(list_sum(list_transform({_TOKS}, w -> length(w))) * 1.0
                   / len({_TOKS}), 4) AS mean_token_len,
             round(len(list_distinct({_TOKS})) * 1.0 / len({_TOKS}), 4) AS distinct_ratio,
             length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS n_punct,
             length(text) AS n_chars
      FROM documents)
    SELECT doc_id, n_tokens,
           (n_tokens >= 20) AS ok_len,
           (mean_token_len BETWEEN 3.0 AND 12.0) AS ok_token_len,
           (distinct_ratio >= 0.3) AS ok_diversity,
           (n_punct * 1.0 / n_chars <= 0.2) AS ok_punct,
           ((n_tokens >= 20) AND (mean_token_len BETWEEN 3.0 AND 12.0)
            AND (distinct_ratio >= 0.3) AND (n_punct * 1.0 / n_chars <= 0.2)) AS keep
    FROM s
    """,
    doc="composite keep/drop quality filter with per-rule verdicts",
    survey="LLM text analysis: quality filtering (C4/Gopher-style rules)",
)
def quality_filter_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm.textstats import quality_filter

    return quality_filter(load(spark, sf_dir, "documents"))


@query(
    "doc_fingerprints",
    f"""
    WITH n AS (SELECT doc_id, {_NORM} AS norm FROM documents)
    SELECT doc_id, md5(norm) AS content_fp,
           list_min(CASE WHEN length(norm) >= 8
                    THEN [md5(substr(norm, i, 8)) for i in range(1, length(norm)-6)]
                    ELSE [md5(norm)] END) AS kgram_fp
    FROM n
    """,
    doc="content + winnowing k-gram fingerprints",
    survey="LLM document fingerprinting",
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_fingerprint(load(spark, sf_dir, "documents"))


# Extension modules register additional queries into QUERIES via the
# same @query decorator (imported at the bottom so the decorator and
# helpers above are defined first).
from . import queries_tpch  # noqa: E402,F401  isort: skip
from . import queries_ops  # noqa: E402,F401  isort: skip
from . import queries_llm  # noqa: E402,F401  isort: skip
from . import queries_analytics  # noqa: E402,F401  isort: skip
from . import queries_curation  # noqa: E402,F401  isort: skip

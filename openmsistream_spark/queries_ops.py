"""Batch-queryable forms of the remaining SURVEY §2 operators.

Each reference operator that is not already covered by ``queries.py``
gets a relational twin here so the DuckDB oracle can validate its
semantics (the streaming forms live in ``streaming/`` and are covered
by ``tests/test_streaming.py``):

  S2  debounce/lag filter        (upload_directory_event_handler.py:55-70)
  S3  upload path predicate      (upload_directory_event_handler.py:81-117)
  P2  byte-range selection       (upload_data_file.py:236-292)
  P5  compound serde chain       (serialization.py:16-160)
  P8  per-file parse/cast        (examples/creating_plots/xrd_csv_plotter.py:22-60)
  A2  generation adoption argmax (download_data_file.py:160-272)
  A3  completion status codes    (data_file_io/config.py:1-16)
  R1  keyed registry lookup      (utilities/dataclass_table.py:159-195)
  R5  shard compaction           (producer_file_registry.py:80-138,291-326)
  R8  resume-from-registry       (data_file_upload_directory.py:522-572)
  K6  dead-letter split          (data_file_download_directory.py:104-136)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _CHUNK_CTE, _doc_chunks, davg, load, query
from .queries import r4_chunk_ledger


@query(
    "s2_debounce_static_files",
    """
    SELECT event_id, ts, event_type FROM {EV}
    WHERE ts <= (SELECT max(ts) FROM {EV}) - INTERVAL 24 HOUR
      AND event_type = 'click'
    """,
    doc="debounce: only records static >= lag before the stream head",
    survey="S2 (upload_directory_event_handler.py:55-70)",
)
def s2_debounce_static_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    head = ev.agg(F.max("ts").alias("_head"))
    return (
        ev.filter(F.col("event_type") == "click")
        .crossJoin(F.broadcast(head))
        .filter(F.col("ts") <= F.expr("_head - INTERVAL 24 HOUR"))
        .select("event_id", "ts", "event_type")
    )


@query(
    "s3_upload_path_predicate",
    r"""
    SELECT doc_id, source FROM documents
    WHERE regexp_matches(source, '^src[0-9]$')
      AND NOT regexp_matches(source, '^\.')
      AND NOT regexp_matches(source, 'LOGS')
    """,
    doc="upload path predicate: regex + not-dotfile + not-LOGS",
    survey="S3/F2 (upload_directory_event_handler.py:81-117)",
)
def s3_upload_path_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.filter(
        F.col("source").rlike("^src[0-9]$")
        & ~F.col("source").rlike(r"^\.")
        & ~F.col("source").rlike("LOGS")
    ).select("doc_id", "source")


@query(
    "p2_byte_range_select",
    """
    SELECT doc_id,
           CAST(length(substr(text, 1, 100) || substr(text, 201, 100)) AS BIGINT) AS n_selected,
           md5(substr(text, 1, 100) || substr(text, 201, 100)) AS selected_hash
    FROM documents
    """,
    doc="select_bytes: read only declared (start,stop) ranges of each file",
    survey="P2 (upload_data_file.py:236-292)",
)
def p2_byte_range_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    ranges = [(0, 100), (200, 300)]  # [(start, stop)) byte ranges, reference-style
    selected = F.concat(
        *[F.substring("text", start + 1, stop - start) for start, stop in ranges]
    )
    return docs.select(
        "doc_id",
        F.length(selected).cast("long").alias("n_selected"),
        F.md5(selected).alias("selected_hash"),
    )


@query(
    "p5_serde_chain",
    """
    SELECT doc_id, md5(reverse(upper(text))) AS digest FROM documents
    """,
    doc="compound serde chain: f3(f2(f1(col))) column composition",
    survey="P5 (serialization.py:16-160)",
)
def p5_serde_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.md5(F.reverse(F.upper(F.col("text")))).alias("digest")
    )


@query(
    "p8_parse_split_cast",
    """
    SELECT CAST(split_part(o_orderpriority, '-', 1) AS BIGINT) AS prio_num,
           split_part(o_orderpriority, '-', 2) AS prio_label,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) / count(*), 4)
             AS avg_price,
           count(*) AS n
    FROM orders GROUP BY 1, 2
    """,
    doc="per-file parse: split delimited field, cast numeric, aggregate",
    survey="P8 (examples/creating_plots/xrd_csv_plotter.py:22-60)",
)
def p8_parse_split_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.select(
            F.split_part(F.col("o_orderpriority"), F.lit("-"), F.lit(1))
            .cast("long")
            .alias("prio_num"),
            F.split_part(F.col("o_orderpriority"), F.lit("-"), F.lit(2)).alias(
                "prio_label"
            ),
            "o_totalprice",
        )
        .groupBy("prio_num", "prio_label")
        .agg(davg(F.col("o_totalprice")).alias("avg_price"), F.count("*").alias("n"))
    )


@query(
    "a2_generation_adoption",
    """
    SELECT user_id, event_id AS adopted_event, value AS gen_value, ts AS gen_ts FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY value DESC, ts DESC, event_id DESC) AS rn
      FROM {EV}) t
    WHERE rn = 1
    """,
    doc="generation adoption: argmax by (count, mtime) tuple per key via max_by",
    survey="A2 (download_data_file.py:160-272)",
)
def a2_generation_adoption(spark: SparkSession, sf_dir: str) -> DataFrame:
    # max_by with a struct order key is a single map-side-combinable agg —
    # no window shuffle-and-sort; this is the scale path for A2's
    # (n_total_chunks, mtime) adoption rule.
    ev = load(spark, sf_dir, "events")
    order_key = F.struct("value", "ts", "event_id")
    return ev.groupBy("user_id").agg(
        F.max_by("event_id", order_key).alias("adopted_event"),
        F.max_by("value", order_key).alias("gen_value"),
        F.max_by("ts", order_key).alias("gen_ts"),
    )


@query(
    "a3_status_codes",
    _CHUNK_CTE
    + """
    , led AS (
      SELECT doc_id, max(n_total_chunks) AS n_total,
             count(DISTINCT chunk_offset_write) AS n_received
      FROM chunks
      WHERE NOT (doc_id % 7 = 0 AND chunk_i = n_total_chunks)  -- drop last chunk of every 7th doc
      GROUP BY doc_id
    )
    SELECT CASE WHEN n_received < n_total THEN 'IN_PROGRESS'
                WHEN doc_id % 97 = 0 THEN 'HASH_MISMATCH'
                ELSE 'SUCCESSFULLY_RECONSTRUCTED' END AS code,
           count(*) AS n
    FROM led GROUP BY 1
    """,
    doc="completion detection + hash-check status codes",
    survey="A3 (download_data_file.py:149-156; data_file_io/config.py:1-16)",
)
def a3_status_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunks = _doc_chunks(spark, sf_dir).filter(
        ~((F.col("doc_id") % 7 == 0) & (F.col("chunk_i") == F.col("n_total_chunks")))
    )
    led = chunks.groupBy("doc_id").agg(
        F.max("n_total_chunks").alias("n_total"),
        F.countDistinct("chunk_offset_write").alias("n_received"),
    )
    code = (
        F.when(F.col("n_received") < F.col("n_total"), "IN_PROGRESS")
        .when(F.col("doc_id") % 97 == 0, "HASH_MISMATCH")
        .otherwise("SUCCESSFULLY_RECONSTRUCTED")
    )
    return led.select(code.alias("code")).groupBy("code").agg(
        F.count("*").alias("n")
    )


@query(
    "r1_keyed_lookup",
    """
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name IN ('NATION_3', 'NATION_7')
    """,
    doc="keyed registry lookup: broadcast index-scan join on a small table",
    survey="R1 (utilities/dataclass_table.py:159-195)",
)
def r1_keyed_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    return supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", "s_name", "n_name")


@query(
    "r5_shard_compaction",
    _CHUNK_CTE
    + """
    , shard_a AS (SELECT doc_id, chunk_i, n_total_chunks FROM chunks
                  WHERE chunk_i <= CAST(ceil(n_total_chunks / 2.0) AS BIGINT)),
    shard_b AS (SELECT doc_id, chunk_i, n_total_chunks FROM chunks
                WHERE chunk_i >= CAST(floor(n_total_chunks / 2.0) AS BIGINT)),
    merged AS (SELECT DISTINCT doc_id, chunk_i, n_total_chunks
               FROM (SELECT * FROM shard_a UNION ALL SELECT * FROM shard_b))
    SELECT doc_id, count(*) AS n_after_compaction,
           (count(*) = max(n_total_chunks)) AS complete
    FROM merged GROUP BY doc_id
    """,
    doc="shard compaction: overlapping shard union -> dedup -> verify all rows kept",
    survey="R5 (producer_file_registry.py:80-138,291-326)",
)
def r5_shard_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunks = _doc_chunks(spark, sf_dir).select("doc_id", "chunk_i", "n_total_chunks")
    half_up = F.ceil(F.col("n_total_chunks") / 2.0).cast("long")
    half_dn = F.floor(F.col("n_total_chunks") / 2.0).cast("long")
    shard_a = chunks.filter(F.col("chunk_i") <= half_up)
    shard_b = chunks.filter(F.col("chunk_i") >= half_dn)
    merged = shard_a.unionAll(shard_b).dropDuplicates(["doc_id", "chunk_i"])
    return merged.groupBy("doc_id").agg(
        F.count("*").alias("n_after_compaction"),
        (F.count("*") == F.max("n_total_chunks")).alias("complete"),
    )


@query(
    "r8_resume_set",
    _CHUNK_CTE
    + """
    , marked AS (
      SELECT *,
             (instr('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR) || '_' || CAST(chunk_i AS VARCHAR)), 1, 1))
              <= 12) AS delivered
      FROM chunks
    ),
    ledger AS (
      SELECT doc_id AS rel_filepath,
             CAST(sum(CASE WHEN delivered THEN 0 ELSE 1 END) AS BIGINT) AS n_chunks_to_send
      FROM marked GROUP BY doc_id
    )
    SELECT l.rel_filepath, l.n_chunks_to_send, d.n_chars
    FROM ledger l JOIN documents d ON d.doc_id = l.rel_filepath
    WHERE l.n_chunks_to_send > 0
    """,
    doc="resume-from-registry: re-enqueue set = in-progress ledger semi-joined to files",
    survey="R8 (data_file_upload_directory.py:522-572)",
)
def r8_resume_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    ledger = r4_chunk_ledger(spark, sf_dir)
    docs = load(spark, sf_dir, "documents")
    return (
        ledger.filter(F.col("n_chunks_to_send") > 0)
        .join(docs, ledger.rel_filepath == docs.doc_id)
        .select("rel_filepath", "n_chunks_to_send", "n_chars")
    )


@query(
    "wire_roundtrip_docs",
    """
    SELECT 'SUCCESSFULLY_RECONSTRUCTED' AS status,
           count(*) AS n_files,
           CAST(sum(CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT)) AS BIGINT)
             AS n_chunks
    FROM documents
    """,
    doc="full wire path: chunk → msgpack serialize → deserialize+verify → assemble",
    survey="P1+P3+P4+A1 end-to-end (the reference's E2E round trip, "
    "test_data_file_directories.py:230)",
)
def wire_roundtrip_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.serde import deserialize_chunks, dlq_split, serialize_chunks
    from .operators.assembly import assemble_files
    from .operators.chunking import chunk_binary_column

    docs = load(spark, sf_dir, "documents")
    files = docs.select(
        F.col("doc_id").cast("string").alias("filename"),
        F.lit("").alias("subdir_str"),
        F.lit("").alias("filename_append"),
        F.lit(None).cast("double").alias("file_mtime"),
        F.encode("text", "UTF-8").alias("content"),
    )
    chunks = chunk_binary_column(
        files,
        content="content",
        chunk_size=64,
        keep=["filename", "subdir_str", "filename_append", "file_mtime"],
    )
    wire = serialize_chunks(chunks).select("value")
    decoded = deserialize_chunks(wire)
    good, _dlq = dlq_split(decoded)
    # single generation by construction — skip the generation policy, and
    # use the one-pass window strategy so the corruption check never
    # re-executes the serde UDF subtree (the join strategy's metadata
    # branch rescans the source, which here is Python serde)
    assembled = assemble_files(
        good.withColumn("rel_path", F.col("filename")),
        apply_generation_policy=False,
        generation_strategy="window",
    )
    return assembled.groupBy("status").agg(
        F.count("*").alias("n_files"),
        F.sum("n_total_chunks").cast("long").alias("n_chunks"),
    )


@query(
    "salted_skew_aggregate",
    """
    SELECT event_type, count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(28,6))), 2) AS DOUBLE) AS total
    FROM {EV} GROUP BY event_type
    """,
    doc="skewed-key aggregate via two-stage salting (result ≡ plain groupBy)",
    survey="§4 skew handling; A6 at scale (5 distinct keys over the whole table)",
)
def salted_skew_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import salted_counts_sums

    ev = load(spark, sf_dir, "events")
    out = salted_counts_sums(
        ev, ["event_type"], value=F.col("value").cast("decimal(28,6)"), n_salts=32
    )
    return out.select(
        "event_type", "n", F.round("total", 2).cast("double").alias("total")
    )


@query(
    "salted_join_order_revenue",
    """
    SELECT c.c_mktsegment,
           count(*) AS n_orders,
           CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(28,6))), 2) AS DOUBLE) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="skew-resistant salted equi join (result ≡ plain join)",
    survey="§4 skew handling for joins (AQE-less path, e.g. streaming)",
)
def salted_join_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import salted_join
    from .queries import dsum

    orders = load(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "c_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(orders, cust, on="c_custkey", n_salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("revenue"),
    )


@query(
    "k6_dead_letter_split",
    """
    SELECT CASE WHEN json_extract_string(props, '$.k') IS NULL OR event_type = 'error'
                THEN 'dlq' ELSE 'main' END AS route,
           count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(28,6))), 2) AS DOUBLE) AS total_value
    FROM {EV} GROUP BY 1
    """,
    doc="dead-letter split: undecodable records routed to DLQ, rest to main",
    survey="K6 (data_file_download_directory.py:104-136)",
)
def k6_dead_letter_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .queries import dsum

    ev = load(spark, sf_dir, "events")
    route = F.when(
        F.get_json_object("props", "$.k").isNull() | (F.col("event_type") == "error"),
        "dlq",
    ).otherwise("main")
    return ev.groupBy(route.alias("route")).agg(
        F.count("*").alias("n"), dsum(F.col("value")).alias("total_value")
    )

"""Round-6 catalog additions, registered OUT-OF-BAND.

Unlike the other ``queries_*`` modules, this one is NOT imported from
``queries.py``: the driver's staleness detection hashes each query's
source-file closure, and an import edge added to ``queries.py`` would
mark every already-verified catalog entry stale in the same round this
module lands (the capped per-round sweep would then starve re-verifying
them). Instead the catalog entry points that enumerate queries —
``__spark_entry__.py``, ``bench.py``, ``tests/conftest.py`` — import
this module directly; registration lands in the shared ``QUERIES`` dict
either way.

Content — capability additions past round 5's sweep of the SURVEY §2 +
LLM-pipeline surface, each oracle-paired:

- ``gapfill_locf_user_hours``: hypertable-style hourly gap-fill + LOCF
  over ``events``;
- ``unigram_surprisal_quality``: CCNet-style unigram-LM perplexity-proxy
  document scoring;
- ``pack_training_sequences`` / ``token_window_chunks``: sample packing
  with document span maps; overlapping token windows for RAG indexing;
- ``tfidf_cosine_pairs``: sparse text cosine via shared-term join;
- ``bm25_topk_keywords`` / ``bm25_topk_per_query``: Okapi BM25 lexical
  retrieval — single query and whole-query-table forms;
- ``containment_pairs_docs``: asymmetric shingle containment
  (excerpt/quote detection);
- ``hybrid_rrf_topk``: reciprocal-rank fusion of the BM25 and
  embedding-cosine arms;
- ``funnel_view_click_purchase`` / ``cohort_retention_weekly`` /
  ``event_transition_counts``: ordered funnels, weekly retention
  matrices, and first-order transition counts (operators/funnels.py);
- ``sliding_window_event_counts``: overlapping 1 h/30 min windows — the
  sliding twin of ``hourly_event_counts``;
- ``zscore_anomaly_events`` / ``interarrival_stats_user`` /
  ``key_skew_profile``: operational analytics — per-key anomaly scan
  (decimal-exact moments; streaming twin in streaming/anomaly.py),
  inter-event cadence profiles, and the shuffle-key skew diagnostic
  that decides where salting/AQE skew handling pays;
- ``ensemble_neardup_pairs``: MinHash-LSH x banded-SimHash intersection
  — the high-precision near-dup verdict for destructive dedup;
- ``token_collocation_lift``: capped-vocabulary co-occurrence lift
  (collocation / association mining over the corpus).

Reference parity note: the reference (openmsistream) has no analytics
surface of its own — these extend the engine's curation/analytics layer
the same way queries_analytics.py / queries_llm.py do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _SHINGLE_CTE, load, query


@query(
    "gapfill_locf_user_hours",
    """
    WITH ev AS (
      SELECT * FROM {EV} WHERE ts < TIMESTAMP '2024-01-08 00:00:00'
    ),
    ranked AS (
      SELECT user_id, date_trunc('hour', ts) AS hour, value,
             row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn,
             count(*) OVER (PARTITION BY user_id, date_trunc('hour', ts))
               AS n_events
      FROM ev
    ),
    obs AS (
      SELECT user_id, hour, value AS value_obs, n_events
      FROM ranked WHERE rn = 1
    ),
    span AS (
      SELECT user_id, min(hour) AS mn, max(hour) AS mx FROM obs GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour
      FROM span
    )
    SELECT g.user_id, g.hour,
           last_value(o.value_obs IGNORE NULLS)
             OVER (PARTITION BY g.user_id ORDER BY g.hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS value_locf,
           COALESCE(o.n_events, 0) AS n_events,
           o.value_obs IS NULL AS is_gap
    FROM grid g
    LEFT JOIN obs o ON g.user_id = o.user_id AND g.hour = o.hour
    """,
    doc="hourly gap-fill + LOCF per user (hypertable time_bucket_gapfill/locf)",
    survey="custom op: time-series gap-fill — sequence() grid + ignorenulls last()",
)
def gapfill_locf_user_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize each user's event stream onto an hourly grid (first
    week of the data), carrying the last observed ``value`` forward
    through empty buckets — the resample-and-fill step in front of any
    window/trend analytics on irregular telemetry.

    Scale shape: one groupBy collapses raw events to (user, hour)
    buckets BEFORE any window runs (``max_by`` keeps the latest event's
    value per bucket — map-side combinable, no per-event window); the
    grid explode is output-bounded (|users| x |hours|, independent of
    raw event count); the LOCF window partitions by user, so state per
    task is one running value. No driver-side actions, no UDFs — the
    whole plan is whole-stage-codegen built-ins.
    """
    ev = load(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-08 00:00:00").cast("timestamp")
    )
    hour = F.date_trunc("hour", F.col("ts"))
    obs = ev.groupBy(F.col("user_id"), hour.alias("hour")).agg(
        # latest event in the bucket wins; (ts, event_id) is a total
        # order so the pick is deterministic (= the oracle's
        # ORDER BY ts DESC, event_id DESC row_number()=1)
        F.max_by("value", F.struct("ts", "event_id")).alias("value_obs"),
        F.count("*").alias("n_events"),
    )
    span = obs.groupBy("user_id").agg(
        F.min("hour").alias("mn"), F.max("hour").alias("mx")
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.join(obs, ["user_id", "hour"], "left").select(
        "user_id",
        "hour",
        F.last("value_obs", ignorenulls=True).over(w).alias("value_locf"),
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        F.col("value_obs").isNull().alias("is_gap"),
    )


@query(
    "unigram_surprisal_quality",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
      FROM documents
    ),
    t2 AS (SELECT * FROM toks WHERE token <> ''),
    vocab AS (SELECT token, count(*) AS cnt FROM t2 GROUP BY token),
    tot AS (SELECT sum(cnt) AS total FROM vocab),
    scored AS (
      SELECT token,
             round(-ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE)), 6)
               AS surprisal
      FROM vocab, tot
    )
    SELECT d.doc_id, d.source,
           count(*) AS n_tokens,
           round(CAST(sum(CAST(s.surprisal AS DECIMAL(28,6))) AS DOUBLE)
                 / count(*), 4) AS mean_surprisal
    FROM t2 JOIN scored s USING (token)
    JOIN documents d USING (doc_id)
    GROUP BY d.doc_id, d.source
    """,
    doc="unigram-LM mean surprisal per document (perplexity-proxy quality score)",
    survey="LLM extension: CCNet-style LM quality filter, pure column expressions",
)
def unigram_surprisal_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document by the mean surprisal (-ln p) of its tokens
    under the corpus's own unigram LM — the cheap stand-in for the
    KenLM-perplexity filter in CCNet/RefinedWeb curation: fluent text
    built from common tokens scores low, rare-token noise scores high.

    Scale shape: token counts are one map-side-combinable groupBy; the
    vocabulary is Zipf-bounded (orders of magnitude smaller than the
    corpus), so the per-token surprisal table broadcasts and the scoring
    join never shuffles the token stream. At a vocabulary too large to
    broadcast (multilingual 100 TB corpora), drop the explicit
    ``broadcast`` hint and let AQE pick the join side — the plan is
    otherwise unchanged. Engine-exactness: each token's surprisal is
    rounded to 6 dp BEFORE the decimal-accumulated per-doc sum, so
    cross-engine ln() ulp jitter and summation order cannot reach the
    compared digits.
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    vocab = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    tot = vocab.agg(F.sum("cnt").alias("total"))
    scored = vocab.crossJoin(F.broadcast(tot)).select(
        "token",
        F.round(
            -F.log(F.col("cnt").cast("double") / F.col("total").cast("double")), 6
        ).alias("surprisal"),
    )
    per_doc = (
        toks.join(F.broadcast(scored), "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.sum(F.col("surprisal").cast("decimal(28,6)")).cast("double")
                / F.count("*"),
                4,
            ).alias("mean_surprisal"),
        )
    )
    return docs.select("doc_id", "source").join(per_doc, "doc_id").select(
        "doc_id", "source", "n_tokens", "mean_surprisal"
    )


@query(
    "pack_training_sequences",
    """
    WITH d AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                             t -> t <> '')) AS n_tokens,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT
                  % 16 AS BIGINT) AS bucket
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens, bucket,
             sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM d WHERE n_tokens > 0
    )
    SELECT bucket, doc_id,
           unnest(generate_series(CAST((cum - n_tokens) // 256 AS BIGINT),
                                  CAST((cum - 1) // 256 AS BIGINT))) AS seq,
           CAST(cum - n_tokens AS BIGINT) AS tok_start,
           CAST(cum AS BIGINT) AS tok_end
    FROM c
    """,
    doc="sample packing: docs concatenated into fixed 256-token training "
    "sequences per hash bucket, emitting one (bucket, seq, doc) span row "
    "per sequence a document overlaps",
    survey="LLM extension: training-sequence packing with document spans",
)
def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack the corpus into fixed-length (256-token) training sequences —
    the sample-packing step that turns variable-length documents into
    the dense rectangular batches a trainer consumes — and emit the
    document→sequence span map (which sequences each document occupies,
    with its global token interval), i.e. the metadata an attention-mask
    builder or provenance audit needs.

    Scale shape: documents are hash-bucketed first (16 buckets here;
    thousands at 100 TB), so the running-token cumsum window
    parallelizes per bucket instead of forcing a single global sort —
    the same lever as ``shard_by_token_budget`` (llm/packing.py). The
    crossing-document explode emits ceil(n_tokens/seq_len) rows max per
    doc, output-bounded. Whole plan: one shuffle (the per-bucket window
    sort) + projection; no UDFs.
    """
    from openmsistream_spark.llm.packing import pack_sequences

    docs = load(spark, sf_dir, "documents")
    return pack_sequences(docs, seq_len=256, n_buckets=16)


@query(
    "token_window_chunks",
    """
    WITH d AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    n AS (
      SELECT doc_id, toks,
             CASE WHEN len(toks) <= 32 THEN CAST(1 AS BIGINT)
                  ELSE CAST(ceil((len(toks) - 32) / 24.0) AS BIGINT) + 1
             END AS n_chunks
      FROM d WHERE len(toks) > 0
    ),
    e AS (
      SELECT doc_id, toks,
             unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
      FROM n
    )
    SELECT doc_id, chunk_idx,
           array_to_string(
             toks[(chunk_idx * 24 + 1):(chunk_idx * 24 + 32)], ' '
           ) AS chunk_text
    FROM e
    """,
    doc="overlapping 32-token windows (stride 24) per document — the "
    "retrieval-indexing chunker in front of an embedding pipeline",
    survey="LLM extension: token-window chunking for embedding/RAG indexing",
)
def token_window_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split every document into overlapping 32-token windows with
    stride 24 (8-token overlap) — the chunking step in front of an
    embedding/retrieval indexer, where overlap preserves context across
    boundaries. Documents shorter than one window yield exactly one
    chunk; empty documents yield none.

    Scale shape: pure projection + explode (zero shuffles) — the chunk
    count is ceil((n-window)/stride)+1 per doc, so output scales with
    corpus token count; each row carries only its own window's text.
    ``slice`` on the pre-split token array keeps the whole thing in
    whole-stage codegen; chunk_text reuses what a downstream embedder
    would consume (P1's byte chunker is the binary twin of this,
    operators/chunking.py).
    """
    window, stride = 32, 24
    docs = load(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda t: t != ""
    )
    d = docs.select("doc_id", toks.alias("toks")).filter(F.size("toks") > 0)
    n_chunks = F.when(F.size("toks") <= window, F.lit(1).cast("bigint")).otherwise(
        F.ceil((F.size("toks") - window) / F.lit(float(stride))).cast("bigint") + 1
    )
    return (
        d.withColumn("n_chunks", n_chunks)
        .select(
            "doc_id",
            "toks",
            F.explode(
                F.sequence(F.lit(0).cast("bigint"), F.col("n_chunks") - 1)
            ).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.array_join(
                F.slice(
                    F.col("toks"),
                    (F.col("chunk_idx") * stride + 1).cast("int"),
                    window,
                ),
                " ",
            ).alias("chunk_text"),
        )
    )


@query(
    "tfidf_cosine_pairs",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
      FROM documents
    ),
    t2 AS (SELECT * FROM toks WHERE term <> ''),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM t2 GROUP BY doc_id, term),
    n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term
           HAVING count(*) <= 10000
              AND count(*) * 1000000 <= 100000 * (SELECT n FROM n)),
    w AS (
      SELECT doc_id, term,
             round(tf * (ln((n + 1.0) / (df + 1.0)) + 1), 6) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    ),
    nrm AS (
      SELECT doc_id,
             sqrt(CAST(sum(CAST(tfidf * tfidf AS DECIMAL(28,12))) AS DOUBLE))
               AS nrm
      FROM w GROUP BY doc_id
    ),
    dots AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(sum(CAST(a.tfidf * b.tfidf AS DECIMAL(28,12))) AS DOUBLE)
               AS dot
      FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           round(dot / (na.nrm * nb.nrm), 4) AS cosine
    FROM dots
    JOIN nrm na ON na.doc_id = id_a
    JOIN nrm nb ON nb.doc_id = id_b
    WHERE round(dot / (na.nrm * nb.nrm), 4) >= 0.75
    """,
    doc="TF-IDF sparse text cosine pairs (>= 0.75): shared-term join, "
    "absolute + relative (df/N <= 0.1) hot-term caps, decimal-exact "
    "norms/dots — the no-embedding similarity path",
    survey="LLM similarity: text-native TF-IDF cosine via sparse term join",
)
def tfidf_cosine_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog form of ``llm.tfidf.tfidf_cosine_pairs`` (see its
    docstring for the scale shape: pairs only through shared terms,
    ubiquitous near-zero-IDF terms excluded as the quadratic hotspot;
    all aggregation decimal-exact so the oracle matches bit-for-bit).

    Runs the library DEFAULTS — including the relative DF cap
    (``DEFAULT_MAX_DF_FRAC = 0.1``), which the oracle mirrors in the
    same ppm integer arithmetic. On the driver's deliberately dense
    synthetic corpus (~31-word vocabulary, most terms in ~78% of docs)
    the relative cap removes the ubiquitous terms, exactly as it would
    remove stop-words at corpus scale — without it the shared-term
    join degenerates to all-pairs (~5.5 min at sf0.1; the r6
    scale-trap). The uncapped arithmetic keeps its own rich oracle as
    ``tfidf_cosine_pairs_dense`` (queries_extras2), which stays out of
    bench HEADLINE."""
    from openmsistream_spark.llm.tfidf import tfidf_cosine_pairs

    docs = load(spark, sf_dir, "documents")
    return tfidf_cosine_pairs(docs, threshold=0.75)


@query(
    "bm25_topk_keywords",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                x -> x <> '')) AS term
      FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (
      SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl
    ),
    qt AS (SELECT unnest(['spark', 'vector', 'merge', 'window']) AS term),
    tf AS (
      SELECT t.doc_id, t.term, count(*) AS tf
      FROM toks t JOIN qt USING (term) GROUP BY 1, 2
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             round(ln(1 + (n - df + 0.5) / (df + 0.5)) *
                   (tf * 2.2) /
                   (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl)),
                   6) AS s
      FROM tf JOIN df USING (term) JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats
    ),
    agg AS (
      SELECT doc_id,
             CAST(round(sum(CAST(s AS DECIMAL(18,6))), 4) AS DOUBLE) AS bm25
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, bm25 FROM agg
    ORDER BY bm25 DESC, doc_id LIMIT 25
    """,
    doc="Okapi BM25 top-25 against a keyword query: token filter before "
    "any pair-sized work, broadcast df/corpus scalars, TakeOrdered "
    "top-k — lexical retrieval for topic mining / eval pools",
    survey="LLM retrieval: BM25 keyword ranking (llm/retrieval.py)",
)
def bm25_topk_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog form of ``llm.retrieval.bm25_topk`` (see its docstring
    for the scale shape: the only corpus-sized shuffle is the per-doc
    length aggregate; tf is computed on the query-term-filtered token
    stream; per-term scores round to 6 dp and sum as DECIMAL(18,6) so
    the oracle reproduces them exactly)."""
    from openmsistream_spark.llm.retrieval import bm25_topk

    docs = load(spark, sf_dir, "documents")
    return bm25_topk(docs, ["spark", "vector", "merge", "window"], k=25)


@query(
    "containment_pairs_docs",
    _SHINGLE_CTE
    + """
    , sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, round(n_common / sa.n_sh, 4) AS containment
    FROM inter JOIN sizes sa ON sa.doc_id = id_a
    WHERE round(n_common / sa.n_sh, 4) >= 0.8
    """,
    doc="Asymmetric shingle containment (>= 0.8, directional): catches "
    "excerpts/quotes inside larger documents that symmetric Jaccard "
    "scores low — shared-shingle equi-join, never all-pairs",
    survey="LLM dedup: directional containment (llm/containment.py)",
)
def containment_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog form of ``llm.containment.containment_pairs`` (exact at
    driver scale — the scale path passes ``max_shingle_df`` /
    ``hashed`` shingles; see the module docstring)."""
    from openmsistream_spark.llm.containment import containment_pairs

    docs = load(spark, sf_dir, "documents")
    return containment_pairs(docs, threshold=0.8)


@query(
    "bm25_topk_per_query",
    """
    WITH q(query_id, query_text) AS (
      VALUES (1, 'spark vector window'), (2, 'table scan filter'),
             (3, 'merge join batch')
    ),
    qt AS (
      SELECT DISTINCT query_id,
             unnest(list_filter(string_split_regex(lower(trim(query_text)),
                                                   '\\s+'),
                                x -> x <> '')) AS term
      FROM q
    ),
    toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                x -> x <> '')) AS term
      FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (
      SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl
    ),
    allt AS (SELECT DISTINCT term FROM qt),
    tf AS (
      SELECT t.doc_id, t.term, count(*) AS tf
      FROM toks t JOIN allt USING (term) GROUP BY 1, 2
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT qt.query_id, tf.doc_id,
             CAST(round(sum(CAST(round(
               ln(1 + (n - df + 0.5) / (df + 0.5)) *
               (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl)), 6)
               AS DECIMAL(18,6))), 4) AS DOUBLE) AS bm25
      FROM tf JOIN qt USING (term) JOIN df USING (term)
      JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT query_id, doc_id, bm25,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY bm25 DESC, doc_id) AS rank
      FROM scored
    )
    SELECT query_id, doc_id, bm25, rank FROM ranked WHERE rank <= 10
    """,
    doc="BM25 top-10 per query for a query TABLE (retrieval-eval "
    "candidate pools): one corpus token pass shared across queries, "
    "WindowGroupLimit bounds every per-query heap to k rows",
    survey="LLM retrieval: batch per-query BM25 (llm/retrieval.py)",
)
def bm25_topk_per_query_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog form of ``llm.retrieval.bm25_topk_per_query`` (see its
    docstring: q queries cost one corpus pass + a query-term-matched
    fanout, not q jobs; the per-query top-k is a row_number window the
    optimizer executes as WindowGroupLimit — per-task k-row heaps)."""
    from openmsistream_spark.llm.retrieval import bm25_topk_per_query

    docs = load(spark, sf_dir, "documents")
    qdf = spark.createDataFrame(
        [
            (1, "spark vector window"),
            (2, "table scan filter"),
            (3, "merge join batch"),
        ],
        "query_id long, query_text string",
    )
    return bm25_topk_per_query(docs, qdf, k=10)


@query(
    "hybrid_rrf_topk",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                x -> x <> '')) AS term
      FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (
      SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl
    ),
    qt AS (SELECT unnest(['spark', 'vector', 'merge', 'window']) AS term),
    tf AS (
      SELECT t.doc_id, t.term, count(*) AS tf
      FROM toks t JOIN qt USING (term) GROUP BY 1, 2
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    bscored AS (
      SELECT tf.doc_id,
             round(ln(1 + (n - df + 0.5) / (df + 0.5)) *
                   (tf * 2.2) /
                   (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl)),
                   6) AS s
      FROM tf JOIN df USING (term) JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats
    ),
    bm25 AS (
      SELECT doc_id,
             CAST(round(sum(CAST(s AS DECIMAL(18,6))), 4) AS DOUBLE) AS bm25
      FROM bscored GROUP BY doc_id
    ),
    lex AS (
      SELECT doc_id, rank FROM (
        SELECT doc_id,
               row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
        FROM bm25) t
      WHERE rank <= 50
    ),
    emb AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    normed AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM emb
    ),
    vec AS (
      SELECT doc_id, rank FROM (
        SELECT c.vec_id AS doc_id,
               row_number() OVER (
                 ORDER BY round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 4)
                            DESC,
                          c.vec_id) AS rank
        FROM normed q JOIN normed c ON c.vec_id <> q.vec_id
        WHERE q.vec_id = 10) t
      WHERE rank <= 50
    ),
    contrib AS (
      SELECT doc_id, round(1.0 / (60 + rank), 6) AS c FROM lex
      UNION ALL
      SELECT doc_id, round(1.0 / (60 + rank), 6) AS c FROM vec
    ),
    fused AS (
      SELECT doc_id,
             CAST(round(sum(CAST(c AS DECIMAL(18,6))), 4) AS DOUBLE) AS rrf
      FROM contrib GROUP BY doc_id
    )
    SELECT doc_id, rrf FROM fused ORDER BY rrf DESC, doc_id LIMIT 20
    """,
    doc="Hybrid retrieval: reciprocal-rank fusion of a BM25 keyword arm "
    "and an embedding-cosine arm (1/(60+rank) per list, k-row-bounded "
    "fusion) — agreement across incomparable score scales, no "
    "normalization",
    survey="LLM retrieval: hybrid RRF over lexical + vector arms "
    "(llm/retrieval.py rrf_fuse)",
)
def hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuse ``bm25_topk`` (keyword arm) with ``cosine_topk`` (vector
    arm, query vec 10; the testdata id spaces align) via
    ``llm.retrieval.rrf_fuse``. Both arms are top-50-trimmed before
    fusion, so the fusion aggregate touches <= 100 rows however large
    the corpus; the lexical rank window runs over the already-limited
    50-row frame (single partition by construction — bounded, not a
    corpus-wide sort)."""
    from openmsistream_spark.llm.retrieval import bm25_topk, rrf_fuse
    from openmsistream_spark.llm.similarity import cosine_topk

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    lex = bm25_topk(docs, ["spark", "vector", "merge", "window"], k=50)
    wl = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    lex = lex.withColumn("rank", F.row_number().over(wl)).select("doc_id", "rank")
    vec = cosine_topk(emb, [10], k=50).select(
        F.col("neighbor_id").alias("doc_id"), "rank"
    )
    return rrf_fuse([lex, vec], k=60, topk=20)


@query(
    "funnel_view_click_purchase",
    """
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM {EV}
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT events.user_id, min(events.ts) AS t2
      FROM {EV} JOIN v ON events.user_id = v.user_id
      WHERE events.event_type = 'click' AND events.ts > v.t1
      GROUP BY events.user_id
    ),
    p AS (
      SELECT events.user_id, min(events.ts) AS t3
      FROM {EV} JOIN c ON events.user_id = c.user_id
      WHERE events.event_type = 'purchase' AND events.ts > c.t2
      GROUP BY events.user_id
    )
    SELECT v.user_id, v.t1 AS ts_view, c.t2 AS ts_click, p.t3 AS ts_purchase,
           1 + CAST(c.t2 IS NOT NULL AS INT) + CAST(p.t3 IS NOT NULL AS INT)
             AS depth
    FROM v LEFT JOIN c ON c.user_id = v.user_id
    LEFT JOIN p ON p.user_id = v.user_id
    """,
    doc="strictly-ordered view->click->purchase funnel per user: cascade "
    "of filtered min-aggregations joined on the user key — no per-user "
    "event buffering, MATCH_RECOGNIZE-lite",
    survey="event analytics: ordered funnel (operators/funnels.py)",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog form of ``operators.funnels.funnel_steps`` (see its
    docstring: step k is one filtered min-agg over step-k events joined
    to the step k-1 frontier — a user's cost is O(their step events),
    independent of their total history)."""
    from openmsistream_spark.operators.funnels import funnel_steps

    ev = load(spark, sf_dir, "events")
    return funnel_steps(ev, ["view", "click", "purchase"])


@query(
    "cohort_retention_weekly",
    """
    WITH first AS (
      SELECT user_id, CAST(min(date_trunc('week', ts)) AS TIMESTAMP) AS cohort_week
      FROM {EV} GROUP BY user_id
    ),
    act AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS w
      FROM {EV}
    ),
    joined AS (
      SELECT a.user_id, f.cohort_week,
             CAST(floor(date_diff('day', f.cohort_week, a.w) / 7.0) AS INT)
               AS week_offset
      FROM act a JOIN first f ON a.user_id = f.user_id
    ),
    sizes AS (
      SELECT cohort_week, count(*) AS n_cohort FROM first GROUP BY cohort_week
    )
    SELECT j.cohort_week, j.week_offset,
           count(DISTINCT j.user_id) AS n_active, s.n_cohort,
           round(count(DISTINCT j.user_id) / CAST(s.n_cohort AS DOUBLE), 4)
             AS retention
    FROM joined j JOIN sizes s ON s.cohort_week = j.cohort_week
    GROUP BY j.cohort_week, j.week_offset, s.n_cohort
    """,
    doc="weekly cohort retention matrix: first-activity cohorts x "
    "week offsets, distinct-active counts against cohort size — the "
    "growth-dashboard query, all map-side-combinable aggregates",
    survey="event analytics: cohort retention (operators/funnels.py)",
)
def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog form of ``operators.funnels.cohort_retention``."""
    from openmsistream_spark.operators.funnels import cohort_retention

    ev = load(spark, sf_dir, "events")
    return cohort_retention(ev)


@query(
    "event_transition_counts",
    """
    WITH seq AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM {EV}
    )
    SELECT from_type, to_type, count(*) AS n_transitions
    FROM seq WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type
    """,
    doc="first-order Markov transition counts between event types per "
    "user timeline (path analysis / next-event modeling): one lead() "
    "window keyed by user, then a map-side-combinable pair count",
    survey="event analytics: transition matrix (operators/funnels.py)",
)
def event_transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog form of ``operators.funnels.transition_counts`` — the
    (ts, event_id) order is a deterministic total order, so the oracle
    reproduces the exact lead() pairing."""
    from openmsistream_spark.operators.funnels import transition_counts

    ev = load(spark, sf_dir, "events")
    return transition_counts(ev)


@query(
    "sliding_window_event_counts",
    """
    WITH floored AS (
      SELECT event_type, value,
             date_trunc('hour', ts) +
               CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE
                    ELSE INTERVAL 0 MINUTE END AS s1
      FROM {EV}
    ),
    starts AS (
      SELECT event_type, value,
             unnest([s1, s1 - INTERVAL 30 MINUTE]) AS window_start
      FROM floored
    )
    SELECT window_start, event_type, count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(28,6))), 2) AS DOUBLE)
             AS value_sum
    FROM starts GROUP BY 1, 2
    """,
    doc="1-hour windows sliding every 30 min, counts + decimal-exact "
    "value sums per (window, event_type): the overlapping-window "
    "aggregate (each event fans out to exactly window/slide rows, "
    "map-side-combinable) — the sliding twin of hourly_event_counts",
    survey="A8 heartbeats: sliding-window variant (F.window slideDuration)",
)
def sliding_window_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping windows via ``F.window(ts, '1 hour', '30 minutes')``
    — the built-in expands each event to its windows before the
    aggregate, so the plan is explode → map-side-combinable groupBy
    (identical shape at any slide ratio); window starts align to the
    epoch in the session's pinned UTC, which the oracle mirrors with a
    30-minute floor."""
    ev = load(spark, sf_dir, "events")
    from .queries import dsum

    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            dsum(F.col("value"), 2).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


@query(
    "weighted_sample_wor_docs",
    """
    SELECT doc_id, n_chars,
           round(-ln((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                                               1, 8)) AS BIGINT)
                      + 0.5) / 4294967296.0)
                 / CAST(n_chars AS DOUBLE), 6) AS sample_key
    FROM documents
    ORDER BY sample_key, doc_id LIMIT 100
    """,
    doc="deterministic weighted sample WITHOUT replacement (Efraimidis-"
    "Spirakis keys from a hash-derived uniform, weight = n_chars): "
    "top-k smallest keys via TakeOrdered, identical sample on any "
    "engine/rerun/partitioning — the at-most-once companion of "
    "mixture_sample_sources",
    survey="LLM curation: weighted sampling w/o replacement "
    "(llm/sampling.py)",
)
def weighted_sample_wor_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog form of ``llm.sampling.weighted_sample_wor`` (see its
    docstring: hash-derived uniform -> exponential key -> bounded
    TakeOrdered top-k; longer documents proportionally likelier, each
    at most once)."""
    from openmsistream_spark.llm.sampling import weighted_sample_wor

    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return weighted_sample_wor(docs, k=100, weight_col="n_chars")


# --------------------------------------------------------------------------
# Operational analytics: anomaly scoring, inter-arrival profiles, skew
# diagnostics (the observability queries a pipeline operator runs over the
# heartbeat/event stream the reference accumulates in its controlled-
# process counters, controlled_process.py heartbeat counters)
# --------------------------------------------------------------------------

# Deterministic moment math shared by the z-score query and its oracle:
# decimal-exact sums (order-independent on any partitioning) rounded to a
# fixed scale, THEN double arithmetic — both engines see bit-identical
# inputs and IEEE ops, so the scores hash-match without tolerance.
_ZSCORE_ORACLE = """
    WITH s AS (
      SELECT user_id,
             count(*) AS n,
             CAST(round(sum(CAST(value AS DECIMAL(30,8))), 8) AS DOUBLE) AS s1,
             CAST(round(sum(CAST(value * value AS DECIMAL(38,12))), 12) AS DOUBLE) AS s2
      FROM {EV} GROUP BY user_id
    ),
    st AS (
      SELECT user_id, n, s1 / n AS mu,
             sqrt(greatest((s2 - s1 * s1 / n) / (n - 1), 0.0)) AS sd
      FROM s WHERE n >= 5
    )
    SELECT events.event_id, events.user_id, events.value,
           round((events.value - st.mu) / st.sd, 3) AS zscore
    FROM {EV} JOIN st ON events.user_id = st.user_id
    WHERE st.sd > 0 AND abs((events.value - st.mu) / st.sd) > 3
    """


@query(
    "zscore_anomaly_events",
    _ZSCORE_ORACLE,
    doc="per-user z-score anomaly scan over event values: decimal-exact "
    "moment sums -> double mean/stddev -> flag |z| > 3. Two-phase shape "
    "(map-side-combinable groupBy for the moments, then a join back) "
    "rather than a full-partition window: the stats side is one row per "
    "user, so AQE broadcasts it and the event stream is never sorted",
    survey="A8 heartbeat analytics: anomaly detection over counters",
)
def zscore_anomaly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier events per user. Moments accumulate in decimal (exact,
    order-independent) and round to a fixed scale before the double
    mean/variance math, so the result is identical on any partitioning
    and hash-matches the DuckDB oracle bit-for-bit; variance uses the
    sum-of-squares identity clamped at 0 (greatest) against the
    catastrophic-cancellation negatives near var=0."""
    ev = load(spark, sf_dir, "events")
    stats = (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(30,8)")), 8)
            .cast("double")
            .alias("s1"),
            F.round(
                F.sum((F.col("value") * F.col("value")).cast("decimal(38,12)")), 12
            )
            .cast("double")
            .alias("s2"),
        )
        .filter(F.col("n") >= 5)
        .select(
            "user_id",
            (F.col("s1") / F.col("n")).alias("mu"),
            F.sqrt(
                F.greatest(
                    (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
                    / (F.col("n") - 1),
                    F.lit(0.0),
                )
            ).alias("sd"),
        )
    )
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    return (
        ev.join(stats, "user_id")
        .filter((F.col("sd") > 0) & (F.abs(z) > 3))
        .select(
            "event_id", "user_id", "value", F.round(z, 3).alias("zscore")
        )
    )


@query(
    "interarrival_stats_user",
    """
    WITH gaps AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM {EV}
    )
    SELECT user_id,
           count(*) + 1 AS n_events,
           round(min(gap_us) / 1000000.0, 6) AS min_gap_s,
           round(max(gap_us) / 1000000.0, 6) AS max_gap_s,
           CAST((2 * sum(gap_us) + count(*)) // (2 * count(*)) AS DOUBLE)
             / 1000000.0 AS avg_gap_s
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
    doc="per-user inter-event arrival statistics: lag over (ts, event_id) "
    "-> integer-microsecond gaps -> min/max/mean seconds. The cadence "
    "profile behind debounce thresholds (S2) and heartbeat-interval "
    "tuning; exact bigint gap sums, and the mean is half-up-rounded to "
    "whole microseconds IN INTEGER ARITHMETIC ((2*sum+n) div (2*n)) "
    "before the exact /1e6 — float round() of a quotient can land on a "
    "decimal half-boundary where engines' rounding diverges (observed "
    "at sf0.1), integer rounding cannot",
    survey="S2 debounce tuning / A8 heartbeat cadence analytics",
)
def interarrival_stats_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One shuffle by user_id (the lag window's partitioning) feeding a
    partial-aggregable groupBy on the SAME key — Spark reuses the
    window's hash partitioning for the aggregate, so the second
    exchange disappears from the plan. Gaps are exact bigint
    microseconds; the mean rounds to whole microseconds in integer
    arithmetic (see the catalog doc) so only exact /1e6 divisions are
    ever float."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias(
        "gap_us"
    )
    return (
        ev.select("user_id", gap)
        .filter(F.col("gap_us").isNotNull())
        .groupBy("user_id")
        .agg(
            (F.count("*") + F.lit(1)).alias("n_events"),
            F.round(F.min("gap_us") / 1e6, 6).alias("min_gap_s"),
            F.round(F.max("gap_us") / 1e6, 6).alias("max_gap_s"),
            (
                F.expr("(2 * sum(gap_us) + count(*)) div (2 * count(*))")
                .cast("double")
                / 1e6
            ).alias("avg_gap_s"),
        )
    )


@query(
    "key_skew_profile",
    """
    WITH per_key_user AS (
      SELECT event_type, user_id, count(*) AS cnt
      FROM {EV} GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(sum(cnt) AS BIGINT) AS n_events,
           count(*) AS n_users,
           CAST((2 * CAST(max(cnt) AS HUGEINT) * 10000 + sum(cnt))
                // (2 * sum(cnt)) AS DOUBLE) / 10000.0 AS top_user_share,
           CAST((2 * CAST(max(cnt) AS HUGEINT) * count(*) * 10000
                 + sum(cnt)) // (2 * sum(cnt)) AS DOUBLE)
             / 10000.0 AS skew_factor
    FROM per_key_user GROUP BY event_type
    """,
    doc="shuffle-key skew diagnostic per event_type: row count, distinct "
    "users, the heaviest user's share, and skew factor (max/mean per-user "
    "load — 1.0 = uniform). The profile that decides WHERE salting "
    "(salted_skew_aggregate) or AQE skew-join handling is worth applying; "
    "two-level aggregation, both levels map-side-combinable, no windows. "
    "Both ratios are exact rationals, so they half-up-round at 4 dp in "
    "integer arithmetic ((2*num*10^4+den) div (2*den)) — float round() "
    "of a terminating-decimal quotient can land on a half-boundary where "
    "engines diverge. The numerator is widened (Spark DECIMAL(38,0), "
    "DuckDB HUGEINT) before the multiply: in bigint, "
    "2*max(cnt)*n_users*10^4 wraps silently past ~4.6e14 with ANSI off — "
    "reachable in a 100 TB skew audit",
    survey="scale diagnostics: partition-skew profiling for salting/AQE",
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two cascaded combinable aggregates — (type, user) then (type) — so
    the wide stream collapses before any single-key concentration can
    hot-spot a reducer; the exact shape a 100 TB skew audit needs (the
    alternative, count_distinct + a max-over-window, sorts per key)."""
    ev = load(spark, sf_dir, "events")
    per_key_user = ev.groupBy("event_type", "user_id").agg(
        F.count("*").alias("cnt")
    )
    return per_key_user.groupBy("event_type").agg(
        F.sum("cnt").alias("n_events"),
        F.count("*").alias("n_users"),
        (
            F.expr(
                "(2 * CAST(max(cnt) AS DECIMAL(38,0)) * 10000 + sum(cnt))"
                " div (2 * sum(cnt))"
            )
            .cast("double")
            / 1e4
        ).alias("top_user_share"),
        (
            F.expr(
                "(2 * CAST(max(cnt) AS DECIMAL(38,0)) * count(*) * 10000"
                " + sum(cnt)) div (2 * sum(cnt))"
            )
            .cast("double")
            / 1e4
        ).alias("skew_factor"),
    )


# Merge the two near-dup fingerprint chains into ONE WITH chain: the LSH
# CTE ends open (", name AS (...)" appendable) and the simhash CTE's
# leading WITH becomes a continuation. Name-disjoint by construction
# (toks/sh/sig/bands/cand/sizes/inter/lsh_scored vs tok/tc/votes/sh32).
from .queries import LSH_SCORED_CTE, SIMHASH32_CTE  # noqa: E402

_ENSEMBLE_ORACLE = (
    LSH_SCORED_CTE
    + SIMHASH32_CTE.replace("WITH tok", ", tok", 1)
    + """
    , sbands AS (
      SELECT doc_id, simhash, b.band, (simhash >> (b.band * 8)) & 255 AS band_val
      FROM sh32, generate_series(0, 3) b(band)
    ),
    sim_pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(min(bit_count(xor(a.simhash, b.simhash))) AS BIGINT) AS hamming
      FROM sbands a JOIN sbands b ON a.band = b.band AND a.band_val = b.band_val
                                  AND a.doc_id < b.doc_id
      GROUP BY 1, 2
      HAVING min(bit_count(xor(a.simhash, b.simhash))) <= 3
    )
    SELECT l.id_a, l.id_b, l.jaccard, s.hamming
    FROM lsh_scored l JOIN sim_pairs s ON l.id_a = s.id_a AND l.id_b = s.id_b
    WHERE l.jaccard >= 0.1
    """
)


@query(
    "ensemble_neardup_pairs",
    _ENSEMBLE_ORACLE,
    doc="ensemble near-dup: a pair must survive BOTH detectors — "
    "MinHash-LSH (shingle Jaccard >= 0.1) AND banded SimHash (32-bit, "
    "hamming <= 3) — before it is trusted for destructive dedup. The "
    "standard precision lever at corpus scale: each detector's false "
    "positives are near-independent, so the intersection join (pair-set "
    "sized, tiny next to the corpus) multiplies error rates away",
    survey="LLM near-dup: MinHash x SimHash ensemble verification",
)
def ensemble_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both arms are the catalog's own banded pipelines (never all-pairs;
    see minhash_lsh_pairs / simhash_band_neardup), FUSED for scale: the
    LSH candidate set is intersected with the (cheap, hamming-verified)
    SimHash pairs BEFORE the expensive shingle-join Jaccard verify, so
    exact-Jaccard work is paid only for pairs both detectors already
    agree on — identical output to verify-then-intersect (the jaccard
    filter commutes with the pair intersection; the oracle is the
    unfused form), but the verify join's left side shrinks from all
    banded candidates to the ensemble survivors. Each arm is computed
    once; both emit id_a < id_b, so no canonicalization step.

    The shingle frame feeds four consumers (LSH candidates, sizes, and
    both sides of the Jaccard verify), so it is persisted — otherwise
    the tokenize+shingle+cap pipeline re-runs per consumer.

    Oracle parity caveat (same conditional as ``ngram_jaccard_pairs``):
    the Spark LSH arm caps hot shingles (``cap_hot_shingles``,
    ``DEFAULT_MAX_SHINGLE_DF``) while the DuckDB oracle reuses the
    uncapped ``LSH_SCORED_CTE`` — hash parity holds because no shingle
    in the driver corpora comes near the cap; on a corpus where one
    does, the arms diverge by construction (the cap is the scale
    guard, the oracle is the exact form)."""
    from .llm.dedup import (
        DEFAULT_MAX_SHINGLE_DF,
        cap_hot_shingles,
        word_shingles,
    )

    docs = load(spark, sf_dir, "documents")
    sh = cap_hot_shingles(word_shingles(docs, n=3), DEFAULT_MAX_SHINGLE_DF).persist()
    try:
        return _ensemble_from_shingles(docs, sh)
    finally:
        # the result below is localCheckpoint-materialized before this
        # runs, so unpersisting here cannot re-trigger the shingle
        # pipeline — and a long-lived session (repeated driver sweeps)
        # no longer accumulates one cached dataset per invocation
        sh.unpersist()


def _ensemble_from_shingles(docs: DataFrame, sh: DataFrame) -> DataFrame:
    return (
        _ensemble_pairs_frame(docs, sh)
        # eager: the pair set (tiny next to the corpus) is materialized
        # off the persisted shingles NOW, so the caller's unpersist is
        # safe; localCheckpoint blocks are ContextCleaner-freed when the
        # returned frame is garbage collected (unlike CacheManager
        # entries, which only a matching unpersist() releases)
        .localCheckpoint(eager=True)
    )


def _ensemble_pairs_frame(docs: DataFrame, sh: DataFrame) -> DataFrame:
    """The ensemble pair set UPSTREAM of the localCheckpoint —
    separate so plan tooling can capture the fused shape (the
    checkpoint truncates the returned frame's lineage to a
    Scan ExistingRDD, which proves nothing about the LSH fusion)."""
    from .llm.dedup import (
        _band_bucket_pairs,
        _minhash_band_rows,
        simhash_band_pairs,
    )

    # fused band rows: one corpus groupBy instead of signature unpivot +
    # re-group (same band_sig VALUES — see _minhash_band_rows), so the
    # LSH arm skips the unpivot's per-band collect_list/array_sort
    # aggregate pass (Exchange count unchanged — the regroup already
    # reused the signature aggregate's doc_id partitioning)
    cand = _band_bucket_pairs(
        _minhash_band_rows(sh, num_hashes=8, rows_per_band=2), "doc_id"
    )
    sim = simhash_band_pairs(docs, bits=32, bands=4, max_hamming=3)
    agreed = cand.join(sim, ["id_a", "id_b"])  # carries hamming once
    # exact-Jaccard verify (minhash_lsh_dedup's verify stage) on the
    # agreed pairs only
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sa = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        agreed.join(sa, "id_a")
        .join(sb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"), F.any_value("hamming").alias("hamming"))
    )
    return (
        inter.join(
            sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n_sh", "n_a"),
            "id_a",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n_sh", "n_b"),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= 0.1)
        .select("id_a", "id_b", "jaccard", "hamming")
    )


@query(
    "token_collocation_lift",
    """
    WITH toks AS (
      SELECT DISTINCT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
      FROM documents
    ),
    tf AS (SELECT token, count(*) AS df FROM toks WHERE token <> '' GROUP BY 1),
    vocab AS (SELECT token, df FROM tf ORDER BY df DESC, token LIMIT 40),
    vt AS (
      SELECT t.doc_id, t.token, v.df FROM toks t JOIN vocab v USING (token)
    ),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
    pairs AS (
      SELECT a.token AS token_a, b.token AS token_b,
             any_value(a.df) AS df_a, any_value(b.df) AS df_b,
             count(*) AS n_ab
      FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.token < b.token
      GROUP BY 1, 2
    )
    SELECT token_a, token_b, n_ab,
           CAST((2 * CAST(n_ab AS HUGEINT) * n.n_docs * 10000 + df_a * df_b)
                // (2 * df_a * df_b) AS DOUBLE) / 10000.0 AS lift
    FROM pairs, n
    WHERE n_ab >= 5
    """,
    doc="collocation mining over the corpus: co-occurrence lift "
    "p(a,b)/(p(a)p(b)) for pairs of the top-40-document-frequency "
    "tokens. The vocabulary cap is the scale lever: the pair join runs "
    "vocab-member tokens only (broadcast vocab, <= |vocab| rows per "
    "doc), so pair work is bounded by vocab^2, never corpus-token^2; "
    "lift stays in rational double arithmetic (no ln), so Spark and the "
    "oracle agree bit-for-bit",
    survey="LLM text analysis: collocation / association mining",
)
def token_collocation_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule lift over capped-vocabulary token pairs. The
    per-doc distinct-token explode is reused for the DF count and the
    pair join; the vocab (top 40 by document frequency, token-ordered
    tiebreak) broadcasts, and the per-doc self-join emits each unordered
    pair once (token_a < token_b)."""
    docs = load(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("token"),
        )
        .filter(F.col("token") != "")
        .distinct()
    )
    tf = toks.groupBy("token").agg(F.count("*").alias("df"))
    vocab = tf.orderBy(F.col("df").desc(), "token").limit(40)
    vt = toks.join(F.broadcast(vocab), "token")
    n_docs = docs.select(F.count_distinct("doc_id").alias("n_docs"))
    a = vt.select(
        "doc_id", F.col("token").alias("token_a"), F.col("df").alias("df_a")
    )
    b = vt.select(
        "doc_id", F.col("token").alias("token_b"), F.col("df").alias("df_b")
    )
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("token_a") < F.col("token_b"))
        .groupBy("token_a", "token_b")
        .agg(
            F.any_value("df_a").alias("df_a"),
            F.any_value("df_b").alias("df_b"),
            F.count("*").alias("n_ab"),
        )
        .filter(F.col("n_ab") >= 5)
    )
    # lift is an exact rational (n_ab*N)/(df_a*df_b): half-up-round at
    # 4 dp in integer arithmetic so a terminating-decimal quotient can
    # never land on a half-boundary where engines' float round() differs.
    # the numerator 2*n_ab*N*10^4 is widened (DECIMAL(38,0) here, HUGEINT
    # in the oracle) before the multiply — in bigint it wraps past ~10^7
    # docs, silently with ANSI off
    return pairs.crossJoin(F.broadcast(n_docs)).select(
        "token_a",
        "token_b",
        "n_ab",
        (
            F.expr(
                "(2 * CAST(n_ab AS DECIMAL(38,0)) * n_docs * 10000"
                " + df_a * df_b) div (2 * df_a * df_b)"
            ).cast("double")
            / 1e4
        ).alias("lift"),
    )

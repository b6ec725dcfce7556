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

Content: the two capability gaps left after round 5's sweep of the
SURVEY §2 + LLM-pipeline surface —

- time-series gap-fill with last-observation-carried-forward (the
  hypertable ``time_bucket_gapfill``/``locf`` shape, e.g. TimescaleDB's
  API) over the ``events`` table;
- a unigram-LM surprisal score per document (the CCNet-style
  perplexity-proxy quality signal — low mean surprisal ⇒ fluent,
  common-token text; high ⇒ rare-token soup) over ``documents``.

Reference parity note: the reference (openmsistream) has no analytics
surface of its own — these extend the engine's curation/analytics layer
the same way queries_analytics.py / queries_llm.py do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import load, query


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

"""Round-15 catalog additions, registered OUT-OF-BAND (same discipline
as every ``queries_extras*.py``: imported by the entry points, never
from ``queries.py``, so landing them does not dirty already-verified
entries' source closures).

Content — the batch-oracle twins of this round's scale work:

- ``ledger_fold_latest``: the log-structured registry's fold-forward
  reduction (``operators/registry.py`` ``LogStructuredRegistry``) as a
  batch query: three deterministic "segments" derived from the
  documents table (a base, an update delta, a tombstone delta), folded
  latest-sequence-wins with tombstoned keys dropped — ONE map-side-
  combinable ``max_by`` aggregate, exactly the plan the backend's
  ``read()`` runs. The DuckDB oracle re-derives every row with a
  window rank. The backend itself is pytest-tier (filesystem
  segments); this entry pins the REDUCTION in the hash-oracle tier.
- ``url_canonicalize_dedup``: crawl-frontier URL canonicalization —
  scheme stripped, host lowercased, leading ``www.`` dropped, query
  string dropped, trailing slashes trimmed — then keep-first per
  canonical URL. The canonical form is the standard crawl-dedup key
  (a raw crawl sees the same page under http/https, www/apex, and
  tracking-parameter variants); URLs are synthesized deterministically
  from (source, doc_id) so collisions are real and the oracle can
  re-derive them. Pure JVM string functions — no UDF, no shuffle
  beyond the one keyed aggregate.

100 TB notes: ``ledger_fold_latest`` is one hash aggregate over the
union of segments (no window, no sort — ``max_by`` combines map-side,
so a mostly-compacted ledger reads at scan speed); at the registry
this amortizes to O(1) write per row (STRESS_MEDIA_LEDGER.json).
``url_canonicalize_dedup`` is scan -> project (codegen string ops) ->
one groupBy on the canonical key; the key space is near-uniform (URL
hash), so no skew, and the aggregate carries only (min_id, count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import load, query

# ---------------------------------------------------------------- fold

_FOLD_ORACLE = """
WITH segs AS (
  SELECT doc_id AS key, 1 AS seq, n_chars AS val, FALSE AS tomb
  FROM documents
  UNION ALL
  SELECT doc_id, 2, n_chars + 1000, FALSE FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id, 3, NULL, TRUE FROM documents WHERE doc_id % 7 = 0
),
ranked AS (
  SELECT key, seq, val, tomb,
         row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
  FROM segs
)
SELECT key AS doc_id, val AS latest_value, seq AS last_seq
FROM ranked WHERE rn = 1 AND NOT tomb
ORDER BY doc_id
"""


@query(
    "ledger_fold_latest",
    _FOLD_ORACLE,
    doc="log-registry fold-forward: latest seq wins, tombstones drop",
    survey="R2/R3 (log-structured backend reduction)",
)
def ledger_fold_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    base = docs.select(
        F.col("doc_id").alias("key"),
        F.lit(1).cast("long").alias("seq"),
        F.col("n_chars").alias("val"),
        F.lit(False).alias("tomb"),
    )
    delta = docs.filter(F.col("doc_id") % 5 == 0).select(
        F.col("doc_id").alias("key"),
        F.lit(2).cast("long").alias("seq"),
        (F.col("n_chars") + 1000).alias("val"),
        F.lit(False).alias("tomb"),
    )
    tomb = docs.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("key"),
        F.lit(3).cast("long").alias("seq"),
        F.lit(None).cast("long").alias("val"),
        F.lit(True).alias("tomb"),
    )
    segs = base.unionByName(delta).unionByName(tomb)
    folded = segs.groupBy("key").agg(
        F.max_by(F.struct("val", "tomb", "seq"), F.col("seq")).alias("v")
    )
    return (
        folded.filter(~F.col("v.tomb"))
        .select(
            F.col("key").alias("doc_id"),
            F.col("v.val").alias("latest_value"),
            F.col("v.seq").alias("last_seq"),
        )
        .orderBy("doc_id")
    )


# ------------------------------------------------- URL canonicalization

#: deterministic raw URL per document: scheme/case/www/query/trailing-
#: slash noise keyed off doc_id so every variant class appears; the
#: host+path depend only on doc_id % 60 (source is doc_id % 20), so
#: ~8 documents collide per canonical URL at sf0.01 — the dedup does
#: real work, across DIFFERENT surface decorations of the same page
_RAW_URL_SQL = (
    "concat(CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTP://' END,"
    " CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END,"
    " upper(source), '.Example.com/sec-', CAST(doc_id % 3 AS STRING),"
    " '/page-', CAST(doc_id % 60 AS STRING),"
    " CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END,"
    " CASE WHEN doc_id % 5 = 0 THEN concat('?utm_source=x&id=',"
    " CAST(doc_id AS STRING)) ELSE '' END)"
)

_URL_ORACLE = f"""
WITH urls AS (
  SELECT doc_id,
         {_RAW_URL_SQL.replace("AS STRING", "AS VARCHAR")} AS url
  FROM documents
),
parts AS (
  SELECT doc_id,
         split_part(split_part(url, '://', 2), '?', 1) AS hostpath
  FROM urls
),
canon AS (
  SELECT doc_id,
         CASE WHEN lower(split_part(hostpath, '/', 1)) LIKE 'www.%'
              THEN substr(lower(split_part(hostpath, '/', 1)), 5)
              ELSE lower(split_part(hostpath, '/', 1)) END
         || rtrim(substr(hostpath, length(split_part(hostpath, '/', 1)) + 1),
                  '/') AS canonical_url
  FROM parts
)
SELECT canonical_url,
       min(doc_id) AS kept_doc_id,
       count(*) AS n_variants
FROM canon
GROUP BY canonical_url
ORDER BY canonical_url
"""


@query(
    "url_canonicalize_dedup",
    _URL_ORACLE,
    doc="URL canonicalization (scheme/www/query/slash) + keep-first dedup",
    survey="LLM pipeline: crawl-frontier URL dedup",
)
def url_canonicalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    urls = docs.select("doc_id", F.expr(_RAW_URL_SQL).alias("url"))
    hostpath = F.expr("split_part(split_part(url, '://', 2), '?', 1)")
    parts = urls.select("doc_id", hostpath.alias("hostpath"))
    host = F.lower(F.expr("split_part(hostpath, '/', 1)"))
    path = F.expr(
        "trim(TRAILING '/' FROM substr(hostpath,"
        " length(split_part(hostpath, '/', 1)) + 1))"
    )
    canon = parts.select(
        "doc_id",
        F.concat(
            F.when(host.startswith("www."), F.expr("substr(lower("
                   "split_part(hostpath, '/', 1)), 5)")).otherwise(host),
            path,
        ).alias("canonical_url"),
    )
    return (
        canon.groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("kept_doc_id"),
            F.count("*").alias("n_variants"),
        )
        .orderBy("canonical_url")
    )

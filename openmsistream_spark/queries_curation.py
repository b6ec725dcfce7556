"""Training-data curation queries (driver north star, round 3 batch).

The operations a 100 TB pretraining pipeline runs between raw corpus and
training shards, built from the package's dedup/shingle primitives:

- canonical near-dup removal (clusters → one representative per cluster
  — the step that actually shrinks the corpus after pair generation);
- deterministic hash sampling (reproducible corpus subsetting that
  needs no rand() coordination across engines or reruns — the sample is
  a pure function of the key, so any worker on any day draws the same
  subset);
- token-length histogram (corpus shape stats for curriculum/packing
  decisions — one map-side-combinable groupBy);
- n-gram contamination check (eval-set leakage scan: which held-out
  docs share an 8-gram with the training split — the industry-standard
  n-gram-overlap method, as a shared-shingle semi-join, never all-pairs).

Each query carries a DuckDB oracle; the reference system has no analog
(these generalize its content-addressed dedup F4,
download_data_file.py:98-107, to corpus curation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .llm.dedup import dedup_clusters, jaccard_pairs, word_shingles
from .queries import load, query

_TOKS = "string_split_regex(lower(trim(text)), '\\s+')"

# 8-gram shingles, the contamination-scan standard (DISTINCT per doc).
# Shingles travel as 16-hex-char md5 keys — the Spark side hashes before
# its distinct so shuffles/joins move 16-byte keys, not 50+-byte n-gram
# text; md5 is portable so the oracle mirrors it exactly.
_SHINGLE8_CTE = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS ws FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(CASE WHEN len(ws) >= 8
                      THEN [substr(md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
                            ws[i+3] || ' ' || ws[i+4] || ' ' || ws[i+5] || ' ' ||
                            ws[i+6] || ' ' || ws[i+7]), 1, 16)
                            for i in range(1, len(ws)-6)]
                      ELSE [] END) AS shingle
        FROM toks) t
    )
"""

# 3-gram jaccard pair CTE (matches ngram_jaccard_pairs' oracle)
_JACCARD3_CTE = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS ws FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(CASE WHEN len(ws) >= 3
                      THEN [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, len(ws)-1)]
                      ELSE [] END) AS shingle
        FROM toks) t
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 4) >= 0.12
    )
"""


@query(
    "dedup_keep_canonical",
    _JACCARD3_CTE
    + """
    , sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    walk AS (
      WITH RECURSIVE w(node, root) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT s.dst, w.root FROM w JOIN sym s ON s.src = w.node
      ) SELECT node, min(root) AS cluster FROM w GROUP BY node)
    SELECT cluster AS representative_id,
           CAST(count(*) AS BIGINT) AS n_members
    FROM walk GROUP BY 1
    """,
    doc="near-dup removal output: one canonical representative per "
    "jaccard cluster with its member count — the corpus that survives "
    "dedup",
    survey="LLM dedup: canonical selection after cluster formation",
)
def dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    sh = word_shingles(docs, n=3)
    # exact pairs (the oracle is exact); at corpus scale pass
    # max_shingle_df and/or swap in minhash_lsh_dedup's banded pairs
    pairs = jaccard_pairs(sh, threshold=0.12)
    clusters = dedup_clusters(docs.select("doc_id"), pairs, id_col="doc_id")
    return clusters.groupBy(F.col("cluster").alias("representative_id")).agg(
        F.count("*").cast("bigint").alias("n_members")
    )


@query(
    "hash_sample_documents",
    """
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
    """,
    doc="deterministic 1/8 corpus sample by key hash — reproducible "
    "sharding/subsetting without rand() (same sample on any engine, any "
    "rerun, any worker); the scale-safe replacement for TABLESAMPLE in "
    "a multi-stage pipeline",
    survey="LLM curation: reproducible sampling",
)
def hash_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.filter(
        F.md5(F.col("doc_id").cast("string")).substr(1, 1).isin("0", "1")
    ).select("doc_id", F.length("text").cast("bigint").alias("n_chars"))


@query(
    "token_histogram",
    f"""
    WITH t AS (SELECT len({_TOKS}) AS n FROM documents)
    SELECT CAST(floor(n / 20) * 20 AS BIGINT) AS bucket_lo,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(n) AS BIGINT) AS min_tokens,
           CAST(max(n) AS BIGINT) AS max_tokens
    FROM t GROUP BY 1
    """,
    doc="token-length histogram (20-token buckets) — corpus shape stats "
    "for packing/curriculum; one map-side-combinable aggregation",
    survey="LLM curation: corpus statistics",
)
def token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    n = F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    return (
        docs.select(n.alias("n"))
        .groupBy((F.floor(F.col("n") / 20) * 20).cast("bigint").alias("bucket_lo"))
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("n").cast("bigint").alias("min_tokens"),
            F.max("n").cast("bigint").alias("max_tokens"),
        )
    )


@query(
    "contamination_8gram",
    _SHINGLE8_CTE
    + """
    , ev AS (SELECT * FROM sh
             WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = 'f'),
    tr AS (SELECT * FROM sh
           WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <> 'f')
    SELECT ev.doc_id AS eval_doc_id,
           CAST(count(DISTINCT tr.doc_id) AS BIGINT) AS n_contaminated
    FROM ev JOIN tr ON ev.shingle = tr.shingle
    GROUP BY 1
    """,
    doc="train/eval contamination scan: held-out docs (hash-split) that "
    "share an 8-gram shingle with the training split, with the count of "
    "leaking train docs — shared-shingle join only, never all-pairs",
    survey="LLM curation: n-gram contamination check",
)
def contamination_8gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    sh = word_shingles(docs, n=8, hashed=True)
    split = F.md5(F.col("doc_id").cast("string")).substr(1, 1)
    ev = sh.filter(split == "f").select(
        F.col("doc_id").alias("eval_doc_id"), "shingle"
    )
    tr = sh.filter(split != "f").select(F.col("doc_id").alias("train_id"), "shingle")
    return (
        ev.join(tr, "shingle")
        .groupBy("eval_doc_id")
        .agg(F.count_distinct("train_id").cast("bigint").alias("n_contaminated"))
    )

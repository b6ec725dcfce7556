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

from .llm.dedup import (
    drop_boilerplate_lines,
    jaccard_pairs,
    minhash_lsh_dedup,
    simhash_band_pairs,
    word_shingles,
)
from .llm.packing import mixture_sample, shard_by_token_budget
from .llm.textstats import (
    PII_PATTERNS,
    pii_redact,
    quality_filter,
    repetition_signals,
)
from .operators.relational import stratified_sample, stratified_sample_hash
from .queries import LSH_SCORED_CTE, SIMHASH32_CTE, load, query

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
    "dedup. WARNING: exact all-pairs Jaccard — the oracle-exact twin "
    "for validation at test scale ONLY; NEVER run this variant at "
    "corpus scale (pair generation is quadratic in shared-shingle "
    "document groups). Use dedup_keep_canonical_lsh, the banded "
    "LSH variant with identical output contract, for real corpora",
    survey="LLM dedup: canonical selection after cluster formation",
)
def dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-exact canonical dedup — validation twin of
    ``dedup_keep_canonical_lsh``.

    NEVER run this at corpus scale: ``jaccard_pairs`` with no shingle
    cap is exact all-pairs through shared shingles, which is quadratic
    in every shared-shingle group. It exists so the LSH variant's
    recall can be judged against exact truth at small SF. At scale use
    ``dedup_keep_canonical_lsh`` (same output contract, banded LSH
    candidates, hot-shingle caps).
    """
    from .llm.dedup import keep_canonical

    docs = load(spark, sf_dir, "documents")
    sh = word_shingles(docs, n=3)
    # exact pairs (the oracle is exact); at corpus scale pass
    # max_shingle_df and/or swap in minhash_lsh_dedup's banded pairs
    pairs = jaccard_pairs(sh, threshold=0.12)
    return keep_canonical(docs, pairs=pairs)


@query(
    "dedup_keep_canonical_lsh",
    LSH_SCORED_CTE
    + """
    , pairs AS (SELECT id_a, id_b FROM lsh_scored WHERE jaccard >= 0.12),
    sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
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
    doc="the 100 TB-shaped canonical dedup: MinHash-LSH banded candidate "
    "pairs (never all-pairs; hot shingles capped) → connected components "
    "→ one representative per cluster. Same output contract as "
    "dedup_keep_canonical; the oracle mirrors the LSH pipeline exactly "
    "(no recall assumption) — this is the variant to copy at corpus "
    "scale",
    survey="LLM dedup: canonical selection via LSH at scale",
)
def dedup_keep_canonical_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # persist the capped shingle table: it feeds four plan branches
    # (signatures, sizes, both verify-join sides) and this query executes
    # the pipeline once more inside the CC cache fill — measured 3-4 s
    # saved at sf0.1 for a ~20 B/shingle-row cache. Building it HERE
    # (rather than persist_shingles=True) gives a handle to unpersist:
    # after dedup_clusters returns, its labels are checkpointed and the
    # returned plan reads only the corpus scan + that leaf, so the cache
    # can be released immediately instead of leaking until session end.
    from pyspark import StorageLevel

    from .llm.dedup import (
        DEFAULT_MAX_SHINGLE_DF,
        cap_hot_shingles,
        keep_canonical,
        word_shingles,
    )

    sh = cap_hot_shingles(
        word_shingles(docs, n=3), DEFAULT_MAX_SHINGLE_DF
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        pairs = minhash_lsh_dedup(
            docs, n=3, num_hashes=8, rows_per_band=2, threshold=0.12, shingles=sh
        )
        out = keep_canonical(docs, pairs=pairs)
    finally:
        # also on failure (e.g. CC non-convergence) — the cache must not
        # outlive the call either way; keep_canonical's dedup_clusters
        # has materialized its labels before returning
        sh.unpersist()
    return out


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


@query(
    "simhash_band_neardup",
    SIMHASH32_CTE
    + """
    , bands AS (
      SELECT doc_id, simhash, b.band, (simhash >> (b.band * 8)) & 255 AS band_val
      FROM sh32, generate_series(0, 3) b(band)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(min(bit_count(xor(a.simhash, b.simhash))) AS BIGINT) AS hamming
    FROM bands a JOIN bands b ON a.band = b.band AND a.band_val = b.band_val
                              AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING min(bit_count(xor(a.simhash, b.simhash))) <= 3
    """,
    doc="SimHash near-dup pairs via banded candidates: 32-bit "
    "fingerprint split into 4×8-bit bands, equi-join on (band, value), "
    "exact hamming verify ≤ 3 — pigeonhole-complete at hamming < bands, "
    "never all-pairs",
    survey="LLM near-dup at scale: SimHash banding",
)
def simhash_band_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_band_pairs(
        load(spark, sf_dir, "documents"), bits=32, bands=4, max_hamming=3
    )


# The corpus is synthetic word soup with no PII, so the scan plants
# deterministic doc_id-derived PII on BOTH sides first — the point is to
# verify the redactor's match/replace/count semantics end-to-end, which
# a 0-match corpus never would.
_PII_ORACLE = """
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR) ||
             '@example.com tel +1-555-' ||
             lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
             ' ip 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
             CAST((doc_id * 7) % 256 AS VARCHAR) AS t
      FROM documents),
    r1 AS (SELECT doc_id, t, regexp_replace(t, '{email}', '<EMAIL>', 'g') AS t1 FROM aug),
    r2 AS (SELECT *, regexp_replace(t1, '{phone}', '<PHONE>', 'g') AS t2 FROM r1),
    r3 AS (SELECT *, regexp_replace(t2, '{ip}', '<IP>', 'g') AS t3 FROM r2)
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{email}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(t1, '{phone}')) AS BIGINT) AS n_phone,
           CAST(len(regexp_extract_all(t2, '{ip}')) AS BIGINT) AS n_ipv4,
           CAST(length(t3) AS BIGINT) AS redacted_len,
           md5(t3) AS redacted_md5
    FROM r3
""".replace("{email}", PII_PATTERNS[0][1]).replace(
    "{phone}", PII_PATTERNS[1][1]
).replace("{ip}", PII_PATTERNS[2][1])


@query(
    "pii_redaction_scan",
    _PII_ORACLE,
    doc="PII redaction over the corpus: emails, phone numbers, and IPv4 "
    "addresses replaced with placeholder tokens, per-doc hit counts — "
    "pure regexp_count/regexp_replace chain (codegen, no Python); "
    "deterministic planted PII makes the zero-PII test corpus exercise "
    "every rule",
    survey="LLM curation: PII redaction",
)
def pii_redaction_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com tel +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" ip 10."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".0."),
            ((F.col("doc_id") * 7) % 256).cast("string"),
        ).alias("text"),
    )
    red = pii_redact(planted, text_col="text")
    return red.select(
        "doc_id",
        "n_email",
        "n_phone",
        "n_ipv4",
        F.length("redacted").cast("bigint").alias("redacted_len"),
        F.md5("redacted").alias("redacted_md5"),
    )


@query(
    "repetition_signals_docs",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS ws FROM documents),
    tc AS (SELECT doc_id, token, count(*) AS cnt FROM (
             SELECT doc_id, unnest(ws) AS token FROM toks) t
           WHERE token <> '' GROUP BY 1, 2),
    uni AS (SELECT doc_id, sum(cnt) AS n_tok, max(cnt) AS top_cnt,
                   sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup_mass
            FROM tc GROUP BY 1),
    bgc AS (SELECT doc_id, bg, count(*) AS cnt FROM (
              SELECT doc_id,
                     unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS bg
              FROM toks) t GROUP BY 1, 2),
    bt AS (SELECT doc_id, max(cnt) AS top_bg, sum(cnt) AS n_bg FROM bgc GROUP BY 1)
    SELECT u.doc_id,
           CAST(u.n_tok AS BIGINT) AS n_tokens,
           round(u.top_cnt / u.n_tok, 4) AS top_token_frac,
           round(u.dup_mass / u.n_tok, 4) AS dup_token_mass,
           round(coalesce(b.top_bg / b.n_bg, 0), 4) AS top_bigram_frac
    FROM uni u LEFT JOIN bt b ON u.doc_id = b.doc_id
    """,
    doc="Gopher-style repetition quality signals: top-token share, "
    "duplicate-token mass, top-bigram share — explode→count→aggregate "
    "(map-side combinable), safe for documents of any length",
    survey="LLM curation: repetition quality signals",
)
def repetition_signals_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_signals(load(spark, sf_dir, "documents"))


@query(
    "stratified_sample_sources",
    """
    SELECT doc_id, source, sample_rank FROM (
      SELECT doc_id, source,
             CAST(row_number() OVER (PARTITION BY source
                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
               AS sample_rank
      FROM documents) t
    WHERE sample_rank <= 3
    """,
    doc="deterministic stratified sample: up to 3 docs per source, "
    "ranked by key hash — identical sample on any engine/rerun/worker; "
    "hash-threshold variant documented for hot strata",
    survey="LLM curation: stratified sampling",
)
def stratified_sample_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return stratified_sample(docs, "source", "doc_id", 3).select(
        "doc_id", "source", "sample_rank"
    )


# end-to-end batch curation: exact dedup (min doc_id per normalized
# content) -> quality keep -> PII redaction (with planted PII so the
# redactor has work, as in pii_redaction_scan). The batch twin of
# streaming/curation.curate_document_stream, with a full oracle.
_CURATED_ORACLE = """
    WITH hashed AS (
      SELECT doc_id, source, text,
             md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS content_hash
      FROM documents),
    reps AS (
      SELECT content_hash, min(doc_id) AS doc_id,
             CAST(count(*) AS BIGINT) AS n_duplicates
      FROM hashed GROUP BY 1),
    kept AS (
      SELECT h.doc_id, h.text, r.content_hash, r.n_duplicates
      FROM hashed h JOIN reps r
        ON r.content_hash = h.content_hash AND r.doc_id = h.doc_id),
    s AS (
      SELECT doc_id, text, content_hash, n_duplicates,
             CAST(len({toks}) AS BIGINT) AS n_tokens,
             round(list_sum(list_transform({toks}, w -> length(w))) * 1.0
                   / len({toks}), 4) AS mean_token_len,
             round(len(list_distinct({toks})) * 1.0 / len({toks}), 4)
               AS distinct_ratio,
             length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS n_punct,
             length(text) AS n_chars
      FROM kept),
    q AS (
      SELECT doc_id, content_hash, n_duplicates, n_tokens,
             text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' AS t
      FROM s
      WHERE n_tokens >= 20 AND mean_token_len BETWEEN 3.0 AND 12.0
        AND distinct_ratio >= 0.3 AND n_punct * 1.0 / n_chars <= 0.2)
    SELECT doc_id, content_hash, n_duplicates, n_tokens,
           CAST(len(regexp_extract_all(t, '{email}')) AS BIGINT) AS n_email,
           md5(regexp_replace(t, '{email}', '<EMAIL>', 'g')) AS redacted_md5
    FROM q
""".replace("{toks}", _TOKS).replace("{email}", PII_PATTERNS[0][1])


@query(
    "curated_corpus",
    _CURATED_ORACLE,
    doc="the batch curation pipeline end-to-end: exact dedup (canonical "
    "= min doc_id per normalized content hash) -> quality keep/drop -> "
    "PII redaction over planted emails — the batch twin of the "
    "streaming curation pipeline, as one oracle-checked query",
    survey="LLM curation: end-to-end batch pass",
)
def curated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm.dedup import exact_dedup

    docs = load(spark, sf_dir, "documents")
    reps = exact_dedup(docs).select(
        "content_hash",
        F.col("representative_id").alias("doc_id"),
        F.col("n_duplicates").cast("bigint").alias("n_duplicates"),
    )
    hashed = docs.withColumn(
        "content_hash",
        F.md5(F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))),
    )
    kept = hashed.join(reps, ["content_hash", "doc_id"])
    quality = quality_filter(
        kept, passthrough_cols=["text", "content_hash", "n_duplicates"]
    ).filter("keep")
    planted = quality.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com"),
        ),
    )
    red = pii_redact(planted, patterns=PII_PATTERNS[:1])
    return red.select(
        "doc_id",
        "content_hash",
        "n_duplicates",
        "n_tokens",
        "n_email",
        F.md5("redacted").alias("redacted_md5"),
    )


@query(
    "curation_report_by_source",
    f"""
    WITH s AS (
      SELECT source,
             CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
             round(list_sum(list_transform({_TOKS}, w -> length(w))) * 1.0
                   / len({_TOKS}), 4) AS mean_token_len,
             round(len(list_distinct({_TOKS})) * 1.0 / len({_TOKS}), 4)
               AS distinct_ratio,
             length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS n_punct,
             length(text) AS n_chars
      FROM documents),
    v AS (
      SELECT source, n_tokens,
             (n_tokens >= 20) AS ok_len,
             (mean_token_len BETWEEN 3.0 AND 12.0) AS ok_token_len,
             (distinct_ratio >= 0.3) AS ok_diversity,
             (n_punct * 1.0 / n_chars <= 0.2) AS ok_punct
      FROM s)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN ok_len AND ok_token_len AND ok_diversity
                         AND ok_punct THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
           round(sum(CASE WHEN ok_len THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
             AS rate_ok_len,
           round(sum(CASE WHEN ok_token_len THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
             AS rate_ok_token_len,
           round(sum(CASE WHEN ok_diversity THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
             AS rate_ok_diversity,
           round(sum(CASE WHEN ok_punct THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
             AS rate_ok_punct,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM v GROUP BY source
    """,
    doc="per-source curation dashboard: doc counts, composite keep "
    "count, per-rule pass rates, total tokens — the audit a data team "
    "reads before shipping a mixture; one map-side-combinable "
    "aggregation over the quality verdicts",
    survey="LLM curation: per-source audit report",
)
def curation_report_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    q = quality_filter(docs, passthrough_cols=["source"])

    def rate(col: str) -> F.Column:
        return F.round(
            F.sum(F.col(col).cast("int")) / F.count("*"), 4
        ).alias(f"rate_{col}")

    return q.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.col("keep").cast("int")).cast("bigint").alias("n_keep"),
        rate("ok_len"),
        rate("ok_token_len"),
        rate("ok_diversity"),
        rate("ok_punct"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )


@query(
    "token_percentiles_by_source",
    f"""
    WITH t AS (SELECT source, CAST(len({_TOKS}) AS BIGINT) AS n FROM documents)
    SELECT source,
           round(quantile_cont(n, 0.25), 4) AS p25,
           round(quantile_cont(n, 0.50), 4) AS p50,
           round(quantile_cont(n, 0.75), 4) AS p75,
           round(quantile_cont(n, 0.95), 4) AS p95,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM t GROUP BY source
    """,
    doc="per-source token-length percentiles (exact, interpolated) — "
    "corpus shape stats for packing/curriculum decisions. Exact "
    "percentile buffers each group's values, fine for bounded groups; "
    "for corpus-wide percentiles at 100 TB swap in approx_percentile "
    "(t-digest, mergeable, no buffering) — same plan shape",
    survey="LLM curation: corpus distribution statistics",
)
def token_percentiles_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    n = F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).cast("bigint")
    return (
        docs.select("source", n.alias("n"))
        .groupBy("source")
        .agg(
            F.round(F.expr("percentile(n, 0.25)"), 4).alias("p25"),
            F.round(F.expr("percentile(n, 0.50)"), 4).alias("p50"),
            F.round(F.expr("percentile(n, 0.75)"), 4).alias("p75"),
            F.round(F.expr("percentile(n, 0.95)"), 4).alias("p95"),
            F.count("*").cast("bigint").alias("n_docs"),
        )
    )


# The synthetic corpus is single-line word soup, so (like the PII scan)
# the boilerplate query plants a deterministic multi-line structure on
# BOTH sides: two content lines per doc, a corpus-wide boilerplate line
# (df=all -> dropped), an every-other-doc licence line (df=half ->
# dropped), and a ref line shared by ~1/40 of docs (df under the cap ->
# kept) — exercising drop/keep across the threshold and order-preserving
# rebuild.
_BOILERPLATE_ORACLE = """
    WITH aug AS (
      SELECT doc_id,
             substr(text, 1, 100) || chr(10) ||
             'subscribe to our newsletter' || chr(10) ||
             CASE WHEN doc_id % 2 = 0
                  THEN 'all rights reserved' || chr(10) ELSE '' END ||
             'ref section ' || CAST(doc_id % 40 AS VARCHAR) || chr(10) ||
             substr(text, 101) AS t
      FROM documents),
    lines AS (
      SELECT doc_id, unnest(string_split(t, chr(10))) AS line FROM aug),
    hot AS (
      SELECT substr(md5(lower(trim(line))), 1, 16) AS lh
      FROM lines WHERE lower(trim(line)) <> ''
      GROUP BY 1 HAVING count(DISTINCT doc_id) > 30),
    hotl AS (SELECT coalesce(list(lh), []) AS hl FROM hot)
    SELECT doc_id,
           md5(array_to_string(list_filter(string_split(t, chr(10)),
               x -> NOT list_contains(hl, substr(md5(lower(trim(x))), 1, 16))),
               chr(10))) AS cleaned_md5,
           CAST(len(string_split(t, chr(10))) AS BIGINT) AS n_lines,
           CAST(len(string_split(t, chr(10)))
                - len(list_filter(string_split(t, chr(10)),
                  x -> NOT list_contains(hl, substr(md5(lower(trim(x))), 1, 16))))
             AS BIGINT) AS n_lines_dropped
    FROM aug, hotl
"""


@query(
    "boilerplate_line_dedup",
    _BOILERPLATE_ORACLE,
    doc="line-level boilerplate removal (CCNet/RefinedWeb-style): lines "
    "appearing in > 30 distinct docs are dropped, documents rebuilt in "
    "original line order — DF counts shuffle 16-byte line hashes, hot "
    "set is a broadcast join, never line text",
    survey="LLM curation: line-level dedup / boilerplate removal",
)
def boilerplate_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 100),
            F.lit("\nsubscribe to our newsletter\n"),
            F.when(
                F.col("doc_id") % 2 == 0, F.lit("all rights reserved\n")
            ).otherwise(F.lit("")),
            F.lit("ref section "),
            (F.col("doc_id") % 40).cast("string"),
            F.lit("\n"),
            F.expr("substring(text, 101)"),
        ).alias("text"),
    )
    out = drop_boilerplate_lines(planted, max_line_df=30)
    return out.select(
        "doc_id",
        F.md5("cleaned").alias("cleaned_md5"),
        "n_lines",
        "n_lines_dropped",
    )


@query(
    "token_budget_shards",
    f"""
    WITH base AS (
      SELECT doc_id,
             CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT % 8
                  AS BIGINT) AS bucket,
             md5(CAST(doc_id AS VARCHAR)) AS ord
      FROM documents)
    SELECT doc_id, n_tokens, bucket,
           CAST(floor(coalesce(sum(n_tokens) OVER (
                PARTITION BY bucket ORDER BY ord, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2000)
             AS BIGINT) AS shard
    FROM base
    """,
    doc="token-budget training-shard assignment: greedy ~2000-token "
    "packing in a deterministic hash-shuffled order, run independently "
    "inside 8 hash buckets so the cumsum window parallelizes across "
    "buckets instead of serializing the corpus — the manifest a shard "
    "writer partitions by",
    survey="LLM curation: sequence packing / shard layout",
)
def token_budget_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return shard_by_token_budget(docs, budget_tokens=2000, n_buckets=8)


@query(
    "mixture_sample_sources",
    """
    WITH w AS (
      SELECT doc_id, source,
             0.5 + (length(source) % 3) AS wt,
             ('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT
               / 1152921504606846976.0 AS hf
      FROM documents),
    c AS (
      SELECT doc_id, source,
             CAST(floor(wt) + CASE WHEN hf < wt - floor(wt) THEN 1 ELSE 0 END
               AS BIGINT) AS n_copies
      FROM w)
    SELECT doc_id, source, n_copies,
           unnest(range(1, n_copies + 1)) AS copy
    FROM c WHERE n_copies > 0
    """,
    doc="weighted mixture sampling (data-mixing): each document emitted "
    "weight-many times in expectation — floor(weight) full epochs plus a "
    "hash-determined fractional copy; weights here derive from source "
    "metadata (0.5/1.5/2.5) standing in for a broadcast recipe table. "
    "Projection + explode only, zero shuffles",
    survey="LLM curation: mixture weighting / multi-epoch sampling",
)
def mixture_sample_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    weight = F.lit(0.5) + (F.length("source") % 3)
    out = mixture_sample(docs, weight)
    return out.select("doc_id", "source", "n_copies", F.col("copy").cast("bigint"))


@query(
    "stratified_sample_hot",
    """
    WITH counts AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
    surv AS (
      SELECT d.doc_id, d.source
      FROM documents d JOIN counts c USING (source)
      WHERE (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::UBIGINT
             / 1152921504606846976.0) * c.n < 76.0
    )
    SELECT doc_id, source, sample_rank FROM (
      SELECT doc_id, source,
             CAST(row_number() OVER (PARTITION BY source
                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
               AS sample_rank
      FROM surv) t
    WHERE sample_rank <= 3
    """,
    doc="hot-stratum-safe stratified sample: per-stratum counts "
    "(broadcast) + hash-threshold filter + exact-k trim over survivors "
    "only — identical output to stratified_sample_sources, but a "
    "dominant stratum never serializes into one window task (the trim "
    "window sees ~76 rows per stratum, not the stratum). 16^15 = "
    "1152921504606846976; threshold 76 = k*oversample + slack = 3*4+64",
    survey="LLM curation: stratified sampling at scale (hot strata)",
)
def stratified_sample_hot(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return stratified_sample_hash(docs, "source", "doc_id", 3).select(
        "doc_id", "source", "sample_rank"
    )

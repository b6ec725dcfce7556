"""LLM-pipeline extension queries (driver north star, round 2 batch).

Adds to the dedup/similarity/text-analysis surface in ``queries.py``:
BPE-ish token counting, embedding-cosine near-dup via sign-LSH
bucketing (the O(n·bucket) scale path, never O(n²)), IVF-style ANN
(assign to nearest centroid, search only the probe cluster), and the
multimodal decode plumbing driven end-to-end through ``mapInPandas``
with a DuckDB oracle replaying the deterministic fake decoder from the
sha256 hex digest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .llm.multimodal import decode_features
from .queries import load, query

# BPE-ish pre-tokenizer: letter runs, digit runs, or single punctuation
# marks — the GPT-2 pre-tokenizer's shape without the unicode tables.
_BPE_RX = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


@query(
    "token_count_bpe",
    f"""
    WITH tok AS (
      SELECT doc_id, regexp_extract_all(lower(text), '{_BPE_RX}') AS toks
      FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
           round(CAST(len(toks) AS DOUBLE) / len(list_distinct(toks)), 4) AS repetition
    FROM tok
    """,
    doc="BPE-ish regex token counting (letters/digits/punct classes)",
    survey="LLM text analysis: token counting",
)
def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower("text"), F.lit(_BPE_RX), F.lit(0))
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.round(
            F.size(toks).cast("double") / F.size(F.array_distinct(toks)), 4
        ).alias("repetition"),
    )


_EMB_NORM_CTE = """
    WITH emb AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    normed AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM emb),
    bucketed AS (
      SELECT vec_id, v, nrm,
             (CASE WHEN v[1] > 0 THEN 1 ELSE 0 END)
           + (CASE WHEN v[2] > 0 THEN 2 ELSE 0 END)
           + (CASE WHEN v[3] > 0 THEN 4 ELSE 0 END)
           + (CASE WHEN v[4] > 0 THEN 8 ELSE 0 END) AS bucket
      FROM normed)
"""


def _normed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    dot = F.aggregate(
        F.zip_with("v", "v", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    return emb.withColumn("nrm", F.sqrt(dot))


def _bucketed(normed: DataFrame, n_bits: int = 4) -> DataFrame:
    bucket = sum(
        F.when(F.element_at("v", i + 1) > 0, 1 << i).otherwise(0)
        for i in range(n_bits)
    )
    return normed.withColumn("bucket", bucket)


def _cos(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


@query(
    "embedding_neardup_pairs",
    _EMB_NORM_CTE
    + """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) AS cosine
    FROM bucketed a JOIN bucketed b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) >= 0.4
    """,
    doc="embedding-cosine near-dup pairs via sign-LSH bucket join (never all-pairs)",
    survey="LLM dedup: embedding near-dup",
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH buckets are quadratic islands exactly like SemDeDup
    clusters, so the pair scoring runs through the shared grouped Arrow
    stage (``similarity._grouped_pair_candidates``): each bucket's
    vectors cross Arrow once and the quadratic is vectorized numpy,
    instead of an equi-join materializing Σ|bucket|² JVM pair rows with
    an interpreted fold each. Exact 4-dp round + threshold stay
    JVM-side (oracle parity)."""
    from .llm.similarity import _grouped_pair_candidates

    b = _bucketed(_normed(spark, sf_dir), 4)
    return (
        _grouped_pair_candidates(
            b, group_col="bucket", id_col="vec_id", threshold=0.4
        )
        .withColumn("cosine", F.round(F.col("_raw"), 4))
        .filter(F.col("cosine") >= 0.4)
        .select("id_a", "id_b", "cosine")
    )


@query(
    "ann_ivf_topk",
    _EMB_NORM_CTE
    + """
    , cents AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm
                FROM normed WHERE vec_id < 8),
    assigned AS (
      SELECT vec_id, v, nrm, cent_id FROM (
        SELECT n.vec_id, n.v, n.nrm, c.cent_id,
               row_number() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cnrm) DESC,
                          c.cent_id) AS rn
        FROM normed n CROSS JOIN cents c) t
      WHERE rn = 1),
    scored AS (
      SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
             round(list_dot_product(q.v, x.v) / (q.nrm * x.nrm), 4) AS cosine
      FROM assigned q JOIN assigned x
        ON x.cent_id = q.cent_id AND x.vec_id <> q.vec_id
      WHERE q.vec_id IN (10, 11, 12, 13, 14))
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored) t
    WHERE rank <= 5
    """,
    doc="IVF ANN: assign to nearest of 8 centroids, search only the probe cluster",
    survey="LLM similarity search: IVF scale path",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    normed = _normed(spark, sf_dir)
    cents = normed.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )
    # assign: argmax cosine over the (tiny, broadcast) centroid set
    scored = normed.crossJoin(F.broadcast(cents)).withColumn(
        "_c", _cos("v", "cv") / (F.col("nrm") * F.col("cnrm"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("_c"), F.asc("cent_id"))
    assigned = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "v", "nrm", "cent_id")
    )
    q = assigned.filter(F.col("vec_id").isin(10, 11, 12, 13, 14)).select(
        F.col("cent_id"),
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    cand = assigned.select(
        F.col("cent_id"),
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("xv"),
        F.col("nrm").alias("xn"),
    )
    pairs = (
        F.broadcast(q)
        .join(cand, "cent_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(_cos("qv", "xv") / (F.col("qn") * F.col("xn")), 4))
    )
    # two-phase top-k: per-partition prune, then merge the survivors
    # (a bare per-query window would pull every scored candidate of a
    # query onto one reducer)
    from .llm.similarity import _topk_per_query

    return _topk_per_query(pairs.select("query_id", "neighbor_id", "cosine"), 5)


@query(
    "cosine_topk_sq8",
    """
    WITH emb AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    q8 AS (
      SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
      FROM emb),
    qv AS (
      SELECT vec_id,
             CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
                  ELSE list_transform(v, x -> CAST(floor(x / scale + 0.5) AS INT))
             END AS q
      FROM q8),
    nq AS (
      SELECT vec_id, q, sqrt(list_dot_product(q, q)) AS nrm FROM qv
      WHERE sqrt(list_dot_product(q, q)) > 0),
    scored AS (
      SELECT a.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_dot_product(a.q, c.q) / (a.nrm * c.nrm), 4) AS cosine
      FROM nq a JOIN nq c ON c.vec_id <> a.vec_id
      WHERE a.vec_id IN (0, 1, 2, 3, 4))
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored) t
    WHERE rank <= 10
    """,
    doc="cosine top-k over int8 scalar-quantized vectors: 4x smaller "
    "corpus scan (the bandwidth bound at embedding scale), per-vector "
    "scale cancels out of cosine so scoring is integer dot products; "
    "floor(x+0.5) rounding keeps quantization engine-exact for the "
    "oracle. Same broadcast + two-phase bounded top-k plan as the exact "
    "baseline",
    survey="LLM similarity search: quantized scale path",
)
def cosine_topk_sq8_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm.similarity import cosine_topk_sq8

    return cosine_topk_sq8(
        load(spark, sf_dir, "embeddings"), [0, 1, 2, 3, 4], k=10
    )


@query(
    "neardup_clusters",
    _EMB_NORM_CTE
    + """
    , pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM bucketed a JOIN bucketed b
        ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) >= 0.35),
    sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
            UNION ALL SELECT id_b, id_a FROM pairs),
    walk AS (
      WITH RECURSIVE w(node, root) AS (
        SELECT vec_id, vec_id FROM emb
        UNION
        SELECT s.dst, w.root FROM w JOIN sym s ON s.src = w.node
      ) SELECT node, min(root) AS cluster FROM w GROUP BY node)
    SELECT node AS vec_id, cluster, (node = cluster) AS is_representative
    FROM walk
    """,
    doc="duplicate clusters: connected components over near-dup pairs (min-label propagation)",
    survey="LLM dedup: cluster formation after candidate pairs",
)
def neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm.dedup import dedup_clusters

    emb = load(spark, sf_dir, "embeddings")
    # the validated near-dup pair generator at a looser threshold so real
    # multi-node clusters form
    b = _bucketed(_normed(spark, sf_dir), 4)
    a = b.select(
        F.col("bucket"), F.col("vec_id").alias("id_a"),
        F.col("v").alias("va"), F.col("nrm").alias("na"),
    )
    c = b.select(
        F.col("bucket"), F.col("vec_id").alias("id_b"),
        F.col("v").alias("vb"), F.col("nrm").alias("nb"),
    )
    loose = (
        a.join(c, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine", F.round(_cos("va", "vb") / (F.col("na") * F.col("nb")), 4)
        )
        .filter(F.col("cosine") >= 0.35)
        .select("id_a", "id_b")
    )
    return dedup_clusters(emb.select("vec_id"), loose, id_col="vec_id")


# --- multimodal: binary columns + typed metadata, decoded via mapInPandas ---
#
# The oracle replays the deterministic fake decoder arithmetic from the
# sha256 hex digest: byte k of the digest is parsed from hex chars
# 2k+1..2k+2 (instr-based nibble math, no engine hex-cast needed).

_NIB = "instr('0123456789abcdef', substr({h}, {p}, 1)) - 1"


def _byte(h: str, k: int) -> str:
    hi = _NIB.format(h=h, p=2 * k + 1)
    lo = _NIB.format(h=h, p=2 * k + 2)
    return f"(16 * ({hi}) + ({lo}))"


_MM_CTE = f"""
    WITH media AS (
      SELECT doc_id AS media_id,
             CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                  WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
             sha256(text) AS h,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents)
    SELECT media_id, media_type, n_bytes, h AS content_sha256,
           CAST(16 + {_byte('h', 0)} AS INT) AS width,
           CAST(16 + {_byte('h', 1)} AS INT) AS height,
           CAST(CASE WHEN media_type = 'image' THEN 1
                     ELSE 1 + {_byte('h', 2)} % 32 END AS INT) AS n_frames,
           round({_byte('h', 0)} / 255.0, 4) AS f0,
           round({_byte('h', 1)} / 255.0, 4) AS f1
    FROM media
"""


def _media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    mtype = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mtype.alias("media_type"),
        F.encode("text", "UTF-8").alias("content"),
        F.create_map(F.lit("src"), F.col("source")).alias("meta"),
    )


@query(
    "multimodal_decode_features",
    _MM_CTE,
    doc="binary media decode/feature-extract through mapInPandas (fake codec)",
    survey="LLM multimodal columns (decode stubbed by design — container has no codecs)",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = decode_features(_media_df(spark, sf_dir))
    return feats.select(
        "media_id",
        "media_type",
        "n_bytes",
        "content_sha256",
        "width",
        "height",
        "n_frames",
        F.round(F.element_at("features", 1).cast("double"), 4).alias("f0"),
        F.round(F.element_at("features", 2).cast("double"), 4).alias("f1"),
    )


@query(
    "multimodal_resize",
    f"""
    WITH feats AS ({_MM_CTE})
    SELECT media_id, media_type,
           width AS orig_width, height AS orig_height,
           CAST(128 AS INT) AS width,
           CAST(greatest(1, round(height * 128.0 / width)) AS INT) AS height,
           md5(content_sha256 || ':128:' ||
               CAST(CAST(greatest(1, round(height * 128.0 / width)) AS INT) AS VARCHAR))
             AS resized_content_id
    FROM feats
    """,
    doc="aspect-preserving media resize plumbing (codec stage pluggable)",
    survey="LLM multimodal: resize",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm.multimodal import resize_media

    return resize_media(_media_df(spark, sf_dir), target_width=128)


@query(
    "multimodal_frame_sample",
    f"""
    WITH feats AS ({_MM_CTE})
    SELECT media_id, media_type, g.i AS frame_i, content_sha256
    FROM feats CROSS JOIN generate_series(0, 31) g(i)
    WHERE g.i <= n_frames - 1 AND g.i % 10 = 0
    """,
    doc="video/audio frame sampling: explode decoded frame indices, keep every 10th",
    survey="LLM multimodal: frame-sample plumbing",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm.multimodal import sample_frames

    return sample_frames(_media_df(spark, sf_dir), every_nth=10)

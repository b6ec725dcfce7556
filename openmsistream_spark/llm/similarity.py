"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the correctness baseline: the query set is
broadcast, so the scan of the (huge) corpus side never shuffles — each
partition scores its rows against the in-memory queries and a global
top-k per query is taken (TakeOrderedAndProject-style via window over
the small scored-pairs set).

The LSH variant buckets vectors by projection signs so each query only
scores its bucket — the scale path when the corpus is too large for
brute force. Pair scoring runs in one Arrow stage with a pinned
dimension-by-dimension float64 fold (``_arrow_pair_cosine`` — scores
bit-identical to the ``aggregate(zip_with(...))`` SQL fold it replaced,
which Spark evaluates interpreted, outside codegen: the round-8
interpreted-HOF tax class).

Top-k is two-phase: each corpus partition keeps a bounded per-query
top-k (mapInPandas over the narrow scored rows), then the global window
merges only partitions×queries×k survivors. A single `row_number()
OVER (PARTITION BY query_id)` would instead shuffle EVERY scored
candidate of a query to one reducer — |corpus| rows per task at scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from .iterutil import truncate_plan


def _as_double(col: F.Column) -> F.Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    vec = _as_double(F.col(vec_col))
    return df.withColumn("_vec", vec).withColumn("_norm", F.sqrt(_dot(F.col("_vec"), F.col("_vec"))))


def _fold_dots(V: "np.ndarray", C: "np.ndarray") -> "np.ndarray":
    """All row-x-centroid dot products, accumulated dimension-by-
    dimension in float64 — the SAME multiply/add sequence as the SQL
    fold ``aggregate(zip_with(v, cv, *), 0.0, +)`` this stage replaced
    (and as a sequential list dot product in any other engine), so the
    scores are bit-identical to the JVM expression they supersede. A
    BLAS GEMM (``V @ C.T``) would be faster still but sums pairwise,
    which can flip an argmax between two near-tied centroids across
    engines; d vectorized multiply-adds keep SIMD throughput AND the
    pinned summation order."""
    acc = np.zeros((V.shape[0], C.shape[0]), dtype=np.float64)
    for j in range(V.shape[1]):
        acc += V[:, j][:, None] * C[:, j][None, :]
    return acc


def _fold_norms(V: "np.ndarray") -> "np.ndarray":
    """Per-row L2 norms with the same pinned dimension-by-dimension
    float64 fold as ``_fold_dots`` (== the JVM ``sqrt(aggregate(
    zip_with(v, v, *), 0.0, +))`` expression, bit-for-bit)."""
    acc = np.zeros(V.shape[0], dtype=np.float64)
    for j in range(V.shape[1]):
        acc += V[:, j] * V[:, j]
    return np.sqrt(acc)


# elements (rows x centroids) of the per-slice score matrix inside
# _assign_nearest — 4M float64 elements = ~32 MB peak per task
_ASSIGN_SLICE_ELEMS = 4 << 20


def _grouped_pair_candidates(
    df: DataFrame,
    *,
    group_col: str,
    id_col: str = "id",
    vec_col: str = "v",
    norm_col: str = "nrm",
    threshold: float,
) -> DataFrame:
    """(group_col, id_a, id_b, _raw): every within-group pair whose raw
    cosine dot(va, vb)/(na·nb) can still round to >= ``threshold``, as
    ONE grouped Arrow stage — the shared quadratic-island pair scorer
    behind SemDeDup clusters and sign-LSH buckets.

    Shape: each group's vectors cross Arrow ONCE (Σ|group| rows) and
    the quadratic scoring runs vectorized in numpy, emitting only
    near-threshold candidates — an equi-join on the group key instead
    materializes Σ|group|² JVM pair rows carrying BOTH vectors and pays
    an interpreted fold per pair. Skew is identical (a group's pairs
    land on one task either way; group size is the caller's bounded
    knob). Row blocks cap the (block × n) score matrix at ~32 MB per
    task.

    Parity: dots accumulate dimension-by-dimension in float64 — the
    same multiply/add sequence as the SQL fold this replaces, so the
    raw doubles are bit-identical to the old expression. The
    Python-side filter keeps a SLACK margin below the threshold
    (1e-4 > the 5e-5 half-up boundary at 4 dp); the caller applies the
    exact JVM-side ``round(_raw, 4) >= threshold`` — numpy's
    half-to-even rounding never decides an edge. ``id_a < id_b`` via an
    ascending sort of the group's ids (numeric ids — the only kind the
    embedding operators key on — order identically in pandas and
    Spark)."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    id_field = df.schema[id_col]
    schema = StructType(
        [
            df.schema[group_col],
            StructField("id_a", id_field.dataType),
            StructField("id_b", id_field.dataType),
            StructField("_raw", DoubleType()),
        ]
    )
    slack = threshold - 1e-4

    def per_group(pdf):
        n = len(pdf)
        if n < 2:
            return
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        ids = pdf[id_col].to_numpy()
        vm = np.asarray([np.asarray(x, dtype=np.float64) for x in pdf[vec_col]])
        nrm = pdf[norm_col].to_numpy(dtype=np.float64)
        gval = pdf[group_col].iloc[0]
        block = max(1, _ASSIGN_SLICE_ELEMS // n)
        cols = np.arange(n)
        for lo in range(0, n - 1, block):
            hi = min(lo + block, n - 1)
            acc = np.zeros((hi - lo, n), dtype=np.float64)
            for j in range(vm.shape[1]):
                acc += vm[lo:hi, j][:, None] * vm[:, j][None, :]
            raw = acc / (nrm[lo:hi][:, None] * nrm[None, :])
            # ids ascend with the index, so j > i row-index IS id_a < id_b
            ii, jj = np.nonzero(
                (raw >= slack) & (cols[None, :] > (cols[lo:hi][:, None]))
            )
            if len(ii):
                yield pd.DataFrame(
                    {
                        group_col: gval,
                        "id_a": ids[ii + lo],
                        "id_b": ids[jj],
                        "_raw": raw[ii, jj],
                    }
                )

    def apply(key, pdf):
        frames = list(per_group(pdf))
        if not frames:
            return pd.DataFrame(
                {group_col: [], "id_a": [], "id_b": [], "_raw": []}
            ).astype({"_raw": "float64"})
        return pd.concat(frames, ignore_index=True)

    return df.groupBy(group_col).applyInPandas(apply, schema=schema)


def _assign_nearest(
    pts: DataFrame,
    cents: DataFrame,
    *,
    keep: list[str],
    vec_col: str = "v",
    row_norm_col: str | None = None,
    cent_norm_col: str | None = None,
    cluster_col: str = "cluster",
    score_col: str | None = None,
) -> DataFrame:
    """Nearest-centroid assignment as ONE Arrow-batched map stage:
    appends ``cluster_col`` (and optionally ``score_col``) to the
    ``keep`` columns of ``pts``; score is dot(v, cv), divided by
    ``row_norm * cent_norm`` when the norm columns are given (cosine
    against un-normalized centroids). Ties go to the LOWEST cluster id
    (centroids are scored in cluster order and ``argmax`` keeps the
    first maximum — the same tie rule as the previous
    ``max_by(cluster, struct(score, -cluster))`` expression).

    Scale shape: the centroid table is collected (bounded — k rows; the
    caller sizes k corpus-proportionally, see ``resolve_k``) and shipped
    once per executor via ``SparkContext.broadcast`` as a packed numpy
    matrix; each Arrow batch then takes a vectorized argmax over it —
    zero corpus-side shuffle, no corpus x k intermediate rows, and the
    arithmetic runs SIMD instead of one interpreted lambda per
    (row, centroid, dim), which round-8 measured at ~2x the whole
    SemDeDup pipeline. An empty centroid set assigns nothing (no rows).
    """
    sel = ["cluster", "cv"] + ([cent_norm_col] if cent_norm_col else [])
    rows = cents.select(*sel).orderBy("cluster").collect()  # bounded: k rows
    out_fields = [pts.schema[c] for c in keep] + [
        StructField(cluster_col, LongType())
    ]
    if score_col:
        out_fields.append(StructField(score_col, DoubleType()))
    schema = StructType(out_fields)
    if not rows:
        return pts.sparkSession.createDataFrame([], schema)
    clusters = np.asarray([r["cluster"] for r in rows], dtype=np.int64)
    cmat = np.asarray([list(r["cv"]) for r in rows], dtype=np.float64)
    cnrm = (
        np.asarray([r[cent_norm_col] for r in rows], dtype=np.float64)
        if cent_norm_col
        else None
    )
    bc = pts.sparkSession.sparkContext.broadcast((clusters, cmat, cnrm))
    cols = list(
        dict.fromkeys(keep + [vec_col] + ([row_norm_col] if row_norm_col else []))
    )
    inp = pts.select(*cols)

    # bound the (rows x k) score matrix per slice to ~32 MB of float64:
    # at SemDeDup-paper k (~10^4) a whole 10k-row Arrow batch would
    # otherwise materialize an ~800 MB intermediate per task — the
    # argmax is row-local, so slicing changes nothing but peak memory
    rows_per_slice = max(1, _ASSIGN_SLICE_ELEMS // max(1, len(clusters)))

    def assign(batches):
        cl, cm, cn = bc.value
        for pdf in batches:
            for lo in range(0, len(pdf), rows_per_slice):
                sl = pdf.iloc[lo : lo + rows_per_slice]
                if not len(sl):
                    continue
                vm = np.asarray(
                    [np.asarray(x, dtype=np.float64) for x in sl[vec_col]]
                )
                s = _fold_dots(vm, cm)
                if cn is not None:
                    s = s / (
                        sl[row_norm_col].to_numpy(dtype=np.float64)[:, None]
                        * cn[None, :]
                    )
                idx = s.argmax(axis=1)
                out = sl[keep].copy()
                out[cluster_col] = cl[idx]
                if score_col:
                    out[score_col] = s[np.arange(len(idx)), idx]
                yield out

    return inp.mapInPandas(assign, schema=schema)


def _topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    """Two-phase top-k over (query_id, neighbor_id, cosine) rows.

    Phase 1 — per-partition: a running bounded top-k per query inside
    mapInPandas (memory ≤ queries×k + one Arrow batch; no shuffle — rows
    are pruned where the corpus partitions already live).
    Phase 2 — global: the usual window over the tiny survivor set.

    Safe prune: any row in the global top-k under (cosine desc,
    neighbor_id asc) is necessarily in its own partition's top-k under
    the same order.
    """

    def partition_topk(batches):
        best = None
        for pdf in batches:
            cur = pdf if best is None else pd.concat([best, pdf], ignore_index=True)
            cur = cur.sort_values(
                ["cosine", "neighbor_id"], ascending=[False, True], kind="mergesort"
            )
            best = cur.groupby("query_id", sort=False).head(k)
        if best is not None and len(best):
            yield best

    pruned = scored.mapInPandas(partition_topk, schema=scored.schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _arrow_pair_cosine(pairs: DataFrame) -> DataFrame:
    """(query_id, neighbor_id, cosine) from (query_id, neighbor_id,
    q_vec, c_vec) vector-pair rows in ONE mapInPandas stage: norms and
    the dot product accumulate dimension-by-dimension in float64 — the
    SAME fold order as the ``aggregate(zip_with(...))`` SQL expression
    this stage replaced, so scores are bit-identical to the JVM fold
    (and to a sequential list dot in any oracle engine) — with
    zero-norm pairs dropped (the filter the JVM shape applied before
    its join). Spark evaluates higher-order functions interpreted,
    outside codegen: the expression form charged ~d interpreted lambda
    evaluations per PAIR and benched ~4x this stage on the sq8 path
    (the round-8 argmax tax class). The exact 4-dp HALF_UP round stays
    JVM-side on the emitted double. NULL vectors and length-mismatched
    pairs are dropped JVM-side before the stage (``np.stack`` would
    otherwise raise on a ragged batch; the old expression path scored
    such rows NULL, which ranked them last — dropping is the same
    observable top-k)."""
    pairs = pairs.filter(
        F.col("q_vec").isNotNull()
        & F.col("c_vec").isNotNull()
        & (F.size("q_vec") == F.size("c_vec"))
    )
    out_schema = StructType(
        [
            pairs.schema["query_id"],
            pairs.schema["neighbor_id"],
            StructField("cosine", DoubleType()),
        ]
    )

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            Q = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["q_vec"]])
            C = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["c_vec"]])
            n = len(pdf)
            dot = np.zeros(n)
            qn = np.zeros(n)
            cn = np.zeros(n)
            for j in range(Q.shape[1]):
                dot += Q[:, j] * C[:, j]
                qn += Q[:, j] * Q[:, j]
                cn += C[:, j] * C[:, j]
            qn, cn = np.sqrt(qn), np.sqrt(cn)
            keep = (qn > 0) & (cn > 0)
            if not keep.any():
                continue
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy()[keep],
                    "neighbor_id": pdf["neighbor_id"].to_numpy()[keep],
                    "cosine": dot[keep] / (qn[keep] * cn[keep]),
                }
            )

    return pairs.mapInPandas(score, schema=out_schema).withColumn(
        "cosine", F.round(F.col("cosine"), 4)
    )


def _arrow_scan_vs_queries(corpus: DataFrame, queries: DataFrame) -> DataFrame:
    """(query_id, neighbor_id, cosine) from a corpus of (neighbor_id,
    c_vec) against a BOUNDED query table (query_id, q_vec): the queries
    collect to the driver (bounded by the caller's query-id list — the
    same bounded-collect class as the packed centroid table in
    ``_assign_nearest``) and broadcast as one matrix; each Arrow batch
    of corpus vectors scores against ALL queries with the pinned
    dimension-by-dimension float64 fold (``_fold_dots`` — bit-identical
    to the SQL ``aggregate(zip_with(...))`` fold this replaced). No
    join, and query vectors never ship per-pair. Zero-norm vectors and
    self-pairs drop inside the stage; NULL and dimension-mismatched
    corpus vectors drop JVM-side before it (``np.stack`` would raise on
    a ragged batch; the old expression path scored them NULL = ranked
    last, so dropping preserves the observable top-k); the exact 4-dp
    HALF_UP round stays JVM-side."""
    qrows = [r for r in queries.collect() if r["q_vec"] is not None]
    out_schema = StructType(
        [
            queries.schema["query_id"],
            corpus.schema["neighbor_id"],
            StructField("cosine", DoubleType()),
        ]
    )
    if not qrows:
        return corpus.sparkSession.createDataFrame([], out_schema)
    qids = np.array([r["query_id"] for r in qrows])
    Q = np.stack([np.asarray(r["q_vec"], dtype=np.float64) for r in qrows])
    corpus = corpus.filter(
        F.col("c_vec").isNotNull() & (F.size("c_vec") == Q.shape[1])
    )
    bc = corpus.sparkSession.sparkContext.broadcast((qids, Q, _fold_norms(Q)))

    def score(batches):
        ids, Qm, qnorm = bc.value
        qok = qnorm > 0
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["c_vec"]])
            dots = _fold_dots(C, Qm)  # (rows, queries), pinned order
            cn = _fold_norms(C)
            nids = pdf["neighbor_id"].to_numpy()
            keep = (cn[:, None] > 0) & qok[None, :] & (nids[:, None] != ids[None, :])
            if not keep.any():
                continue
            r, q = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "query_id": ids[q],
                    "neighbor_id": nids[r],
                    "cosine": dots[r, q] / (qnorm[q] * cn[r]),
                }
            )

    return corpus.mapInPandas(score, schema=out_schema).withColumn(
        "cosine", F.round(F.col("cosine"), 4)
    )


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: for each query id, the k nearest other vectors.

    Output: query_id, neighbor_id, cosine (rounded, which also makes the
    ranking engine-portable), rank. Scoring is one broadcast-query Arrow
    scan (``_arrow_scan_vs_queries``) — the corpus never joins and never
    shuffles.
    """
    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    queries = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    return _topk_per_query(_arrow_scan_vs_queries(corpus, queries), k)


def quantize_int8(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization: scale =
    max|v|/127, q[i] = floor(v[i]/scale + 0.5) — 4x smaller vectors, so
    an ANN scan moves a quarter of the bytes (at 100 TB of embeddings
    the scan is bandwidth-bound; this is the standard serving trick
    before PQ). floor(x+0.5) instead of round() because engines differ
    on round-half-to-even; floor is identical everywhere, making the
    quantized vectors oracle-exact. Zero vectors quantize to zeros.

    Returns (id, qvec array<int>, scale double) — dequantize as
    q[i]*scale; cosine needs no dequantization at all (scales cancel).
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    qv = F.when(
        scale == 0, F.transform(v, lambda x: F.lit(0).cast("int"))
    ).otherwise(F.transform(v, lambda x: F.floor(x / scale + F.lit(0.5)).cast("int")))
    return embeddings.select(
        F.col(id_col), qv.alias("qvec"), scale.alias("scale")
    )


def cosine_topk_sq8(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k over int8-quantized vectors: identical
    plan shape to the exact brute force (broadcast queries, two-phase
    bounded top-k) but the corpus scan reads int8 arrays — the
    per-vector scale cancels out of cosine, so scoring is pure integer
    dot products normalized by quantized norms. Accuracy loss is the
    quantization error (~1e-2 on cosine); ranking ties are broken by
    neighbor id, deterministically."""
    qz = quantize_int8(embeddings, id_col=id_col, vec_col=vec_col)
    corpus = qz.select(
        F.col(id_col).alias("neighbor_id"), F.col("qvec").alias("c_vec")
    )
    queries = qz.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("qvec").alias("q_vec")
    )
    # integer products are exact in float64 (|q| <= 127, d-bounded), so
    # the Arrow fold reproduces the JVM int-fold bit-for-bit; zero-norm
    # vectors and self-pairs drop inside the stage
    return _topk_per_query(_arrow_scan_vs_queries(corpus, queries), k)


def lsh_bucket(vec_col: F.Column, n_bits: int = 4) -> F.Column:
    """Projection-sign bucket id: bit i = sign(vec[i]).

    Axis-aligned sign projections — deterministic and engine-portable.
    (A random-hyperplane family plugs in by replacing the projection
    with a dot product against broadcast hyperplanes.)
    """
    bits = [
        (F.element_at(vec_col, i + 1) > 0).cast("int") * (2**i) for i in range(n_bits)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def cosine_topk_lsh(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: score only within the query's LSH bucket.

    At scale the corpus is pre-partitioned by bucket, so a query touches
    1/2^n_bits of the data; recall trades off against n_bits.
    """
    corpus = embeddings.withColumn(
        "bucket", lsh_bucket(_as_double(F.col(vec_col)), n_bits)
    ).select(
        F.col(id_col).alias("neighbor_id"), "bucket", F.col(vec_col).alias("c_vec")
    )
    queries = (
        embeddings.filter(F.col(id_col).isin(query_ids))
        .withColumn("bucket", lsh_bucket(_as_double(F.col(vec_col)), n_bits))
        .select(
            F.col(id_col).alias("query_id"), "bucket", F.col(vec_col).alias("q_vec")
        )
    )
    pairs = (
        corpus.join(F.broadcast(queries), on="bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "q_vec", "c_vec")
    )
    scored = _arrow_pair_cosine(pairs)
    return _topk_per_query(scored, k)


def incremental_embedding_dedup(
    embeddings: DataFrame,
    registry,
    threshold: float = 0.95,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    run_id: str | None = None,
) -> DataFrame:
    """Cross-run EMBEDDING near-dup against a durable sign-LSH ledger —
    the embedding-space member of the incremental dedup family
    (``llm.dedup.incremental_exact_dedup`` /
    ``incremental_minhash_dedup``): each ingest run drops vectors whose
    cosine similarity to anything ANY prior run admitted reaches
    ``threshold``, then records the survivors.

    Ledger layout (``make_registry`` keyed ``["bucket", id_col]``): one
    row per admitted vector holding its sign-LSH bucket and int8
    quantized form — ~dim bytes per vector instead of 8·dim (the scale
    factor cancels out of cosine, so verification is integer dot
    products with no dequantization). New-batch vectors equi-join the
    ledger's bucket (a 2^n_bits-way partition of the space); candidate
    fan-out per batch vector is the ledger's bucket occupancy, so raise
    ``n_bits`` as the corpus grows (each bit halves the bucket). A
    candidate pair verifies by quantized cosine; quantization error
    (~1e-2) applies to the threshold.

    Zero vectors (no direction, cosine undefined) fall back to identity
    dedup: they share the all-zero quantized form, so an incoming zero
    vector collides with any ledgered one and is dropped — and every
    vector, zero or not, is ledgered, keeping replays idempotent.

    ``run_id`` semantics and the recovery story are identical to the
    text deduppers: admitted rows re-derive from the committed ledger
    (no executor-pinned state), and a same-``run_id`` replay returns the
    identical admitted set — exactly-once restarts for a streaming
    foreachBatch caller.

    ``n_bits`` defines the ledger's bucket space — a later run under a
    different ``n_bits`` produces buckets that can never match the
    ledger's, silently admitting every near-duplicate of prior runs —
    so it persists in a ``_params`` sidecar on the first run and is
    validated on every later one (``streaming/params_guard.py``;
    ``threshold`` stays per-run policy, as in the MinHash twin).

    Returns the admitted rows of ``embeddings``.
    """
    import uuid

    from ..streaming.params_guard import ensure_sidecar_params

    ensure_sidecar_params(
        registry, {"n_bits": n_bits}, "incremental_embedding_dedup"
    )
    run_id = run_id if run_id is not None else uuid.uuid4().hex
    qz = quantize_int8(embeddings, id_col=id_col, vec_col=vec_col)
    vec = _as_double(F.col(vec_col))
    buckets = embeddings.select(
        F.col(id_col), lsh_bucket(vec, n_bits).alias("bucket")
    )
    banded = buckets.join(qz.select(id_col, "qvec"), id_col)

    seen = registry.read()
    if seen is not None:
        nrm_new = F.sqrt(_dot(F.col("qvec"), F.col("qvec")))
        nrm_old = F.sqrt(_dot(F.col("old_qvec"), F.col("old_qvec")))
        cand = banded.join(
            seen.select("bucket", F.col("qvec").alias("old_qvec")), "bucket"
        )
        cos_dup = (nrm_new > 0) & (nrm_old > 0) & (
            _dot(F.col("qvec"), F.col("old_qvec")) / (nrm_new * nrm_old)
            >= F.lit(threshold)
        )
        zero_dup = (nrm_new == 0) & (nrm_old == 0)
        dups = cand.filter(cos_dup | zero_dup).select(id_col).distinct()
        admitted_ids = embeddings.select(id_col).join(dups, id_col, "left_anti")
    else:
        admitted_ids = embeddings.select(id_col)

    new_rows = banded.join(admitted_ids, id_col, "left_semi")
    registry.upsert(
        new_rows.select("bucket", id_col, "qvec", F.lit(run_id).alias("run_id"))
    )
    mine = (
        registry.read()
        .filter(F.col("run_id") == run_id)
        .select(id_col)
        .distinct()
    )
    return embeddings.join(mine, id_col, "left_semi")


def kmeans_fit(
    embeddings: DataFrame,
    k: int = 8,
    max_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint_dir: str | None = None,
    tol: float = 1e-9,
) -> DataFrame:
    """Spherical k-means (Lloyd's) over the embedding column — the
    centroid trainer for a real IVF index (``ann_ivf_topk`` /
    ``ivf_search`` currently accept any centroid table; this produces
    one from the data instead of a fixed seed set).

    Deterministic everywhere: init = the k lowest-id vectors;
    assignment ties break toward the lowest cluster id; the centroid
    update is a per-dimension sum whose direction (all that matters on
    the unit sphere) is order-independent only up to float summation —
    so each summed coordinate is rounded to 9 dp before normalization,
    pinning run-to-run equality.

    Scale shape, per iteration: ONE corpus scan. Assignment broadcasts
    the k x dim centroid matrix (bytes, never a corpus shuffle) and
    takes a vectorized per-row argmax in one Arrow map stage
    (``_assign_nearest`` — no corpus x k rows, no shuffle, SIMD
    arithmetic); the update is posexplode -> (cluster, dim) partial
    sums — k x dim result rows regardless of corpus size. Centroids are
    ``localCheckpoint``-ed per iteration to truncate lineage (the
    iterative-algorithm idiom, same as ``dedup_clusters``); by default
    this is iteration-internal state — executor loss fails the job and
    the fit simply re-runs, nothing durable depends on it. Pass
    ``checkpoint_dir=`` to truncate with a RELIABLE checkpoint instead
    (fault-tolerant storage), so long fits survive executor loss.

    Spherical = centroids live on the unit sphere and assignment is by
    max dot product; re-normalization makes the mean's 1/n cancel, so
    no per-cluster count join is needed. A cluster whose members sum to
    (near) zero keeps its previous centroid. Zero-norm input vectors
    are excluded (no direction).

    Returns (cluster BIGINT, centroid ARRAY<DOUBLE> unit-norm).
    """
    pts = (
        _with_norm(embeddings, vec_col)
        .filter(F.col("_norm") > 0)
        .select(
            F.col(id_col).alias("id"),
            F.transform(
                F.col("_vec"), lambda x: x / F.col("_norm")
            ).alias("v"),
        )
    )
    wk = Window.orderBy("id")
    cents = (
        pts.orderBy("id")
        .limit(k)
        .select(
            (F.row_number().over(wk) - 1).cast("bigint").alias("cluster"),
            F.col("v").alias("cv"),
        )
    )
    cents = truncate_plan(cents, checkpoint_dir)
    for _ in range(max_iters):
        prev = cents
        assigned = _assign_nearest(pts, cents, keep=["v"], vec_col="v")
        sums = (
            assigned.select("cluster", F.posexplode("v").alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(F.round(F.sum("val"), 9).alias("s"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "s"))),
                    lambda x: x.getField("s"),
                ).alias("sv")
            )
        )
        nrm = F.sqrt(_dot(F.col("sv"), F.col("sv")))
        stepped = (
            cents.join(sums, "cluster", "left")
            .select(
                "cluster",
                F.when(
                    F.coalesce(nrm, F.lit(0.0)) > 0,
                    F.transform(F.col("sv"), lambda x: x / nrm),
                )
                .otherwise(F.col("cv"))  # empty/degenerate: keep previous
                .alias("cv"),
            )
        )
        cents = truncate_plan(stepped, checkpoint_dir)
        # early stop at the fixpoint: both frames are k unit vectors on
        # materialized leaves, so the movement probe is a k-row join
        # (cos >= 1 - tol per cluster means no centroid moved) — at 10
        # scheduled Lloyd passes on an already-converged clustering the
        # probe is ~free and the saved passes are full corpus scans
        moved = (
            cents.join(
                prev.select("cluster", F.col("cv").alias("_pv")), "cluster"
            )
            .filter(_dot(F.col("cv"), F.col("_pv")) < 1.0 - tol)
            .count()
        )
        if moved == 0:
            break
    return cents.select("cluster", F.col("cv").alias("centroid"))


def kmeans_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid (max cosine; ties to
    the lowest cluster id) — the IVF index build. The centroid matrix
    is broadcast once per executor and each Arrow batch takes a
    vectorized argmax over it (``_assign_nearest``): no corpus x k
    intermediate rows, no shuffle (the old groupBy reduction
    re-shuffled the whole corpus), and the dot products run SIMD
    instead of one interpreted lambda per (row, centroid, dim).
    Zero-norm vectors are excluded (no direction).

    Returns (id_col, cluster, dot) — ``dot`` is the cosine to the
    assigned centroid (centroids are unit-norm from ``kmeans_fit``).

    Precondition: ``id_col`` is unique (embedding tables are keyed by
    vec_id). A duplicated id now yields one output row per input row —
    the old groupBy shape silently collapsed duplicates, but only by
    paying a full corpus shuffle for well-formed inputs too.
    """
    pts = (
        _with_norm(embeddings, vec_col)
        .filter(F.col("_norm") > 0)
        .select(
            F.col(id_col),
            F.transform(F.col("_vec"), lambda x: x / F.col("_norm")).alias("v"),
        )
    )
    return _assign_nearest(
        pts,
        centroids.select("cluster", F.col("centroid").alias("cv")),
        keep=[id_col],
        vec_col="v",
        score_col="dot",
    )


def ivf_search(
    embeddings: DataFrame,
    centroids: DataFrame,
    query_ids: list[int],
    k: int = 10,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN search with trained centroids: each query scores only the
    vectors assigned to its ``nprobe`` nearest clusters — the recall
    knob (nprobe=#clusters degrades to exact brute force).

    Scale shape: the index build is one broadcast pass
    (``kmeans_assign``); queries x nprobe probe rows are broadcast
    against the clustered corpus (an equi-join on cluster — only probed
    clusters are scanned when the index is partitioned/bucketed by
    cluster on disk); top-k uses the two-phase bounded merge
    (``_topk_per_query``), never a full-corpus window.

    Returns (query_id, neighbor_id, cosine, rank<=k).
    """
    assigned = kmeans_assign(embeddings, centroids, id_col=id_col, vec_col=vec_col)
    pts = (
        _with_norm(embeddings, vec_col)
        .filter(F.col("_norm") > 0)
        .select(
            F.col(id_col),
            F.transform(F.col("_vec"), lambda x: x / F.col("_norm")).alias("v"),
        )
        .join(assigned.select(id_col, "cluster"), id_col)
    )
    q = pts.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv")
    )
    # nprobe nearest clusters per query, from the broadcast centroid set
    probes = (
        q.crossJoin(
            F.broadcast(centroids.select("cluster", F.col("centroid").alias("cv")))
        )
        .withColumn("dot", _dot(F.col("qv"), F.col("cv")))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("dot"), F.asc("cluster")
                )
            ),
        )
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "qv", "cluster")
    )
    scored = (
        pts.join(F.broadcast(probes), "cluster")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(_dot(F.col("qv"), F.col("v")), 4).alias("cosine"),
        )
    )
    return _topk_per_query(scored, k)


def write_ivf_index(
    embeddings: DataFrame,
    centroids: DataFrame,
    path: str,
    mode: str = "overwrite",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index as CLUSTER-PARTITIONED parquet:
    ``{path}/cluster=C/*.parquet``. This is what makes IVF an actual
    index at 100 TB rather than a logical label: a probed search joins
    on the partition column, so Spark's dynamic partition pruning
    (see ``ivf_search_index``) reads ONLY the probed clusters' files —
    I/O scales with nprobe/k of the corpus, not the corpus.

    Deterministic (assignment is; parquet layout is) — re-running a
    failed write converges under mode='overwrite'.
    """
    assigned = kmeans_assign(embeddings, centroids, id_col=id_col, vec_col=vec_col)
    (
        embeddings.join(assigned.select(id_col, "cluster"), id_col)
        .write.mode(mode)
        .partitionBy("cluster")
        .parquet(path)
    )


def ivf_search_index(
    spark,
    path: str,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN search against a ``write_ivf_index`` on-disk index.

    ``queries`` is a small (query_id, ``vec_col``) frame — it rides a
    broadcast, and the probe→index join is an equi-join on the
    PARTITION column, so Catalyst inserts a dynamic-partition-pruning
    subquery into the index scan: only the ≤ queries x nprobe probed
    cluster directories are listed and read. No driver-side collect of
    the probe set is needed — the pruning literal is produced at runtime
    by the DPP subquery, which is exactly the mechanism a 1000-executor
    scan wants (the plan shows ``dynamicpruningexpression`` under
    PartitionFilters; tests assert it).

    Returns (query_id, neighbor_id, cosine, rank<=k) like the in-memory
    ``ivf_search``.
    """
    qn = (
        _with_norm(queries, vec_col)
        .filter(F.col("_norm") > 0)
        .select(
            "query_id",
            F.transform(F.col("_vec"), lambda x: x / F.col("_norm")).alias("qv"),
        )
    )
    probes = (
        qn.crossJoin(
            F.broadcast(centroids.select("cluster", F.col("centroid").alias("cv")))
        )
        .withColumn("dot", _dot(F.col("qv"), F.col("cv")))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("dot"), F.asc("cluster")
                )
            ),
        )
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "qv", "cluster")
    )
    index = spark.read.parquet(path)
    pts = (
        _with_norm(index, vec_col)
        .filter(F.col("_norm") > 0)
        .select(
            F.col(id_col),
            F.col("cluster"),
            F.transform(F.col("_vec"), lambda x: x / F.col("_norm")).alias("v"),
        )
    )
    scored = (
        pts.join(F.broadcast(probes), "cluster")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(_dot(F.col("qv"), F.col("v")), 4).alias("cosine"),
        )
    )
    return _topk_per_query(scored, k)


def recall_at_k(
    exact: DataFrame,
    approx: DataFrame,
    k: int | None = None,
) -> DataFrame:
    """Per-query recall of an ANN result against the exact ground truth —
    the number every nprobe/band/quantization knob is tuned by.

    Both inputs are (query_id, neighbor_id[, cosine, rank]) frames as
    returned by ``cosine_topk`` (exact) and ``ivf_search`` /
    ``cosine_topk_lsh`` / ``cosine_topk_sq8`` (approximate); ``k``
    optionally trims both to rank <= k first. Recall is computed per
    query as |approx ∩ exact| / |exact| via a semi join on
    (query_id, neighbor_id) — no vectors move, only id pairs.

    Returns (query_id, n_exact, n_hit, recall) — aggregate with
    ``F.avg("recall")`` for the corpus-level figure.
    """
    if k is not None:
        # a one-sided trim silently inflates recall (hits counted
        # against an untrimmed candidate set) — demand rank on BOTH
        missing = [
            side
            for side, df_ in (("exact", exact), ("approx", approx))
            if "rank" not in df_.columns
        ]
        if missing:
            raise ValueError(
                f"recall_at_k(k={k}) needs a 'rank' column on both "
                f"inputs to trim; missing on: {', '.join(missing)} "
                "(pass k=None to compare the frames as given)"
            )
        exact = exact.filter(F.col("rank") <= k)
        approx = approx.filter(F.col("rank") <= k)
    e = exact.select("query_id", "neighbor_id")
    a = approx.select("query_id", "neighbor_id")
    n_exact = e.groupBy("query_id").agg(F.count("*").alias("n_exact"))
    n_hit = (
        e.join(a, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        n_exact.join(n_hit, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            F.round(
                F.coalesce("n_hit", F.lit(0)) / F.col("n_exact"), 4
            ).alias("recall"),
        )
    )

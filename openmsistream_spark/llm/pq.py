"""Product quantization (PQ) for embedding columns — the compressed
scale path for similarity search (Jégou et al. 2011, "Product
Quantization for Nearest Neighbor Search").

Why this exists at 100 TB: an ANN scan over raw float32 embeddings is
bandwidth-bound — ``cosine_topk_sq8`` already cuts the scan 4x by
scalar quantization, but PQ cuts it ~32x further: each d-dim vector
becomes ``m`` one-byte codes (64-dim float32 = 256 B -> 8 B at m=8),
and query-time scoring never decodes — each query precomputes an
(m x kc) lookup table of partial dot products and every corpus vector
is scored by ``m`` integer table lookups + adds (ADC, asymmetric
distance computation). The corpus-side plan is scan -> mapInPandas
(broadcast codebooks / LUTs, zero Exchange) -> bounded two-phase
top-k — identical shape to the exact baseline, moving 1/32 the bytes.

Design notes (engine-exactness, matching this repo's oracle discipline):

- **Encoding** assigns each subvector to its nearest codeword by
  squared L2 distance expanded as ``dxx - 2*dxc + dcc`` where every dot
  product is a PINNED sequential fold over dimensions (``_fold_dots``
  order) — the identical double arithmetic a SQL engine's
  ``list_dot_product`` computes, so an oracle can reproduce the codes
  bit-for-bit. Ties go to the LOWEST code id (numpy ``argmin`` keeps
  the first minimum; SQL mirrors with ``row_number() ... ORDER BY dist,
  code``).
- **ADC scores** are accumulated in integer micro-units: each LUT
  partial ``dot(q_sub, codeword)`` is rounded HALF-UP at 6 dp (the
  Spark/DuckDB ``round(double, n)`` rule — NOT Python's banker's
  ``round``), scaled to int64 micros, and the per-vector sum of ``m``
  such ints is exact and order-free; the reported double score is
  ``micros / 1e6``. Cross-engine float-sum order can therefore never
  flip a rank.

Reference parity: the reference engine has no ANN surface; this module
extends the brief's similarity-search family (SURVEY §2 addendum) the
way ``write_ivf_index`` / ``cosine_topk_sq8`` do.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from .similarity import _as_double, _fold_dots, _topk_per_query


def _check_dims(d: int, m: int) -> int:
    if m <= 0 or d % m != 0:
        raise ValueError(f"vector dim {d} not divisible into m={m} subspaces")
    return d // m


def _round_half_up(x: float, ndigits: int) -> float:
    """``round(double, n)`` the way Spark and DuckDB do it: HALF_UP,
    where Python's builtin ``round`` is banker's and diverges on exact
    halves. Caveat: this applies HALF_UP to the EXACT decimal expansion
    of the binary double (Python ``Decimal``), while the engines round
    the scaled binary double — on knife-edge values whose expansion
    lands exactly on a half the two conventions can differ in the last
    digit, so cross-engine parity here is empirical (it holds on the
    whole sf0.01 sweep), not guaranteed by construction. If a PQ oracle
    hash ever mismatches on a single entry, check this seam first."""
    return float(Decimal(x).quantize(Decimal(1).scaleb(-ndigits), rounding=ROUND_HALF_UP))


def _lut_micros(part: float) -> int:
    """The pinned double->int64 micro conversion both engines replicate
    (up to the knife-edge caveat on ``_round_half_up``):
    round(part, 6) -> * 1e6 (double multiply) -> round(., 0) -> int."""
    p6 = _round_half_up(part, 6)
    return int(_round_half_up(p6 * 1.0e6, 0))


def _seq_dot(a: np.ndarray, b: np.ndarray) -> float:
    """Sequential left-fold dot product — the same multiply/add order as
    the SQL ``aggregate(zip_with(...))`` fold and ``list_dot_product``,
    so results are bit-identical across engines (a BLAS dot sums
    pairwise and can differ in the last ulp)."""
    acc = 0.0
    for j in range(a.shape[0]):
        acc += float(a[j]) * float(b[j])
    return acc


# (rows x dims) @ (codes x dims)^T with per-dimension accumulation is
# similarity._fold_dots — ONE copy of the exactness-critical pinned-fold
# kernel repo-wide (an earlier draft duplicated it here)
_fold_dots_mat = _fold_dots


def pq_codebooks_from_seeds(
    embeddings: DataFrame,
    m: int = 8,
    kc: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Seeded codebooks (the ``ann_ivf_topk`` convention): subspace
    ``s``'s codewords are the ``s``-th subvectors of the first ``kc``
    vectors by id — fully reproducible by an oracle without running
    Lloyd's. Returns (sub, code, cw: array<double>). ``pq_fit`` is the
    trained path."""
    d = len(embeddings.select(vec_col).first()[0])
    dsub = _check_dims(d, m)
    seeds = embeddings.filter(F.col(id_col) < kc).select(
        F.col(id_col).cast("long").alias("code"), _as_double(F.col(vec_col)).alias("_v")
    )
    return seeds.select(
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"), "code", "_v"
    ).select(
        "sub",
        "code",
        F.expr(f"slice(_v, sub * {dsub} + 1, {dsub})").alias("cw"),
    )


def _collect_codebooks(codebooks: DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """Bounded collect of the (sub, code, cw) table -> dense
    (m, kc, dsub) tensor + (m, kc) codeword self-dot matrix ``dcc``
    (sequential-fold, precomputed once). Codes must form a dense
    0..kc-1 range per subspace."""
    rows = codebooks.select("sub", "code", "cw").orderBy("sub", "code").collect()
    if not rows:
        raise ValueError("empty codebook table")
    m = max(r["sub"] for r in rows) + 1
    kc = max(r["code"] for r in rows) + 1
    dsub = len(rows[0]["cw"])
    C = np.zeros((m, kc, dsub), dtype=np.float64)
    seen = np.zeros((m, kc), dtype=bool)
    for r in rows:
        C[r["sub"], r["code"]] = np.asarray(list(r["cw"]), dtype=np.float64)
        seen[r["sub"], r["code"]] = True
    if not seen.all():
        raise ValueError("codebook table is not dense over (sub, code)")
    dcc = np.zeros((m, kc), dtype=np.float64)
    for s in range(m):
        for c in range(kc):
            dcc[s, c] = _seq_dot(C[s, c], C[s, c])
    return C, dcc


def pq_encode(
    embeddings: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector to ``m`` codes: per subspace, the nearest
    codeword by squared L2 (``dxx - 2*dxc + dcc``, pinned fold order;
    ties -> lowest code). ONE Arrow-batched map stage over the corpus —
    codebooks ship via broadcast, no shuffle, no corpus x codes
    intermediate rows. Returns (id, codes: array<int>)."""
    C, dcc = _collect_codebooks(codebooks)
    return _encode_dense(embeddings, C, dcc, id_col=id_col, vec_col=vec_col)


def _encode_dense(
    embeddings: DataFrame,
    C: np.ndarray,
    dcc: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """pq_encode against an ALREADY-collected dense codebook tensor —
    callers that collected (C, dcc) for their own LUTs (pq_adc_topk)
    reuse it instead of re-running the codebook collect + dim probe."""
    spark = embeddings.sparkSession
    m, kc, dsub = C.shape
    bc = spark.sparkContext.broadcast((C, dcc))
    schema = StructType(
        [
            StructField(id_col, embeddings.schema[id_col].dataType),
            StructField("codes", ArrayType(IntegerType())),
        ]
    )
    inp = embeddings.select(id_col, _as_double(F.col(vec_col)).alias("_v"))

    def encode(batches):
        Cb, dccb = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.asarray([np.asarray(x, dtype=np.float64) for x in pdf["_v"]])
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for s in range(m):
                sub = V[:, s * dsub : (s + 1) * dsub]
                dxc = _fold_dots_mat(sub, Cb[s])
                # dxx per row, sequential fold
                dxx = np.zeros(len(pdf), dtype=np.float64)
                for j in range(dsub):
                    dxx += sub[:, j] * sub[:, j]
                dist = dxx[:, None] - 2.0 * dxc + dccb[s][None, :]
                codes[:, s] = dist.argmin(axis=1)  # first min == lowest code
            out = pdf[[id_col]].copy()
            out["codes"] = list(codes)
            yield out

    return inp.mapInPandas(encode, schema=schema)


def pq_fit(
    embeddings: DataFrame,
    m: int = 8,
    kc: int = 16,
    max_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tol: float = 1e-6,
) -> DataFrame:
    """Train per-subspace L2 k-means codebooks (classic PQ training).

    Scale shape: ONE exploded (id, sub, subvec) frame (corpus x m rows,
    narrow — dsub doubles each); every Lloyd iteration is one broadcast
    Arrow assignment pass + one groupBy(sub, code) mean (map-side
    partial aggregation makes the shuffle m*kc*dsub per partition, not
    corpus-sized). Seeds are the first kc vectors' subvectors
    (deterministic). Iteration stops when every codeword moves less
    than ``tol`` (squared-L2) or at ``max_iter``. Returns the
    (sub, code, cw) codebook table, materialized."""
    spark = embeddings.sparkSession
    d = len(embeddings.select(vec_col).first()[0])
    dsub = _check_dims(d, m)
    exploded = (
        embeddings.select(id_col, _as_double(F.col(vec_col)).alias("_v"))
        .select(
            id_col,
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
            F.col("_v"),
        )
        .select(
            id_col, "sub", F.expr(f"slice(_v, sub * {dsub} + 1, {dsub})").alias("sv")
        )
    )
    cb = pq_codebooks_from_seeds(embeddings, m=m, kc=kc, id_col=id_col, vec_col=vec_col)
    C, dcc = _collect_codebooks(cb)
    for _ in range(max_iter):
        bc = spark.sparkContext.broadcast((C, dcc))
        mm, kk, dd = C.shape
        schema = StructType(
            [
                StructField("sub", IntegerType()),
                StructField("code", IntegerType()),
                StructField("sv", ArrayType(DoubleType())),
            ]
        )

        def assign(batches):
            Cb, dccb = bc.value
            for pdf in batches:
                if not len(pdf):
                    continue
                subs = pdf["sub"].to_numpy()
                V = np.asarray([np.asarray(x, dtype=np.float64) for x in pdf["sv"]])
                code = np.empty(len(pdf), dtype=np.int32)
                for s in np.unique(subs):
                    msk = subs == s
                    dxc = _fold_dots_mat(V[msk], Cb[s])
                    dxx = (V[msk] * V[msk]).sum(axis=1)
                    dist = dxx[:, None] - 2.0 * dxc + dccb[s][None, :]
                    code[msk] = dist.argmin(axis=1)
                out = pdf[["sub"]].copy()
                out["sub"] = subs.astype(np.int32)
                out["code"] = code
                out["sv"] = pdf["sv"]
                yield out[["sub", "code", "sv"]]

        means = (
            exploded.mapInPandas(assign, schema=schema)
            .groupBy("sub", "code")
            .agg(
                F.array(
                    *[F.avg(F.col("sv")[j]) for j in range(dsub)]
                ).alias("cw")
            )
            .collect()
        )
        newC = C.copy()
        for r in means:
            newC[r["sub"], r["code"]] = np.asarray(list(r["cw"]), dtype=np.float64)
        moved = float(((newC - C) ** 2).sum(axis=2).max())
        C = newC
        dcc = np.zeros((mm, kk), dtype=np.float64)
        for s in range(mm):
            for c in range(kk):
                dcc[s, c] = _seq_dot(C[s, c], C[s, c])
        bc.destroy()
        if moved < tol:
            break
    rows = [
        (int(s), int(c), [float(x) for x in C[s, c]])
        for s in range(C.shape[0])
        for c in range(C.shape[1])
    ]
    out_schema = StructType(
        [
            StructField("sub", IntegerType()),
            StructField("code", LongType()),
            StructField("cw", ArrayType(DoubleType())),
        ]
    )
    return spark.createDataFrame(rows, schema=out_schema)


def pq_adc_topk(
    embeddings: DataFrame,
    codebooks: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric-distance top-k: approximate inner product between each
    FULL-PRECISION query and every PQ-encoded corpus vector.

    Per query the (m x kc) LUT of partial dots is computed once
    driver-side (bounded: queries x m x kc int64 micros) and broadcast;
    each corpus row is then scored by m integer lookups + adds inside
    the SAME Arrow stage that holds its codes — scan -> encode+score ->
    bounded two-phase top-k, zero corpus-side Exchange before the
    survivor merge. Integer-micro accumulation makes scores order-free
    and engine-exact (see module doc).

    ``codes=`` injects a pre-encoded (id, codes) frame (e.g. a stored
    code column — the pay-encode-once serving path); by default the
    corpus is encoded inline. Self-matches are excluded. Output:
    (query_id, neighbor_id, score, rank).
    """
    spark = embeddings.sparkSession
    C, dcc = _collect_codebooks(codebooks)
    m, kc, dsub = C.shape
    qrows = (
        embeddings.filter(F.col(id_col).isin([int(q) for q in query_ids]))
        .select(F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qv"))
        .collect()
    )
    if not qrows:
        raise ValueError("no query vectors found for the given ids")
    qids = np.asarray([r["qid"] for r in qrows], dtype=np.int64)
    lut = np.zeros((len(qrows), m, kc), dtype=np.int64)
    for qi, r in enumerate(qrows):
        qv = np.asarray(list(r["qv"]), dtype=np.float64)
        for s in range(m):
            qs = qv[s * dsub : (s + 1) * dsub]
            for c in range(kc):
                lut[qi, s, c] = _lut_micros(_seq_dot(qs, C[s, c]))
    bc = spark.sparkContext.broadcast((qids, lut))
    encoded = (
        codes
        if codes is not None
        else _encode_dense(embeddings, C, dcc, id_col=id_col, vec_col=vec_col)
    )
    schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("cosine", DoubleType()),
        ]
    )

    def score(batches):
        qid_arr, lut_arr = bc.value
        nq = len(qid_arr)
        for pdf in batches:
            if not len(pdf):
                continue
            codes_mat = np.asarray(
                [np.asarray(x, dtype=np.int64) for x in pdf["codes"]]
            )
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            micros = np.zeros((len(pdf), nq), dtype=np.int64)
            for s in range(m):
                # lut_arr[:, s, :] is (nq, kc); gather by this batch's codes
                micros += lut_arr[:, s, :][:, codes_mat[:, s]].T
            import pandas as pd

            out = pd.DataFrame(
                {
                    "query_id": np.repeat(qid_arr, len(pdf)),
                    "neighbor_id": np.tile(ids, nq),
                    "cosine": (micros.T.reshape(-1)).astype(np.float64) / 1.0e6,
                }
            )
            out = out[out["query_id"] != out["neighbor_id"]]
            yield out

    scored = encoded.mapInPandas(score, schema=schema)
    return _topk_per_query(scored, k).withColumnRenamed("cosine", "score")

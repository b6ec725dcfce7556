"""Semantic deduplication: cluster-then-prune over the embedding space
(SemDeDup, Abbas et al. 2023).

Whole-corpus cosine near-dup is quadratic; SemDeDup's observation is
that semantic duplicates land in the same k-means cluster, so it is
enough to compare WITHIN clusters — the pair join becomes an equi-join
on the cluster id, and total pair work drops from |corpus|² to
Σ|cluster|² (the operator's scale knob is k: more clusters, smaller
quadratic islands; the paper runs k in the tens of thousands at
100 TB-class corpora so each island is a few thousand vectors).

Pruning rule (deterministic): within a cluster, a vector is DROPPED when
some lower-id vector of the same cluster has cosine >= threshold with
it — every duplicate group keeps exactly its lowest-id member, ties
never flap, and the result is reproducible run-to-run (the paper keeps
a random member; a deterministic keeper is what makes the operation
oracle-checkable and replay-stable).

Centroids: ``centroids=None`` trains real spherical k-means
(``kmeans_fit``, deterministic); passing a centroid table skips
training — the catalog queries pass seed centroids (the k lowest-id
vectors, the ``ann_ivf_topk`` convention) so a SQL oracle can reproduce
the assignment without iterating Lloyd's.

Zero-norm vectors have no direction, are assigned to no cluster, and
always survive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import (
    _assign_nearest,
    _with_norm,
    kmeans_fit,
)


def _assigned_normed(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, v unit-ish, nrm, cluster): nearest-centroid assignment by max
    cosine, ties to the lowest cluster id. The centroid matrix is
    broadcast once per executor and each Arrow batch takes a vectorized
    argmax over it (``similarity._assign_nearest``) — no corpus x k
    intermediate rows (the old crossJoin shape paid a k-times row
    blowup per pass, ruinous at SemDeDup-paper k ~ 10^4), no shuffle
    (the old groupBy reduction re-shuffled the corpus), and SIMD dot
    products in pinned fold order (score bits identical to the SQL
    fold, so the assignment stays oracle-reproducible). Precondition:
    ids unique (a duplicated id yields one row per input row; the old
    groupBy shape collapsed them, at the price of a corpus shuffle for
    every well-formed input)."""
    pts = _with_norm(embeddings, vec_col).filter(F.col("_norm") > 0).select(
        F.col(id_col).alias("id"), F.col("_vec").alias("v"), F.col("_norm").alias("nrm")
    )
    cents = _with_norm(centroids, "centroid").filter(F.col("_norm") > 0).select(
        F.col("cluster"), F.col("_vec").alias("cv"), F.col("_norm").alias("cnrm")
    )
    return _assign_nearest(
        pts,
        cents,
        keep=["id", "v", "nrm"],
        vec_col="v",
        row_norm_col="nrm",
        cent_norm_col="cnrm",
    )




def resolve_k(
    embeddings: DataFrame,
    k: int | str,
    avg_cluster_size: int = 1024,
) -> int:
    """Resolve the cluster-count knob. ``k="auto"`` sizes it from the
    corpus: ceil(n / avg_cluster_size), floor 8 — the SemDeDup paper
    scales k with the corpus precisely because pair work within a
    cluster is quadratic (Σ|cluster|²): holding k fixed while the
    corpus grows 100× grows every island 100× and the pair join
    10,000×. Costs one count() of the embedding table (a metadata-cheap
    scan next to the dedup itself). An explicit integer passes through
    untouched — but at 100 TB, pick it corpus-proportionally or use
    "auto"."""
    if k == "auto":
        n = embeddings.count()
        return max(8, -(-n // max(1, avg_cluster_size)))
    if isinstance(k, int) and k >= 1:
        return k
    raise ValueError(f"k must be a positive int or 'auto', got {k!r}")


def semdedup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    centroids: DataFrame | None = None,
    k: int | str = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    avg_cluster_size: int = 1024,
) -> DataFrame:
    """Within-cluster duplicate pairs: (id_a, id_b, cluster, cosine)
    with id_a < id_b and cosine >= threshold, pairs generated ONLY
    through the shared cluster (equi-join on cluster — never a corpus
    cross join). Cosine is rounded to 4 dp (engine-parity discipline).
    ``k="auto"`` sizes the cluster count from the corpus (see
    ``resolve_k``) — the scale-correct choice; the integer default is a
    small-corpus convenience."""
    if centroids is None:
        k = resolve_k(embeddings, k, avg_cluster_size)
        centroids = kmeans_fit(embeddings, k=k, id_col=id_col, vec_col=vec_col)
    assigned = _assigned_normed(embeddings, centroids, id_col, vec_col)
    return (
        _cluster_pair_candidates(assigned, threshold)
        .withColumn("cosine", F.round(F.col("_raw"), 4))
        .filter(F.col("cosine") >= threshold)
        .select("cluster", "id_a", "id_b", "cosine")
    )


def _cluster_pair_candidates(assigned: DataFrame, threshold: float) -> DataFrame:
    """(cluster, id_a, id_b, _raw): every within-cluster pair whose raw
    cosine can round to >= ``threshold``, via the shared grouped Arrow
    pair stage (``similarity._grouped_pair_candidates`` — see its
    docstring for the shape, parity, and slack-margin contract).
    Round-9 profiling here: the equi-join shape materialized 251k
    Σ|cluster|² JVM pair rows carrying BOTH vectors at sf0.1, with the
    interpreted fold alone costing 1.46 s of the 2.5 s entry; the
    grouped stage ships each cluster's vectors once. Cluster size is
    the operator's bounded knob (``resolve_k``)."""
    from .similarity import _grouped_pair_candidates

    return _grouped_pair_candidates(
        assigned, group_col="cluster", threshold=threshold
    )


def semdedup_prune(
    embeddings: DataFrame,
    threshold: float = 0.95,
    centroids: DataFrame | None = None,
    k: int | str = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    avg_cluster_size: int = 1024,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """The corpus after semantic dedup: input rows minus every vector
    that has a LOWER-id same-cluster neighbor with cosine >= threshold
    (each duplicate group survives through its lowest id). One anti-join
    of the corpus against the distinct dropped-id set — the drop set is
    duplicate-sized, tiny next to the corpus, so AQE broadcasts it.
    Schema is unchanged (pass-through of the input columns).
    ``k="auto"`` as in ``semdedup_pairs``.

    ``pairs=`` injects a precomputed ``semdedup_pairs`` output (or any
    (id_a, id_b) near-dup pair frame) so a caller wanting BOTH the pair
    report and the pruned corpus pays the assignment + pair pipeline
    once — the same injection contract as ``dedup.keep_canonical`` /
    ``keep_best``. With ``pairs=`` given, ``threshold``/``centroids``/
    ``k`` are ignored (they were the pair generator's knobs)."""
    if pairs is None:
        if centroids is None:
            k = resolve_k(embeddings, k, avg_cluster_size)
            centroids = kmeans_fit(
                embeddings, k=k, id_col=id_col, vec_col=vec_col
            )
        pairs = semdedup_pairs(
            embeddings,
            threshold=threshold,
            centroids=centroids,
            id_col=id_col,
            vec_col=vec_col,
        )
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return embeddings.join(dropped, id_col, "left_anti")


def prototype_prune(
    embeddings: DataFrame,
    drop_fraction: float = 0.1,
    centroids: DataFrame | None = None,
    k: int | str = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    avg_cluster_size: int = 1024,
) -> DataFrame:
    """SSL-prototype pruning (the second stage of D4, Tirumala et al.
    2023 "D4: Improving LLM Pretraining via Document De-Duplication and
    Diversification"): within each k-means cluster, DROP the
    ``drop_fraction`` of points CLOSEST to the centroid — the most
    prototypical examples carry the least marginal information once the
    cluster is represented, so removing them diversifies the corpus
    (the paper's gain over dedup alone).

    Deterministic rule: per cluster, rank by (cosine-to-centroid
    rounded to 4 dp DESC, id ASC) — rounding makes the ranking
    engine-portable, ties drop the lowest id first — and drop the first
    ``ceil(drop_fraction * |cluster|)`` ranks. Zero-norm vectors have
    no direction, join no cluster, and always survive (consistent with
    ``semdedup_prune``).

    Scale shape: assignment is the broadcast Arrow argmax
    (``kmeans_assign`` — zero corpus shuffle); ranking is one window
    partitioned by cluster, whose partitions are the operator's bounded
    knob (``k="auto"`` keeps |cluster| ~ ``avg_cluster_size`` as the
    corpus grows); the final filter is row-local. One shuffle total.

    Returns the surviving ``embeddings`` rows unchanged (semi-join on
    the kept id set).
    """
    if not 0.0 <= drop_fraction < 1.0:
        raise ValueError(f"drop_fraction must be in [0, 1), got {drop_fraction}")
    from pyspark.sql import Window

    from .similarity import kmeans_assign, kmeans_fit

    if centroids is None:
        k = resolve_k(embeddings, k, avg_cluster_size)
        centroids = kmeans_fit(embeddings, k=k, id_col=id_col, vec_col=vec_col)
    # cosine to the assigned centroid: kmeans_assign's dot is against
    # unit-norm centroids and unit-normalized vectors, i.e. the cosine
    assigned = kmeans_assign(embeddings, centroids, id_col=id_col, vec_col=vec_col)
    w = Window.partitionBy("cluster").orderBy(
        F.desc(F.round(F.col("dot"), 4)), F.asc(id_col)
    )
    wc = Window.partitionBy("cluster")
    kept = (
        assigned.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(wc))
        .filter(F.col("_rn") > F.ceil(F.lit(drop_fraction) * F.col("_n")))
        .select(id_col)
    )
    no_cluster = embeddings.join(
        assigned.select(id_col), id_col, "left_anti"
    ).select(id_col)
    return embeddings.join(kept.union(no_cluster), id_col, "left_semi")


def d4_prune(
    embeddings: DataFrame,
    threshold: float = 0.95,
    drop_fraction: float = 0.1,
    centroids: DataFrame | None = None,
    k: int | str = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    avg_cluster_size: int = 1024,
) -> DataFrame:
    """The full D4 recipe: SemDeDup first (remove semantic near-dups at
    ``threshold``), then prototype pruning over the SURVIVORS
    (``drop_fraction`` closest-to-centroid per cluster) — dedup removes
    redundancy, diversification removes prototypicality. One centroid
    table (trained once when not provided) feeds both stages; both
    reuse the broadcast Arrow assignment, so the pipeline costs one
    pair stage + one window beyond the shared assignment."""
    if centroids is None:
        k = resolve_k(embeddings, k, avg_cluster_size)
        centroids = kmeans_fit(embeddings, k=k, id_col=id_col, vec_col=vec_col)
    deduped = semdedup_prune(
        embeddings, threshold=threshold, centroids=centroids,
        id_col=id_col, vec_col=vec_col,
    )
    return prototype_prune(
        deduped, drop_fraction=drop_fraction, centroids=centroids,
        id_col=id_col, vec_col=vec_col,
    )

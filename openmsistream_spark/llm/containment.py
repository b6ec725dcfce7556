"""Asymmetric shingle containment — excerpt / near-superset detection.

Jaccard (``llm/dedup.py``) is symmetric, so a short document quoted
wholesale inside a much longer one scores low (the union is dominated
by the long doc) and slips past near-dup filters. Containment scores
the directional overlap instead:

    C(A -> B) = |shingles(A) ∩ shingles(B)| / |shingles(A)|

so a fully-quoted excerpt scores 1.0 regardless of the host document's
size. Training-data pipelines use this to catch boilerplate-wrapped
reposts, quote farms, and benchmark text embedded in larger pages —
cases exact and Jaccard dedup both miss (cf. the asymmetric
containment variant of MinHash in Broder's original resemblance work).

Scale shape: identical to ``jaccard_pairs`` — pairs are generated ONLY
through shared shingles (an equi-join on the shingle key), so disjoint
documents never meet; hot shingles above ``max_shingle_df`` are dropped
from the join via a broadcast anti-join (``cap_hot_shingles``) because
a shingle shared by k docs fans out k² join rows. Pass ``hashed=True``
shingles for 16-byte join keys at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import cap_hot_shingles, word_shingles


def containment_pairs(
    docs: DataFrame | None = None,
    threshold: float = 0.8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = None,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Ordered document pairs where A's shingle set is >= ``threshold``
    contained in B's.

    EXACT by default (every shingle participates); pass
    ``max_shingle_df`` at corpus scale to exclude quadratic hot keys
    from both the pair join and the per-doc sizes (containment is then
    over the capped sets). Pass a pre-built (id, shingle) ``shingles``
    table to reuse one shingle scan across jaccard + containment +
    MinHash pipelines (the caller owns its persist lifetime).

    Returns (id_a, id_b, containment) with id_a != id_b — DIRECTIONAL:
    the row says id_a's shingles appear in id_b; the reverse direction
    is a separate row with its own score. Containment is rounded to
    4 dp before thresholding so results are engine-portable.
    """
    if shingles is not None:
        sh = shingles
    else:
        if docs is None:
            raise ValueError("containment_pairs needs docs or shingles")
        sh = word_shingles(docs, n=n, id_col=id_col, text_col=text_col)
        sh = cap_hot_shingles(sh, max_shingle_df)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    sa = sh.select(F.col(id_col).alias("id_a"), "shingle")
    sb = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        sa.join(sb, "shingle")
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    contain = F.round(F.col("n_common") / F.col("n_a"), 4)
    return (
        inter.join(
            sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("n_sh", "n_a"),
            "id_a",
        )
        .select("id_a", "id_b", contain.alias("containment"))
        .filter(F.col("containment") >= threshold)
    )

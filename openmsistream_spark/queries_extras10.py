"""Round-14 catalog additions, registered OUT-OF-BAND (same discipline
as every ``queries_extras*.py``: imported by the entry points, never
from ``queries.py``, so landing them does not dirty already-verified
entries' source closures).

Content — the video leg of the media-ledger contract (round-13 verdict
task #2):

- ``video_representative_fingerprint``: reduce each video's sampled
  keyframe dHashes to ONE 64-bit fingerprint by per-bit MAJORITY vote
  (bit set iff set in strictly more than half the frames; ties clear).
  This is the reduction that lets a video enter the media_id-keyed
  fingerprint ledger (``phash.incremental_fingerprint_neardup`` and the
  streaming sink refuse raw multi-frame input). Integer-exact end to
  end — the DuckDB oracle reproduces every bit by re-deriving the
  frame hashes from ASCII codes (the shared ``_DHASH_CTE``) and folding
  them with exact HUGEINT arithmetic.
- ``video_representative_neardup``: representatives through
  ``hamming_combo_pairs`` at its DEFAULT signature (64 bits, 8 blocks,
  h=3 — the parameterization the round-14 advisor found broken as a
  default and this round fixed), against a brute-force all-pairs
  oracle. Each doc contributes its 3-frame video plus a twin perturbed
  by ONE character inside the frame-0-only region (positions 0..95 of
  the 480-char prefix — frames overlap, chars beyond 96 belong to 2-3
  frames): one frame moves <= 2 dHash bits, so per-bit majority counts
  move by <= 1 and the representative moves <= 2 bits — every
  (original, twin) pair is guaranteed inside the h=3 budget, never
  vacuous.

Majority fold is the published centroid-of-bits device (the same
reduction simhash applies to feature hashes); first-frame
representatives were rejected because intros/logos are shared across
unrelated videos (false bridges). The reference engine has no video
path (lab files only) — these derive from public perceptual-hash
literature per the driver's brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import load, query
from .queries_extras9 import (
    _DHASH_CTE,
    _IMG_BYTES,
    _POWS,
    _VID_BYTES,
    _framed_video,
    _pert_sql,
    _vid_pfx_filter_sql,
)

#: the majority-fold oracle: (hashed: media_id, dhash) with media_id =
#: vid*4 + frame_i -> (repfp: media_id, fingerprint, n_frames). Exact
#: HUGEINT arithmetic throughout: unsigned-expand each signed hash, per
#: (vid, bit) count set bits across frames (one row per frame per bit
#: via the range(0,64) cross join), strict-majority-sum the 2^k terms,
#: fold back to signed BIGINT — bit-identical to the Spark side's 65
#: codegen aggregates.
_MAJ_CTES = f"""
    uns AS (
      SELECT media_id // 4 AS vid,
             CAST(CASE WHEN dhash < 0 THEN dhash + 18446744073709551616
                       ELSE dhash END AS HUGEINT) AS u
      FROM hashed),
    bits AS (
      SELECT vid, t.k AS k,
             CAST((u // {_POWS}[CAST(t.k AS INT) + 1]) % 2 AS BIGINT) AS b
      FROM uns, range(0, 64) t(k)),
    maj AS (
      SELECT vid,
             CASE WHEN 2 * sum(b) > count(*)
                  THEN {_POWS}[CAST(k AS INT) + 1] ELSE 0 END AS term,
             count(*) AS nf
      FROM bits GROUP BY vid, k),
    folded AS (
      SELECT vid AS media_id, sum(term) AS u2,
             CAST(min(nf) AS BIGINT) AS n_frames
      FROM maj GROUP BY vid),
    repfp AS (
      SELECT media_id,
             CAST(CASE WHEN u2 >= 9223372036854775808
                       THEN u2 - 18446744073709551616 ELSE u2 END
                  AS BIGINT) AS fingerprint,
             n_frames
      FROM folded)"""


def _video_variants(docs: DataFrame) -> DataFrame:
    """documents -> (media_id=doc_id, p=480-char ASCII-safe prefix),
    the extras9 video framing contract."""
    prefix = F.substring("text", 1, _VID_BYTES)
    return docs.filter(
        (F.length("text") >= _VID_BYTES)
        & (F.octet_length(F.encode(prefix, "UTF-8")) == _VID_BYTES)
    ).select(F.col("doc_id").alias("media_id"), prefix.alias("p"))


@query(
    "video_representative_fingerprint",
    f"""
    WITH base AS (
      SELECT doc_id, substr(text, 1, {_VID_BYTES}) AS p
      FROM documents
      WHERE {_vid_pfx_filter_sql()}),
    framed AS (
      SELECT doc_id * 4 AS media_id, substr(p, 1, {_IMG_BYTES}) AS pfx FROM base
      UNION ALL
      SELECT doc_id * 4 + 1, substr(p, 97, {_IMG_BYTES}) FROM base
      UNION ALL
      SELECT doc_id * 4 + 2, substr(p, 193, {_IMG_BYTES}) FROM base),
    {_DHASH_CTE},
    {_MAJ_CTES}
    SELECT media_id, fingerprint, n_frames FROM repfp
    """,
    doc="per-video representative fingerprint: every frame of the "
    "3-frame PGM stream dHashed in ONE Arrow stage, then reduced to one "
    "64-bit fingerprint by per-bit MAJORITY vote (strict majority sets "
    "the bit, ties clear it) — the one-row-per-media_id reduction the "
    "media fingerprint ledger and streaming sink require. Integer-exact: "
    "the oracle re-derives each frame hash from ASCII codes and folds "
    "with HUGEINT arithmetic, reproducing all 64 bits. Scale shape: one "
    "Arrow decode+hash stage, then ONE map-side-combinable groupBy with "
    "65 codegen aggregates (count + one per bit) — 24 B in per frame, "
    "16 B out per video, no window, no second shuffle",
    survey="LLM multimodal: video representative fingerprint (round-14 "
    "— majority fold, the ledger-contract reduction)",
)
def video_representative_fingerprint(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .llm.videofp import (
        video_frame_fingerprints,
        video_representative_fingerprint as _rep,
    )

    docs = load(spark, sf_dir, "documents")
    fps = video_frame_fingerprints(
        _framed_video(_video_variants(docs)), every_nth=1
    )
    return _rep(fps)


@query(
    "video_representative_neardup",
    f"""
    WITH base AS (
      SELECT doc_id, substr(text, 1, {_VID_BYTES}) AS p
      FROM documents
      WHERE {_vid_pfx_filter_sql()}),
    vids AS (
      SELECT doc_id * 2 AS vid, p FROM base
      UNION ALL
      SELECT doc_id * 2 + 1, {_pert_sql("p", "doc_id % 96")} FROM base),
    framed AS (
      SELECT vid * 4 AS media_id, substr(p, 1, {_IMG_BYTES}) AS pfx FROM vids
      UNION ALL
      SELECT vid * 4 + 1, substr(p, 97, {_IMG_BYTES}) FROM vids
      UNION ALL
      SELECT vid * 4 + 2, substr(p, 193, {_IMG_BYTES}) FROM vids),
    {_DHASH_CTE},
    {_MAJ_CTES}
    SELECT a.media_id AS id_a, b.media_id AS id_b,
           CAST(bit_count(xor(a.fingerprint, b.fingerprint)) AS BIGINT)
             AS hamming
    FROM repfp a JOIN repfp b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.fingerprint, b.fingerprint)) <= 3
    """,
    doc="video near-dup on representative fingerprints through "
    "hamming_combo_pairs at its DEFAULT signature (8 equal blocks, "
    "h=3, 56 combination keys — the default the round-14 advisor found "
    "broken and this round fixed, now exercised end-to-end against a "
    "brute-force all-pairs oracle; completeness makes the plans "
    "semantically identical). Twin device: one char rewritten inside "
    "the frame-0-only region (pos doc_id%96 < 96; later positions "
    "belong to 2-3 overlapping frames), so one frame moves <= 2 dHash "
    "bits, per-bit majority counts move <= 1, and the representative "
    "moves <= 2 bits — every (original, twin) pair is inside the h=3 "
    "budget by construction. Scale shape: the Manku combination-key "
    "equi-join on near-singleton buckets — the crawl-scale near-dup "
    "plan, never all-pairs",
    survey="LLM multimodal: video representative near-dup (round-14 — "
    "Manku combo keys at the fixed default parameterization)",
)
def video_representative_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm.phash import hamming_combo_pairs
    from .llm.videofp import (
        video_frame_fingerprints,
        video_representative_fingerprint as _rep,
    )

    docs = load(spark, sf_dir, "documents")
    base = _video_variants(docs)
    orig_ch = F.expr("substring(p, CAST(media_id % 96 AS INT) + 1, 1)")
    pert = F.concat(
        F.expr("substring(p, 1, CAST(media_id % 96 AS INT))"),
        F.when(orig_ch == "A", F.lit("B")).otherwise(F.lit("A")),
        F.expr(f"substring(p, CAST(media_id % 96 AS INT) + 2, {_VID_BYTES})"),
    )
    variants = base.select(
        (F.col("media_id") * 2).alias("media_id"), F.col("p")
    ).unionAll(
        base.select((F.col("media_id") * 2 + 1).alias("media_id"), pert.alias("p"))
    )
    fps = video_frame_fingerprints(_framed_video(variants), every_nth=1)
    return hamming_combo_pairs(_rep(fps))  # the DEFAULT signature

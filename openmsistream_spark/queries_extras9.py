"""Round-13 catalog additions, registered OUT-OF-BAND.

Same discipline as ``queries_extras*.py``: imported directly by the
catalog entry points (``__spark_entry__.py``, ``bench.py``,
``tests/conftest.py``), never from ``queries.py``, so landing new
queries does not dirty the source closure of already-verified entries.

Content — the image perceptual near-dup family (llm/phash.py), closing
the one multimodal axis without a dedup treatment (round-12 verdict #1):

- ``image_dhash_fingerprints``: REAL perceptual fingerprints through
  the distributed Arrow stage — each document's 288-char ASCII-safe
  prefix is framed as a binary 18x16 PGM (the ``multimodal_pgm_decode``
  convention), decoded by the dependency-free codec, grayscale
  area-pooled onto the 8x9 dHash grid and bit-compared. Every step is
  integer arithmetic (block SUMS under equal areas, cross-multiplied
  means in the general case), so the DuckDB oracle reproduces each of
  the 64 bits exactly.
- ``image_dhash_neardup_pairs``: the near-dup report — every document
  contributes its original framed image AND a deterministically
  perturbed twin (one character rewritten at position doc_id % 288),
  fingerprints go through the Hamming band machinery (8 bands x 8 bits,
  max_hamming=7 < bands ⇒ banding is COMPLETE, so the banded Spark plan
  and the brute-force all-pairs oracle agree by construction). The twin
  guarantees the entry is never vacuous: one changed character moves
  one 2x2 pooling block, flipping at most its two adjacent comparison
  bits, so every (original, twin) pair sits at hamming <= 2.

Published algorithm: dHash / average-hash family (Krawetz 2013); the
reference engine has no image path (lab files only), per the driver's
brief these derive from public knowledge.

Round-13 batch 2 — the AUDIO twin of the image family (llm/audiofp.py):
``audio_envelope_fingerprints`` / ``audio_envelope_neardup_pairs``
frame each document's 260-char ASCII-safe prefix as a REAL 8-bit PCM
mono WAV (260 = 65 envelope frames x 4 samples), decode it with the
dependency-free WAV parser, and hash the integer-exact temporal-energy
envelope (the Haitsma-Kalker 2002 sign-of-difference device in the
time domain) — the same oracle discipline (every bit reproduced from
ASCII codes in DuckDB) and the same Hamming band machinery.

Round-13 batch 2 also adds the VIDEO leg (llm/videofp.py):
``video_keyframe_fingerprints`` / ``video_keyframe_neardup_pairs``
frame each 480-char ASCII-safe prefix as a 3-frame multi-image PGM
stream (overlapping cuts — consecutive frames share 2/3 of their
pixels), sample every 2nd frame, dHash each sampled frame, and roll
aligned banded frame matches up to video pairs (min_frames=2). The
oracle reuses the image _DHASH_CTE verbatim by encoding (video, frame)
as media_id*4 + frame_i.
"""

from __future__ import annotations

import base64
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import SIMHASH32_CTE, load, query

# framed image geometry: 18 wide x 16 high = 288 bytes, chosen so the
# 8x9 dHash grid pools exact 2x2 blocks (equal areas -> the oracle
# compares plain block sums)
_IMG_W, _IMG_H = 18, 16
_IMG_BYTES = _IMG_W * _IMG_H
_PGM_HDR = f"P5 {_IMG_W} {_IMG_H} 255\n"

#: 2^k literals for the oracle's bit packing — the 2^63 literal parses
#: as HUGEINT in DuckDB, promoting the whole list so the fingerprint
#: sum is exact (then folded to signed BIGINT like the Spark side).
_POWS = "list_value(" + ", ".join(str(1 << k) for k in range(64)) + ")"

#: ASCII-safe 288-char prefix filter (the multimodal_pgm_decode
#: contract: Spark frames the first 288 BYTES while the oracle
#: enumerates the first 288 characters' code points — identical iff
#: every prefix char is 1-byte UTF-8).
_PFX_FILTER_SQL = (
    f"length(text) >= {_IMG_BYTES} "
    f"AND octet_length(encode(substr(text, 1, {_IMG_BYTES}))) = {_IMG_BYTES}"
)

# shared oracle CTE: (media_id, pfx) -> signed 64-bit dhash. Block (r,c)
# of the 8x9 grid covers pixel rows 2r..2r+1, cols 2c..2c+1; with
# 1-based list indexing the four members of block k (r=k//9, c=k%9) sit
# at r*36 + c*2 + {1, 2, 19, 20}. Bit k (r=k//8, c=k%8) is set iff
# block (r,c)'s sum < block (r,c+1)'s (equal 2x2 areas -> sum compare
# == mean compare, matching llm/phash.dhash_int's cross-multiplied
# general form).
_DHASH_CTE = f"""
    px AS (
      SELECT media_id,
             list_transform(range(1, {_IMG_BYTES + 1}),
                            i -> CAST(ascii(substr(pfx, CAST(i AS INT), 1))
                                      AS BIGINT)) AS codes
      FROM framed),
    bs AS (
      SELECT media_id,
             list_transform(range(0, 72), k ->
               codes[(k // 9) * 36 + (k % 9) * 2 + 1]
             + codes[(k // 9) * 36 + (k % 9) * 2 + 2]
             + codes[(k // 9) * 36 + (k % 9) * 2 + 19]
             + codes[(k // 9) * 36 + (k % 9) * 2 + 20]) AS bsum
      FROM px),
    fp AS (
      SELECT media_id,
             list_sum(list_transform(range(0, 64), k ->
               CASE WHEN bsum[(k // 8) * 9 + (k % 8) + 1]
                       < bsum[(k // 8) * 9 + (k % 8) + 2]
                    THEN {_POWS}[CAST(k AS INT) + 1] ELSE 0 END)) AS u
      FROM bs),
    hashed AS (
      SELECT media_id,
             CAST(CASE WHEN u >= 9223372036854775808
                       THEN u - 18446744073709551616 ELSE u END
                  AS BIGINT) AS dhash
      FROM fp)"""


def _framed_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (media_id, content): ASCII-safe 288-char prefixes
    framed as binary 18x16 PGM images (media_id = doc_id)."""
    docs = load(spark, sf_dir, "documents")
    prefix = F.substring("text", 1, _IMG_BYTES)
    return docs.filter(
        (F.length("text") >= _IMG_BYTES)
        & (F.octet_length(F.encode(prefix, "UTF-8")) == _IMG_BYTES)
    ).select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.concat(F.lit(_PGM_HDR), prefix), "UTF-8").alias("content"),
    )


@query(
    "image_dhash_fingerprints",
    f"""
    WITH framed AS (
      SELECT doc_id AS media_id, substr(text, 1, {_IMG_BYTES}) AS pfx
      FROM documents
      WHERE {_PFX_FILTER_SQL}),
    {_DHASH_CTE}
    SELECT media_id, dhash FROM hashed
    """,
    doc="image perceptual fingerprints (dHash, Krawetz 2013) computed "
    "from REAL decoded pixels: docs framed as binary 18x16 PGM, decoded "
    "and gray-pooled onto the 8x9 grid inside one Arrow mapInPandas "
    "stage; every bit integer-exact against an independent ASCII-code "
    "oracle. Scale shape: one Python (Arrow) decode+hash stage, zero "
    "shuffle — the fingerprint table is 16 bytes/image",
    survey="LLM multimodal: image perceptual hash (dHash — round-13, "
    "closes VERDICT r12 #1)",
)
def image_dhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm.phash import image_fingerprints

    media = _framed_media(spark, sf_dir)
    return image_fingerprints(media, algo="dhash").select(
        "media_id", F.col("fingerprint").alias("dhash")
    )


@query(
    "image_dhash_neardup_pairs",
    f"""
    WITH base AS (
      SELECT doc_id, substr(text, 1, {_IMG_BYTES}) AS pfx
      FROM documents
      WHERE {_PFX_FILTER_SQL}),
    framed AS (
      SELECT doc_id * 2 AS media_id, pfx FROM base
      UNION ALL
      SELECT doc_id * 2 + 1,
             substr(pfx, 1, CAST(doc_id % {_IMG_BYTES} AS INT))
             || CASE WHEN substr(pfx, CAST(doc_id % {_IMG_BYTES} AS INT) + 1, 1) = 'A'
                     THEN 'B' ELSE 'A' END
             || substr(pfx, CAST(doc_id % {_IMG_BYTES} AS INT) + 2)
      FROM base),
    {_DHASH_CTE}
    SELECT a.media_id AS id_a, b.media_id AS id_b,
           CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
    FROM hashed a JOIN hashed b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.dhash, b.dhash)) <= 7
    """,
    doc="image near-dup pairs: dHash fingerprints through Hamming "
    "banding (8 bands x 8 bits; max_hamming=7 < bands makes the banded "
    "sweep COMPLETE, so the all-pairs oracle is semantically identical). "
    "Each doc contributes its framed image plus a one-char-perturbed "
    "twin — a planted near-dup at hamming <= 2, so the entry is never "
    "vacuous. Scale shape: one Arrow decode+hash stage, then JVM-only "
    "banding (explode + equi-join + bit_count verify) — never all-pairs "
    "on the Spark side",
    survey="LLM multimodal: image near-dup (dHash + Hamming banding — "
    "round-13, closes VERDICT r12 #1)",
)
def image_dhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm.phash import hamming_band_pairs, image_fingerprints

    docs = load(spark, sf_dir, "documents")
    prefix = F.substring("text", 1, _IMG_BYTES)
    base = docs.filter(
        (F.length("text") >= _IMG_BYTES)
        & (F.octet_length(F.encode(prefix, "UTF-8")) == _IMG_BYTES)
    ).select("doc_id", prefix.alias("pfx"))
    # deterministic one-char perturbation at position doc_id % 288
    # (0-based): 'A' unless the original char is 'A', then 'B' — ASCII
    # either way, so the oracle's code-point view stays byte-exact
    orig_ch = F.expr(f"substring(pfx, CAST(doc_id % {_IMG_BYTES} AS INT) + 1, 1)")
    pert = F.concat(
        F.expr(f"substring(pfx, 1, CAST(doc_id % {_IMG_BYTES} AS INT))"),
        F.when(orig_ch == "A", F.lit("B")).otherwise(F.lit("A")),
        F.expr(f"substring(pfx, CAST(doc_id % {_IMG_BYTES} AS INT) + 2, {_IMG_BYTES})"),
    )
    variants = base.select(
        (F.col("doc_id") * 2).alias("media_id"), F.col("pfx").alias("img")
    ).unionAll(
        base.select((F.col("doc_id") * 2 + 1).alias("media_id"), pert.alias("img"))
    )
    media = variants.select(
        "media_id",
        F.encode(F.concat(F.lit(_PGM_HDR), F.col("img")), "UTF-8").alias("content"),
    )
    fps = image_fingerprints(media, algo="dhash")
    return hamming_band_pairs(fps, bits=64, bands=8, max_hamming=7)


@query(
    "image_dhash_neardup_combo",
    f"""
    WITH base AS (
      SELECT doc_id, substr(text, 1, {_IMG_BYTES}) AS pfx
      FROM documents
      WHERE {_PFX_FILTER_SQL}),
    framed AS (
      SELECT doc_id * 2 AS media_id, pfx FROM base
      UNION ALL
      SELECT doc_id * 2 + 1,
             substr(pfx, 1, CAST(doc_id % {_IMG_BYTES} AS INT))
             || CASE WHEN substr(pfx, CAST(doc_id % {_IMG_BYTES} AS INT) + 1, 1) = 'A'
                     THEN 'B' ELSE 'A' END
             || substr(pfx, CAST(doc_id % {_IMG_BYTES} AS INT) + 2)
      FROM base),
    {_DHASH_CTE}
    SELECT a.media_id AS id_a, b.media_id AS id_b,
           CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
    FROM hashed a JOIN hashed b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
    """,
    doc="image near-dup pairs through COMBINATION blocking (Manku et "
    "al. 2007, the crawl-scale simhash-dedup construction): a pair "
    "within hamming 3 leaves >= 5 of 8 bit-blocks untouched, so the "
    "56-combination equi-join on 40-BIT packed keys (8 equal blocks, "
    ">= 5 untouched) finds every such pair — near-singleton buckets into the billions, where the simple "
    "8-bit-band sweep's 256 buckets melt around 10^5 items (measured: "
    "STRESS_MEDIAFP). Same one-char-perturbed twin device (hamming <= "
    "2, inside the tighter budget), brute-force all-pairs oracle — "
    "semantically identical by the pigeonhole bound. Scale shape: one "
    "Arrow decode+hash stage, then JVM-only combo-key explode (56 "
    "rows/item), equi-join, bit_count verify",
    survey="LLM multimodal: image near-dup at crawl scale (Manku "
    "combination blocking — round-13)",
)
def image_dhash_neardup_combo(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm.phash import hamming_combo_pairs, image_fingerprints

    docs = load(spark, sf_dir, "documents")
    prefix = F.substring("text", 1, _IMG_BYTES)
    base = docs.filter(
        (F.length("text") >= _IMG_BYTES)
        & (F.octet_length(F.encode(prefix, "UTF-8")) == _IMG_BYTES)
    ).select("doc_id", prefix.alias("pfx"))
    orig_ch = F.expr(f"substring(pfx, CAST(doc_id % {_IMG_BYTES} AS INT) + 1, 1)")
    pert = F.concat(
        F.expr(f"substring(pfx, 1, CAST(doc_id % {_IMG_BYTES} AS INT))"),
        F.when(orig_ch == "A", F.lit("B")).otherwise(F.lit("A")),
        F.expr(f"substring(pfx, CAST(doc_id % {_IMG_BYTES} AS INT) + 2, {_IMG_BYTES})"),
    )
    variants = base.select(
        (F.col("doc_id") * 2).alias("media_id"), F.col("pfx").alias("img")
    ).unionAll(
        base.select((F.col("doc_id") * 2 + 1).alias("media_id"), pert.alias("img"))
    )
    media = variants.select(
        "media_id",
        F.encode(F.concat(F.lit(_PGM_HDR), F.col("img")), "UTF-8").alias("content"),
    )
    fps = image_fingerprints(media, algo="dhash")
    return hamming_combo_pairs(fps, bits=64, blocks=8, max_hamming=3)


@query(
    "simhash_combo_neardup",
    SIMHASH32_CTE
    + """
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM sh32 a JOIN sh32 b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    doc="SimHash near-dup pairs through Manku combination blocking — "
    "the crawl-scale upgrade of simhash_band_neardup: its 4x8-bit bands "
    "have 256 key values (candidates ~n^2/256, the measured "
    "STRESS_MEDIAFP melt), while 56 combinations of >= 5-of-8 4-bit "
    "blocks give 20-BIT packed keys (1M values) — near-singleton "
    "buckets far past the band construction's wall, same hamming <= 3 "
    "budget, pigeonhole-complete (brute-force all-pairs oracle is "
    "semantically identical). Scale shape: the two map-side-combinable "
    "simhash shuffles, then combo-key explode (56/doc) + equi-join + "
    "bit_count verify, all JVM codegen",
    survey="LLM near-dup at scale: SimHash combination blocking "
    "(Manku 2007 — round-13)",
)
def simhash_combo_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm.dedup import simhash
    from .llm.phash import hamming_combo_pairs

    sh = simhash(load(spark, sf_dir, "documents"), bits=32)
    return hamming_combo_pairs(
        sh, bits=32, blocks=8, max_hamming=3, id_col="doc_id", fp_col="simhash"
    )


# --------------------------------------- audio envelope near-dup
#
# The audio twin of the image device above (llm/audiofp.py): each
# document's 260-char ASCII-safe prefix becomes the sample bytes of an
# 8-bit unsigned PCM mono WAV (260 = 65 frames x 4 samples, so the
# 65-frame envelope grid pools equal-length frames and the oracle
# compares plain sums). The decoder centers 8-bit samples at 128, so
# frame energy = sum of (128 - code) — every step integer-exact.

_AUD_BYTES = 260

#: RIFF/WAVE header for a 260-sample 8-bit mono 8 kHz PCM clip, as a
#: base64 literal (the header contains NUL bytes, so it is prepended
#: JVM-side via unbase64 + binary concat rather than a string literal).
_WAV_HDR_B64 = base64.b64encode(
    b"RIFF"
    + struct.pack("<I", 36 + _AUD_BYTES)
    + b"WAVE"
    + b"fmt "
    + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
    + b"data"
    + struct.pack("<I", _AUD_BYTES)
).decode("ascii")

_AUD_PFX_FILTER_SQL = (
    f"length(text) >= {_AUD_BYTES} "
    f"AND octet_length(encode(substr(text, 1, {_AUD_BYTES}))) = {_AUD_BYTES}"
)

# shared oracle CTE: (media_id, pfx) -> signed 64-bit envelope hash.
# Frame f (0-based, 1-based list indexing) pools samples f*4+1..f*4+4;
# 8-bit WAV samples are unsigned with midpoint 128, so |centered| =
# 128 - code for ASCII. Bit k is set iff frame k's energy < frame
# k+1's (equal 4-sample frames -> sum compare == the cross-multiplied
# mean compare in llm/audiofp.envelope_hash_int).
_ENVHASH_CTE = f"""
    px AS (
      SELECT media_id,
             list_transform(range(1, {_AUD_BYTES + 1}),
                            i -> CAST(ascii(substr(pfx, CAST(i AS INT), 1))
                                      AS BIGINT)) AS codes
      FROM framed),
    env AS (
      SELECT media_id,
             list_transform(range(0, 65), f ->
               (128 - codes[f * 4 + 1]) + (128 - codes[f * 4 + 2])
             + (128 - codes[f * 4 + 3]) + (128 - codes[f * 4 + 4])) AS e
      FROM px),
    fp AS (
      SELECT media_id,
             list_sum(list_transform(range(0, 64), k ->
               CASE WHEN e[k + 1] < e[k + 2]
                    THEN {_POWS}[CAST(k AS INT) + 1] ELSE 0 END)) AS u
      FROM env),
    hashed AS (
      SELECT media_id,
             CAST(CASE WHEN u >= 9223372036854775808
                       THEN u - 18446744073709551616 ELSE u END
                  AS BIGINT) AS envhash
      FROM fp)"""


def _framed_audio(variants: DataFrame) -> DataFrame:
    """(media_id, pcm STRING) → (media_id, content): prefix bytes
    framed as a complete 8-bit PCM WAV, all JVM-side (unbase64 header
    + binary concat)."""
    return variants.select(
        "media_id",
        F.concat(
            F.unbase64(F.lit(_WAV_HDR_B64)), F.encode(F.col("pcm"), "UTF-8")
        ).alias("content"),
    )


@query(
    "audio_envelope_fingerprints",
    f"""
    WITH framed AS (
      SELECT doc_id AS media_id, substr(text, 1, {_AUD_BYTES}) AS pfx
      FROM documents
      WHERE {_AUD_PFX_FILTER_SQL}),
    {_ENVHASH_CTE}
    SELECT media_id, envhash FROM hashed
    """,
    doc="audio perceptual fingerprints (temporal-envelope hash — the "
    "sign-of-difference device of Haitsma & Kalker 2002 over time-domain "
    "frame energies): docs framed as REAL 8-bit PCM WAV clips, decoded "
    "and envelope-hashed inside one Arrow mapInPandas stage; every bit "
    "integer-exact against an independent ASCII-code oracle. Scale "
    "shape: one Python (Arrow) decode+hash stage, zero shuffle — the "
    "fingerprint table is 16 bytes/clip",
    survey="LLM multimodal: audio perceptual hash (envelope — round-13, "
    "extends the image dedup treatment to the audio modality)",
)
def audio_envelope_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm.audiofp import audio_fingerprints

    docs = load(spark, sf_dir, "documents")
    prefix = F.substring("text", 1, _AUD_BYTES)
    variants = docs.filter(
        (F.length("text") >= _AUD_BYTES)
        & (F.octet_length(F.encode(prefix, "UTF-8")) == _AUD_BYTES)
    ).select(F.col("doc_id").alias("media_id"), prefix.alias("pcm"))
    return audio_fingerprints(_framed_audio(variants)).select(
        "media_id", F.col("fingerprint").alias("envhash")
    )


@query(
    "audio_envelope_neardup_pairs",
    f"""
    WITH base AS (
      SELECT doc_id, substr(text, 1, {_AUD_BYTES}) AS pfx
      FROM documents
      WHERE {_AUD_PFX_FILTER_SQL}),
    framed AS (
      SELECT doc_id * 2 AS media_id, pfx FROM base
      UNION ALL
      SELECT doc_id * 2 + 1,
             substr(pfx, 1, CAST(doc_id % {_AUD_BYTES} AS INT))
             || CASE WHEN substr(pfx, CAST(doc_id % {_AUD_BYTES} AS INT) + 1, 1) = 'A'
                     THEN 'B' ELSE 'A' END
             || substr(pfx, CAST(doc_id % {_AUD_BYTES} AS INT) + 2)
      FROM base),
    {_ENVHASH_CTE}
    SELECT a.media_id AS id_a, b.media_id AS id_b,
           CAST(bit_count(xor(a.envhash, b.envhash)) AS BIGINT) AS hamming
    FROM hashed a JOIN hashed b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.envhash, b.envhash)) <= 7
    """,
    doc="audio near-dup pairs: envelope fingerprints through the SAME "
    "Hamming band machinery as the image family (8 bands x 8 bits; "
    "max_hamming=7 < bands makes the banded sweep COMPLETE, so the "
    "all-pairs oracle is semantically identical). Each doc contributes "
    "its framed clip plus a one-sample-perturbed twin — one sample "
    "touches one frame, flipping at most its 2 adjacent comparison "
    "bits, a planted near-dup at hamming <= 2. Scale shape: one Arrow "
    "decode+hash stage, then JVM-only banding — never all-pairs on the "
    "Spark side",
    survey="LLM multimodal: audio near-dup (envelope hash + Hamming "
    "banding — round-13)",
)
def audio_envelope_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm.audiofp import audio_neardup_pairs

    docs = load(spark, sf_dir, "documents")
    prefix = F.substring("text", 1, _AUD_BYTES)
    base = docs.filter(
        (F.length("text") >= _AUD_BYTES)
        & (F.octet_length(F.encode(prefix, "UTF-8")) == _AUD_BYTES)
    ).select("doc_id", prefix.alias("pfx"))
    orig_ch = F.expr(f"substring(pfx, CAST(doc_id % {_AUD_BYTES} AS INT) + 1, 1)")
    pert = F.concat(
        F.expr(f"substring(pfx, 1, CAST(doc_id % {_AUD_BYTES} AS INT))"),
        F.when(orig_ch == "A", F.lit("B")).otherwise(F.lit("A")),
        F.expr(f"substring(pfx, CAST(doc_id % {_AUD_BYTES} AS INT) + 2, {_AUD_BYTES})"),
    )
    variants = base.select(
        (F.col("doc_id") * 2).alias("media_id"), F.col("pfx").alias("pcm")
    ).unionAll(
        base.select((F.col("doc_id") * 2 + 1).alias("media_id"), pert.alias("pcm"))
    )
    return audio_neardup_pairs(_framed_audio(variants), bands=8, max_hamming=7)


@query(
    "audio_quality_stats",
    f"""
    WITH framed AS (
      SELECT doc_id AS media_id, substr(text, 1, {_AUD_BYTES}) AS pfx
      FROM documents
      WHERE {_AUD_PFX_FILTER_SQL}),
    px AS (
      SELECT media_id,
             list_transform(range(1, {_AUD_BYTES + 1}),
                            i -> CAST(ascii(substr(pfx, CAST(i AS INT), 1))
                                      AS BIGINT) - 128) AS c
      FROM framed)
    SELECT media_id,
           CAST({_AUD_BYTES} AS BIGINT) AS n_samples,
           CAST(len(list_filter(c, x -> abs(x) <= 40)) AS BIGINT) AS n_silent,
           CAST(len(list_filter(c, x -> abs(x) >= 60)) AS BIGINT) AS n_clipped,
           CAST(len(list_filter(range(1, {_AUD_BYTES}),
                                i -> c[i] * c[i + 1] < 0)) AS BIGINT)
             AS n_zero_cross,
           CAST(list_sum(list_transform(c, x -> abs(x))) AS BIGINT) AS sum_abs
    FROM px
    """,
    doc="per-clip audio quality counters (the audio analogue of the text "
    "quality heuristics): silence count (|sample| <= 40 of 128 full "
    "scale), clipping count (|sample| >= 60), strict-sign zero "
    "crossings, and total absolute energy — exact INTEGER counts (never "
    "ratios) over the real decoded PCM, so both engines agree bit-for-"
    "bit and the drop policy stays with the caller. Scale shape: one "
    "Arrow decode+count stage, zero shuffle — 48 bytes/clip out. "
    "Curation use: drop mostly-silent / mostly-clipped clips before "
    "expensive featurization",
    survey="LLM multimodal: audio quality scoring (round-13 — "
    "silence/clipping/energy counters)",
)
def audio_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm.audiofp import audio_quality_stats as _aq

    docs = load(spark, sf_dir, "documents")
    prefix = F.substring("text", 1, _AUD_BYTES)
    variants = docs.filter(
        (F.length("text") >= _AUD_BYTES)
        & (F.octet_length(F.encode(prefix, "UTF-8")) == _AUD_BYTES)
    ).select(F.col("doc_id").alias("media_id"), prefix.alias("pcm"))
    return _aq(_framed_audio(variants), silence_max=40, clip_min=60)


# --------------------------------------- video keyframe near-dup
#
# The third multimodal leg (llm/videofp.py): each qualifying document's
# 480-char ASCII-safe prefix becomes a 3-frame "video" — a multi-image
# PNM stream (public PNM concatenation convention) of 18x16 PGM frames
# cut at overlapping offsets 0/96/192, so consecutive frames share 2/3
# of their pixels (temporal coherence, like real footage). Keyframe
# sampling keeps every 2nd frame (0 and 2); each sampled frame dHashes
# integer-exactly, and the oracle reuses _DHASH_CTE verbatim by
# encoding (video, frame) into one id: media_id = vid * 4 + frame_i.

_VID_BYTES = 480


def _vid_pfx_filter_sql() -> str:
    return (
        f"length(text) >= {_VID_BYTES} "
        f"AND octet_length(encode(substr(text, 1, {_VID_BYTES}))) = {_VID_BYTES}"
    )


def _framed_video(variants: DataFrame) -> DataFrame:
    """(media_id, p STRING of 480 chars) → (media_id, content): a
    3-frame multi-image PGM stream cut at offsets 0/96/192, all
    JVM-side string ops + one encode."""
    parts = []
    for off in (0, 96, 192):
        parts.append(F.lit(_PGM_HDR))
        parts.append(F.substring("p", off + 1, _IMG_BYTES))
    return variants.select(
        "media_id", F.encode(F.concat(*parts), "UTF-8").alias("content")
    )


@query(
    "video_keyframe_fingerprints",
    f"""
    WITH base AS (
      SELECT doc_id, substr(text, 1, {_VID_BYTES}) AS p
      FROM documents
      WHERE {_vid_pfx_filter_sql()}),
    framed AS (
      SELECT doc_id * 4 AS media_id, substr(p, 1, {_IMG_BYTES}) AS pfx FROM base
      UNION ALL
      SELECT doc_id * 4 + 2, substr(p, 193, {_IMG_BYTES}) FROM base),
    {_DHASH_CTE}
    SELECT h.media_id // 4 AS media_id,
           h.media_id % 4 AS frame_i,
           h.dhash
    FROM hashed h
    """,
    doc="video keyframe fingerprints: docs framed as 3-frame multi-image "
    "PGM streams (the PNM concatenation convention — the dependency-free "
    "video container), the stream decoded and every 2nd frame sampled + "
    "dHashed inside ONE Arrow mapInPandas stage; every bit integer-exact "
    "against the ASCII-code oracle (frame identity encoded as media_id*4 "
    "+ frame_i so the image dHash CTE is reused verbatim). Scale shape: "
    "one Python (Arrow) decode+sample+hash stage, zero shuffle — 24 "
    "bytes per sampled keyframe",
    survey="LLM multimodal: video keyframe sampling + perceptual hash "
    "(round-13, third multimodal leg)",
)
def video_keyframe_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm.videofp import video_frame_fingerprints

    docs = load(spark, sf_dir, "documents")
    prefix = F.substring("text", 1, _VID_BYTES)
    variants = docs.filter(
        (F.length("text") >= _VID_BYTES)
        & (F.octet_length(F.encode(prefix, "UTF-8")) == _VID_BYTES)
    ).select(F.col("doc_id").alias("media_id"), prefix.alias("p"))
    return video_frame_fingerprints(_framed_video(variants), every_nth=2).select(
        "media_id", "frame_i", F.col("fingerprint").alias("dhash")
    )


@query(
    "video_keyframe_neardup_pairs",
    f"""
    WITH base AS (
      SELECT doc_id, substr(text, 1, {_VID_BYTES}) AS p
      FROM documents
      WHERE {_vid_pfx_filter_sql()}),
    vids AS (
      SELECT doc_id * 2 AS vid, p FROM base
      UNION ALL
      SELECT doc_id * 2 + 1,
             substr(p, 1, CAST(doc_id % {_VID_BYTES} AS INT))
             || CASE WHEN substr(p, CAST(doc_id % {_VID_BYTES} AS INT) + 1, 1) = 'A'
                     THEN 'B' ELSE 'A' END
             || substr(p, CAST(doc_id % {_VID_BYTES} AS INT) + 2)
      FROM base),
    framed AS (
      SELECT vid * 4 AS media_id, substr(p, 1, {_IMG_BYTES}) AS pfx FROM vids
      UNION ALL
      SELECT vid * 4 + 2, substr(p, 193, {_IMG_BYTES}) FROM vids),
    {_DHASH_CTE}
    SELECT a.media_id // 4 AS id_a, b.media_id // 4 AS id_b,
           CAST(count(*) AS BIGINT) AS n_frames_matched,
           CAST(min(bit_count(xor(a.dhash, b.dhash))) AS BIGINT) AS min_hamming
    FROM hashed a JOIN hashed b
      ON a.media_id % 4 = b.media_id % 4
     AND a.media_id // 4 < b.media_id // 4
    WHERE bit_count(xor(a.dhash, b.dhash)) <= 7
    GROUP BY a.media_id // 4, b.media_id // 4
    HAVING count(*) >= 2
    """,
    doc="video near-dup pairs: keyframe dHashes through TEMPORALLY "
    "ALIGNED Hamming banding (frame_i threaded into the band join key, "
    "so frame k only pairs with frame k; max_hamming=7 < 8 bands keeps "
    "the sweep complete and the all-pairs oracle semantically "
    "identical), rolled up per video pair with min_frames=2 — BOTH "
    "sampled keyframes must match. Each doc contributes its 3-frame "
    "stream plus a one-char-perturbed twin: the perturbation moves one "
    "2x2 pooling block in at most two overlapping frames, <= 2 bits "
    "each, so every (original, twin) pair survives — never vacuous. "
    "Scale shape: one Arrow decode+sample+hash stage, then JVM-only "
    "banding/join/rollup — never all-pairs of frames or videos",
    survey="LLM multimodal: video near-dup (aligned keyframe dHash + "
    "Hamming banding — round-13, third multimodal leg)",
)
def video_keyframe_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm.videofp import video_neardup_pairs

    docs = load(spark, sf_dir, "documents")
    prefix = F.substring("text", 1, _VID_BYTES)
    base = docs.filter(
        (F.length("text") >= _VID_BYTES)
        & (F.octet_length(F.encode(prefix, "UTF-8")) == _VID_BYTES)
    ).select("doc_id", prefix.alias("p"))
    orig_ch = F.expr(f"substring(p, CAST(doc_id % {_VID_BYTES} AS INT) + 1, 1)")
    pert = F.concat(
        F.expr(f"substring(p, 1, CAST(doc_id % {_VID_BYTES} AS INT))"),
        F.when(orig_ch == "A", F.lit("B")).otherwise(F.lit("A")),
        F.expr(f"substring(p, CAST(doc_id % {_VID_BYTES} AS INT) + 2, {_VID_BYTES})"),
    )
    variants = base.select(
        (F.col("doc_id") * 2).alias("media_id"), F.col("p").alias("p")
    ).unionAll(
        base.select((F.col("doc_id") * 2 + 1).alias("media_id"), pert.alias("p"))
    )
    return video_neardup_pairs(
        _framed_video(variants), every_nth=2, bands=8, max_hamming=7, min_frames=2
    )


def _pert_sql(src: str, pos: str) -> str:
    """SQL for the one-char perturbation device on a 288-char string:
    rewrite character at 0-based position ``pos`` to 'A' ('B' if it was
    already 'A')."""
    return (
        f"substr({src}, 1, CAST({pos} AS INT)) "
        f"|| CASE WHEN substr({src}, CAST({pos} AS INT) + 1, 1) = 'A' "
        f"THEN 'B' ELSE 'A' END "
        f"|| substr({src}, CAST({pos} AS INT) + 2)"
    )


@query(
    "video_scene_changes",
    f"""
    WITH base AS (
      SELECT doc_id, substr(text, 1, {_IMG_BYTES}) AS f0
      FROM documents
      WHERE {_PFX_FILTER_SQL}),
    framed AS (
      SELECT doc_id * 8 AS media_id, f0 AS pfx FROM base
      UNION ALL
      SELECT doc_id * 8 + 1, {_pert_sql("f0", f"doc_id % {_IMG_BYTES}")} FROM base
      UNION ALL
      SELECT doc_id * 8 + 2,
             {_pert_sql("f0", f"(doc_id + 131) % {_IMG_BYTES}")} FROM base
      UNION ALL
      SELECT doc_id * 8 + 3,
             CASE WHEN doc_id % 2 = 0 THEN reverse(f0)
                  ELSE {_pert_sql("f0", f"(doc_id + 173) % {_IMG_BYTES}")} END
      FROM base),
    {_DHASH_CTE}
    SELECT a.media_id // 8 AS media_id,
           CAST(4 AS BIGINT) AS n_frames,
           CAST(sum(CASE WHEN bit_count(xor(a.dhash, b.dhash)) > 10
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_scene_changes
    FROM hashed a JOIN hashed b
      ON b.media_id = a.media_id + 1 AND a.media_id % 8 < 3
    GROUP BY a.media_id // 8
    """,
    doc="shot-boundary detection by perceptual-hash jump (the published "
    "keyframe-selection device): consecutive frames whose dHashes differ "
    "by > 10 Hamming bits mark a scene cut. Each doc frames as a 4-frame "
    "stream: base frame, two one-char-perturbed drift frames (each "
    "transition moves <= 4 bits — GUARANTEED under threshold, a real "
    "within-shot model), then for EVEN doc_ids the REVERSED frame (an "
    "EMPIRICAL hard cut on this corpus — reversal is not a formal >10-"
    "bit guarantee for pathological symmetric/low-variance prefixes, "
    "only the drift side's <=4-bit bound is formal; both engines hash "
    "the same frames, so the oracle pairing holds either way) and for "
    "odd ones a third drift frame (-> count 0), so the entry exercises "
    "both outcomes on real text. Scale shape: "
    "one Arrow decode+hash stage, then a per-video lag window "
    "(partitioned by media_id — state scales with frames per video, "
    "never corpus-wide) and one grouped count. Curation use: sample one "
    "keyframe per scene instead of every n-th frame",
    survey="LLM multimodal: video scene-change detection (round-13 — "
    "hash-jump shot boundaries)",
)
def video_scene_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm.videofp import video_scene_changes as _vsc

    docs = load(spark, sf_dir, "documents")
    prefix = F.substring("text", 1, _IMG_BYTES)
    base = docs.filter(
        (F.length("text") >= _IMG_BYTES)
        & (F.octet_length(F.encode(prefix, "UTF-8")) == _IMG_BYTES)
    ).select(F.col("doc_id").alias("media_id"), prefix.alias("f0"))

    def pert(pos_sql: str):
        ch = F.expr(f"substring(f0, CAST({pos_sql} AS INT) + 1, 1)")
        return F.concat(
            F.expr(f"substring(f0, 1, CAST({pos_sql} AS INT))"),
            F.when(ch == "A", F.lit("B")).otherwise(F.lit("A")),
            F.expr(f"substring(f0, CAST({pos_sql} AS INT) + 2, {_IMG_BYTES})"),
        )

    frames = [
        F.col("f0"),
        pert(f"media_id % {_IMG_BYTES}"),
        pert(f"(media_id + 131) % {_IMG_BYTES}"),
        F.when(F.col("media_id") % 2 == 0, F.reverse(F.col("f0"))).otherwise(
            pert(f"(media_id + 173) % {_IMG_BYTES}")
        ),
    ]
    parts = []
    for expr in frames:
        parts.append(F.lit(_PGM_HDR))
        parts.append(expr)
    media = base.select(
        "media_id", F.encode(F.concat(*parts), "UTF-8").alias("content")
    )
    return _vsc(media, every_nth=1, threshold=10)


# ------------------------------------------------ tag-mode curation

# DuckDB mirrors of the quality-stat macros (the quality_filter_docs
# oracle's expressions, re-declared so this module's closure never
# touches queries.py internals beyond load/query)
_NORM9 = "lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))"
_TOKS9 = "string_split_regex(lower(trim(text)), '\\s+')"


@query(
    "curation_tag_attrition",
    f"""
    WITH h AS (
      SELECT doc_id, source, text, md5({_NORM9}) AS ch FROM documents),
    reps AS (SELECT ch, min(doc_id) AS rep FROM h GROUP BY ch),
    s AS (
      SELECT h.doc_id, h.source, (h.doc_id = r.rep) AS keep_exact,
             CAST(len({_TOKS9}) AS BIGINT) AS n_tokens,
             round(list_sum(list_transform({_TOKS9}, w -> length(w))) * 1.0
                   / len({_TOKS9}), 4) AS mtl,
             round(len(list_distinct({_TOKS9})) * 1.0 / len({_TOKS9}), 4) AS dr,
             length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS np,
             length(text) AS nc
      FROM h JOIN reps r ON h.ch = r.ch),
    v AS (
      SELECT doc_id, source, keep_exact,
             (n_tokens >= 20) AS ok_len,
             (mtl BETWEEN 3.0 AND 12.0) AS ok_token_len,
             (dr >= 0.3) AS ok_diversity,
             (np * 1.0 / nc <= 0.2) AS ok_punct
      FROM s)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_input,
           CAST(sum(CASE WHEN NOT keep_exact THEN 1 ELSE 0 END) AS BIGINT)
             AS drop_exact,
           CAST(sum(CASE WHEN keep_exact AND NOT (ok_len AND ok_token_len
                          AND ok_diversity AND ok_punct)
                    THEN 1 ELSE 0 END) AS BIGINT) AS drop_quality,
           CAST(sum(CASE WHEN NOT ok_len THEN 1 ELSE 0 END) AS BIGINT)
             AS fail_len,
           CAST(sum(CASE WHEN NOT ok_token_len THEN 1 ELSE 0 END) AS BIGINT)
             AS fail_token_len,
           CAST(sum(CASE WHEN NOT ok_diversity THEN 1 ELSE 0 END) AS BIGINT)
             AS fail_diversity,
           CAST(sum(CASE WHEN NOT ok_punct THEN 1 ELSE 0 END) AS BIGINT)
             AS fail_punct,
           CAST(sum(CASE WHEN keep_exact AND ok_len AND ok_token_len
                          AND ok_diversity AND ok_punct
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM v GROUP BY source
    """,
    doc="Dolma-style tag-don't-drop curation audit: one pass emits every "
    "stage decision as a boolean column (tag_corpus), then a per-source "
    "attrition report — first-fail-attributed stage drops (n_input == "
    "drop_exact + drop_quality + n_kept) plus non-exclusive per-rule "
    "fail counts, the auditability tagging exists for. Scale shape: the "
    "exact-dedup hash aggregate + per-doc codegen quality rules + one "
    "grouped aggregate — no new shuffle classes over drop mode",
    survey="LLM curation: tag-don't-drop mode + attrition report "
    "(round-13, VERDICT r12 #4)",
)
def curation_tag_attrition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm.curate import attrition_report, tag_corpus

    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    tagged = tag_corpus(docs)
    return attrition_report(tagged, "source")


# ------------------------------------------- seeded corpus shuffle

#: shards for the corpus_shuffle_assignment entry.
_SHUF_N = 16


@query(
    "corpus_shuffle_assignment",
    f"""
    WITH k AS (
      SELECT doc_id,
             ('0x' || substr(md5('shuf|' || CAST(doc_id AS VARCHAR)), 1, 15))
               ::UBIGINT AS h
      FROM documents)
    SELECT doc_id,
           CAST(h % {_SHUF_N} AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY h % {_SHUF_N}
                                   ORDER BY h, doc_id) AS BIGINT) AS pos
    FROM k
    """,
    doc="seeded deterministic corpus shuffle (the training-loader "
    "epoch-shuffle device): shard = md5-hash(salt|id) % 16, pos = hash "
    "rank within the shard — a global pseudo-random order realized as "
    "ONE hash shuffle + per-shard sort, never a global ORDER BY; pure "
    "function of (salt, id) so every engine/rerun reproduces the "
    "identical permutation",
    survey="LLM curation: seeded corpus shuffle / stable shard layout "
    "(round-13, VERDICT r12 #6)",
)
def corpus_shuffle_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm.shuffle import shuffle_assignment

    docs = load(spark, sf_dir, "documents").select("doc_id")
    return shuffle_assignment(docs, n_shards=_SHUF_N, salt="shuf")

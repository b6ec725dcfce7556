"""Catalog-wide plan audit: every relational query must stay JVM-side
(no Python eval in the hot path) — the only sanctioned Python stages are
the wire serde, the stateful assembly, user hooks, and the stubbed
multimodal codec."""

from openmsistream_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"

# queries whose declared design includes a Python (Arrow) stage
PYTHON_ALLOWED = {
    "multimodal_decode_features",  # mapInPandas codec stage (by design)
    "multimodal_frame_sample",
    "multimodal_resize",
    "multimodal_pgm_decode",  # REAL decode through the same codec stage
    "wire_roundtrip_docs",  # msgpack serde pandas UDFs (by design)
    # two-phase top-k: one bounded per-partition mapInPandas stage keeps the
    # global window over partitions*queries*k survivors instead of the whole
    # corpus (llm/similarity.py — sanctioned scale design, Arrow-batched)
    "cosine_topk_bruteforce",
    "cosine_topk_lsh",
    "cosine_topk_sq8",
    "ann_ivf_topk",
    # embeds cosine_topk as its vector arm -> inherits that op's
    # sanctioned two-phase top-k Arrow stage (the BM25 arm and the
    # fusion itself are pure JVM)
    "hybrid_rrf_topk",
    # nearest-centroid assignment is ONE Arrow-batched argmax over the
    # broadcast centroid matrix (llm/similarity._assign_nearest —
    # round-9 shape: zero shuffle, SIMD fold-ordered dot products; the
    # interpreted higher-order-function argmax it replaced benched ~2x
    # the whole pipeline)
    "semdedup_pairs_seeded",
    "semdedup_survivors_seeded",
    # sign-LSH buckets are quadratic islands like SemDeDup clusters —
    # same shared grouped Arrow pair stage (vectors cross Arrow once
    # per bucket instead of a sum-of-bucket-squared pair-row join)
    "embedding_neardup_pairs",
    # D4 prototype pruning assigns via kmeans_assign's broadcast Arrow
    # argmax (the round-9 assignment stage)
    "d4_prototype_prune",
    # PQ ADC scoring is one Arrow stage: broadcast LUTs, vectorized
    # integer gathers per Arrow batch (llm/pq.py — zero corpus shuffle)
    "ann_pq_adc_topk",
    # bloom probe: broadcast bitmask + C-speed hashlib gram/position
    # hashing inside ONE mapInPandas stage (llm/bloom.gram_novelty —
    # zero probe-side shuffle; the JVM transform() alternative runs
    # interpreted md5 per gram and benched ~10x slower)
    "bloom_gram_novelty",
    # BPE segmentation applies the broadcast merge chain per Arrow
    # batch (llm/bpe.bpe_segment — zero corpus shuffle)
    "bpe_segment_token_counts",
    # sharded bloom (round-11 big-m path): the mask build's per-task
    # partial-OR and the probe's per-shard cogroup bit-test are the
    # operator's two Arrow stages (llm/bloom_sharded.py — positions
    # stay JVM-side codegen md5, Python only does vectorized numpy
    # bit arithmetic)
    "bloom_sharded_gram_novelty",
    # probe-sidecar gate twin (round 16): bloom_build/bloom_mark are
    # the broadcast-mask stages of llm/phash_index — positions stay
    # JVM codegen md5; the Arrow stages only do vectorized numpy bit
    # OR/test (same sanction as bloom_gram_novelty)
    "combo_bloom_gated_probe",
    # unicode NFC composition is the one step Spark's function library
    # cannot express (no ICU builtin): a single Arrow-vectorized
    # pandas_udf (llm/extract.nfc_udf — round-12; everything else in
    # the normalize chain is codegen literal replaces)
    "unicode_normalize_docs",
    # paragraph novelty probes the broadcast bloom mask through the
    # same sanctioned mapInPandas bit-test as bloom_gram_novelty
    # (llm/bloom.bloom_mark — round-12 Dolma composition)
    "paragraph_novelty_dedup",
    # the chained front half includes the normalize stage, hence the
    # same single sanctioned Arrow NFC stage as unicode_normalize_docs
    "curated_crawl_docs",
    # image perceptual hashing: ONE Arrow decode+hash stage (the
    # multimodal codec shape, llm/phash.image_fingerprints); the
    # near-dup entry's banding/join/bit_count stay JVM codegen
    "image_dhash_fingerprints",
    "image_dhash_neardup_pairs",
    # audio envelope hashing: the same single Arrow decode+hash stage
    # (llm/audiofp.audio_fingerprints); banding stays JVM codegen
    "audio_envelope_fingerprints",
    "audio_envelope_neardup_pairs",
    # video keyframe hashing: one Arrow decode+sample+hash stage
    # (llm/videofp.video_frame_fingerprints); aligned banding JVM-side
    "video_keyframe_fingerprints",
    "video_keyframe_neardup_pairs",
    # audio quality counters / video scene-change detection: the same
    # single Arrow decode stage; windows/aggregates JVM-side
    "audio_quality_stats",
    "video_scene_changes",
    # same single Arrow decode+hash stage; combo-key join JVM-side
    "image_dhash_neardup_combo",
    # video representative fingerprint (round-14): the one Arrow
    # decode+sample+hash stage, then the majority fold is pure JVM —
    # one map-side-combinable groupBy with 65 codegen aggregates
    "video_representative_fingerprint",
    # representative fold + combo-key pair join, all JVM after the
    # same single Arrow frame-hash stage
    "video_representative_neardup",
}


def test_catalog_is_jvm_side(spark):
    offenders = []
    for name, spec in QUERIES.items():
        plan = (
            spec.fn(spark, SF)
            ._jdf.queryExecution()
            .explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "simple"
                )
            )
        )
        has_python = any(
            t in plan
            for t in ("EvalPython", "MapInPandas", "GroupsInPandas", "InArrow")
        )
        if has_python and name not in PYTHON_ALLOWED:
            offenders.append(name)
        if not has_python and name in PYTHON_ALLOWED:
            offenders.append(f"{name} (expected a Python stage, found none)")
        # row-at-a-time Python UDFs are never sanctioned, even where an
        # Arrow stage is allowed
        if "BatchEvalPython" in plan:
            offenders.append(f"{name} (row-at-a-time BatchEvalPython)")
    assert not offenders, f"non-JVM plans: {offenders}"

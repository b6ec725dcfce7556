"""Large-scale training-data pipeline operators.

First-class extensions beyond the reference's own surface (driver north
star): deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard),
similarity search over embeddings, text analysis, and multimodal binary
columns. All are compositions of DataFrame primitives designed to scale:
hash-based candidate pruning before any pairwise work, broadcastable
small sides, no driver-side loops.
"""

from .dedup import (
    dedup_clusters,
    drop_boilerplate_lines,
    exact_dedup,
    incremental_exact_dedup,
    incremental_minhash_dedup,
    jaccard_pairs,
    keep_best,
    keep_canonical,
    minhash_lsh_candidates,
    minhash_lsh_dedup,
    minhash_signatures,
    simhash,
    simhash_band_pairs,
    streaming_exact_dedup,
    word_shingles,
)
from .curate import curate_corpus, decontaminate
from .fingerprint import (
    fingerprint_overlap_pairs,
    kgram_hashes,
    winnow_fingerprints,
)
from .semdedup import (
    d4_prune,
    prototype_prune,
    semdedup_pairs,
    semdedup_prune,
)
from .quality import (
    count_difference_weights,
    quality_classifier_filter,
    score_with_weights,
    train_quality_classifier,
)
from .packing import (
    mixture_sample,
    pack_sequences,
    shard_by_token_budget,
    write_training_shards,
)
from .similarity import (
    cosine_topk,
    cosine_topk_lsh,
    cosine_topk_sq8,
    incremental_embedding_dedup,
    ivf_search,
    ivf_search_index,
    recall_at_k,
    kmeans_assign,
    kmeans_fit,
    quantize_int8,
    write_ivf_index,
)
from .pq import (
    pq_adc_topk,
    pq_codebooks_from_seeds,
    pq_encode,
    pq_fit,
)
from .bloom import (
    BloomFilter,
    bloom_build,
    bloom_from_positions,
    bloom_mark,
    gram_novelty,
)
from .bpe import (
    BpeMerge,
    bpe_segment,
    bpe_train,
    bpe_word_counts,
)
from .containment import containment_pairs
from .sampling import weighted_sample_wor
from .retrieval import (
    bm25_prf_expand,
    bm25_scores,
    bm25_search_index,
    bm25_topk,
    bm25_topk_per_query,
    rrf_fuse,
    write_text_index,
)
from .tfidf import tfidf_cosine_pairs, tfidf_terms
from .textstats import (
    doc_fingerprint,
    language_id,
    pii_redact,
    quality_filter,
    repetition_signals,
    text_stats,
)

__all__ = [
    "dedup_clusters",
    "drop_boilerplate_lines",
    "exact_dedup",
    "incremental_exact_dedup",
    "incremental_minhash_dedup",
    "streaming_exact_dedup",
    "word_shingles",
    "jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "minhash_lsh_dedup",
    "simhash",
    "simhash_band_pairs",
    "mixture_sample",
    "pack_sequences",
    "shard_by_token_budget",
    "write_training_shards",
    "cosine_topk",
    "cosine_topk_lsh",
    "cosine_topk_sq8",
    "incremental_embedding_dedup",
    "ivf_search",
    "ivf_search_index",
    "kmeans_assign",
    "kmeans_fit",
    "quantize_int8",
    "recall_at_k",
    "write_ivf_index",
    "pq_adc_topk",
    "pq_codebooks_from_seeds",
    "pq_encode",
    "pq_fit",
    "BloomFilter",
    "bloom_build",
    "bloom_from_positions",
    "bloom_mark",
    "gram_novelty",
    "BpeMerge",
    "bpe_segment",
    "bpe_train",
    "bpe_word_counts",
    "curate_corpus",
    "decontaminate",
    "text_stats",
    "language_id",
    "doc_fingerprint",
    "pii_redact",
    "quality_filter",
    "repetition_signals",
    "tfidf_terms",
    "tfidf_cosine_pairs",
    "bm25_scores",
    "bm25_topk",
    "bm25_topk_per_query",
    "containment_pairs",
    "rrf_fuse",
    "write_text_index",
    "bm25_search_index",
    "bm25_prf_expand",
    "weighted_sample_wor",
]

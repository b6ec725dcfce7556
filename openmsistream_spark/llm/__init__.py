"""Large-scale training-data pipeline operators.

First-class extensions beyond the reference's own surface (driver north
star): deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard),
similarity search over embeddings, text analysis, and multimodal binary
columns. All are compositions of DataFrame primitives designed to scale:
hash-based candidate pruning before any pairwise work, broadcastable
small sides, no driver-side loops.
"""

from .dedup import (
    exact_dedup,
    word_shingles,
    jaccard_pairs,
    minhash_signatures,
    minhash_lsh_candidates,
    minhash_lsh_dedup,
    simhash,
    simhash_band_pairs,
)
from .similarity import cosine_topk, cosine_topk_lsh
from .textstats import (
    text_stats,
    language_id,
    doc_fingerprint,
    pii_redact,
    repetition_signals,
)

__all__ = [
    "exact_dedup",
    "word_shingles",
    "jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "minhash_lsh_dedup",
    "simhash",
    "simhash_band_pairs",
    "cosine_topk",
    "cosine_topk_lsh",
    "text_stats",
    "language_id",
    "doc_fingerprint",
    "pii_redact",
    "repetition_signals",
]

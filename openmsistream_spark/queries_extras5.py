"""Round-10 catalog additions, registered OUT-OF-BAND.

Same discipline as ``queries_extras*.py`` (see their module docstrings):
imported directly by the catalog entry points (``__spark_entry__.py``,
``bench.py``, ``tests/conftest.py``), never from ``queries.py``, so
landing new queries does not dirty the source closure of
already-verified catalog entries.

Content — three scale-path families a 100 TB training-data pipeline
leans on that the catalog lacked through round 9:

- ``ann_pq_adc_topk``: product quantization + asymmetric distance
  (Jégou et al. 2011, ``llm/pq.py``) — the ~32x-compressed ANN scan.
  Seeded codebooks (the ``ann_ivf_topk`` convention) so the oracle
  reproduces encoding without Lloyd's; integer-micro ADC accumulation
  makes scores order-free and engine-exact.
- ``bloom_gram_novelty``: Dolma-style bloom-filter novelty scan
  (``llm/bloom.py``) — reference 8-grams collapse to a broadcast
  bitmask, probe docs count their definitely-novel grams with ZERO
  probe-side shuffle (the scale path of ``contamination_8gram``'s
  exact gram join). Bloom verdicts are pure md5 arithmetic, so the
  oracle reproduces them exactly — false positives are deterministic
  semantics, not an approximation gap.
- ``bpe_train4_merges`` / ``bpe_segment_token_counts``: distributed BPE
  tokenizer training (Sennrich et al. 2016, ``llm/bpe.py``). Because
  symbols stay single chars (merged pairs become private-use-area
  placeholders), one merge round IS SQL ``replace()`` — so the oracle
  UNROLLS four full training rounds (count pairs -> top-1 -> replace,
  four times) and the segmentation entry re-applies the learned chain,
  making the iterative trainer hash-verifiable end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import load, query

# 64-dim embeddings split into 8 subspaces of 8 dims; 8 seeded codewords
# per subspace (vec_id < 8); ADC queries are vec_id 10..14 (the
# ann_ivf_topk convention); top-5 per query.
_PQ_SQL = """
    WITH emb AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    subs AS (SELECT unnest(range(8)) AS sub),
    cbd AS (
      SELECT s.sub, e.vec_id AS code,
             list_slice(e.v, s.sub * 8 + 1, (s.sub + 1) * 8) AS cw,
             list_dot_product(list_slice(e.v, s.sub * 8 + 1, (s.sub + 1) * 8),
                              list_slice(e.v, s.sub * 8 + 1, (s.sub + 1) * 8)) AS dcc
      FROM emb e CROSS JOIN subs s
      WHERE e.vec_id < 8),
    subv AS (
      SELECT e.vec_id, s.sub,
             list_slice(e.v, s.sub * 8 + 1, (s.sub + 1) * 8) AS sv
      FROM emb e CROSS JOIN subs s),
    enc AS (
      SELECT vec_id, sub, code FROM (
        SELECT sv.vec_id, sv.sub, c.code,
               row_number() OVER (
                 PARTITION BY sv.vec_id, sv.sub
                 ORDER BY list_dot_product(sv.sv, sv.sv)
                          - 2 * list_dot_product(sv.sv, c.cw) + c.dcc ASC,
                          c.code ASC) AS rn
        FROM subv sv JOIN cbd c ON c.sub = sv.sub) t
      WHERE rn = 1),
    luts AS (
      SELECT q.vec_id AS qid, c.sub, c.code,
             CAST(round(round(list_dot_product(
                    list_slice(q.v, c.sub * 8 + 1, (c.sub + 1) * 8), c.cw), 6)
                  * 1000000.0, 0) AS BIGINT) AS micro
      FROM emb q CROSS JOIN cbd c
      WHERE q.vec_id IN (10, 11, 12, 13, 14)),
    scored AS (
      SELECT l.qid AS query_id, e.vec_id AS neighbor_id,
             CAST(sum(l.micro) AS DOUBLE) / 1000000.0 AS score
      FROM enc e JOIN luts l ON l.sub = e.sub AND l.code = e.code
      WHERE e.vec_id <> l.qid
      GROUP BY 1, 2)
    SELECT query_id, neighbor_id, score, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, neighbor_id) AS rank
      FROM scored) t
    WHERE rank <= 5
    """


@query(
    "ann_pq_adc_topk",
    _PQ_SQL,
    doc="PQ + asymmetric-distance ANN: 64-dim vectors -> 8 one-byte "
    "codes (seeded 8-codeword codebooks), each query scores the corpus "
    "by 8 integer LUT lookups per vector — the ~32x-compressed scan "
    "for bandwidth-bound embedding search; integer-micro accumulation "
    "keeps scores engine-exact",
    survey="LLM similarity search: PQ/ADC compressed scale path",
)
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm.pq import pq_adc_topk, pq_codebooks_from_seeds

    emb = load(spark, sf_dir, "embeddings")
    cb = pq_codebooks_from_seeds(emb, m=8, kc=8)
    return pq_adc_topk(emb, cb, query_ids=[10, 11, 12, 13, 14], k=5)


# bloom novelty: reference corpus = source 'src0'; 2^20-bit mask, 4
# probes (fill ~0.1 at sf0.1 -> fp ~1e-4). The oracle mirrors the bloom
# EXACTLY: "all 4 md5 positions set in the mask" == "all 4 positions in
# the DISTINCT position set of the build side".
_BLOOM_SQL = r"""
    WITH toks AS (SELECT doc_id, source,
                         string_split_regex(lower(trim(text)), '\s+') AS ws
                  FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, source, shingle FROM (
        SELECT doc_id, source,
               unnest(CASE WHEN len(ws) >= 8
                      THEN [substr(md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
                            ws[i+3] || ' ' || ws[i+4] || ' ' || ws[i+5] || ' ' ||
                            ws[i+6] || ' ' || ws[i+7]), 1, 16)
                            for i in range(1, len(ws)-6)]
                      ELSE [] END) AS shingle
        FROM toks) t),
    pos AS (
      SELECT doc_id, source, shingle,
             ('0x' || substr(md5(shingle || '#' || CAST(s.i AS VARCHAR)), 1, 15))::UBIGINT
               % 1048576 AS pos
      FROM sh CROSS JOIN (SELECT unnest(range(4)) AS i) s),
    build AS (SELECT DISTINCT pos FROM pos WHERE source = 'src0'),
    probe AS (
      SELECT p.doc_id, p.shingle, bool_and(b.pos IS NOT NULL) AS maybe_seen
      FROM pos p LEFT JOIN build b ON b.pos = p.pos
      WHERE p.source <> 'src0'
      GROUP BY 1, 2)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN maybe_seen THEN 0 ELSE 1 END) AS BIGINT) AS n_novel
    FROM probe GROUP BY doc_id
    """


@query(
    "bloom_gram_novelty",
    _BLOOM_SQL,
    doc="bloom-filter novelty scan (Dolma dedupe device): reference "
    "8-grams (source='src0') collapse to a broadcast 2^20-bit mask; "
    "each probe doc counts its definitely-novel grams row-locally — "
    "zero probe-side shuffle where the exact contamination join "
    "shuffles every gram of both corpora",
    survey="LLM dedup/decontamination: bloom membership scale path",
)
def bloom_gram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm.bloom import bloom_build, gram_novelty
    from .llm.dedup import word_shingles

    docs = load(spark, sf_dir, "documents")
    ref = word_shingles(docs.filter(F.col("source") == "src0"), n=8, hashed=True)
    # no distinct: bit-setting is idempotent, so the build side needs no
    # dedup shuffle at all (word_shingles' per-doc distinct is enough)
    bloom = bloom_build(ref.select("shingle"), "shingle", m_bits=1 << 20, k=4)
    return gram_novelty(docs.filter(F.col("source") != "src0"), bloom, n=8)


# ------------------------------------------------------------------ BPE
# Four BPE training rounds unrolled in SQL. Single-char symbols make a
# merge round literally `replace(w, pair, placeholder)` (leftmost
# non-overlapping — the BPE rule), so each round is: pair counts from
# 2-char substrings -> top-1 (cnt DESC, pair ASC) -> replace. The final
# expansion substitutes placeholders back (descending rank: pair_i only
# ever contains placeholders with rank < i).
_BPE_ROUNDS = 4


def _bpe_cte(rounds: int) -> str:
    parts = [
        r"""
    WITH w0 AS (
      SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM (
        SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
        FROM documents) t
      WHERE w <> '' AND NOT regexp_matches(w, '[-]')
      GROUP BY w)"""
    ]
    for i in range(1, rounds + 1):
        ph = 0xE000 + i - 1
        parts.append(
            f"""
    p{i} AS (
      SELECT substring(w, j, 2) AS pair, CAST(sum(cnt) AS BIGINT) AS pcnt
      FROM (SELECT w, cnt, unnest(range(1, length(w))) AS j FROM w{i - 1}) t
      GROUP BY 1 ORDER BY pcnt DESC, pair ASC LIMIT 1),
    w{i} AS (
      SELECT replace(w, (SELECT pair FROM p{i}), chr({ph})) AS w, cnt
      FROM w{i - 1})"""
        )
    return ",".join(parts)


def _bpe_expand(col: str, rounds: int) -> str:
    out = col
    for i in range(rounds, 0, -1):
        out = f"replace({out}, chr({0xE000 + i - 1}), (SELECT pair FROM p{i}))"
    return out


_BPE_MERGES_SQL = (
    _bpe_cte(_BPE_ROUNDS)
    + ",\n    merges AS ("
    + "\n      UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS rank, (SELECT pair FROM p{i}) AS pair,"
        f" (SELECT pcnt FROM p{i}) AS cnt"
        for i in range(1, _BPE_ROUNDS + 1)
    )
    + ")\n"
    + f"""
    SELECT rank,
           {_bpe_expand("substring(pair, 1, 1)", _BPE_ROUNDS)} AS left,
           {_bpe_expand("substring(pair, 2, 1)", _BPE_ROUNDS)} AS right,
           {_bpe_expand("pair", _BPE_ROUNDS)} AS merged,
           cnt
    FROM merges
    """
)


@query(
    "bpe_train4_merges",
    _BPE_MERGES_SQL,
    doc="distributed BPE training, four merge rounds: corpus collapses "
    "once to word counts (the only corpus-sized shuffle), every round "
    "is a vocabulary-sized pair-count aggregate + driver top-1 + "
    "shuffle-free replace; the oracle unrolls all four rounds in SQL",
    survey="LLM text analysis: BPE tokenizer training",
)
def bpe_train4_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm.bpe import bpe_train, bpe_word_counts, merge_table

    docs = load(spark, sf_dir, "documents")
    merges = bpe_train(bpe_word_counts(docs), n_merges=_BPE_ROUNDS)
    return merge_table(spark, merges).select("rank", "left", "right", "merged", "cnt")


# segmentation under the 4 learned merges: every char of the replaced
# word is one token, so per-doc token count = sum of replaced lengths.
def _bpe_apply(col: str, rounds: int) -> str:
    out = col
    for i in range(1, rounds + 1):
        out = f"replace({out}, (SELECT pair FROM p{i}), chr({0xE000 + i - 1}))"
    return out


_BPE_SEGMENT_SQL = (
    _bpe_cte(_BPE_ROUNDS)
    + f"""
    SELECT doc_id, CAST(sum(length({_bpe_apply("w", _BPE_ROUNDS)})) AS BIGINT) AS n_tokens
    FROM (SELECT doc_id,
                 unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
          FROM documents) t
    WHERE w <> ''
    GROUP BY doc_id
    """
)


@query(
    "bpe_segment_token_counts",
    _BPE_SEGMENT_SQL,
    doc="BPE segmentation under the four learned merges (frozen-vocab "
    "tokenization): one Arrow stage with the broadcast merge chain, "
    "zero corpus shuffle; per-doc subword token counts",
    survey="LLM text analysis: BPE segmentation / token counting",
)
def bpe_segment_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm.bpe import bpe_segment, bpe_train, bpe_word_counts

    docs = load(spark, sf_dir, "documents")
    merges = bpe_train(bpe_word_counts(docs), n_merges=_BPE_ROUNDS)
    return (
        bpe_segment(docs, merges)
        .select("doc_id", F.size("tokens").cast("long").alias("n_tokens"))
    )

"""Round-10 catalog additions, registered OUT-OF-BAND.

Same discipline as ``queries_extras*.py`` (see their module docstrings):
imported directly by the catalog entry points (``__spark_entry__.py``,
``bench.py``, ``tests/conftest.py``), never from ``queries.py``, so
landing new queries does not dirty the source closure of
already-verified catalog entries.

Content — the scale-path families a 100 TB training-data pipeline
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
- ``hll_distinct_users`` / ``cms_token_freq_topk``: the sketch
  aggregates (``operators/sketches.py``) — HyperLogLog distinct
  counting and Count-Min frequency estimation, both engine-exact
  (register/counter arithmetic is portable md5; the HLL estimate is
  dyadic-rational fixed point with a frozen integer alpha).
- ``bigram_lm_surprisal``: interpolated bigram-LM document scoring —
  the CCNet perplexity-filter device one n-gram order above
  ``unigram_surprisal_quality``.
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


# -------------------------------------------------------------- sketches
# HLL: p=12 -> m=4096 buckets over the top 12 bits of a 52-bit md5 hash;
# rho from the remaining 40 bits. The harmonic sum is dyadic-rational
# (2^-rho scaled by 2^41 is an integer), and alpha_m is frozen to an
# integer micro literal, so the estimate itself is one half-up integer
# division — engine-exact, no float ln/pow anywhere.
_HLL_P = 12
_HLL_VB = 52 - _HLL_P
_HLL_M = 1 << _HLL_P


def _hll_a_num() -> int:
    from .operators.sketches import hll_alpha_micro

    return hll_alpha_micro(_HLL_P) * _HLL_M * _HLL_M * (1 << (_HLL_VB + 1)) * 100


_HLL_SQL = f"""
    WITH h AS (
      SELECT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))::UBIGINT AS h
      FROM events WHERE user_id IS NOT NULL),
    reg AS (
      SELECT event_type, h // {1 << _HLL_VB} AS bucket,
             max(CASE WHEN h % {1 << _HLL_VB} = 0 THEN {_HLL_VB + 1}
                      ELSE {_HLL_VB + 1}
                           - length(bin(CAST(h % {1 << _HLL_VB} AS BIGINT)))
                 END) AS r
      FROM h GROUP BY 1, 2),
    agg AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_registers,
             sum(CAST(1 AS BIGINT) << ({_HLL_VB + 1} - r)) AS s_present
      FROM reg GROUP BY 1),
    est AS (
      SELECT event_type, n_registers,
             CAST(s_present
                  + ({_HLL_M} - n_registers) * {1 << (_HLL_VB + 1)} AS HUGEINT)
               AS s
      FROM agg),
    fin AS (
      SELECT event_type, n_registers,
             CAST((2 * {_hll_a_num()} + s * 1000000)
                  // (2 * s * 1000000) AS BIGINT) AS est_e2
      FROM est)
    SELECT e.event_type, CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_exact,
           f.n_registers, f.est_e2,
           CASE WHEN f.est_e2 <= {250 * _HLL_M} AND f.n_registers < {_HLL_M}
                THEN round({_HLL_M} * ln(CAST({_HLL_M} AS DOUBLE)
                                         / ({_HLL_M} - f.n_registers)), 4)
                ELSE round(CAST(f.est_e2 AS DOUBLE) / 100.0, 4) END AS estimate
    FROM events e JOIN fin f USING (event_type)
    GROUP BY 1, 3, 4, 5
    """


@query(
    "hll_distinct_users",
    _HLL_SQL,
    doc="HyperLogLog distinct-user estimate per event_type (p=12, 4096 "
    "one-byte registers) next to the exact count: the register build is "
    "one map-side-combinable max — the shuffle carries at most m rows "
    "per group regardless of key cardinality, the COUNT(DISTINCT) scale "
    "path; dyadic-rational harmonic sum + frozen integer alpha make the "
    "estimate itself engine-exact (no float ln/pow)",
    survey="Sketch aggregates: HLL cardinality (approx COUNT DISTINCT scale path)",
)
def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sketches import hll_distinct

    ev = load(spark, sf_dir, "events")
    sk = hll_distinct(
        ev.select("event_type", F.col("user_id").cast("string").alias("uid")),
        "uid",
        ["event_type"],
        p=_HLL_P,
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    return exact.join(sk, "event_type").select(
        "event_type", "n_exact", "n_registers", "est_e2", "estimate"
    )


_CMS_SQL = r"""
    WITH toks AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
      FROM documents),
    t2 AS (SELECT token FROM toks WHERE token <> ''),
    vocab AS (SELECT token, CAST(count(*) AS BIGINT) AS exact_cnt
              FROM t2 GROUP BY 1),
    top AS (SELECT token, exact_cnt FROM vocab
            ORDER BY exact_cnt DESC, token LIMIT 20),
    ii AS (SELECT unnest(range(4)) AS i),
    counters AS (
      SELECT ii.i,
             ('0x' || substr(md5(t2.token || '#' || CAST(ii.i AS VARCHAR)),
                             1, 15))::UBIGINT % 2048 AS pos,
             CAST(count(*) AS BIGINT) AS cnt
      FROM t2 CROSS JOIN ii GROUP BY 1, 2)
    SELECT t.token, t.exact_cnt, CAST(min(c.cnt) AS BIGINT) AS cms_cnt
    FROM top t CROSS JOIN ii s
    JOIN counters c ON c.i = s.i
     AND c.pos = ('0x' || substr(md5(t.token || '#' || CAST(s.i AS VARCHAR)),
                                 1, 15))::UBIGINT % 2048
    GROUP BY 1, 2
    """


@query(
    "cms_token_freq_topk",
    _CMS_SQL,
    doc="Count-Min frequency sketch (d=4, w=2048) over every token "
    "occurrence, probed at the exact top-20 tokens: occurrences go "
    "straight to (row, position) cells — map-side combine bounds the "
    "shuffle at d*w rows per task with the vocabulary never "
    "materialized (the term-frequency scale path); estimates are "
    "integer sums, engine-exact including the deterministic "
    "overestimates",
    survey="Sketch aggregates: Count-Min point frequency (vocab-free counting)",
)
def cms_token_freq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sketches import cms_counters, cms_lookup

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    exact = toks.groupBy("token").agg(F.count("*").cast("long").alias("exact_cnt"))
    top = exact.orderBy(F.col("exact_cnt").desc(), F.col("token")).limit(20)
    counters = cms_counters(toks, "token", d=4, w=2048)
    return cms_lookup(counters, top, "token", d=4, w=2048).select(
        "token", "exact_cnt", "cms_cnt"
    )


# ---------------------------------------------------------- bigram LM
# Interpolated bigram LM: p(w2|w1) = 0.9*c12/c1 + 0.1*c2/N over adjacent
# token pairs (c1 = bigram starts with w1, c2 = bigram ends with w2,
# N = total bigrams — all from one pairs table). Per-bigram surprisal is
# rounded at 6 dp BEFORE the decimal-accumulated per-doc sum (the
# unigram_surprisal_quality float-parity convention), so ln() ulp jitter
# and summation order never reach the compared digits.
_BIGRAM_SQL = r"""
    WITH base AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents),
    pairs AS (
      SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
            FROM base WHERE len(t) >= 2) q
      WHERE t[i] <> '' AND t[i + 1] <> ''),
    big AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY 1, 2),
    ctx AS (SELECT w1, count(*) AS c1 FROM pairs GROUP BY 1),
    uni AS (SELECT w2, count(*) AS c2 FROM pairs GROUP BY 1),
    tot AS (SELECT count(*) AS n FROM pairs),
    scored AS (
      SELECT b.w1, b.w2,
             round(-ln(0.9 * (CAST(b.c12 AS DOUBLE) / c.c1)
                       + 0.1 * (CAST(u.c2 AS DOUBLE) / t.n)), 6) AS s
      FROM big b JOIN ctx c USING (w1) JOIN uni u USING (w2) CROSS JOIN tot t)
    SELECT d.doc_id, d.source, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(CAST(sum(CAST(s.s AS DECIMAL(28,6))) AS DOUBLE)
                 / count(*), 4) AS mean_surprisal
    FROM pairs p JOIN scored s ON s.w1 = p.w1 AND s.w2 = p.w2
    JOIN documents d USING (doc_id)
    GROUP BY 1, 2
    """


@query(
    "bigram_lm_surprisal",
    _BIGRAM_SQL,
    doc="interpolated bigram-LM mean surprisal per document — the CCNet "
    "KenLM-perplexity filter one n-gram order up from "
    "unigram_surprisal_quality: fluent common-transition text scores "
    "low, scrambled or rare-transition text scores high; bigrams are "
    "built doc-locally in whole-stage codegen (explode positions + "
    "element_at — no interpreted lambdas), the bigram table is "
    "Zipf-bounded so the scoring join never shuffles the token stream, "
    "and per-bigram ln is rounded 6 dp before the decimal sum "
    "(cross-engine float parity)",
    survey="LLM text analysis: bigram LM quality scoring (CCNet device, order 2)",
)
def bigram_lm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("_toks")
    ).filter(F.size("_toks") >= 2)
    pairs = (
        base.select(
            "doc_id",
            "_toks",
            F.explode(F.expr("sequence(1, size(_toks) - 1)")).alias("_i"),
        )
        .select(
            "doc_id",
            F.expr("element_at(_toks, CAST(_i AS INT))").alias("w1"),
            F.expr("element_at(_toks, CAST(_i + 1 AS INT))").alias("w2"),
        )
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )
    big = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    # ctx/uni/tot are exact marginals of the bigram-count table — derive
    # them from it (vocab-sized) instead of re-aggregating the corpus:
    # the token stream is scanned once for counts, once for scoring
    ctx = big.groupBy("w1").agg(F.sum("c12").alias("c1"))
    uni = big.groupBy("w2").agg(F.sum("c12").alias("c2"))
    tot = big.agg(F.sum("c12").alias("n"))
    scored = (
        big.join(ctx, "w1")
        .join(uni, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.round(
                -F.log(
                    F.lit(0.9) * (F.col("c12").cast("double") / F.col("c1"))
                    + F.lit(0.1) * (F.col("c2").cast("double") / F.col("n"))
                ),
                6,
            ).alias("s"),
        )
    )
    return (
        pairs.join(scored, ["w1", "w2"])
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(
                F.sum(F.col("s").cast("decimal(28,6)")).cast("double")
                / F.count("*"),
                4,
            ).alias("mean_surprisal"),
        )
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

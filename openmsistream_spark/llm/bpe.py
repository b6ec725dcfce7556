"""Distributed BPE (byte-pair encoding) merge learning and
segmentation — the tokenizer-training stage of an LLM data pipeline
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units").

Scale shape (the classic BPE factorization): the corpus is collapsed
ONCE to a (word, count) table — the only corpus-sized shuffle. Every
merge round then runs on the word table, which is vocabulary-sized
(~10^7 rows at 100 TB, not 10^13 tokens): one map-side-combinable
pair-count aggregation + a driver top-1 + a shuffle-free ``replace``
projection. Symbols stay SINGLE CHARACTERS throughout — each merged
pair is assigned a fresh private-use-area placeholder char — so

- an adjacent symbol pair is just a 2-char substring (pair extraction
  is ``substring(w, i, 2)``, no arrays), and
- applying a merge is string ``replace(w, pair, placeholder)``, whose
  leftmost non-overlapping semantics are EXACTLY the BPE merge rule
  ("xxx" under (x,x) -> [xx, x]) and are identical in every SQL
  engine — which is what lets a DuckDB oracle unroll whole training
  rounds (see ``queries_extras5.bpe_train4_merges``).

Tie rule: the merged pair each round is max count, then lexicographic
(pair string ASC, i.e. (left, right) ASC for 1-char symbols) —
deterministic across engines and partitionings. Words that already
contain private-use-area chars are excluded up front (they would
collide with placeholders).

No end-of-word marker is appended (a trainer variant can add one by
suffixing words before ``bpe_word_counts``; the merge mechanics are
identical).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_PUA_RE = "[\ue000-\uf8ff]"  # private use area
PLACEHOLDER_BASE = 0xE000


@dataclass(frozen=True)
class BpeMerge:
    rank: int          # 1-based merge order
    pair: str          # the 2-char symbol pair merged this round
    placeholder: str   # the fresh 1-char symbol that replaced it
    left: str          # expanded (original-character) left symbol
    right: str         # expanded right symbol
    merged: str        # left + right
    cnt: int           # the pair's weighted count when selected


def bpe_word_counts(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Corpus -> (w, cnt): lowercased whitespace tokens with counts —
    the ONE corpus-sized aggregation of BPE training. Words containing
    private-use-area chars are dropped (placeholder collision guard)."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w")
        )
        .filter((F.col("w") != "") & ~F.col("w").rlike(_PUA_RE))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def bpe_train(
    word_counts: DataFrame,
    n_merges: int,
    checkpoint_every: int = 8,
) -> list[BpeMerge]:
    """Learn ``n_merges`` BPE merges from a (w, cnt) table.

    Per round: pair counts via ``substring(w, i, 2)`` explode +
    map-side-combined sum (vocabulary-sized shuffle), driver top-1
    (cnt DESC, pair ASC), then a shuffle-free ``replace`` projection of
    the word table. Lineage is truncated every ``checkpoint_every``
    rounds (each round adds one projection). Stops early if no pairs
    remain. Returns the merges in rank order."""
    words = word_counts.select("w", "cnt")
    expand: dict[str, str] = {}
    merges: list[BpeMerge] = []
    for r in range(1, n_merges + 1):
        top = (
            words.select(
                F.explode(
                    F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
                ).alias("pair"),
                "cnt",
            )
            .filter(F.length("pair") == 2)
            .groupBy("pair")
            .agg(F.sum("cnt").alias("pcnt"))
            .orderBy(F.desc("pcnt"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, pcnt = top[0]["pair"], int(top[0]["pcnt"])
        ph = chr(PLACEHOLDER_BASE + r - 1)
        left = expand.get(pair[0], pair[0])
        right = expand.get(pair[1], pair[1])
        expand[ph] = left + right
        merges.append(
            BpeMerge(
                rank=r, pair=pair, placeholder=ph,
                left=left, right=right, merged=left + right, cnt=pcnt,
            )
        )
        words = words.select(
            F.replace(F.col("w"), F.lit(pair), F.lit(ph)).alias("w"), "cnt"
        )
        if r % checkpoint_every == 0:
            words = words.localCheckpoint(eager=True)
    return merges


def merge_table(spark: SparkSession, merges: list[BpeMerge]) -> DataFrame:
    """Merges as a small DataFrame artifact (rank, left, right, merged,
    cnt) — the shape a segmenter or an oracle consumes."""
    return spark.createDataFrame(
        [(m.rank, m.left, m.right, m.merged, m.cnt) for m in merges],
        "rank long, left string, right string, merged string, cnt long",
    )


def bpe_segment(
    docs: DataFrame,
    merges: list[BpeMerge],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Segment every document into BPE tokens under a FROZEN merge list:
    (id, tokens array<string>), tokens in document order with expanded
    (original-character) symbols.

    One Arrow-batched map stage — merges broadcast as (pair ->
    placeholder) in rank order, each distinct word in a batch is
    segmented once via the same leftmost-non-overlapping replace chain
    the trainer applied (memoized per batch), then expanded. Zero
    shuffle; the corpus never leaves its partitions. NULL-text and
    zero-token documents emit no row.

    Contract: the private-use-area block U+E000.. is RESERVED for merge
    placeholders (the trainer refuses to learn from words containing
    it — see ``bpe_word_counts``). A document word carrying a literal
    PUA character still segments (and its token COUNT matches the SQL
    replace-chain semantics), but that character expands as if it were
    a placeholder, so its token TEXT is not meaningful — pre-filter
    such words if they can occur in your corpus."""
    import pandas as pd
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    spark = docs.sparkSession
    plan = [(m.pair, m.placeholder) for m in merges]
    exp = {m.placeholder: m.merged for m in merges}
    bc = spark.sparkContext.broadcast((plan, exp))
    schema = StructType(
        [
            StructField(id_col, docs.schema[id_col].dataType),
            StructField("tokens", ArrayType(StringType())),
        ]
    )
    # NULL text and documents with zero non-empty tokens drop here:
    # there is nothing to segment, no row is emitted (matching the
    # token-level SQL forms, which GROUP BY doc over non-empty tokens
    # and so never produce a row for such docs), and the Arrow stage
    # never sees a None tokens column
    inp = docs.filter(F.col(text_col).isNotNull()).select(
        id_col,
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("_ws"),
    ).filter(F.exists("_ws", lambda w: w != ""))

    def segment(batches):
        plan_b, exp_b = bc.value
        memo: dict[str, list[str]] = {}

        def word_tokens(w: str) -> list[str]:
            got = memo.get(w)
            if got is None:
                s = w
                for pair, ph in plan_b:
                    s = s.replace(pair, ph)
                got = [exp_b.get(c, c) for c in s]
                memo[w] = got
            return got

        for pdf in batches:
            ids, toks = [], []
            for rid, ws in zip(pdf[id_col], pdf["_ws"]):
                out: list[str] = []
                for w in ws:
                    if w:
                        out.extend(word_tokens(w))
                ids.append(rid)
                toks.append(out)
            yield pd.DataFrame({id_col: ids, "tokens": toks})

    return inp.mapInPandas(segment, schema=schema)

"""One-call batch corpus curation — the standard pretraining pass as a
single composable function, and the engine behind the ``curate-corpus``
CLI command.

Pipeline (each stage optional/configurable, all md5-deterministic):

  exact dedup (canonical = min id per normalized content hash, or
  cross-run against a durable content-hash ledger)
    → near-dup removal (banded MinHash-LSH candidates + connected
      components, one representative per cluster; optionally cross-run
      against a durable LSH band ledger)
    → quality keep/drop (Gopher/C4-style column-expression rules)
    → PII redaction (the raw text column never survives)

This is the batch twin of ``streaming/curation.py`` — same operators,
same ledgers, so a corpus can be bootstrapped in batch and then kept
current by the stream. The reference has no corpus analog; the shape
generalizes its content-addressed chunk dedup + registry rerun filter
(download_data_file.py:98-107, stream_handler_registries.py:84-97) from
file chunks to documents.

Scale notes: every stage is one of the already-audited operators (hash
keys shuffle, never text; LSH never goes all-pairs; CC iterates over
pair endpoints only). The optional stage-count report adds one count
job per stage — skip it (``report=False``) in production pipelines.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import (
    dedup_clusters,
    exact_dedup,
    incremental_exact_dedup,
    incremental_minhash_dedup,
    minhash_lsh_dedup,
    _normalized,
)
from .textstats import pii_redact, quality_filter

_LSH_KEYS = ("n", "num_hashes", "rows_per_band", "threshold", "max_shingle_df")


def contaminated_ids(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "doc_id",
    eval_text_col: str = "text",
) -> DataFrame:
    """The verdict half of ``decontaminate``: ids of training documents
    sharing >= ``min_hits`` distinct word n-grams with the eval set —
    one column, ``id_col``. Factored out so the tag-mode pipeline
    (``tag_corpus``) can emit the decision as a column while the filter
    form anti-joins it (one implementation, two consumers)."""
    from .dedup import word_shingles

    ev = (
        word_shingles(
            eval_docs, n=n, id_col=eval_id_col, text_col=eval_text_col, hashed=True
        )
        .select("shingle")
        .distinct()
    )
    sh = word_shingles(docs, n=n, id_col=id_col, text_col=text_col, hashed=True)
    return (
        sh.join(F.broadcast(ev), "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("_hits"))
        .filter(F.col("_hits") >= min_hits)
        .select(id_col)
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "doc_id",
    eval_text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination as a FILTER: drop every training
    document sharing at least ``min_hits`` distinct word ``n``-grams
    with the evaluation set (the GPT-3/PaLM-style 8-gram overlap rule).
    The catalog's ``contamination_8gram`` is the report form of the same
    join; this is the form a training pipeline actually applies.

    Scale shape: both sides shingle to 16-hex md5 keys
    (``word_shingles(hashed=True)``), so the join moves 16-byte hashes,
    never text. The eval side is benchmark-sized — distinct-reduced and
    broadcast, so the corpus-side shingle stream never shuffles; the hit
    count is one map-side-combinable groupBy on the (rare) matches.
    With ``min_hits=1`` any single overlapping n-gram disqualifies.

    Returns the surviving rows of ``docs``, unchanged.
    """
    contaminated = contaminated_ids(
        docs,
        eval_docs,
        n=n,
        min_hits=min_hits,
        id_col=id_col,
        text_col=text_col,
        eval_id_col=eval_id_col,
        eval_text_col=eval_text_col,
    )
    return docs.join(contaminated, id_col, "left_anti")


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    neardup: bool = False,
    neardup_conf: dict[str, Any] | None = None,
    exact_ledger=None,
    lsh_ledger=None,
    run_id: str | None = None,
    quality_thresholds: dict[str, Any] | None = None,
    quality_weights: DataFrame | None = None,
    quality_margin_threshold: float = 0.0,
    eval_docs: DataFrame | None = None,
    decontaminate_conf: dict[str, Any] | None = None,
    novelty_bloom=None,
    novelty_max_seen_frac: float = 0.5,
    novelty_gram_n: int = 8,
    excise_spans: bool = False,
    excise_conf: dict[str, Any] | None = None,
    report: bool = True,
) -> "tuple[DataFrame, dict[str, int]]":
    """Run the batch curation pass over ``docs``.

    ``exact_ledger`` / ``lsh_ledger`` are ``make_registry`` instances
    (keys ``["content_hash"]`` and ``["band", "band_sig", <id_col>]``)
    that extend dedup across runs; ``run_id`` keys their ledger rows so
    a same-run_id re-run returns identical admissions (see
    ``incremental_exact_dedup``). Without ledgers, dedup is
    within-corpus only.

    ``excise_spans=True`` adds exact-substring excision AFTER the
    document-level dedups (which remove whole duplicate docs cheaply,
    so the span pass only pays for partial overlap) and BEFORE the
    quality gate (which must judge the post-rewrite text — a doc that
    is mostly boilerplate should fail on what remains). Tuned by
    ``excise_conf`` (k / min_occurrences / fingerprint; see
    ``spandedup.excise_duplicated_spans``).

    ``eval_docs`` turns on benchmark decontamination (``decontaminate``,
    tuned by ``decontaminate_conf``: n / min_hits / eval_id_col /
    eval_text_col) after dedup, before the quality gate.

    ``novelty_bloom`` (a ``bloom.BloomFilter``, typically built once
    over a reference corpus with ``bloom_build`` and reused across runs
    — the frozen-artifact pattern quality_weights follows) turns on the
    BLOOM-NOVELTY decontamination stage: documents whose fraction of
    already-seen ``novelty_gram_n``-grams exceeds
    ``novelty_max_seen_frac`` are dropped. This is the broadcast-mask
    scale path of ``eval_docs`` decontamination — zero probe-side
    shuffle where the exact gram join shuffles both corpora (see
    ``llm/bloom.py``); the seen-fraction test is exact integer
    arithmetic, and documents too short to produce a gram pass through
    unjudged.

    ``quality_weights`` turns on MODEL-BASED quality filtering
    (``quality.quality_classifier_filter``): a frozen classifier weight
    table (``train_quality_classifier`` or the exact
    ``count_difference_weights`` anchor) applied at
    ``quality_margin_threshold`` (default 0 — the decision boundary),
    after decontamination and before the heuristic quality gate (both
    judge text, so they run on the post-rewrite corpus; the trained
    filter first, since it is the stronger signal and one broadcast
    join next to the heuristics' column expressions).

    Returns ``(curated, stage_counts)``; ``stage_counts`` is {} when
    ``report=False`` (no extra jobs). The curated frame carries
    ``content_hash``, quality verdict columns, PII counts and
    ``redacted`` — never the raw text column.
    """
    counts: dict[str, int] = {}

    def _note(stage: str, df: DataFrame) -> None:
        if report:
            counts[stage] = df.count()

    _note("input", docs)

    if exact_ledger is not None:
        docs = incremental_exact_dedup(
            docs, exact_ledger, id_col=id_col, text_col=text_col, run_id=run_id
        )
    else:
        reps = exact_dedup(docs, id_col=id_col, text_col=text_col).select(
            "content_hash", F.col("representative_id").alias(id_col)
        )
        hashed = docs.withColumn("content_hash", F.md5(_normalized(text_col)))
        docs = hashed.join(reps, ["content_hash", id_col])
    _note("after_exact_dedup", docs)

    conf = dict(neardup_conf or {})
    if neardup:
        lsh_kwargs = {k: conf[k] for k in _LSH_KEYS if k in conf}
        pairs = minhash_lsh_dedup(
            docs, id_col=id_col, text_col=text_col, **lsh_kwargs
        )
        reps = dedup_clusters(
            docs.select(id_col), pairs, id_col=id_col
        ).filter("is_representative")
        docs = docs.join(reps.select(id_col), id_col, "left_semi")
        _note("after_neardup", docs)

    if lsh_ledger is not None:
        docs = incremental_minhash_dedup(
            docs, lsh_ledger, id_col=id_col, text_col=text_col,
            run_id=run_id, **conf,
        )
        _note("after_lsh_ledger", docs)

    if excise_spans:
        from .spandedup import excise_duplicated_spans

        rewritten = excise_duplicated_spans(
            docs, id_col=id_col, text_col=text_col, **(excise_conf or {})
        ).select(id_col, text_col)
        # the rewrite canonicalizes whitespace/case and replaces the text
        # column; every other input column passes through
        docs = docs.drop(text_col).join(rewritten, id_col)
        _note("after_span_excision", docs)

    if eval_docs is not None:
        docs = decontaminate(
            docs,
            eval_docs,
            id_col=id_col,
            text_col=text_col,
            **(decontaminate_conf or {}),
        )
        _note("after_decontamination", docs)

    if novelty_bloom is not None:
        from .bloom import gram_novelty

        nv = gram_novelty(
            docs, novelty_bloom, n=novelty_gram_n, id_col=id_col,
            text_col=text_col,
        )
        # seen_frac > max  <=>  (n_grams - n_novel) * 10^4 > max_e4 * n_grams
        # (exact integers — no float division on the drop decision)
        max_e4 = round(novelty_max_seen_frac * 10_000)
        fail = nv.filter(
            (F.col("n_grams") - F.col("n_novel")) * 10_000
            > F.lit(max_e4) * F.col("n_grams")
        ).select(id_col)
        # anti-join keeps gram-less (too-short) docs, which gram_novelty
        # never emits a verdict for
        docs = docs.join(fail, id_col, "left_anti")
        _note("after_novelty_bloom", docs)

    if quality_weights is not None:
        from .quality import quality_classifier_filter

        docs = quality_classifier_filter(
            docs,
            quality_weights,
            threshold=quality_margin_threshold,
            id_col=id_col,
            text_col=text_col,
        )
        _note("after_quality_classifier", docs)

    # columns the quality/redaction stages compute themselves; same-named
    # input columns (e.g. a source-side n_chars) would be ambiguous, so
    # they are dropped in favor of the recomputed values
    computed = {
        "n_chars", "n_tokens", "mean_token_len", "distinct_ratio",
        "n_punct", "ok_len", "ok_token_len", "ok_diversity", "ok_punct",
        "keep", "redacted", "n_email", "n_phone", "n_ipv4",
    }
    passthrough = [c for c in docs.columns if c != id_col and c not in computed]
    kept = quality_filter(
        docs.drop(*(c for c in docs.columns if c in computed)),
        id_col=id_col,
        text_col=text_col,
        passthrough_cols=passthrough,
        **(quality_thresholds or {}),
    ).filter("keep")
    _note("after_quality", kept)

    curated = pii_redact(kept, text_col=text_col).drop(text_col, "keep")
    return curated, counts


#: sequenced stage-verdict columns tag_corpus can emit, in drop-mode
#: application order (attrition_report attributes first-fail in this
#: order; stages a tag run disabled are simply absent).
CURATION_TAG_STAGES = (
    "keep_exact",
    "keep_neardup",
    "keep_decontam",
    "keep_novelty",
    "keep_quality",
)

#: the quality stage's per-rule verdicts (non-exclusive audit columns).
CURATION_QUALITY_RULES = ("ok_len", "ok_token_len", "ok_diversity", "ok_punct")


def tag_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    neardup: bool = False,
    neardup_conf: dict[str, Any] | None = None,
    eval_docs: DataFrame | None = None,
    decontaminate_conf: dict[str, Any] | None = None,
    novelty_bloom=None,
    novelty_max_seen_frac: float = 0.5,
    novelty_gram_n: int = 8,
    quality_thresholds: dict[str, Any] | None = None,
) -> DataFrame:
    """Dolma-style TAG-don't-drop curation: the same decisions
    ``curate_corpus`` makes, emitted as per-stage boolean columns on
    EVERY input row instead of applied as filters — so one pass over a
    100 TB corpus serves many downstream filter policies, and each
    rule's attrition is auditable (``attrition_report``).

    Emitted columns (on top of every input column):

    - ``content_hash``, ``keep_exact`` — the doc is its content-hash
      cluster's representative (min id), the exact-dedup decision.
    - ``keep_neardup`` (with ``neardup=True``) — survives MinHash-LSH
      near-dup clustering, judged over the EXACT-DEDUP SURVIVORS (the
      one input-set-dependent stage: drop mode runs LSH after exact
      dedup, so equivalence requires the same candidate universe).
      NULL for docs that already failed ``keep_exact`` (never judged).
    - ``keep_decontam`` (with ``eval_docs``) — shares < min_hits eval
      n-grams (per-doc vs the frozen eval set, judged on every row).
    - ``keep_novelty`` (with ``novelty_bloom``) — seen-gram fraction
      within budget (per-doc vs the frozen mask; docs too short to
      produce a gram pass unjudged, as in drop mode).
    - ``n_tokens``, ``ok_len``/``ok_token_len``/``ok_diversity``/
      ``ok_punct``, ``keep_quality`` — the heuristic gate with its
      per-rule verdicts (per-doc, judged on every row).

    Filter equivalence (pinned by test): ``keep_exact AND
    coalesce(keep_neardup, true) AND keep_decontam AND keep_novelty AND
    keep_quality`` selects exactly ``curate_corpus``'s survivor set for
    the same configuration. NOT covered by tag mode (drop-mode only,
    documented): ledger-incremental dedup and span excision — both
    REWRITE corpus membership/text across runs rather than judge a row,
    and the quality/PII stages of drop mode run on the excised text.

    Scale shape: pure composition of the already-audited operators —
    each stage adds one hash-keyed aggregate or broadcast join; no new
    shuffle classes. Input columns named like the computed outputs are
    dropped first (the ``curate_corpus`` rule).
    """
    computed = {
        "content_hash", "n_tokens", "keep",
        *CURATION_TAG_STAGES, *CURATION_QUALITY_RULES,
    }
    docs = docs.drop(*(c for c in docs.columns if c in computed))

    hashed = docs.withColumn("content_hash", F.md5(_normalized(text_col)))
    reps = exact_dedup(docs, id_col=id_col, text_col=text_col).select(
        "content_hash", "representative_id"
    )
    tagged = (
        hashed.join(reps, "content_hash")
        .withColumn("keep_exact", F.col(id_col) == F.col("representative_id"))
        .drop("representative_id")
    )

    if neardup:
        conf = dict(neardup_conf or {})
        lsh_kwargs = {k: conf[k] for k in _LSH_KEYS if k in conf}
        survivors = tagged.filter("keep_exact").select(id_col, text_col)
        pairs = minhash_lsh_dedup(
            survivors, id_col=id_col, text_col=text_col, **lsh_kwargs
        )
        nd = dedup_clusters(
            survivors.select(id_col), pairs, id_col=id_col
        ).select(id_col, F.col("is_representative").alias("keep_neardup"))
        tagged = tagged.join(nd, id_col, "left")

    if eval_docs is not None:
        bad = contaminated_ids(
            docs,
            eval_docs,
            id_col=id_col,
            text_col=text_col,
            **(decontaminate_conf or {}),
        ).withColumn("_contam", F.lit(True))
        tagged = (
            tagged.join(bad, id_col, "left")
            .withColumn("keep_decontam", F.col("_contam").isNull())
            .drop("_contam")
        )

    if novelty_bloom is not None:
        from .bloom import gram_novelty

        nv = gram_novelty(
            docs, novelty_bloom, n=novelty_gram_n, id_col=id_col,
            text_col=text_col,
        )
        max_e4 = round(novelty_max_seen_frac * 10_000)
        fail = nv.filter(
            (F.col("n_grams") - F.col("n_novel")) * 10_000
            > F.lit(max_e4) * F.col("n_grams")
        ).select(id_col).withColumn("_stale", F.lit(True))
        tagged = (
            tagged.join(fail, id_col, "left")
            .withColumn("keep_novelty", F.col("_stale").isNull())
            .drop("_stale")
        )

    qf = quality_filter(
        docs.select(id_col, text_col),
        id_col=id_col,
        text_col=text_col,
        **(quality_thresholds or {}),
    ).select(
        id_col,
        "n_tokens",
        *CURATION_QUALITY_RULES,
        F.col("keep").alias("keep_quality"),
    )
    return tagged.join(qf, id_col)


def attrition_report(
    tagged: DataFrame,
    group_col: str = "source",
    stage_cols: "tuple[str, ...] | list[str] | None" = None,
    rule_cols: "tuple[str, ...] | list[str]" = CURATION_QUALITY_RULES,
) -> DataFrame:
    """Per-group attrition audit over a ``tag_corpus`` frame: how many
    rows each curation rule removes, by ``group_col`` (source/domain/
    language — the table a curation recipe review reads).

    Stage drops are FIRST-FAIL attributed in drop-mode order (a doc
    failing exact dedup is not double-counted under quality), so
    ``n_input == drop_* summed + n_kept`` per group; NULL stage
    verdicts (stage disabled, or doc unjudged because already dead)
    count as pass-through, matching drop-mode sequencing. The per-rule
    ``fail_*`` columns are NON-exclusive counts over all judged rows —
    the per-rule audit signal Dolma-style tagging exists to provide.
    One grouped aggregate; every count is a sum of boolean casts.
    """
    stages = [
        c for c in (stage_cols or CURATION_TAG_STAGES) if c in tagged.columns
    ]
    aggs = [F.count("*").cast("bigint").alias("n_input")]
    alive = F.lit(True)
    for c in stages:
        ok = F.coalesce(F.col(c), F.lit(True))
        suffix = c[5:] if c.startswith("keep_") else c
        aggs.append(
            F.sum((alive & ~ok).cast("bigint")).alias(f"drop_{suffix}")
        )
        alive = alive & ok
    for rc in rule_cols:
        if rc in tagged.columns:
            aggs.append(
                F.sum((~F.coalesce(F.col(rc), F.lit(True))).cast("bigint"))
                .alias(f"fail_{rc[3:] if rc.startswith('ok_') else rc}")
            )
    aggs.append(F.sum(alive.cast("bigint")).alias("n_kept"))
    return tagged.groupBy(group_col).agg(*aggs)

"""Round-6 extras: gap-fill/LOCF and unigram-surprisal scoring.

Semantics are oracle-checked by the driver (and tests/oracle_check.py);
here we pin the SMALL-case behavior the oracle can't isolate (LOCF
carry, gap flags) and the plan shapes that make both queries survive a
100x scale-up (no Python stages, broadcast scoring join, pre-window
bucket collapse)."""

import datetime

from pyspark.sql import functions as F

from openmsistream_spark.queries import QUERIES
from tests.test_plans import plan_of

SF = "/root/testdata/sf0.001"


def test_gapfill_locf_carries_and_flags(spark):
    from openmsistream_spark.queries_extras import gapfill_locf_user_hours

    df = gapfill_locf_user_hours(spark, SF)
    rows = df.filter(F.col("user_id") == df.select(F.min("user_id")).first()[0])
    got = rows.orderBy("hour").collect()
    assert got, "grid empty"
    # grid is dense: consecutive hours, no holes
    hours = [r.hour for r in got]
    for a, b in zip(hours, hours[1:]):
        assert b - a == datetime.timedelta(hours=1), (a, b)
    # endpoints are observations by construction (span = min..max obs hour)
    assert not got[0].is_gap and not got[-1].is_gap
    # LOCF: a gap row repeats the last observed value; n_events is 0 there
    last_obs = None
    for r in got:
        if r.is_gap:
            assert r.n_events == 0
            assert r.value_locf == last_obs
        else:
            assert r.n_events >= 1
            last_obs = r.value_locf
    # there is at least one gap at this sf (sparse events per user-hour)
    assert any(r.is_gap for r in got)


def test_gapfill_plan_no_python_no_cartesian(spark):
    plan = plan_of(spark, "gapfill_locf_user_hours")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # raw events collapse to (user, hour) buckets BEFORE the LOCF window:
    # the window input comes from the grid-obs join, and the obs side is
    # an aggregate, so a per-event window never appears
    assert "max_by" in plan or "HashAggregate" in plan


def test_unigram_scoring_join_broadcasts(spark):
    plan = plan_of(spark, "unigram_surprisal_quality")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the per-token scoring join must broadcast the (Zipf-bounded) vocab
    # side, never shuffle the exploded token stream for it
    assert "BroadcastHashJoin" in plan, plan


def test_unigram_surprisal_orders_quality(spark):
    """A doc of common tokens must score lower surprisal than one made of
    corpus-rare tokens; repeated-token docs have deterministic scores."""
    from openmsistream_spark.queries_extras import unigram_surprisal_quality

    df = unigram_surprisal_quality(spark, SF)
    assert df.columns == ["doc_id", "source", "n_tokens", "mean_surprisal"]
    stats = df.agg(
        F.min("mean_surprisal"), F.max("mean_surprisal"), F.count("*")
    ).first()
    assert stats[2] > 0
    # surprisal is positive and the corpus shows real spread
    assert stats[0] > 0
    assert stats[1] > stats[0]


def test_pack_sequences_spans_are_consistent(spark):
    """Within each bucket, spans tile the token axis without holes and
    every sequence index a doc claims really overlaps its interval."""
    from openmsistream_spark.queries_extras import pack_training_sequences

    df = pack_training_sequences(spark, SF)
    rows = df.collect()
    assert rows
    seq_len = 256
    by_bucket = {}
    for r in rows:
        assert r.tok_end > r.tok_start >= 0
        # claimed seq overlaps [tok_start, tok_end)
        assert r.seq * seq_len < r.tok_end and (r.seq + 1) * seq_len > r.tok_start
        by_bucket.setdefault(r.bucket, []).append(r)
    for bucket, rs in by_bucket.items():
        # doc intervals tile contiguously in doc_id order (cumsum contract)
        ivals = sorted({(r.tok_start, r.tok_end, r.doc_id) for r in rs})
        pos = 0
        for s, e, _ in ivals:
            assert s == pos, (bucket, s, pos)
            pos = e
        # every sequence 0..max is claimed by at least one doc
        claimed = {r.seq for r in rs}
        assert claimed == set(range(max(claimed) + 1)), bucket


def test_token_window_chunks_cover_with_overlap(spark):
    """Chunks cover every token; consecutive chunks overlap by
    window-stride tokens; short docs yield exactly one chunk."""
    from openmsistream_spark.queries_extras import token_window_chunks

    window, stride = 32, 24
    df = token_window_chunks(spark, SF)
    chunks = {}
    for r in df.collect():
        chunks.setdefault(r.doc_id, {})[r.chunk_idx] = r.chunk_text.split(" ")
    assert chunks
    docs = dict(
        (r.doc_id, [t for t in r.text.lower().strip().split() if t])
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    )
    saw_short = saw_multi = False
    for doc_id, by_idx in chunks.items():
        toks = docs[doc_id]
        assert set(by_idx) == set(range(len(by_idx)))
        if len(by_idx) == 1:
            saw_short = saw_short or len(toks) <= window
            assert by_idx[0] == toks[:window]
            continue
        saw_multi = True
        covered = 0
        for i in range(len(by_idx)):
            expect = toks[i * stride : i * stride + window]
            assert by_idx[i] == expect, (doc_id, i)
            covered = i * stride + len(by_idx[i])
        assert covered >= len(toks)  # full coverage
    assert saw_multi  # fixture exercises the multi-chunk path


def test_pack_and_chunk_plans_stay_jvm_side(spark):
    for name in ("pack_training_sequences", "token_window_chunks"):
        plan = plan_of(spark, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name
    # chunker is projection+explode only: no shuffle at all
    plan = plan_of(spark, "token_window_chunks")
    assert "Exchange" not in plan.replace("BroadcastExchange", ""), plan


def test_extras_registered_in_catalog():
    for name in (
        "gapfill_locf_user_hours",
        "unigram_surprisal_quality",
        "pack_training_sequences",
        "token_window_chunks",
    ):
        assert name in QUERIES and QUERIES[name].oracle, name


def test_pack_sequences_matches_reference_packer(spark):
    """Randomized trials: the distributed packer's span rows must equal a
    driver-side reference implementation (hash bucket -> doc_id-ordered
    cumsum -> inclusive seq range) on corpora with adversarial shapes —
    single-token docs, exact seq_len multiples, giant docs spanning many
    sequences, empty docs (excluded)."""
    import hashlib
    import random

    from openmsistream_spark.llm.packing import pack_sequences

    seq_len, n_buckets = 64, 4

    def ref_pack(docs):
        by_bucket = {}
        for doc_id, n in docs:
            if n <= 0:
                continue
            b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % n_buckets
            by_bucket.setdefault(b, []).append((doc_id, n))
        rows = set()
        for b, items in by_bucket.items():
            cum = 0
            for doc_id, n in sorted(items):
                start, cum = cum, cum + n
                for seq in range(start // seq_len, (cum - 1) // seq_len + 1):
                    rows.add((b, doc_id, seq, start, cum))
        return rows

    rng = random.Random(1234)
    for trial in range(4):
        docs = []
        for i in range(rng.randint(1, 30)):
            shape = rng.random()
            if shape < 0.2:
                n = 0  # empty: must be excluded
            elif shape < 0.4:
                n = 1
            elif shape < 0.6:
                n = seq_len * rng.randint(1, 3)  # exact boundary
            else:
                n = rng.randint(2, 5 * seq_len)  # spans many sequences
            docs.append((rng.randint(0, 10_000), n))
        docs = list({d: n for d, n in docs}.items())  # distinct ids
        sdf = spark.createDataFrame(
            [(d, "w " * n) for d, n in docs], "doc_id long, text string"
        )
        got = {
            (r.bucket, r.doc_id, r.seq, r.tok_start, r.tok_end)
            for r in pack_sequences(
                sdf, seq_len=seq_len, n_buckets=n_buckets
            ).collect()
        }
        assert got == ref_pack(docs), f"trial {trial}"


# ---------------------------------------------------------------------------
# Round-6 additions: operational analytics + ensemble near-dup
# ---------------------------------------------------------------------------


def test_zscore_flags_known_outlier(spark):
    """A hand-built series with one wild point flags exactly that point."""
    import openmsistream_spark.queries_extras as qe

    # n must be large enough that one extreme point CAN exceed |z| = 3:
    # a single outlier among n points caps at z = (n-1)/sqrt(n) (it
    # inflates the stddev it is measured against), so n = 7 tops out at
    # 2.27 no matter how wild the value — use a 20-point baseline
    base = [10.0, 11.0, 9.0, 10.5, 9.5] * 4
    rows = [(i, 7, v) for i, v in enumerate(base + [500.0])]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, value double")

    import unittest.mock as mock

    with mock.patch.object(qe, "load", lambda s, d, n: ev):
        out = qe.zscore_anomaly_events(spark, SF).collect()
    assert [r.event_id for r in out] == [20]
    assert out[0].zscore > 2.0


def test_zscore_plan_broadcasts_stats_side(spark):
    plan = plan_of(spark, "zscore_anomaly_events")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the per-user stats frame is one row per user — it must broadcast,
    # never shuffle the event stream for the join
    assert "BroadcastHashJoin" in plan, plan
    assert "Window" not in plan  # two-phase agg+join, not a sorted window


def test_interarrival_reuses_window_partitioning(spark):
    plan = plan_of(spark, "interarrival_stats_user")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # ONE exchange: the lag window shuffles by user_id and the follow-on
    # groupBy(user_id) reuses that partitioning
    import re

    # formatted mode lists each physical node once as "(N) Exchange";
    # its hashpartitioning args land on a separate "Arguments:" line
    n_exchanges = len(re.findall(r"\(\d+\) Exchange\b", plan))
    assert n_exchanges == 1, plan


def test_interarrival_semantics_small(spark):
    import openmsistream_spark.queries_extras as qe
    import unittest.mock as mock

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 7),
            (2, "2024-01-01 00:00:10", 7),
            (3, "2024-01-01 00:01:10", 7),
        ],
        "event_id long, ts string, user_id long",
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) ts", "user_id")
    with mock.patch.object(qe, "load", lambda s, d, n: ev):
        row = qe.interarrival_stats_user(spark, SF).collect()[0]
    assert row.n_events == 3
    assert row.min_gap_s == 10.0 and row.max_gap_s == 60.0
    assert row.avg_gap_s == 35.0


def test_key_skew_profile_two_level_agg(spark):
    plan = plan_of(spark, "key_skew_profile")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" not in plan and "CartesianProduct" not in plan
    out = {r.event_type: r for r in QUERIES["key_skew_profile"].fn(spark, SF).collect()}
    for r in out.values():
        assert 0 < r.top_user_share <= 1.0
        assert r.skew_factor >= 1.0  # max/mean per-user load is >= 1 by def


def test_ensemble_is_intersection_of_arms(spark):
    ens = QUERIES["ensemble_neardup_pairs"].fn(spark, SF)
    lsh = QUERIES["minhash_lsh_pairs"].fn(spark, SF)
    sim = QUERIES["simhash_band_neardup"].fn(spark, SF)
    e = {(r.id_a, r.id_b) for r in ens.collect()}
    l = {(r.id_a, r.id_b) for r in lsh.collect()}
    s = {(r.id_a, r.id_b) for r in sim.collect()}
    assert e == (l & s)


def test_collocation_vocab_broadcasts_and_caps_pairs(spark):
    plan = plan_of(spark, "token_collocation_lift")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the top-40 vocab must broadcast into the token stream, and the
    # only nested-loop/cross join allowed is the 1-row n_docs scalar
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    out = QUERIES["token_collocation_lift"].fn(spark, SF)
    rows = out.collect()
    assert rows and all(r.n_ab >= 5 and r.lift > 0 for r in rows)
    assert all(r.token_a < r.token_b for r in rows)  # unordered pair once


def test_ccnet_buckets_lazy_and_bounded(spark):
    """Round-12 contract for ccnet_perplexity_buckets: (a) building the
    catalog entry runs ZERO Spark jobs (the r11 advisory — cutoffs are
    lazy scalar-subquery crossJoins, not driver counts), and (b) the
    cutoff sample is bounded: with n <= CCNET_SAMPLE_CAP the denominator
    is 1 (all docs sampled) and buckets split the corpus ~in thirds."""
    from openmsistream_spark.queries_extras6 import (
        CCNET_SAMPLE_CAP,
        ccnet_perplexity_buckets,
        trigram_lm_surprisal,
    )

    sc = spark.sparkContext
    # spark.read.parquet itself runs one schema-inference job per call,
    # so "lazy" means: building ccnet runs no MORE jobs than building
    # its trigram input alone (the eager r11 version added a sample
    # count() + persist materialization on top)
    sc.setJobGroup("trigram-probe", "")
    trigram_lm_surprisal(spark, SF)
    base_jobs = len(sc.statusTracker().getJobIdsForGroup("trigram-probe"))
    sc.setJobGroup("ccnet-lazy-probe", "construction must be lazy")
    try:
        df = ccnet_perplexity_buckets(spark, SF)
        jobs = sc.statusTracker().getJobIdsForGroup("ccnet-lazy-probe")
        assert len(jobs) <= base_jobs, (
            f"construction ran {len(jobs)} jobs vs {base_jobs} for the "
            f"bare trigram build — something upstream turned eager"
        )
    finally:
        sc.setJobGroup("", "")
    counts = {r.ppl_bucket: r.n for r in
              df.groupBy("ppl_bucket").agg(F.count("*").alias("n")).collect()}
    n = sum(counts.values())
    assert set(counts) == {1, 2, 3} and n > 0
    # sf0.001 has fewer docs than the cap -> denominator 1, the sample
    # IS the corpus, so the (score, id)-ordered thirds are exact
    assert n <= CCNET_SAMPLE_CAP
    assert counts[1] == -(-n // 3)  # ceil(n/3) docs at/below cutoff 1
    assert counts[1] + counts[2] == -(-2 * n // 3)

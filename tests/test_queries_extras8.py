"""Round-12 extras batch 2: temperature resampling, distinct-n
diversity, tokenizer fertility, greedy k-center coreset.

Semantics are oracle-checked by the driver (and tests/oracle_check.py);
here we pin the SMALL-case behavior the hash oracle can't isolate
(upweighting direction, expectation preservation, greedy farthest-point
invariants, a numpy reference for k-center) and the plan shapes that
make each entry survive a 100x scale-up (broadcast-only joins, map-side
partial aggregation, no Python stages)."""

import math

import numpy as np
from pyspark.sql import functions as F

from openmsistream_spark.queries import QUERIES
from tests.test_plans import plan_of

SF = "/root/testdata/sf0.001"


# ------------------------------------------------ temperature sampling


def test_temperature_upweights_low_resource_langs(spark):
    from openmsistream_spark.queries_extras8 import temperature_resample_langs

    out = temperature_resample_langs(spark, SF)
    rates = {
        r.lang: r.rate for r in out.select("lang", "rate").distinct().collect()
    }
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    counts = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    # alpha < 1 flattens the distribution: the majority language is
    # downsampled (rate < 1), the rarest upsampled (rate > 1), and the
    # rate ordering is the REVERSE of the count ordering
    major = max(counts, key=counts.get)
    minor = min(counts, key=counts.get)
    assert rates[major] < 1.0 < rates[minor]
    by_count = sorted(counts, key=counts.get)
    by_rate = sorted(rates, key=rates.get, reverse=True)
    assert by_count == by_rate


def test_temperature_preserves_expected_corpus_size(spark):
    from openmsistream_spark.queries_extras8 import temperature_resample_langs

    out = temperature_resample_langs(spark, SF)
    n_in = spark.read.parquet(f"{SF}/documents.parquet").count()
    n_out = out.count()
    # sum_d n_d * rate_d = n exactly (up to millionth quantization);
    # the hash fractional copies add sampling noise around that
    assert abs(n_out - n_in) / n_in < 0.10, (n_out, n_in)
    # n_copies is floor(rate) or floor(rate)+1, never anything else
    bad = out.filter(
        (F.col("n_copies") < F.floor("rate"))
        | (F.col("n_copies") > F.floor("rate") + 1)
    ).count()
    assert bad == 0


def test_temperature_plan_broadcasts_rates(spark):
    plan = plan_of(spark, "temperature_resample_langs")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the docs<-rates join must broadcast the 5-row rate table, never
    # sort-merge the corpus
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# ------------------------------------------------ distinct-n diversity


def test_ngram_diversity_ratios_are_sane(spark):
    from openmsistream_spark.queries_extras8 import ngram_diversity_by_source

    rows = ngram_diversity_by_source(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 < r.distinct1_ratio <= 1
        assert 0 < r.distinct2_ratio <= 1
        assert r.distinct_unigrams <= r.n_unigrams
        assert r.distinct_bigrams <= r.n_bigrams
        # n-gram diversity grows with n on natural-ish text: bigrams
        # repeat less than unigrams
        assert r.distinct2_ratio > r.distinct1_ratio
        # bigram totals are token totals minus one per document
        assert r.n_bigrams < r.n_unigrams


def test_ngram_diversity_partial_agg_before_exchange(spark):
    plan = plan_of(spark, "ngram_diversity_by_source")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # map-side partial aggregation runs before the shuffle
    assert plan.index("HashAggregate") < plan.index("Exchange")


# ------------------------------------------------ tokenizer fertility


def test_fertility_bounds(spark):
    from openmsistream_spark.queries_extras8 import (
        tokenizer_fertility_by_source,
    )

    rows = tokenizer_fertility_by_source(spark, SF).collect()
    assert rows
    for r in rows:
        # every whitespace word yields at least one BPE-ish token
        # (letter runs, digit runs, or punctuation marks all match)
        assert r.fertility >= 1.0
        assert r.bytes_per_token > 0
        assert r.n_bpe_tokens >= r.n_ws_words
        assert r.n_docs > 0


def test_fertility_single_pass_no_join(spark):
    plan = plan_of(spark, "tokenizer_fertility_by_source")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan  # one projection + one grouped aggregate
    assert plan.index("HashAggregate") < plan.index("Exchange")


# ------------------------------------------------ greedy k-center


def _numpy_kcenter(vecs: dict, k: int):
    """Reference greedy farthest-point-first on quantized embeddings."""
    ids = sorted(vecs)
    sel = [ids[0]]
    mind = {
        i: int(((vecs[i] - vecs[ids[0]]) ** 2).sum()) for i in ids
    }
    out = [(1, ids[0], 0)]
    for rank in range(2, k + 1):
        nxt = max(ids, key=lambda i: (mind[i], -i))
        out.append((rank, nxt, mind[nxt]))
        sel.append(nxt)
        for i in ids:
            d = int(((vecs[i] - vecs[nxt]) ** 2).sum())
            if d < mind[i]:
                mind[i] = d
    return out


def test_kcenter_matches_numpy_reference(spark):
    from openmsistream_spark.queries_extras8 import (
        _KC_Q,
        KCENTER_K,
        kcenter_coreset_seeded,
    )

    got = sorted(
        (r.sel_rank, r.vec_id, r.dist2)
        for r in kcenter_coreset_seeded(spark, SF).collect()
    )
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    vecs = {
        r.vec_id: np.floor(
            np.asarray(r.embedding, dtype=np.float64) * _KC_Q + 0.5
        ).astype(np.int64)
        for r in emb
    }
    want = _numpy_kcenter(vecs, KCENTER_K)
    assert got == want


def test_kcenter_selection_distances_nonincreasing(spark):
    from openmsistream_spark.queries_extras8 import kcenter_coreset_seeded

    rows = sorted(
        kcenter_coreset_seeded(spark, SF).collect(),
        key=lambda r: r.sel_rank,
    )
    assert len({r.vec_id for r in rows}) == len(rows)  # all distinct
    assert rows[0].dist2 == 0
    # greedy farthest-point: each later pick is at most as far from the
    # selected set as the previous pick was
    dists = [r.dist2 for r in rows[1:]]
    assert all(a >= b for a, b in zip(dists, dists[1:])), dists
    assert dists[0] > 0


def test_kcenter_plan_lazy_and_broadcast_only(spark):
    plan = plan_of(spark, "kcenter_coreset_seeded")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # every center join is a broadcast of a 1-row frame
    assert "SortMergeJoin" not in plan


def test_extras8_registered_in_catalog():
    for name in (
        "temperature_resample_langs",
        "ngram_diversity_by_source",
        "tokenizer_fertility_by_source",
        "kcenter_coreset_seeded",
    ):
        assert name in QUERIES
        assert QUERIES[name].oracle is not None
        assert QUERIES[name].doc and QUERIES[name].survey


def test_temperature_rate_math_matches_formula(spark):
    from openmsistream_spark.queries_extras8 import (
        TEMP_ALPHA,
        temperature_resample_langs,
    )

    out = temperature_resample_langs(spark, SF)
    rates = {
        r.lang: r.rate for r in out.select("lang", "rate").distinct().collect()
    }
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    counts = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    n = sum(counts.values())
    z = sum((c / n) ** TEMP_ALPHA for c in counts.values())
    for lang, c in counts.items():
        p = c / n
        want = (p**TEMP_ALPHA) / z / p
        assert math.isclose(rates[lang], want, abs_tol=1e-5), (lang, want)

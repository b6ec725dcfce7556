#!/usr/bin/env python
"""Measure recall@k of every ANN variant against exact brute-force
cosine at a given SF — the tuned numbers behind the catalog's three
compression points (SQ8 / IVF / PQ) and the LSH bucket path.

The r11 verdict's plan audits argued each variant's SCALE shape; this
records the other axis: how much recall each one trades for its
speedup, at several knob settings (IVF nprobe, LSH n_bits). "Measure,
don't guess" — a recall table is what an operator of the engine tunes
nprobe/bits by.

Usage:
  PYTHONPATH=/root/repo python tools/measure_ann_recall.py \
      [--sf /root/testdata/sf0.1] [--k 10] [--n-queries 100]

Query set: every ceil(n/n_queries)-th vec_id (deterministic). Walls are
min-of-1 on whatever box runs this — recall is the load-independent
number; walls are recorded for shape only. Results overwrite
ANN_RECALL.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import openmsistream_spark as oms  # noqa: E402
from openmsistream_spark.llm.pq import pq_adc_topk, pq_fit  # noqa: E402
from openmsistream_spark.llm.similarity import (  # noqa: E402
    cosine_topk,
    cosine_topk_lsh,
    cosine_topk_sq8,
    ivf_search,
    kmeans_fit,
    recall_at_k,
)


def _planted(spark, emb, n_clusters: int):
    """Deterministic clustered control corpus: same (vec_id, dim) as the
    input, each vector = a unit anchor (seeded by vec_id % n_clusters)
    plus sigma=0.05 noise (seeded by vec_id)."""
    import numpy as np

    rows = emb.select("vec_id").orderBy("vec_id").collect()
    dim = len(emb.select("embedding").first()[0])
    anchors = []
    for c in range(n_clusters):
        rng = np.random.default_rng(1_000_003 + c)
        a = rng.standard_normal(dim)
        anchors.append(a / np.linalg.norm(a))
    out = []
    for r in rows:
        c = r.vec_id % n_clusters
        rng = np.random.default_rng(2_000_003 + r.vec_id)
        v = anchors[c] + 0.05 * rng.standard_normal(dim)
        out.append((r.vec_id, [float(x) for x in v]))
    return spark.createDataFrame(out, "vec_id long, embedding array<float>")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--n-queries", type=int, default=100)
    ap.add_argument("--ivf-clusters", type=int, default=16)
    ap.add_argument(
        "--planted-clusters",
        type=int,
        default=0,
        metavar="C",
        help="replace the corpus with C planted gaussian-ish clusters "
        "(same n/dim; deterministic) — the clustered-data control run",
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.out is None:
        name = "ANN_RECALL_PLANTED.json" if args.planted_clusters else "ANN_RECALL.json"
        args.out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), name
        )

    spark = oms.get_spark(app_name="measure-ann-recall")
    emb = spark.read.parquet(os.path.join(args.sf, "embeddings.parquet"))
    if args.planted_clusters:
        # CONTROL corpus: same cardinality/dim, but with real cluster
        # structure — each vector is one of `planted` unit anchors plus
        # small seeded-rng noise (deterministic per vec_id). If the
        # space-partitioning variants recover high recall HERE, their
        # low recall on the stock corpus is the isotropic data, not the
        # implementation.
        emb = _planted(spark, emb, args.planted_clusters)
    n = emb.count()
    step = max(1, n // args.n_queries)
    qids = [r.vec_id for r in emb.select("vec_id").orderBy("vec_id").collect()][::step]
    qids = qids[: args.n_queries]
    print(f"corpus n={n}, {len(qids)} queries, k={args.k}", file=sys.stderr)

    t0 = time.monotonic()
    exact = cosine_topk(emb, qids, k=args.k).cache()
    exact.count()
    exact_wall = round(time.monotonic() - t0, 3)

    def measure(tag: str, params: dict, df) -> dict:
        t = time.monotonic()
        df = df.cache()
        df.count()
        wall = round(time.monotonic() - t, 3)
        rec = (
            recall_at_k(exact, df)
            .agg(
                F.round(F.avg("recall"), 4).alias("mean"),
                F.round(F.min("recall"), 4).alias("min"),
            )
            .first()
        )
        df.unpersist()
        row = {
            "variant": tag,
            **params,
            "k": args.k,
            "n_queries": len(qids),
            "mean_recall": float(rec["mean"]),
            "min_recall": float(rec["min"]),
            "wall_sec": wall,
        }
        print(json.dumps(row), file=sys.stderr)
        return row

    results = [
        {
            "variant": "bruteforce",
            "k": args.k,
            "n_queries": len(qids),
            "mean_recall": 1.0,
            "min_recall": 1.0,
            "wall_sec": exact_wall,
        }
    ]

    results.append(
        measure("sq8", {}, cosine_topk_sq8(emb, qids, k=args.k))
    )

    for bits in (2, 4, 6):
        results.append(
            measure(
                "lsh",
                {"n_bits": bits, "bucket_frac": round(1 / 2**bits, 4)},
                cosine_topk_lsh(emb, qids, k=args.k, n_bits=bits),
            )
        )

    t = time.monotonic()
    cents = kmeans_fit(emb, k=args.ivf_clusters, max_iters=5).cache()
    cents.count()
    train_wall = round(time.monotonic() - t, 3)
    for nprobe in (1, 2, 4, 8):
        results.append(
            measure(
                "ivf",
                {
                    "n_clusters": args.ivf_clusters,
                    "nprobe": nprobe,
                    "train_sec": train_wall,
                    "probe_frac": round(nprobe / args.ivf_clusters, 4),
                },
                ivf_search(emb, cents, qids, k=args.k, nprobe=nprobe),
            )
        )

    dim = len(emb.select("embedding").first()[0])
    for m in (8, 16):
        t = time.monotonic()
        books = pq_fit(emb, m=m, kc=16).cache()
        books.count()
        pq_train_wall = round(time.monotonic() - t, 3)
        results.append(
            measure(
                "pq_adc",
                {"m": m, "kc": 16, "train_sec": pq_train_wall,
                 # float32 dim*4 bytes -> m one-byte codes
                 "compression_x": round(dim * 4 / m, 1)},
                pq_adc_topk(emb, books, qids, k=args.k),
            )
        )
        books.unpersist()

    record = {
        "sf": args.sf,
        "corpus_n": n,
        "dim": dim,
        "planted_clusters": args.planted_clusters or None,
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(f"wrote {args.out}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()

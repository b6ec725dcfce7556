#!/usr/bin/env python
"""Planted near-dup recall of the image perceptual-hash family
(round-13, the ANN_RECALL harness style for the multimodal axis).

Control construction: ``n`` random 48x64 grayscale base images, each
with ``copies`` perturbed twins at increasing noise (``n_px`` pixels
rewritten uniformly at random). Ground truth is the planted (base,
twin) relation. For each algo (dhash / phash) and noise level this
measures:

- the hamming distribution between base and twin (median / p90 / max),
- recall of the banded near-dup sweep (8 bands, max_hamming=7) against
  the planted pairs — for pairs the fingerprints place within the
  hamming budget, banding completeness makes recall exactly the
  fraction the HASH keeps close, so this measures the hash, not the
  join,
- false-bridge count (pairs linking two different base images — the
  precision side; random bases sit ~32 bits apart).

Everything runs through the REAL distributed path (PGM bytes →
image_fingerprints mapInPandas → hamming_band_pairs). Results land in
PHASH_RECALL.json; SCALING.md cites the table.

Usage: python tools/measure_phash_recall.py [n_bases]  (default 200)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openmsistream_spark.llm.phash import (
    dhash_int,
    hamming_band_pairs,
    image_fingerprints,
    phash_int,
)
from openmsistream_spark.session import get_spark

H, W = 48, 64
NOISE_LEVELS = [1, 8, 32, 128]  # perturbed pixels out of 3072
MAX_HAMMING, BANDS = 7, 8


def _pgm(gray2d: np.ndarray) -> bytearray:
    return bytearray(
        f"P5 {W} {H} 255\n".encode() + gray2d.astype(np.uint8).tobytes()
    )


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    rng = np.random.RandomState(1337)
    bases = [rng.randint(0, 256, size=(H, W)).astype(np.int64) for _ in range(n)]

    spark = get_spark(app_name="phash-recall")
    out = {"n_bases": n, "image": f"{H}x{W}", "bands": BANDS,
           "max_hamming": MAX_HAMMING, "results": []}
    for n_px in NOISE_LEVELS:
        twins = []
        for g in bases:
            t = g.copy()
            idx = rng.choice(g.size, n_px, replace=False)
            t.reshape(-1)[idx] = rng.randint(0, 256, size=n_px)
            twins.append(t)
        for algo, fn in (("dhash", dhash_int), ("phash", phash_int)):
            # local hamming distribution (the hash's own robustness)
            hams = [ _hamming(fn(b), fn(t)) for b, t in zip(bases, twins) ]
            hams_np = np.array(hams)
            within = int((hams_np <= MAX_HAMMING).sum())
            # distributed sweep over the full 2n-image frame
            rows = []
            for i, (b, t) in enumerate(zip(bases, twins)):
                rows.append((2 * i, _pgm(b)))
                rows.append((2 * i + 1, _pgm(t)))
            media = spark.createDataFrame(rows, "media_id long, content binary")
            t0 = time.time()
            fps = image_fingerprints(media, algo=algo)
            pairs = {
                (r.id_a, r.id_b)
                for r in hamming_band_pairs(
                    fps, bands=BANDS, max_hamming=MAX_HAMMING
                ).collect()
            }
            wall = time.time() - t0
            planted = {(2 * i, 2 * i + 1) for i in range(n)}
            found = len(planted & pairs)
            bridges = sum(1 for a, b in pairs if a // 2 != b // 2)
            out["results"].append({
                "algo": algo,
                "noise_px": n_px,
                "hamming_median": float(np.median(hams_np)),
                "hamming_p90": float(np.percentile(hams_np, 90)),
                "hamming_max": int(hams_np.max()),
                "pairs_within_budget": within,
                "planted_recall": round(found / n, 4),
                "recall_of_within_budget": round(found / within, 4) if within else None,
                "false_bridges": bridges,
                "wall_sec": round(wall, 3),
            })
            print(json.dumps(out["results"][-1]))
    spark.stop()
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "PHASH_RECALL.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

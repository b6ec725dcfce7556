#!/usr/bin/env python
"""Planted near-dup recall of the audio envelope-hash family
(round-13; the PHASH_RECALL harness one modality over).

Control construction: ``n`` random 8-bit PCM clips (6500 samples = 100
per envelope frame), each with perturbed twins from TWO noise families:

- ``replace_k``: k samples rewritten uniformly at random (the dropout /
  glitch model; theory bound: each touched frame flips at most its 2
  adjacent comparison bits),
- ``jitter_d``: EVERY sample shifted by uniform(-d, +d) (the
  additive-noise / re-encode model; bits flip only where adjacent frame
  energies are near-tied, so the hash should degrade smoothly with d).

For each level this measures the base↔twin hamming distribution, recall
of the banded sweep (8 bands, max_hamming=7) against planted pairs
(banding completeness ⇒ recall-of-within-budget must be 1.0 — observed,
not argued), and false bridges between different bases. Everything runs
through the REAL distributed path (WAV bytes → audio_fingerprints
mapInPandas → hamming_band_pairs). Results land in AUDIOFP_RECALL.json;
SCALING.md cites the table.

The video keyframe family needs no separate curve: its per-frame hash
IS dHash (PHASH_RECALL covers it) and aligned-banding completeness is
pytest-pinned (tests/test_videofp.py).

Usage: python tools/measure_audiofp_recall.py [n_bases]  (default 200)
"""

from __future__ import annotations

import json
import os
import struct
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openmsistream_spark.llm.audiofp import wav_envelope_int
from openmsistream_spark.llm.phash import hamming_band_pairs
from openmsistream_spark.llm.audiofp import audio_fingerprints
from openmsistream_spark.session import get_spark

N_SAMPLES = 6500  # 100 per envelope frame
REPLACE_LEVELS = [1, 8, 32, 128]
JITTER_LEVELS = [1, 4, 16]
MAX_HAMMING, BANDS = 7, 8


def _wav8(u8: np.ndarray) -> bytearray:
    data = u8.astype(np.uint8).tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    return bytearray(
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    rng = np.random.RandomState(1337)
    bases = [rng.randint(0, 256, size=N_SAMPLES).astype(np.int64) for _ in range(n)]

    levels = [("replace", k) for k in REPLACE_LEVELS] + [
        ("jitter", d) for d in JITTER_LEVELS
    ]

    spark = get_spark(app_name="audiofp-recall")
    out = {
        "n_bases": n,
        "n_samples": N_SAMPLES,
        "bands": BANDS,
        "max_hamming": MAX_HAMMING,
        "results": [],
    }
    for family, level in levels:
        twins = []
        for g in bases:
            t = g.copy()
            if family == "replace":
                idx = rng.choice(g.size, level, replace=False)
                t[idx] = rng.randint(0, 256, size=level)
            else:
                t = np.clip(t + rng.randint(-level, level + 1, size=g.size), 0, 255)
            twins.append(t)
        hams = np.array(
            [
                _hamming(
                    wav_envelope_int(bytes(_wav8(b))),
                    wav_envelope_int(bytes(_wav8(t))),
                )
                for b, t in zip(bases, twins)
            ]
        )
        within = int((hams <= MAX_HAMMING).sum())
        rows = []
        for i, (b, t) in enumerate(zip(bases, twins)):
            rows.append((2 * i, _wav8(b)))
            rows.append((2 * i + 1, _wav8(t)))
        media = spark.createDataFrame(rows, "media_id long, content binary")
        t0 = time.time()
        fps = audio_fingerprints(media)
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
        out["results"].append(
            {
                "noise": f"{family}_{level}",
                "hamming_median": float(np.median(hams)),
                "hamming_p90": float(np.percentile(hams, 90)),
                "hamming_max": int(hams.max()),
                "pairs_within_budget": within,
                "planted_recall": round(found / n, 4),
                "recall_of_within_budget": round(found / within, 4)
                if within
                else None,
                "false_bridges": bridges,
                "wall_sec": round(wall, 3),
            }
        )
        print(json.dumps(out["results"][-1]))
    spark.stop()
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "AUDIOFP_RECALL.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

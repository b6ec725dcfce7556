#!/usr/bin/env python
"""Scale stress of the multimodal perceptual-hash families (round-13
scale audit; the STRESS_EXTRACT method).

Claims measured, per multiplier (media count = mult x sf0.1 documents):

- fingerprints (image dHash / audio envelope): ONE Arrow decode+hash
  stage, ZERO shuffle at any corpus size — wall should scale linearly
  with items, REST-level shuffle bytes must read ~0.
- simple banded pairs (8 bands x 8 bits, max_hamming=7): the band key
  has only 256 values, so candidates grow ~n^2/256 — this run MEASURES
  the melt (the 50x point is deliberately skipped: at 250k items the
  candidate volume is ~1e9 rows; a prior run sat in that join 20+
  minutes). The wide-budget sweep is a small-corpus device.
- Manku combination blocking (8 blocks, max_hamming=3, 56 combos of
  40-bit keys): near-singleton buckets at any n — wall and shuffle
  must scale LINEARLY through 50x. This is the crawl-scale path.

Synthetic media is generated JVM-side (hex-digest pixel/sample bytes,
salted per replica so content differs) and materialized to parquet
first, so generation cost stays out of the timing. Results land in
STRESS_MEDIAFP.json; SCALING.md cites the table.

Usage: python tools/stress_mediafp_scale.py [mult ...]  (default 1 10 50)
"""

from __future__ import annotations

import base64
import json
import os
import struct
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from openmsistream_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# 18x16 image (the catalog geometry): 288 pixel bytes = 9 hex blocks
_IMG_W, _IMG_H = 18, 16
_IMG_HDR = f"P5 {_IMG_W} {_IMG_H} 255\n"
# 650-sample 8-bit mono WAV (10 samples per envelope frame); media are
# kept small so the synthetic-generation cost (interpreted per-block
# md5) stays out of the way — the claims under test scale with ITEM
# COUNT (per-item Arrow overhead, band/combo bucket sizes), not bytes
_AUD_N = 650
_WAV_HDR_B64 = base64.b64encode(
    b"RIFF"
    + struct.pack("<I", 36 + _AUD_N)
    + b"WAVE"
    + b"fmt "
    + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
    + b"data"
    + struct.pack("<I", _AUD_N)
).decode("ascii")


def rest_totals(spark) -> dict[str, int]:
    time.sleep(1.0)  # status store is async — let the last stages land
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    stages = json.loads(urllib.request.urlopen(url, timeout=10).read())
    keys = ("shuffleWriteBytes", "shuffleReadBytes", "inputBytes")
    return {k: sum(s.get(k, 0) for s in stages) for k in keys}


def _hex_blob(n_chars: int, salt: str):
    """n_chars of per-item, per-block varied hex (no repetition — a
    repeated pattern makes envelope frames near-tied and band buckets
    degenerate, which would fake a pathological skew the real corpus
    doesn't have)."""
    n_blocks = (n_chars + 31) // 32
    blob = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(n_blocks)),
            lambda i: F.md5(F.concat_ws("|", "media_id", F.lit(salt), i)),
        ),
        "",
    )
    return F.substring(blob, 1, n_chars)


def build_media(spark, mult: int, out_dir: str) -> tuple[str, str]:
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    ids = docs.select("doc_id")
    n_base = ids.count()
    reps = spark.range(mult).withColumnRenamed("id", "rep")
    media_ids = ids.crossJoin(reps).select(
        (F.col("doc_id") * 1000 + F.col("rep")).alias("media_id")
    )
    img = media_ids.select(
        "media_id",
        F.encode(
            F.concat(F.lit(_IMG_HDR), _hex_blob(_IMG_W * _IMG_H, "img")), "UTF-8"
        ).alias("content"),
    )
    aud = media_ids.select(
        "media_id",
        F.concat(
            F.unbase64(F.lit(_WAV_HDR_B64)),
            F.encode(_hex_blob(_AUD_N, "aud"), "UTF-8"),
        ).alias("content"),
    )
    img_path = os.path.join(out_dir, f"img_{mult}x.parquet")
    aud_path = os.path.join(out_dir, f"aud_{mult}x.parquet")
    img.write.mode("overwrite").parquet(img_path)
    aud.write.mode("overwrite").parquet(aud_path)
    print(f"built {mult}x: {n_base * mult} items each modality")
    return img_path, aud_path


def timed(spark, df) -> tuple[float, dict]:
    before = rest_totals(spark)
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    after = rest_totals(spark)
    return wall, {
        k: after[k] - before[k] for k in ("shuffleWriteBytes", "inputBytes")
    }


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 10, 50]
    spark = get_spark(
        app_name="mediafp-stress",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4098"},
    )
    from openmsistream_spark.llm.audiofp import audio_fingerprints
    from openmsistream_spark.llm.phash import (
        hamming_band_pairs,
        hamming_combo_pairs,
        image_fingerprints,
    )

    out = {"sf_dir": SF_DIR, "results": []}
    with tempfile.TemporaryDirectory() as tmp:
        for mult in mults:
            img_path, aud_path = build_media(spark, mult, tmp)
            row = {"mult": mult}
            for tag, path, fp_fn in (
                ("image_dhash", img_path, image_fingerprints),
                ("audio_envelope", aud_path, audio_fingerprints),
            ):
                media = spark.read.parquet(path)
                n = media.count()
                wall, delta = timed(spark, fp_fn(media))
                row[f"{tag}_items"] = n
                row[f"{tag}_fp_wall_sec"] = round(wall, 3)
                row[f"{tag}_fp_items_per_sec"] = round(n / wall, 1)
                row[f"{tag}_fp_shuffle_mb"] = round(
                    delta["shuffleWriteBytes"] / 1e6, 3
                )
                fps = fp_fn(media)
                # crawl-scale path: combination blocking, h=3
                wall, delta = timed(
                    spark,
                    hamming_combo_pairs(fps, bits=64, blocks=8, max_hamming=3),
                )
                row[f"{tag}_combo_h3_wall_sec"] = round(wall, 3)
                row[f"{tag}_combo_h3_shuffle_mb"] = round(
                    delta["shuffleWriteBytes"] / 1e6, 3
                )
                # wide-budget simple banding: baseline at 1x only. At
                # 10x (50k items) the ~1e8-candidate band join GC-killed
                # a 16g-driver local session outright (measured — the
                # melt IS the finding); 50x would be ~25x worse again.
                if mult == 1:
                    wall, delta = timed(
                        spark, hamming_band_pairs(fps, bands=8, max_hamming=7)
                    )
                    row[f"{tag}_banded_h7_wall_sec"] = round(wall, 3)
                    row[f"{tag}_banded_h7_shuffle_mb"] = round(
                        delta["shuffleWriteBytes"] / 1e6, 3
                    )
                else:
                    row[f"{tag}_banded_h7_wall_sec"] = (
                        "skipped: ~n^2/256 candidates; at 10x the join "
                        "GC-killed a 16g local session (measured)"
                    )
            out["results"].append(row)
            print(json.dumps(row))
    spark.stop()
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "STRESS_MEDIAFP.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

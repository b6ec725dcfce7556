#!/usr/bin/env python
"""Capture the .explain("formatted") plan of the PAIRS frame UPSTREAM
of the connected-components localCheckpoint for the two dedup entries
whose declared-query plans the checkpoint truncates to a
``Scan ExistingRDD`` (r16 VERDICT "What's wrong" #5):

- ``ensemble_neardup_pairs`` → the ensemble pair set
  (``queries_extras._ensemble_pairs_frame``), the frame that carries
  the fused ``_minhash_band_rows`` LSH arm;
- ``dedup_keep_canonical_lsh`` → ``minhash_lsh_dedup``'s verified pair
  set, the frame ``keep_canonical`` feeds to ``dedup_clusters``.

Planning only — no job executes. Writes
``plans/<dir>/<name>_pairsframe_<tag>.txt``.

Usage: python tools/capture_upstream_plans.py plans/r17 after
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openmsistream_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir, tag = sys.argv[1:3]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture_upstream_plans")

    from openmsistream_spark.queries import load  # noqa: E402
    from openmsistream_spark.queries_extras import _ensemble_pairs_frame
    from openmsistream_spark.llm.dedup import (
        DEFAULT_MAX_SHINGLE_DF,
        cap_hot_shingles,
        minhash_lsh_dedup,
        word_shingles,
    )

    docs = load(spark, sf_dir, "documents")
    sh = cap_hot_shingles(word_shingles(docs, n=3), DEFAULT_MAX_SHINGLE_DF)

    frames = {
        "ensemble_neardup_pairs": _ensemble_pairs_frame(docs, sh),
        "dedup_keep_canonical_lsh": minhash_lsh_dedup(
            docs, n=3, num_hashes=8, rows_per_band=2, threshold=0.12,
            shingles=sh,
        ),
    }
    for name, df in frames.items():
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_pairsframe_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(
            f"wrote {path} ({plan.count('Exchange')} Exchange refs, "
            f"{plan.count('ObjectHashAggregate')} ObjectHashAggregate refs)"
        )
    spark.stop()


if __name__ == "__main__":
    main()

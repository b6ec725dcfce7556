#!/usr/bin/env python
"""Scale stress of the raw-crawl FRONT half (round-12 scale audit).

The front half (HTML->text main-content extraction -> unicode
normalize -> C4 line rules, ``crawl_front_transform``) is claimed
embarrassingly parallel: per-row column expressions plus ONE Arrow
stage (NFC), zero shuffle at any corpus size. This measures that claim
the way STRESS_DEDUP measured the dedup family: synthesize HTML pages
around sf0.1's documents at several multipliers, materialize the pages
to parquet (generation cost stays out of the timing), run the shared
transform, and record wall seconds, input MB, MB/s, and the REST-level
shuffle bytes (must stay ~0 at every scale — a nonzero reading means
an Exchange crept into a "row-local" pipeline).

Results land in STRESS_EXTRACT.json; SCALING.md cites the table.

Usage: python tools/stress_extract_scale.py [mult ...]  (default 1 10 50)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from openmsistream_spark.queries_extras7 import _synth_html_spark
from openmsistream_spark.session import get_spark
from openmsistream_spark.streaming.extract import crawl_front_transform

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def rest_totals(spark) -> dict[str, int]:
    """Cumulative shuffle/in-out bytes across all completed stages."""
    # settle: the status store is fed by the async listener bus — an
    # immediate post-collect read can miss the final stages' metrics
    time.sleep(1.0)
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    stages = json.loads(urllib.request.urlopen(url, timeout=10).read())
    keys = ("shuffleWriteBytes", "shuffleReadBytes", "inputBytes", "outputBytes")
    return {k: sum(s.get(k, 0) for s in stages) for k in keys}


def build_pages(spark, mult: int, out_dir: str) -> str:
    """mult x sf0.1 documents rendered as synthetic HTML pages.

    Replicas keep their replica id in doc_id (id-spaced) and get it
    salted into the text so page content differs across replicas —
    growth adds VOLUME, not identical pages the scan could short-cut."""
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n_base = docs.count()
    reps = spark.range(mult).withColumnRenamed("id", "rep")
    pages = (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("rep") * n_base).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" rep"), F.col("rep").cast("string")
            ).alias("text"),
            "source",
        )
        .withColumn("html", _synth_html_spark(punct=True))
        .select("doc_id", "html")
    )
    path = os.path.join(out_dir, f"pages_x{mult}")
    # spread the synthetic pages over one partition per core BEFORE the
    # timed run: the generated parquet would otherwise land in 1-4 files
    # (maxPartitionBytes never splits them), serializing the measurement
    # on a near-idle box and understating per-node throughput — a real
    # crawl input is thousands of splits
    n_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    pages.repartition(n_cpus).write.mode("overwrite").parquet(path)
    return path


def run_scale(spark, mult: int, work: str) -> dict:
    path = build_pages(spark, mult, work)
    pages = spark.read.parquet(path)
    n_pages = pages.count()
    in_bytes = pages.select(
        F.sum(F.octet_length("html")).alias("b")
    ).first()["b"]

    out = crawl_front_transform(pages, html_col="html", id_col="doc_id")
    # warm-up pass first: whole-stage codegen compilation and Arrow
    # worker startup land on the first materialization and would make
    # small-mult walls incomparable with later ones
    out.write.format("noop").mode("overwrite").save()

    before = rest_totals(spark)
    t0 = time.monotonic()
    # materialize fully on the executors (noop write, no driver funnel)
    out.write.format("noop").mode("overwrite").save()
    wall = round(time.monotonic() - t0, 3)
    after = rest_totals(spark)

    kept = out.filter(F.col("n_kept") > 0).count()
    row = {
        "mult": mult,
        "n_pages": n_pages,
        "input_mb": round(in_bytes / 1e6, 1),
        "wall_sec": wall,
        "mb_per_sec": round(in_bytes / 1e6 / wall, 1),
        "pages_with_kept_lines": kept,
        "shuffle_write_mb": round(
            (after["shuffleWriteBytes"] - before["shuffleWriteBytes"]) / 1e6, 3
        ),
        "shuffle_read_mb": round(
            (after["shuffleReadBytes"] - before["shuffleReadBytes"]) / 1e6, 3
        ),
    }
    print(json.dumps(row), file=sys.stderr)
    return row


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 10, 50]
    spark = get_spark(
        app_name="stress-extract-scale",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4098"},
    )
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "STRESS_EXTRACT.json",
    )
    results = []
    with tempfile.TemporaryDirectory() as work:
        for m in mults:
            results.append(run_scale(spark, m, work))
    record = {
        "sf_base": SF_DIR,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
    print(f"wrote {out_path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()

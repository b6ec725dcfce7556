#!/usr/bin/env python
"""Regenerate CATALOG.md from the query registry (the footer snippet of
CATALOG.md, promoted to a committed tool so every round regenerates the
table identically).

Usage: PYTHONPATH=/root/repo python tools/regen_catalog.py
"""

from __future__ import annotations

import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openmsistream_spark.queries import QUERIES  # noqa: E402

for mod in (
    "queries_extras",
    "queries_extras2",
    "queries_extras3",
    "queries_extras4",
    "queries_extras5",
    "queries_extras6",
    "queries_extras7",
    "queries_extras8",
    "queries_extras9",
    "queries_extras10",
    "queries_extras11",
    "queries_extras12",
):
    importlib.import_module(f"openmsistream_spark.{mod}")

HEADER = """# CATALOG — the oracle-validated query surface

Generated from `openmsistream_spark.queries.QUERIES` (do not edit by hand;
regenerate with `python tools/regen_catalog.py`). One row per catalog entry:
the name the driver/`bench.py`/`tests/oracle_check.py` use, the module
holding the Spark implementation, the SURVEY §2 / extension tag it
covers, and what it computes. Every entry is paired with an ANSI-SQL
DuckDB oracle; the driver compares rows + schema + values at sf0.01.

Determinism tiers: every catalog entry is oracle-paired (hash-exact).
Two operators in the wider library are NOT: `llm/phash.phash_int` (DCT
pHash) uses a float DCT, so no second engine reproduces its bits — it
is the repo's single property-tested-tier fingerprint (noise
robustness, brightness invariance, separation: tests/test_phash.py)
with measured recall in PHASH_RECALL.json; its integer-exact sibling
`dhash_int` carries the oracle-paired catalog entries. And
`llm/jpeg.jpeg_pixels` (baseline JPEG decode) is float-tier pixels
(IDCT + color convert, like every real JPEG library) — verified
against an independent forward encoder in tests/test_jpeg.py, with
flat-field exactness pinned.
"""


def main() -> None:
    n = len(QUERIES)
    n_oracle = sum(1 for s in QUERIES.values() if s.oracle)
    lines = [HEADER]
    lines.append(f"**{n} queries, {n_oracle} oracle-paired.**\n")
    lines.append("| # | Query | Module | Covers | What it computes |")
    lines.append("|---|---|---|---|---|")
    for i, (name, spec) in enumerate(QUERIES.items(), 1):
        module = spec.fn.__module__.rsplit(".", 1)[-1]
        covers = (spec.survey or "").replace("|", "\\|").replace("\n", " ")
        doc = (spec.doc or "").replace("|", "\\|").replace("\n", " ")
        lines.append(f"| {i} | `{name}` | {module} | {covers} | {doc} |")
    lines.append(
        "\nRegenerate: `PYTHONPATH=/root/repo python tools/regen_catalog.py`"
    )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "CATALOG.md"
    )
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {n} queries, {n_oracle} oracle-paired")


if __name__ == "__main__":
    main()

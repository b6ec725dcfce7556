"""Bench-record guards (round-11 fix for the driver's `parsed: null`).

The driver keeps only the last 2000 chars of bench.py's stdout and
json-parses the final line. Rounds 8 and 10 grew the single JSON line
past the tail, head-truncating it — every per-query timing was lost from
the round record. bench.py now (a) writes the lossless full-precision
map to BENCH_LOCAL.json and (b) prints a compact stdout line that
auto-trims the CHEAPEST entries until it fits the tail budget, so the
heavy / TPC-H headline entries always survive in the parsed record.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
import __spark_entry__ as entry  # noqa: E402

ALL_NAMES = list(bench.HEADLINE) + list(bench.EXTRA)


def _synthetic_timings():
    # deterministic spread resembling a real round: a heavy tail of 7-8 s
    # dedup entries over a floor of sub-second scans
    return {
        n: round(0.1 + (i * 7.9) / max(1, len(ALL_NAMES) - 1), 3)
        for i, n in enumerate(ALL_NAMES)
    }


def test_compact_line_fits_driver_tail_with_full_catalog():
    timings = _synthetic_timings()
    line = bench.compact_stdout_line(timings, round(sum(timings.values()), 3), 0.1)
    assert len(line) <= 1900
    doc = json.loads(line)
    assert doc["metric"] == "headline_queries_total_runtime"
    assert doc["unit"] == "sec"
    assert doc["sf"] == 0.1
    assert doc["queries"]  # never trims to empty


def test_trim_drops_cheapest_first_and_records_omission():
    timings = _synthetic_timings()
    line = bench.compact_stdout_line(timings, 1.0, 0.1)
    doc = json.loads(line)
    kept = set(doc["queries"])
    dropped = set(timings) - kept
    if dropped:
        assert doc["omitted"] == len(dropped)
        assert doc["full"] == "BENCH_LOCAL.json"
        # every dropped entry is cheaper than every kept entry
        assert max(timings[n] for n in dropped) <= min(timings[n] for n in kept)
    # the heaviest entries (the ones the judge plan-audits) always stay
    heavy = sorted(timings, key=timings.get, reverse=True)[:20]
    assert all(h in kept for h in heavy)


def test_simulated_driver_tail_parse():
    """Exactly what the driver does: capture stdout, keep the last 2000
    chars, parse the final line — with JVM noise preceding the line."""
    timings = _synthetic_timings()
    line = bench.compact_stdout_line(timings, 2.0, 0.1)
    stdout = "WARN noise\n" * 200 + line + "\n"
    tail = stdout[-2000:]
    last = tail.strip().splitlines()[-1]
    parsed = json.loads(last)
    assert parsed["metric"] == "headline_queries_total_runtime"


def test_no_trim_when_line_fits():
    timings = {"q1_pricing_summary": 1.234, "dedup_keep_best": 7.5}
    line = bench.compact_stdout_line(timings, 8.734, 0.01)
    doc = json.loads(line)
    assert "omitted" not in doc
    assert doc["queries"] == {"q1_pricing_summary": 1.23, "dedup_keep_best": 7.5}


def test_bench_cost_reads_local_record(tmp_path, monkeypatch):
    """__spark_entry__._bench_cost must pick up BENCH_LOCAL.json — the
    lossless record — when it is NEWER than the driver-round files, and
    must NOT let a stale committed local file override a fresher round
    (read-only checkouts skip the local write while the driver still
    lands BENCH_r*.json; ordering is by file mtime)."""
    import os as _os

    old = {"n": 3, "parsed": {"queries": {"q1_pricing_summary": 9.0, "only_old": 1.0}}}
    (tmp_path / "BENCH_r03.json").write_text(json.dumps(old))
    local = {"metric": "m", "queries": {"q1_pricing_summary": 1.5, "only_new": 2.0}}
    (tmp_path / "BENCH_LOCAL.json").write_text(json.dumps(local))
    _os.utime(tmp_path / "BENCH_r03.json", (1_000_000, 1_000_000))
    _os.utime(tmp_path / "BENCH_LOCAL.json", (2_000_000, 2_000_000))
    monkeypatch.setattr(entry, "_HERE", str(tmp_path))
    cost = entry._bench_cost()
    assert cost["q1_pricing_summary"] == 1.5  # newer local overrides
    assert cost["only_old"] == 1.0
    assert cost["only_new"] == 2.0
    # stale local (older mtime) must NOT override a fresher round file
    _os.utime(tmp_path / "BENCH_LOCAL.json", (500_000, 500_000))
    cost = entry._bench_cost()
    assert cost["q1_pricing_summary"] == 9.0
    assert cost["only_new"] == 2.0  # but its unique entries still count

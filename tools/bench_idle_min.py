#!/usr/bin/env python
"""Fold N idle bench runs (bench.py JSON outputs) into the per-entry
min table the SURVEY perf comparisons use (the round-14/15 idle-bench
discipline: min-of-runs on a quiet box is the converged-cost signal;
single runs carry host-steal and JIT-position noise).

Usage:
    python tools/bench_idle_min.py OUT.json RUN1.json RUN2.json [...]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    out_path, *run_paths = sys.argv[1:]
    if not run_paths:
        raise SystemExit(__doc__)
    runs = [json.load(open(p)) for p in run_paths]
    sfs = {r.get("sf") for r in runs}
    if len(sfs) != 1:
        raise SystemExit(f"refusing to fold runs at different sf: {sfs}")
    common = set(runs[0]["queries"])
    for r in runs[1:]:
        common &= set(r["queries"])
    queries = {
        q: round(min(r["queries"][q] for r in runs), 3) for q in sorted(common)
    }
    only = {
        p: sorted(set(r["queries"]) - common)
        for p, r in zip(run_paths, runs)
        if set(r["queries"]) - common
    }
    out = {
        "note": f"per-entry min of {', '.join(run_paths)} (same HEAD, idle box)",
        "sf": runs[0].get("sf"),
        "total": round(sum(queries.values()), 1),
        "queries": queries,
    }
    if only:
        out["entries_not_in_all_runs"] = only
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {out_path}: {len(queries)} entries, total {out['total']} s")


if __name__ == "__main__":
    main()

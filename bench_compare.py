#!/usr/bin/env python
"""Bench regression guard: compare two BENCH_r{N}.json files and flag
per-query regressions beyond a threshold (default 25%).

    python bench_compare.py BENCH_r02.json BENCH_r03.json [--threshold 0.25]

Exit code 1 when any common query regressed past the threshold — the
offenders (and the common-subset totals) print either way, so a flagged
run can be triaged into PLANS.md (code regression vs. environmental load;
this box carries outside load — record `uptime` with every bench run).
"""

from __future__ import annotations

import argparse
import json


def compare(old: dict, new: dict, threshold: float = 0.25) -> dict:
    qo, qn = old.get("queries", {}), new.get("queries", {})
    common = sorted(set(qo) & set(qn))
    regressions = {
        q: {"old": qo[q], "new": qn[q], "ratio": round(qn[q] / qo[q], 3)}
        for q in common
        if qo[q] > 0 and (qn[q] - qo[q]) / qo[q] > threshold
        and qn[q] - qo[q] > 0.05  # ignore sub-50ms jitter on tiny queries
    }
    return {
        "common_queries": len(common),
        "old_total": round(sum(qo[q] for q in common), 2),
        "new_total": round(sum(qn[q] for q in common), 2),
        "threshold": threshold,
        "regressions": regressions,
        "added": sorted(set(qn) - set(qo)),
        "removed": sorted(set(qo) - set(qn)),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.25)
    args = ap.parse_args()
    def load(path: str) -> dict:
        with open(path) as f:
            d = json.load(f)
        # the driver's BENCH_r{N}.json wraps bench.py's line under "parsed"
        return d["parsed"] if "queries" not in d and "parsed" in d else d

    old, new = load(args.old), load(args.new)
    result = compare(old, new, args.threshold)
    print(json.dumps(result, indent=2))
    return 1 if result["regressions"] else 0


if __name__ == "__main__":
    raise SystemExit(main())

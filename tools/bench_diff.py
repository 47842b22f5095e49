#!/usr/bin/env python3
"""Round-over-round bench comparison: flag per-query regressions beyond
the box's co-tenant noise band (±30% unless overridden), list added and
removed queries, and split each flagged delta into its build vs exec
component (a build regression and an execution regression have
different fixes — see bench.py).

Usage:
    python tools/bench_diff.py OLD_bench_out.json NEW_bench_out.json [--band 1.3]

Exit code 0 always — this is a report, not a gate; the numbers feed
VERIFY_LOG.md and the per-round judgment, where a flagged query needs
either a fix or an explanation, not an automatic failure.
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict:
    """Accept either bench.py's bench_out.json (one JSON line) or the
    driver's BENCH_r{N}.json wrapper, whose "tail" field captures the
    last ~2000 stdout chars — extract the embedded compact line from
    it (the tail may clip the line's HEAD, so scan for the LAST parse
    that yields a queries map: an earlier run's bench-like line can
    also be present in the captured tail)."""
    with open(path) as fh:
        doc = json.load(fh)
    if "queries" in doc:
        return doc
    tail = doc.get("tail", "")
    best: dict = {}
    for i, ch in enumerate(tail):
        if ch != "{":
            continue
        try:
            cand = json.loads(tail[i:].splitlines()[0])
        except Exception:
            continue
        if isinstance(cand, dict) and "queries" in cand:
            best = cand  # keep scanning: the LAST parseable line wins
    if not best:
        sys.exit(f"{path}: no bench line with a queries map found")
    return best


def diff(old: dict, new: dict, band: float) -> dict:
    oq, nq = old.get("queries", {}), new.get("queries", {})
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    flagged = []
    for name in sorted(set(oq) & set(nq)):
        o, n = oq[name], nq[name]
        if o <= 0:
            continue
        ratio = n / o
        if ratio > band or ratio < 1 / band:
            flagged.append(
                {
                    "query": name,
                    "old": o,
                    "new": n,
                    "ratio": round(ratio, 3),
                    "build_delta": round(
                        new.get("build", {}).get(name, 0.0)
                        - old.get("build", {}).get(name, 0.0),
                        4,
                    ),
                    "exec_delta": round(
                        new.get("exec", {}).get(name, 0.0)
                        - old.get("exec", {}).get(name, 0.0),
                        4,
                    ),
                }
            )
    flagged.sort(key=lambda r: -r["ratio"])
    return {
        "headline_old": old.get("value"),
        "headline_new": new.get("value"),
        "band": band,
        "flagged": flagged,
        "added": added,
        "removed": removed,
    }


def main() -> None:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("old", help="baseline bench_out.json or BENCH_r{N}.json")
    ap.add_argument("new", help="candidate bench_out.json or BENCH_r{N}.json")
    ap.add_argument(
        "--band", type=float, default=1.3,
        help="noise band: flag ratios outside [1/band, band] (default 1.3)",
    )
    ns = ap.parse_args()
    report = diff(load(ns.old), load(ns.new), ns.band)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()

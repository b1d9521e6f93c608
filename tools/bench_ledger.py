#!/usr/bin/env python3
"""Cross-SF bench-mover ledger (r14 verdict task #7).

Each Bench run flags keys >1.5x their pinned round-start baseline in its
own BENCH_LOCAL-<sf>.json `regressions` field — but a mover flagged at
only one SF lived ONLY inside that file (r14's 4.69x bucketed_join_orders
at sf1 surfaced in no document). This tool unions the three per-SF
regression maps into ONE line so round-end bookkeeping (BASELINE.md
refresh) and the judge see every flagged mover, named, in one place.

Usage: python3 tools/bench_ledger.py [sf ...]   (default: sf0.01 sf0.1 sf1)
Prints one JSON line: {"ledger":"bench-movers","n":N,"movers":{"<sf>:<key>":
{"prev":s,"now":s,"ratio":r}, ...}} with movers sorted by ratio descending.
Exit code 0 always — the ledger REPORTS; judgment lives in EXPERIMENTS.md.
"""
import json
import os
import sys


def main():
    sfs = sys.argv[1:] or ["sf0.01", "sf0.1", "sf1"]
    movers = {}
    missing = []
    for sf in sfs:
        path = f"BENCH_LOCAL-{sf}.json"
        if not os.path.exists(path):
            missing.append(sf)
            continue
        with open(path) as f:
            doc = json.load(f)
        for key, reg in (doc.get("regressions") or {}).items():
            movers[f"{sf}:{key}"] = reg
    ordered = dict(sorted(movers.items(),
                          key=lambda kv: -kv[1].get("ratio", 0)))
    print(json.dumps({
        "ledger": "bench-movers",
        "n": len(ordered),
        "missing_sfs": missing,
        "movers": ordered,
    }, separators=(",", ":")))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Refresh the committed bench regression-gate baseline from a driver round
report.

The Bench rerun gate compares each entry against
`bench_history/baseline_<sf>.tsv` — the PRIOR round's driver-recorded
numbers. The driver writes its measurements as a raw stdout tail in
`BENCH_r{N}.json`; this script extracts the `"queries":{...}` map from that
tail (the tail may hold a truncated JSON line, so the map is located by
scanning, not by parsing the whole line) and rewrites the baseline TSV.

Usage: python3 scripts/refresh_baseline.py BENCH_r09.json [sf0.1]
"""
import json
import re
import sys


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    path = sys.argv[1]
    with open(path) as f:
        report = json.load(f)
    tail = report.get("tail", "")
    m = re.search(r'"queries":(\{.*?\})', tail)
    if not m:
        print(f"no queries map found in the tail of {path}", file=sys.stderr)
        return 1
    queries = json.loads(m.group(1))
    sf = sys.argv[2] if len(sys.argv) > 2 else f"sf{report.get('sf', 0.1)}"
    out = f"bench_history/baseline_{sf}.tsv"
    with open(out, "w") as f:
        for name, secs in queries.items():
            f.write(f"{name}\t{secs}\n")
    print(f"{out}: {len(queries)} entries from {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Refresh the committed bench regression-gate baseline from a driver round
report.

The Bench rerun gate compares each entry against
`bench_history/baseline_<sf>.tsv` — the PRIOR round's driver-recorded
numbers. The driver writes its measurements as a raw stdout tail in
`BENCH_r{N}.json`; this script extracts the `"queries":{...}` map from that
tail (the tail may hold a truncated JSON line, so the map is located by
scanning, not by parsing the whole line) and rewrites the baseline TSV.

Gate-semantics guards (the naive extraction would poison the gate):
- refuses a failed round (rc != 0) without --force, and always drops
  entries named in the line's "errors" map — an errored entry's time is
  elapsed-until-throw, not a reference;
- entries re-run by the gate hold min-of-two in the queries map, but the
  baseline must reference FIRST-pass times (a warm-rerun floor would flag
  every honest later round), so the "reruns":{name:[first,rerun]} echo
  overrides them when present — when the tail was shrunk to a variant
  without the echo, the min-of-two leak for re-run entries is unavoidable
  from the report alone and is WARNED about;
- a 1-decimal render writes sub-0.05s entries as 0.0, which would shadow
  a good fallback value while failing Bench's `p > 0` guard (silently
  ungating the entry): zero entries keep their previous baseline value;
- a render that dropped the prep_* entries keeps the previous baseline's
  prep lines rather than silently unbaselining them.

Usage: python3 scripts/refresh_baseline.py BENCH_r09.json [sf0.1] [--force]
"""
import json
import os
import re
import sys


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--force"]
    force = "--force" in sys.argv
    if not args:
        print(__doc__)
        return 2
    path = args[0]
    with open(path) as f:
        report = json.load(f)
    if report.get("rc", 0) != 0 and not force:
        print(f"{path}: rc={report['rc']} — a failed round is not a gate "
              "reference (--force to override)", file=sys.stderr)
        return 1
    tail = report.get("tail", "")

    def field(name):
        m = re.search(r'"%s":(\{.*?\})' % name, tail)
        return json.loads(m.group(1)) if m else {}

    queries = field("queries")
    if not queries:
        print(f"no queries map found in the tail of {path}", file=sys.stderr)
        return 1
    errors = field("errors")
    for name in errors:
        queries.pop(name, None)
        print(f"dropped errored entry {name} ({errors[name][:60]})")
    reruns = field("reruns")
    for name, pair in reruns.items():
        if name in queries:
            queries[name] = pair[0]  # first pass, not min-of-two
    if not reruns and '"reruns"' not in tail:
        print("warning: no reruns echo in the tail (shrunk render) — any "
              "gate-re-run entry carries min-of-two, not first-pass")

    sf = args[1] if len(args) > 1 else f"sf{report.get('sf', 0.1)}"
    out = f"bench_history/baseline_{sf}.tsv"
    old = {}
    if os.path.exists(out):
        with open(out) as f:
            for line in f:
                parts = line.split("\t")
                if len(parts) >= 2:
                    old[parts[0]] = float(parts[1])
    for name, secs in list(queries.items()):
        if secs <= 0:
            kept = old.get(name)
            if kept is not None and kept > 0:
                queries[name] = kept
                print(f"kept prior baseline for {name} (rendered as 0.0)")
            else:
                del queries[name]
                print(f"dropped {name}: rendered as 0.0 with no prior value")
    if not any(n.startswith("prep_") for n in queries):
        preps = {n: v for n, v in old.items() if n.startswith("prep_")}
        queries.update(preps)
        if preps:
            print(f"render dropped prep_* — kept {len(preps)} prior prep lines")

    with open(out, "w") as f:
        for name, secs in queries.items():
            f.write(f"{name}\t{secs}\n")
    print(f"{out}: {len(queries)} entries from {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

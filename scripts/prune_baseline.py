#!/usr/bin/env python3
"""One-shot r13 collapse of BASELINE.md (r12 VERDICT #7).

BASELINE.md accreted 20+ '## Bench minima' and 25+ '## Scale exponents'
sections across rounds 5-12 (5,400+ lines); BENCH_FLOORS.json (via
gen_floors.py) is the machine consumer and only needs the per-key MIN.
This script:

  - keeps the conventions header and a small keep-verbatim set (the
    r12-sf10 sweep, the recall tables, the last two minima sections,
    the self-rescue conventions, the r12 closing summary) untouched;
  - folds every OTHER '## Bench minima' section into ONE consolidated
    per-key-min table in the exact format gen_floors.py parses, so
    regeneration yields a bit-identical BENCH_FLOORS.json;
  - folds every other '## Scale exponents' section into one table
    keeping the LATEST (document-order) row per key;
  - replaces remaining prose sections with one-line pointers to git
    history (the full tables live in the pre-collapse commit).

Idempotent in effect (re-running on the collapsed file is a no-op
collapse) but intended to run once; verify with gen_floors.py + diff.
"""
import re
import subprocess
import sys

KEEP_VERBATIM = (
    "## Artifact + metric conventions",
    "## ANN radius-vs-recall r11",
    "## Bench self-rescue conventions (pinned r11)",
    "## Scale exponents r12-sf10",
    "## fn_jaro_snm measured recall r12",
    "## Round-12 closing summary",
    "## ANN bucket-width curve r13",
    "## Bench minima r13-newkeys (",   # holds the malformed-floor adjudication
    "## Bench minima r13-newkeys-d",   # holds the q_pareto small-sf note
    "## Scale exponents r13-sf10",
    "## Scale exponents r13b-sf10",
    "## Scale exponents r13c-sf10",
    "## Scale exponents r13d-sf10",
    "## Scale exponents r13e-sf10",
    "## Scale exponents r13f-sf10",
    "## fn_jaro_snm_w50 recall SLA closed r13",
    "## llm_mutual_nn_snm measured recall r13",
    "## Stream-side ingest funnel throughput r13",
    "## Bench minima r13-canonical-c",
    "## Round-13 closing summary",
)

def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "BASELINE.md"
    with open(path) as f:
        text = f.read()

    heads = [m for m in re.finditer(r"^## .*$", text, re.M)]
    sections = []  # (header_line, body_text_including_header)
    for i, m in enumerate(heads):
        end = heads[i + 1].start() if i + 1 < len(heads) else len(text)
        sections.append((m.group(0), text[m.start():end]))
    preamble = text[:heads[0].start()] if heads else text

    minima = {}   # key -> (min, runs)
    expo = {}     # key -> (row, source_tag)  latest wins
    collapsed_minima_tags, collapsed_expo_tags, pointer_tags = [], [], []
    kept = []

    for header, body in sections:
        if any(header.startswith(k) for k in KEEP_VERBATIM):
            kept.append(body)
            continue
        tag = header[3:].split("(")[0].strip()
        if header.startswith("## Bench minima"):
            collapsed_minima_tags.append(tag)
            for row in re.finditer(r"^\| (\S+) \| ([0-9.]+) \| (\d+) \|$",
                                   body, re.M):
                k, v, n = row.group(1), float(row.group(2)), int(row.group(3))
                if k not in minima or v < minima[k][0]:
                    minima[k] = (v, n)
        elif header.startswith("## Scale exponents"):
            collapsed_expo_tags.append(tag)
            # 5-col round sections AND the 6-col (source-tagged) table a
            # previous collapse emitted — re-collapsing must not drop rows
            for row in re.finditer(
                    r"^\| (\S+) \| ([0-9.]+) \| ([0-9.]+) \| ([0-9.-]+) \| (\w+) \|"
                    r"(?: ([^|]+) \|)?$",
                    body, re.M):
                src = (row.group(6) or tag).strip()
                expo[row.group(1)] = (row.groups()[:5], src)
        else:
            pointer_tags.append(tag)

    sha = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                         capture_output=True, text=True).stdout.strip()

    out = [preamble]
    out.append(
        "## Collapsed history (r13)\n\n"
        f"Rounds 5-12 accreted {len(collapsed_minima_tags)} minima sections, "
        f"{len(collapsed_expo_tags)} scale-exponent sections and "
        f"{len(pointer_tags)} prose sections here; the full per-section "
        f"tables live in git history (commit {sha} and earlier). The two "
        "consolidated tables below preserve exactly what the machine "
        "consumers need: the per-key all-time minimum (gen_floors.py input "
        "- regeneration after this collapse is bit-identical) and the "
        "latest recorded sf0.1->sf1 exponent per key. Collapsed prose "
        "sections: " + "; ".join(pointer_tags) + ".\n")

    out.append(
        "## Bench minima consolidated-pre-r12c (r13 collapse, "
        "sf=/root/testdata/sf0.1)\n\n"
        "Per-key MIN across the " + str(len(collapsed_minima_tags)) +
        " collapsed minima sections (" +
        ", ".join(collapsed_minima_tags) + ").\n\n"
        "| key | min (s) | runs |\n| --- | --- | --- |")
    for k in sorted(minima, key=lambda k: -minima[k][0]):
        v, n = minima[k]
        out.append(f"| {k} | {v} | {n} |")
    out.append("")

    out.append(
        "## Scale exponents consolidated-sf1 (r13 collapse, "
        "/root/testdata/sf0.1 vs target/scaledata/sf1, flag > 1.35)\n\n"
        "Latest recorded row per key across the " +
        str(len(collapsed_expo_tags)) + " collapsed exponent sections; "
        "e = log10(t_big / t_small): ~1 linear, <1 overhead-bound, "
        ">1.35 super-linear.\n\n"
        "| key | t(small) | t(big) | exponent | verdict | source |\n"
        "| --- | --- | --- | --- | --- | --- |")
    for k in sorted(expo):
        (key, ts, tb, e, verdict), tag = expo[k]
        out.append(f"| {key} | {ts} | {tb} | {e} | {verdict} | {tag} |")
    out.append("")

    out.extend(kept)

    result = "\n".join(out)
    if not result.endswith("\n"):
        result += "\n"
    with open(path, "w") as f:
        f.write(result)
    print(f"{path}: {len(result.splitlines())} lines "
          f"({len(collapsed_minima_tags)} minima + {len(collapsed_expo_tags)} "
          f"exponent sections collapsed, {len(kept)} kept verbatim)")

if __name__ == "__main__":
    main()

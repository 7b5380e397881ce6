#!/usr/bin/env python3
"""Regenerate LEAKCHECK.json — the repo's no-proprietary-content sweep.

The judged artifact has seven hit buckets; this script is the reproducible
producer (r9 ADVICE: the round bump alone was indistinguishable from not
having re-run the check). Each bucket greps the buildable surface (src/,
scripts/, build.sbt, project/) for a class of reference that must not
appear in a from-public-knowledge-only repo:

  internal-import  imports outside the public dependency surface
                   (Spark/Scala/Java/ScalaTest/ScalaCheck/graft itself)
  internal-url     http(s) URLs to anything but a public-docs allowlist
  internal-pkg2    com/net/io packages with internal/private/corp segments
  internal-bucket  cloud-storage URIs (s3/gs/abfs/wasb) — no real buckets
  slack-link       slack links / go-links style shortcuts
  api-key          credential-shaped literals (AWS/GitHub/Slack/sk- keys)
  axon-env         env-var names that smell like credentials or an
                   internal control plane (anything beyond SPARK_GRAFT_*)

Output is LEAKCHECK.json with generated_at + source commit provenance so
a round bump is checkable. Exit 1 when any bucket has hits.

Usage: scripts/leakcheck.py [--round N] [--out LEAKCHECK.json]
"""
import json
import os
import re
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PATTERNS = {
    # Rooted-package imports only (com./net./io./... or a non-public org.*)
    # — local value imports (`import spark.implicits._`, `import Obj.X`)
    # are Scala scoping, not a dependency, and must not count.
    "internal-import":
        r"^\s*import\s+(?:(?:com|net|io|ai|co|dev|cloud)\.|"
        r"org\.(?!apache\.|scalatest\.|scalacheck\.|openjdk\.))",
    "internal-url":
        r"https?://(?!github\.com|raw\.githubusercontent\.com|"
        r"spark\.apache\.org|issues\.apache\.org|arxiv\.org|doi\.org|"
        r"duckdb\.org|openjdk\.org|scala-lang\.org|www\.scala-sbt\.org|"
        r"repo1\.maven\.org|en\.wikipedia\.org|datatracker\.ietf\.org|"
        r"schemas\.openxmlformats\.org|www\.w3\.org|"
        r"localhost|127\.0\.0\.1|example\.com|www\.example\.com)"
        r"[A-Za-z0-9.-]+",
    "internal-pkg2":
        r"\b(?:com|net|io)\.(?!example\b)[a-z0-9]+\.(?:internal|private|corp)\b",
    "internal-bucket":
        r"\b(?:s3a?|gs|abfss?|wasbs?)://[A-Za-z0-9._-]+",
    "slack-link":
        r"slack\.com|app\.slack|\bgo/[a-z][a-z0-9-]{2,}\b",
    "api-key":
        r"\b(?:AKIA[0-9A-Z]{16}|sk-[A-Za-z0-9]{20,}|ghp_[A-Za-z0-9]{20,}|"
        r"xox[baprs]-[A-Za-z0-9-]{10,})\b",
    "axon-env":
        r"\b[A-Z][A-Z0-9_]{2,}_(?:TOKEN|SECRET|APIKEY|API_KEY|CREDENTIALS?|"
        r"PASSWORD)\b",
}

SCAN_ROOTS = ["src", "scripts", "build.sbt", "project",
              # Repo-root prose is the largest surface and the likeliest
              # leak site (pasted links/IDs land in docs first) — sweep
              # every tracked root-level markdown artifact too.
              "README.md", "SURVEY.md", "BASELINE.md", "KEYS.md",
              "FIXTURES.md", "TESTDATA.md"]
SKIP_BASENAMES = {"leakcheck.py"}  # the patterns would self-match


def scan_files():
    for root in SCAN_ROOTS:
        path = os.path.join(REPO, root)
        if os.path.isfile(path):
            yield path
        elif os.path.isdir(path):
            for dirpath, dirnames, filenames in os.walk(path):
                dirnames[:] = [d for d in dirnames if d != "target"]
                for f in sorted(filenames):
                    if f in SKIP_BASENAMES:
                        continue
                    if f.endswith((".scala", ".sbt", ".py", ".sh", ".md")):
                        yield os.path.join(dirpath, f)


def main():
    args = sys.argv[1:]
    rnd = None
    out = os.path.join(REPO, "LEAKCHECK.json")
    if "--round" in args:
        i = args.index("--round")
        rnd = int(args[i + 1])
    if "--out" in args:
        i = args.index("--out")
        out = args[i + 1]
    if rnd is None:
        try:
            with open(os.path.join(REPO, "LEAKCHECK.json")) as f:
                rnd = json.load(f).get("round", 0) + 0  # keep current round
        except Exception:
            rnd = 0

    compiled = {k: re.compile(v) for k, v in PATTERNS.items()}
    hits = {k: [] for k in PATTERNS}
    for path in scan_files():
        rel = os.path.relpath(path, REPO)
        try:
            with open(path, encoding="utf-8", errors="replace") as f:
                for ln, line in enumerate(f, 1):
                    for cat, rx in compiled.items():
                        if rx.search(line):
                            hits[cat].append(f"{rel}:{ln}: {line.strip()[:160]}")
        except OSError as e:
            print(f"WARN: unreadable {rel}: {e}", file=sys.stderr)

    try:
        commit = subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=REPO,
            capture_output=True, text=True).stdout.strip() or "unknown"
    except Exception:
        commit = "unknown"

    n = sum(len(v) for v in hits.values())
    doc = {
        "round": rnd,
        "n_hits": n,
        "hits": hits,
        "generated_at": datetime.now(timezone.utc).isoformat(timespec="seconds"),
        "commit": commit,
        "generator": "scripts/leakcheck.py",
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=2)
        f.write("\n")
    print(f"{n} hits across {len(PATTERNS)} categories -> {out}")
    if n:
        for cat, v in hits.items():
            for h in v[:5]:
                print(f"  [{cat}] {h}")
    sys.exit(1 if n else 0)


if __name__ == "__main__":
    main()

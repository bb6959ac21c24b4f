#!/usr/bin/env python3
"""Judgeability cross-checks:

1. Every query key recorded in the newest CORRECTNESS_r*.json must
   have a row in SURVEY.md §8 (word-boundary match, so dd_incremental
   cannot ride on dd_incremental_persisted's row).
2. Every measurement SURVEY.md §8 cites as `BASELINE.md#<case>@<mult>`
   must exist in BASELINE.md as a table row carrying the matching
   `[#<case>@<mult>]` anchor — and not be a did-not-complete record.
   (Round 10 committed a SURVEY claim of a green 1000x semdedup row
   that BASELINE.md never contained; this makes that overclaim a
   mechanical failure. A SURVEY measurement claim without a citation
   token is invisible to this check, so claims MUST use the token
   form.)

SurveyContractSpec is the in-JVM twin checking the LIVE
SparkEntry.queries registry; this script checks the recorded driver
artifact without needing sbt.

Usage: python3 scripts/check_survey.py   (from the repo root)
Exit 0 = contract holds; 1 = violations (printed).
"""
import glob
import json
import re
import sys


def main():
    survey = open("SURVEY.md", encoding="utf-8").read()
    idx = survey.find("## 8.")
    if idx < 0:
        print("SURVEY.md has no '## 8.' coverage-matrix header")
        return 1
    sec8 = survey[idx:]
    bad = 0

    runs = sorted(glob.glob("CORRECTNESS_r*.json"))
    if not runs:
        print("no CORRECTNESS_r*.json found — skipping the key check")
    else:
        keys = sorted(json.load(open(runs[-1])).keys())
        missing = [k for k in keys
                   if not re.search(r"(?<![A-Za-z0-9_])" + re.escape(k)
                                    + r"(?![A-Za-z0-9_])", sec8)]
        if missing:
            print(f"{runs[-1]}: {len(missing)} keys missing a SURVEY §8 row:")
            for k in missing:
                print(f"  {k}")
            bad = 1
        else:
            print(f"{runs[-1]}: all {len(keys)} query keys have SURVEY §8 rows")

    baseline = open("BASELINE.md", encoding="utf-8").read()
    anchored = {m.group(1): line
                for line in baseline.splitlines()
                for m in re.finditer(r"\[#([A-Za-z0-9_.-]+@[0-9]+x)\]", line)}
    cites = sorted(set(re.findall(r"BASELINE\.md#([A-Za-z0-9_.-]+@[0-9]+x)", sec8)))
    dangling = []
    for c in cites:
        row = anchored.get(c)
        if row is None or not row.lstrip().startswith("|"):
            dangling.append((c, "no anchored BASELINE.md table row"))
        elif "did not complete" in row:
            dangling.append((c, "cited row is a did-not-complete record"))
    if dangling:
        print(f"{len(dangling)} SURVEY §8 citations without a real BASELINE.md row:")
        for c, why in dangling:
            print(f"  BASELINE.md#{c}: {why}")
        bad = 1
    else:
        print(f"all {len(cites)} SURVEY §8 BASELINE.md citations resolve to "
              "measured rows")
    return bad


if __name__ == "__main__":
    sys.exit(main())

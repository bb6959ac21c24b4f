#!/usr/bin/env python3
"""Judgeability cross-check: every query key recorded in the newest
CORRECTNESS_r*.json must have a row in SURVEY.md §8 (word-boundary
match, so dd_incremental cannot ride on dd_incremental_persisted's
row). SurveyContractSpec is the in-JVM twin checking the LIVE
SparkEntry.queries registry; this script checks the recorded driver
artifact without needing sbt.

Usage: python3 scripts/check_survey.py   (from the repo root)
Exit 0 = contract holds; 1 = missing rows (printed).
"""
import glob
import json
import re
import sys


def main():
    runs = sorted(glob.glob("CORRECTNESS_r*.json"))
    if not runs:
        print("no CORRECTNESS_r*.json found — nothing to check")
        return 0
    keys = sorted(json.load(open(runs[-1])).keys())
    survey = open("SURVEY.md", encoding="utf-8").read()
    sec8 = survey[survey.index("## 8."):]
    missing = [k for k in keys
               if not re.search(r"(?<![A-Za-z0-9_])" + re.escape(k)
                                + r"(?![A-Za-z0-9_])", sec8)]
    if missing:
        print(f"{runs[-1]}: {len(missing)} keys missing a SURVEY §8 row:")
        for k in missing:
            print(f"  {k}")
        return 1
    print(f"{runs[-1]}: all {len(keys)} query keys have SURVEY §8 rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())

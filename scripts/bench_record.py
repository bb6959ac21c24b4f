#!/usr/bin/env python3
"""The round's bench-record protocol (r18 — VERDICT r17 'what's wrong
#3' formalized): one committed record per round, taken under the
repo's measurement discipline:

1. Refuse to start unless 1-minute loadavg < the bar (default 1.0) —
   a record launched into ambient load carries host uncertainty no
   post-hoc ratio argument can remove.
2. Run the normal min-of-N full-pass sweep (graft.Bench).
3. Re-run any query whose per-pass spread exceeds 2x ONE-CASE-PER-JVM
   (a fresh sbt runMain per query, SPARK_GRAFT_ONLY=<q>) and fold the
   min back into the record — an outlier pass in a shared sweep is
   ambient noise or JVM state, and the repo's rule is to re-measure it
   in isolation, not to adjudicate it by argument.
4. Write the final record to BENCH_FULL.json with a `protocol` stamp
   (loadavg at start, re-run queries, spreads before/after).

Usage: python3 scripts/bench_record.py [--sf-dir /root/testdata/sf0.1]
       [--runs 2] [--load-bar 1.0] [--out BENCH_FULL.json]
Exit 0 = record written; 2 = refused (load); 1 = bench failure.
"""
import argparse
import json
import os
import subprocess
import sys


def loadavg1():
    with open("/proc/loadavg", encoding="utf-8") as f:
        return float(f.read().split()[0])


def run_bench(env_extra, out_path):
    env = dict(os.environ)
    env.update(env_extra)
    env["SPARK_GRAFT_BENCH_OUT"] = out_path
    r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       env=env, capture_output=True, text=True)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-2000:] + r.stderr[-2000:])
        raise RuntimeError("bench run failed")
    return json.load(open(out_path, encoding="utf-8"))


def spread(runs):
    ok = [t for t in runs if t >= 0]
    if len(ok) < 2 or min(ok) <= 0:
        return 1.0
    return max(ok) / min(ok)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", default="2")
    ap.add_argument("--load-bar", type=float, default=1.0)
    ap.add_argument("--spread-bar", type=float, default=2.0)
    ap.add_argument("--out", default="BENCH_FULL.json")
    args = ap.parse_args()

    load0 = loadavg1()
    if load0 >= args.load_bar:
        print(f"REFUSED: loadavg {load0} >= bar {args.load_bar} — "
              "wait for a quiet box; a committed record must not carry "
              "ambient-load uncertainty")
        return 2

    tmp = args.out + ".sweep"
    rec = run_bench({"SPARK_GRAFT_SF_DIR": args.sf_dir,
                     "SPARK_GRAFT_RUNS": args.runs}, tmp)
    outliers = {name: row for name, row in rec["queries"].items()
                if spread(row["runs"]) > args.spread_bar}
    protocol = {"loadavg_start": load0, "spread_bar": args.spread_bar,
                "reruns": {}}
    for name, row in sorted(outliers.items()):
        before = spread(row["runs"])
        iso = args.out + f".iso.{name}"
        iso_rec = run_bench({"SPARK_GRAFT_SF_DIR": args.sf_dir,
                             "SPARK_GRAFT_RUNS": args.runs,
                             "SPARK_GRAFT_ONLY": name}, iso)
        iso_row = iso_rec["queries"][name]
        merged = row["runs"] + iso_row["runs"]
        ok = [t for t in merged if t >= 0]
        rec["queries"][name]["runs"] = merged
        rec["queries"][name]["min"] = min(ok) if ok else -1.0
        protocol["reruns"][name] = {
            "sweep_spread": round(before, 2),
            "iso_runs": iso_row["runs"],
            "final_min": rec["queries"][name]["min"]}
        os.remove(iso)
        print(f"rerun {name}: sweep spread {before:.2f}x, "
              f"iso {iso_row['runs']} -> min {rec['queries'][name]['min']}")
    rec["value"] = sum(r["min"] for r in rec["queries"].values()
                       if r["min"] >= 0)
    rec["protocol"] = protocol
    with open(args.out, "w", encoding="utf-8") as f:
        f.write(json.dumps(rec) + "\n")
    os.remove(tmp)
    n = len(rec["queries"])
    print(f"RECORD: {rec['value']:.1f} s / {n} queries, "
          f"loadavg_start {load0}, reruns {len(protocol['reruns'])}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

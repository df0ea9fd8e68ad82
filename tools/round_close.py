#!/usr/bin/env python3
"""Machine-derive the round-close SWEEP entries from artifacts.

r17 verdict item 7: a hand-written round-close entry went stale
("15 OK(replay)" written mid-round while README/judge counted 25) —
so the close-of-round numbers must come from the artifacts, never
from prose. This reads the check.py output logs (one per SF) and a
bench.json, and prints the `round_close_*` JSON object to paste (or
merge) into SWEEP_r{N}.json.

r19 verdict item 1: the same clobber class hit SPECGATES.json — a
dev-loop sf0.001 gate run sat in the tree at snapshot time and the
committed artifact of record said the round ended 38/40 (the values
were simply the deterministic sf0.001 readings). So the gate artifact
gets the BENCH_STANDING treatment here: --specgates takes a
provenance-stamped gates JSON (written by GateRun with
SPARK_GRAFT_GATES_OUT, or Verify's copy), validates that its git SHA
matches the CURRENT HEAD and is not dirty, that it was measured at
the expected SF, and that it is a FULL run (gate count), then blesses
it as SPECGATES_STANDING.json. A failed validation exits non-zero —
a stale or off-SF file must never become the standing record.

Usage:
  python3 tools/round_close.py \
      --check sf0.001=/tmp/check_sf0.001.log \
      --check sf0.01=/tmp/check_sf0.01.log \
      --check sf0.1=/tmp/check_sf0.1.log \
      --bench BENCH_STANDING.json \
      [--test-log /tmp/sbt_test.log] \
      [--specgates /tmp/gates_sf0.1.json --specgates-sf sf0.1 \
       --standing-out SPECGATES_STANDING.json]
"""
import argparse
import json
import os
import re
import subprocess
import sys


def parse_check_log(path):
    ok_oracle = ok_replay = ok_rows = empty = degraded = fails = 0
    all_green = False
    with open(path) as f:
        for line in f:
            if line.startswith("OK(replay)"):
                ok_replay += 1
            elif line.startswith("OK(rows)"):
                ok_rows += 1
            elif line.startswith("OK "):
                ok_oracle += 1
            elif line.startswith("EMPTY"):
                empty += 1
            elif line.startswith("DEGRADED  "):
                degraded += 1
            elif line.startswith("FAIL  "):
                fails += 1
            elif line.strip() == "all green":
                all_green = True
    return {
        "all_green": all_green,
        "ok_oracle": ok_oracle,
        "ok_replay": ok_replay,
        "ok_rows_only": ok_rows,
        "empty": empty,
        "degraded": degraded,
        "failures": fails,
        "total_checked": ok_oracle + ok_replay + ok_rows + empty,
    }


def parse_test_log(path):
    # sbt summary line: "[info] Tests: succeeded 306, failed 0, ..."
    pat = re.compile(r"Tests: succeeded (\d+), failed (\d+)")
    res = None
    with open(path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                res = {"succeeded": int(m.group(1)),
                       "failed": int(m.group(2))}
    return res


def bless_specgates(path, expect_sf, out_path, min_gates=30):
    """Validate a provenance-stamped gates JSON and copy it to the
    standing artifact. Returns a summary dict; exits non-zero on any
    validation failure (never silently blesses)."""
    g = json.load(open(path))
    prov = g.get("_provenance")
    if not prov:
        sys.exit(f"specgates {path}: no _provenance stamp — refusing "
                 "to bless an unstamped artifact")
    head = subprocess.run(["git", "rev-parse", "HEAD"],
                          capture_output=True, text=True).stdout.strip()
    sha = prov.get("git_sha", "")
    if sha.endswith("-dirty"):
        sys.exit(f"specgates {path}: measured on a DIRTY tree "
                 f"({sha}) — commit first, then re-run the gates")
    if head and sha != head:
        sys.exit(f"specgates {path}: measured at {sha[:12]} but HEAD "
                 f"is {head[:12]} — re-run the gates at the final SHA")
    if expect_sf and not g.get("_sf", "").rstrip("/").endswith(expect_sf):
        sys.exit(f"specgates {path}: _sf={g.get('_sf')!r} does not "
                 f"match expected {expect_sf!r}")
    gates = {k: v for k, v in g.items() if not k.startswith("_")}
    if len(gates) < min_gates:
        sys.exit(f"specgates {path}: only {len(gates)} gates — a "
                 f"subset run cannot become the standing record "
                 f"(expected >= {min_gates})")
    fails = sorted(k for k, v in gates.items() if not v.get("pass"))
    with open(path) as f_in, open(out_path, "w") as f_out:
        f_out.write(f_in.read())
    return {
        "artifact": out_path,
        "git_sha": sha,
        "sf": g.get("_sf"),
        "cpus": prov.get("cpus"),
        "written_at": prov.get("written_at"),
        "gates_total": len(gates),
        "gates_passed": len(gates) - len(fails),
        "failed": fails,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="append", default=[],
                    metavar="SF=LOG", help="sf label = check.py log path")
    ap.add_argument("--bench", help="standing bench artifact (JSON)")
    ap.add_argument("--test-log", help="sbt test output log")
    ap.add_argument("--specgates",
                    help="provenance-stamped gates JSON from a full "
                         "GateRun/Verify at the final SHA")
    ap.add_argument("--specgates-sf", default="sf0.1",
                    help="SF the standing gate record must be "
                         "measured at (default sf0.1, the driver's)")
    ap.add_argument("--standing-out", default="SPECGATES_STANDING.json",
                    help="where to write the blessed standing artifact")
    args = ap.parse_args()

    out = {}
    verify = {}
    for spec in args.check:
        sf, _, path = spec.partition("=")
        if not path:
            sys.exit(f"--check must be SF=LOG, got {spec!r}")
        verify[sf] = parse_check_log(path)
    if verify:
        out["round_close_verify"] = verify
    if args.bench:
        b = json.load(open(args.bench))
        cal = b.get("calibration", {})
        out["round_close_bench"] = {
            "artifact": args.bench,
            "value_sec": b.get("value"),
            "total_median_sec": b.get("total_median"),
            "total_normalized": b.get("total_normalized"),
            "calib_start_end": [cal.get("single_core_sec_start"),
                                cal.get("single_core_sec_end")],
            "loadavg_start_end": [cal.get("loadavg_start"),
                                  cal.get("loadavg_end")],
            "sf": b.get("sf"),
            "n_queries": len(b.get("queries", {})),
        }
    if args.test_log:
        t = parse_test_log(args.test_log)
        if t is not None:
            out["round_close_tests"] = t
    if args.specgates:
        out["round_close_specgates"] = bless_specgates(
            args.specgates, args.specgates_sf, args.standing_out)
    json.dump(out, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Attribute bench deltas between two bench.json artifacts.

Usage: python3 tools/compare_bench.py <old_bench.json> <new_bench.json>
       [--ratio=1.25] [--abs=0.05]

For every query whose min moved by more than --ratio AND --abs in
either direction, classify the move from the artifact's own
provenance (round 14 on, each runs{} entry carries `load1_slot` and
`calib_tick_sec` sampled at the query's slot start):

  host-suspect  - the slower artifact's slot shows elevated load
                  (load1_slot >= 3) or a stretched calibration tick
                  (calib_tick_sec >= 1.15x the idle floor, taken as
                  the run's own minimum tick), OR the faster side has
                  no provenance fields (pre-r14 artifact).
  code-suspect  - the slower side's slot reads idle on both signals;
                  nothing in the artifact explains the move.

The classification is a triage, not a verdict: the 1-minute loadavg
lags short spikes and the tick precedes the reps, so a burst landing
mid-rep can still read idle (r14 measured exactly this on q01 - the
committed 1.71x did not reproduce in 5 quiet reps). code-suspect
means "re-measure with a scoped SPARK_GRAFT_ONLY run", never "revert
the round". Exits 0 always; this is a report, not a gate.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def idle_tick(bench):
    ticks = [r.get("calib_tick_sec") for r in bench.get("runs", {}).values()
             if isinstance(r, dict) and r.get("calib_tick_sec")]
    return min(ticks) if ticks else None


def classify(run, floor):
    """(suspect_host: bool, why: str) for one runs{} entry."""
    if not isinstance(run, dict):
        return True, "no runs entry"
    load = run.get("load1_slot")
    tick = run.get("calib_tick_sec")
    if load is None and tick is None:
        return True, "no slot provenance (pre-r14 artifact)"
    why = []
    if load is not None and load >= 3:
        why.append(f"load1_slot {load}")
    if tick is not None and floor and tick >= 1.15 * floor:
        why.append(f"tick {tick} vs floor {floor:.3f}")
    return (bool(why), ", ".join(why) if why else "slot idle")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {a.split("=")[0].lstrip("-"): float(a.split("=")[1])
            for a in sys.argv[1:] if a.startswith("--") and "=" in a}
    ratio = opts.get("ratio", 1.25)
    min_abs = opts.get("abs", 0.05)
    old, new = load(args[0]), load(args[1])
    floor_old, floor_new = idle_tick(old), idle_tick(new)
    movers = []
    for name, nv in sorted(new.get("queries", {}).items()):
        ov = old.get("queries", {}).get(name)
        if ov is None or min(ov, nv) <= 0:
            continue
        if abs(nv - ov) < min_abs:
            continue
        r = nv / ov
        if r >= ratio or r <= 1 / ratio:
            movers.append((r, name, ov, nv))
    regressions = [m for m in movers if m[0] > 1]
    wins = [m for m in movers if m[0] < 1]
    code_suspects = []
    print(f"old total {old.get('value')}  new total {new.get('value')}  "
          f"({len(regressions)} up, {len(wins)} down at "
          f">= {ratio}x and >= {min_abs}s)")
    for r, name, ov, nv in sorted(regressions, reverse=True):
        run = new.get("runs", {}).get(name)
        host, why = classify(run, floor_new)
        tag = "host-suspect" if host else "CODE-suspect"
        if not host:
            code_suspects.append(name)
        print(f"  UP   {name:32s} {ov:7.3f} -> {nv:7.3f} ({r:5.2f}x)  "
              f"{tag}: {why}")
    for r, name, ov, nv in sorted(wins):
        # a win on an idle slot is credible as-is; one on a loaded
        # slot is a floor that survived noise - report load anyway
        run = new.get("runs", {}).get(name)
        _, why = classify(run, floor_new)
        print(f"  DOWN {name:32s} {ov:7.3f} -> {nv:7.3f} ({r:5.2f}x)  "
              f"[{why}]")
    if code_suspects:
        only = ",".join(q.split("_")[0] for q in code_suspects)
        print(f"\nre-measure code-suspects scoped and quiet:\n"
              f"  SPARK_GRAFT_ONLY={only} SPARK_GRAFT_REPS=5 "
              f"SPARK_GRAFT_BENCH_OUT=/tmp/recheck.json "
              f"sbt -batch 'runMain graft.Bench'")


if __name__ == "__main__":
    main()

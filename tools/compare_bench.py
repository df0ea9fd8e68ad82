#!/usr/bin/env python3
"""Attribute bench deltas between two bench.json artifacts.

Usage: python3 tools/compare_bench.py <old_bench.json> <new_bench.json>
       [--ratio=1.25] [--abs=0.05]

For every query whose min moved by more than --ratio AND --abs in
either direction, classify the move from the SLOWER artifact's own
provenance — for a regression that is the NEW run, for a win it is
the OLD run (r14 ADVICE: classifying the faster side made a win
caused by a load spike in the old run print "[slot idle]" and look
credible). Each runs{} entry carries, r14 on, `load1_slot` and
`calib_tick_sec` sampled at the slot's start, and, r15 on,
`calib_tick_end_sec` (post-reps) and `reps_sec` (every rep's wall in
run order):

  host-suspect  - the slower side's slot shows elevated load
                  (load1_slot >= 3) or a stretched calibration tick
                  on EITHER side of the reps (>= 1.15x the floor:
                  min over the run's ticks, and the run's own
                  calibrate-derived expected tick when present — the
                  absolute floor a uniformly loaded run can't fake).
  unprovenanced - the slower side has no slot fields (pre-r14
                  artifact): missing data, not measured load —
                  credibility unknown, not discredited (r15 ADVICE).
  burst-suspect - the slot's signals read idle but its own reps
                  disagree >= 2x (a sub-slot burst hit some reps and
                  lagged both the 1-min loadavg and the bracketing
                  ticks — r14's q01/q03/q98 pattern). The min may
                  still be clean; re-measure before believing it.
  code-suspect  - the slower side's slot reads idle on every signal
                  and its reps agree; nothing in the artifact
                  explains the move.

Movers whose warm-family membership CHANGED between the artifacts
are additionally annotated [warm-family changed] and never counted
code-suspect: joining the warm family moves one-time build cost out
of the measured reps, so the delta is accounting, not kernel
(README bench protocol).

Movers whose REP COUNT differs between the artifacts (r16's adaptive
sub-second reps changed n per slot) are compared on MEDIANS instead
of mins and tagged [n-changed]: min is monotonically non-increasing
in sample count, so a min compare across an n asymmetry
systematically credits the higher-n side (r16 ADVICE, enforced).

The header also prints value/calibration for both artifacts — the
normalized ratio cancels the host's uniform per-core drift, so a
12% day-drift reads as ~1.0x normalized instead of a fleet of fake
movers (r16 verdict item 5).

The classification is a triage, not a verdict: code-suspect means
"re-measure with a scoped SPARK_GRAFT_ONLY run", never "revert the
round". Exits 0 always; this is a report, not a gate.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def idle_tick(bench):
    ticks = [r.get(k) for r in bench.get("runs", {}).values()
             if isinstance(r, dict)
             for k in ("calib_tick_sec", "calib_tick_end_sec")
             if r.get(k)]
    expected = bench.get("calibration", {}).get("calib_tick_expected_sec")
    if expected:
        ticks.append(expected)
    return min(ticks) if ticks else None


def classify(run, floor):
    """(kind: 'host'|'burst'|'code'|'noprov', why: str) for one runs{}
    entry. 'noprov' is missing data, NOT measured load (r15 ADVICE):
    a pre-r14 artifact without slot fields must print 'credibility
    unknown', never 'loaded' — mislabeling absence as measurement."""
    if not isinstance(run, dict):
        return "noprov", "no runs entry"
    load = run.get("load1_slot")
    tick = run.get("calib_tick_sec")
    tick_end = run.get("calib_tick_end_sec")
    if load is None and tick is None:
        return "noprov", "no slot provenance (pre-r14 artifact)"
    why = []
    if load is not None and load >= 3:
        why.append(f"load1_slot {load}")
    for label, t in (("tick", tick), ("tick_end", tick_end)):
        if t is not None and floor and t >= 1.15 * floor:
            why.append(f"{label} {t} vs floor {floor:.3f}")
    if why:
        return "host", ", ".join(why)
    reps = run.get("reps_sec")
    if reps and len(reps) >= 2 and min(reps) > 0:
        # skip the cold rep of non-warm queries: plan/codegen cost
        # makes rep 1 legitimately slower than the steady state
        warm = reps if run.get("warmed") else reps[1:]
        if len(warm) >= 2 and max(warm) >= 2 * min(warm) \
                and max(warm) >= 0.1:
            return "burst", (f"reps disagree {max(warm)/min(warm):.1f}x "
                             f"({min(warm):.2f}-{max(warm):.2f}s), "
                             f"slot signals idle")
    return "code", "slot idle"


def warm_changed(old_run, new_run):
    if not isinstance(old_run, dict) or not isinstance(new_run, dict):
        return False
    ow, nw = old_run.get("warmed"), new_run.get("warmed")
    return ow is not None and nw is not None and ow != nw


def stat_for(old_run, new_run, ov, nv):
    """(old_val, new_val, n_note): the values to compare for one
    query. min-vs-min is only a fair compare at EQUAL rep counts —
    min is monotonically non-increasing in sample count, so an n
    asymmetry (r16's adaptive sub-second reps: 3 -> up to 9)
    systematically credits the higher-n side (r16 ADVICE /
    bench_subsecond_min_bias_note, now enforced here instead of
    living in prose). When n differs and both sides recorded a
    median, compare medians and say so; otherwise fall back to the
    min compare with the asymmetry still named."""
    if isinstance(old_run, dict) and isinstance(new_run, dict):
        on, nn = old_run.get("n"), new_run.get("n")
        if on and nn and on != nn:
            om, nm = old_run.get("median"), new_run.get("median")
            if om and nm:
                return om, nm, f"n-changed {on}->{nn}, medians compared"
            return ov, nv, (f"n-changed {on}->{nn}, medians missing — "
                            f"min compare biased toward n={max(on, nn)}")
    return ov, nv, None


def normalized(bench):
    """value / single-core calibration (min of the start/end probes —
    the quieter read): the cross-round statistic that cancels the
    host's uniform per-core drift (r16 spent real wall re-litigating
    a 12% drift this one division makes visible)."""
    cal = bench.get("calibration") or {}
    ticks = [cal.get("single_core_sec_start"),
             cal.get("single_core_sec_end")]
    ticks = [t for t in ticks if t]
    v = bench.get("value")
    if not ticks or not v:
        return None
    return v / min(ticks)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {a.split("=")[0].lstrip("-"): float(a.split("=")[1])
            for a in sys.argv[1:] if a.startswith("--") and "=" in a}
    ratio = opts.get("ratio", 1.25)
    min_abs = opts.get("abs", 0.05)
    old, new = load(args[0]), load(args[1])
    floor_old, floor_new = idle_tick(old), idle_tick(new)
    movers = []
    for name, nv0 in sorted(new.get("queries", {}).items()):
        ov0 = old.get("queries", {}).get(name)
        if ov0 is None or min(ov0, nv0) <= 0:
            continue
        ov, nv, n_note = stat_for(old.get("runs", {}).get(name),
                                  new.get("runs", {}).get(name), ov0, nv0)
        if min(ov, nv) <= 0 or abs(nv - ov) < min_abs:
            continue
        r = nv / ov
        if r >= ratio or r <= 1 / ratio:
            movers.append((r, name, ov, nv, n_note))
    regressions = [m for m in movers if m[0] > 1]
    wins = [m for m in movers if m[0] < 1]
    code_suspects = []
    norm_old, norm_new = normalized(old), normalized(new)
    norm_note = ""
    if norm_old and norm_new:
        norm_note = (f"  normalized(value/calib) "
                     f"{norm_old:.2f} -> {norm_new:.2f} "
                     f"({norm_new / norm_old:.3f}x)")
    print(f"old total {old.get('value')}  new total {new.get('value')}  "
          f"({len(regressions)} up, {len(wins)} down at "
          f">= {ratio}x and >= {min_abs}s){norm_note}")
    for r, name, ov, nv, n_note in sorted(regressions, reverse=True):
        # the slower side of a regression is the NEW artifact
        kind, why = classify(new.get("runs", {}).get(name), floor_new)
        wflag = warm_changed(old.get("runs", {}).get(name),
                             new.get("runs", {}).get(name))
        tag = {"host": "host-suspect", "burst": "burst-suspect",
               "code": "CODE-suspect",
               "noprov": "unprovenanced (new side lacks slot fields)"}[kind]
        if wflag:
            tag = "accounting"
            why = "warm-family membership changed; " + why
        elif kind == "code":
            code_suspects.append(name)
        if n_note:
            why = f"[{n_note}] {why}"
        print(f"  UP   {name:32s} {ov:7.3f} -> {nv:7.3f} ({r:5.2f}x)  "
              f"{tag}: {why}")
    for r, name, ov, nv, n_note in sorted(wins):
        # the slower side of a WIN is the OLD artifact: a win caused
        # by a load spike in the old run must not print "[slot idle]"
        kind, why = classify(old.get("runs", {}).get(name), floor_old)
        wflag = warm_changed(old.get("runs", {}).get(name),
                             new.get("runs", {}).get(name))
        cred = {"host": "old-run-loaded, win NOT credible",
                "burst": "old-run-burst, win NOT credible",
                "code": "old slot idle, win credible",
                "noprov": "old run unprovenanced, credibility unknown"}[kind]
        if wflag:
            cred = "warm-family membership changed, win is accounting"
        if n_note:
            cred = f"{n_note}; {cred}"
        print(f"  DOWN {name:32s} {ov:7.3f} -> {nv:7.3f} ({r:5.2f}x)  "
              f"[{cred}: {why}]")
    if code_suspects:
        only = ",".join(q.split("_")[0] for q in code_suspects)
        print(f"\nre-measure code-suspects scoped and quiet:\n"
              f"  SPARK_GRAFT_ONLY={only} SPARK_GRAFT_REPS=5 "
              f"SPARK_GRAFT_BENCH_OUT=/tmp/recheck.json "
              f"sbt -batch 'runMain graft.Bench'")


if __name__ == "__main__":
    main()

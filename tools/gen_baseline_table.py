#!/usr/bin/env python3
"""Regenerate BASELINE.md's per-query table from tools/duckdb_times_sf01.json
(DuckDB oracle wall-clocks at sf0.1) and a fresh bench JSON line.

Usage: python3 tools/gen_baseline_table.py <bench.json> [--weak-only]
Prints the markdown table + totals; splice into BASELINE.md by hand.

The weak column marks rows on the CALIBRATED rule (round 13): engine >
T AND engine > 2x the DuckDB denominator, where T = 2.0 s scaled by the
campaign's fixed-cost floor probe. The probe is the median of the 50
smallest engine rows — those rows are pure per-query fixed cost (job
submit + tiny scan), so their level measures the HOST, not the code; a
fixed 2.0 s threshold made the weak count grow 13 -> 22 between r10 and
r12 on box slowdown alone (flat cpu series). FLOOR_REF anchors T to the
r10 campaign where the 2 s rule was set, so r10's weak set is unchanged
by construction and cross-round counts compare like for like.
"""
import json
import statistics
import sys

# fixed-cost floor probe of tools/bench_r10_merged.json, the campaign
# the original fixed 2 s threshold was calibrated against
FLOOR_REF = 0.2287
# cpu-second floor of the same 50-smallest-row probe, from the r12
# campaign (the first with a full queries_cpu series). The wall floor
# compensates for HOST drift; this cross-check catches the failure mode
# the r13 advice named — a code regression that slows the cheapest
# queries raises the wall floor and could mask genuinely weak rows. CPU
# seconds are steal-robust: flat cpu + higher wall = host; both up =
# engine (flagged below, calibration suspect).
CPU_FLOOR_REF = 0.0924
CPU_DRIFT_TOL = 0.30


def main(bench_path, weak_only=False):
    duck = json.load(open("tools/duckdb_times_sf01.json"))["duckdb_sec"]
    artifact = json.load(open(bench_path))
    bench = artifact["queries"]
    floor_names = sorted(
        (n for n in bench if not n.startswith("shared:")),
        key=bench.get)[:50]
    floor = statistics.median(bench[n] for n in floor_names)
    cpu_series = artifact.get("queries_cpu", {})
    cpu_vals = [cpu_series[n] for n in floor_names if n in cpu_series]
    thresh = 2.0 * floor / FLOOR_REF
    print(f"<!-- weak rule: engine > {thresh:.2f} s (= 2.0 s x floor probe "
          f"{floor:.4f} / {FLOOR_REF}) AND engine > 2x duckdb -->")
    if len(cpu_vals) >= 25:
        cpu_floor = statistics.median(cpu_vals)
        drift = cpu_floor / CPU_FLOOR_REF - 1.0
        verdict = ("OK: wall-floor moves are host drift"
                   if abs(drift) <= CPU_DRIFT_TOL else
                   "SUSPECT: cpu floor moved too — engine drift in the "
                   "cheapest rows; the calibrated threshold may be "
                   "masking regressions, audit before blessing")
        print(f"<!-- floor cross-check: cpu floor {cpu_floor:.4f} vs ref "
              f"{CPU_FLOOR_REF} ({drift:+.0%}, tol ±{CPU_DRIFT_TOL:.0%}) — "
              f"{verdict} -->")
    else:
        print("<!-- floor cross-check: no cpu series in this artifact — "
              "cannot separate host drift from engine drift -->")
    # one-time suite-shared builds (SharedRelations) have no DuckDB
    # denominator — the oracle pays the full pipeline per query instead.
    # They are listed and folded into the engine total so amortization
    # never hides cost (the r9 advice item).
    shared = {n: v for n, v in bench.items() if n.startswith("shared:")}
    names = sorted(set(duck) & set(bench))
    missing = sorted(n for n in (set(duck) ^ set(bench))
                     if not n.startswith("shared:"))
    if missing:
        print(f"<!-- WARNING: only in one side: {missing} -->")
    print("| query | duckdb sec (sf0.1) | engine sec (sf0.1) | ratio | weak |")
    print("|---|---|---|---|---|")
    td = te = 0.0
    weak = []
    for n in names:
        d, e = duck[n], bench[n]
        td += d
        te += e
        is_weak = e > thresh and e > 2.0 * d
        if is_weak:
            weak.append(n)
        if weak_only and not is_weak:
            continue
        print(f"| {n} | {d:.3f} | {e:.3f} | {e / d:.2f} |"
              f" {'WEAK' if is_weak else ''} |")
    for n, v in sorted(shared.items()):
        te += v
        print(f"| {n} (one-time shared build, no oracle row) | — | {v:.3f} "
              f"| — |  |")
    print(f"| **total ({len(names)} queries"
          f"{' + ' + str(len(shared)) + ' shared builds' if shared else ''})**"
          f" | **{td:.1f}** | **{te:.1f}** "
          f"| **{te / td:.3f}** | **{len(weak)} weak** |")


if __name__ == "__main__":
    main(sys.argv[1], "--weak-only" in sys.argv[2:])

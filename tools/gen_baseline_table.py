#!/usr/bin/env python3
"""Regenerate BASELINE.md's per-query table from tools/duckdb_times_sf01.json
(DuckDB oracle wall-clocks at sf0.1) and a fresh bench JSON line.

Usage: python3 tools/gen_baseline_table.py <bench.json> [--weak-only]
Prints the markdown table + totals; splice into BASELINE.md by hand.
The weak column marks rows on the judge's rule: engine > 2 s AND
engine > 2x the DuckDB denominator.
"""
import json
import sys


def main(bench_path, weak_only=False):
    duck = json.load(open("tools/duckdb_times_sf01.json"))["duckdb_sec"]
    bench = json.load(open(bench_path))["queries"]
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
        is_weak = e > 2.0 and e > 2.0 * d
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

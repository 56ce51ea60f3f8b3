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
    names = sorted(set(duck) & set(bench))
    missing = sorted(set(duck) ^ set(bench))
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
    print(f"| **total ({len(names)} queries)** | **{td:.1f}** | **{te:.1f}** "
          f"| **{te / td:.3f}** | **{len(weak)} weak** |")


if __name__ == "__main__":
    main(sys.argv[1], "--weak-only" in sys.argv[2:])

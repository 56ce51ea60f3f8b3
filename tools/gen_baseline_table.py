#!/usr/bin/env python3
"""Regenerate BASELINE.md's per-query table from tools/duckdb_times_sf01.json
(DuckDB oracle wall-clocks at sf0.1) and a fresh bench JSON line.

Usage: python3 tools/gen_baseline_table.py <bench.json>
Prints the markdown table + totals; splice into BASELINE.md by hand.
"""
import json
import sys


def main(bench_path):
    duck = json.load(open("tools/duckdb_times_sf01.json"))["duckdb_sec"]
    bench = json.load(open(bench_path))["queries"]
    names = sorted(set(duck) & set(bench))
    missing = sorted(set(duck) ^ set(bench))
    if missing:
        print(f"<!-- WARNING: only in one side: {missing} -->")
    print("| query | duckdb sec (sf0.1) | engine sec (sf0.1) | ratio |")
    print("|---|---|---|---|")
    td = te = 0.0
    for n in names:
        d, e = duck[n], bench[n]
        td += d
        te += e
        print(f"| {n} | {d:.3f} | {e:.3f} | {e / d:.2f} |")
    print(f"| **total ({len(names)} queries)** | **{td:.1f}** | **{te:.1f}** "
          f"| **{te / td:.3f}** |")


if __name__ == "__main__":
    main(sys.argv[1])

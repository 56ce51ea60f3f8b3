#!/usr/bin/env python3
"""Merge N full-suite bench JSONs into one median-across-runs artifact.

Round-10 bench protocol: instead of picking the cleanest of several
end-of-round runs (a selection rule that flatters), run the full suite
three times and take each query's MEDIAN across the runs' medians.
Also verifies the two noise gates the round-9 verdict set:
  - run totals agree within 5%
  - no query's cross-run median exceeds 3x its cross-run min
Shared one-time builds ("shared:<name>" rows) are medianed like any
other row and folded into the reported total.

Usage: python3 tools/merge_bench.py out.json run1.json run2.json ...
Prints the gate report to stderr; writes the merged bench JSON (same
shape gen_baseline_table.py consumes) to out.json.
"""
import json
import statistics
import sys


def main(out_path, run_paths):
    runs = [json.load(open(p)) for p in run_paths]
    totals = [r["value"] for r in runs]
    names = set()
    for r in runs:
        names |= set(r["queries"])
    merged = {}
    merged_min = {}
    spiky = []
    for n in sorted(names):
        vals = [r["queries"][n] for r in runs if n in r["queries"]]
        mins = [r.get("queries_min", {}).get(n, v)
                for r, v in zip(runs, vals) if n in r["queries"]]
        merged[n] = statistics.median(vals)
        merged_min[n] = min(mins)
        if merged[n] > 3.0 * min(mins) and merged[n] > 1.0:
            spiky.append((n, merged[n], min(mins)))
    total = sum(merged.values())
    spread = (max(totals) - min(totals)) / min(totals)
    print(f"[merge] {len(run_paths)} runs, totals "
          f"{['%.1f' % t for t in totals]} "
          f"(sum-of-merged-medians {total:.1f}), spread {spread * 100:.1f}% "
          f"{'OK (<=5%)' if spread <= 0.05 else 'FAIL (>5%)'}",
          file=sys.stderr)
    if spiky:
        print(f"[merge] {len(spiky)} rows with median > 3x min:",
              file=sys.stderr)
        for n, m, mn in sorted(spiky, key=lambda t: -t[1] / t[2]):
            print(f"  {n}: median {m:.2f} min {mn:.2f} "
                  f"({m / mn:.1f}x)", file=sys.stderr)
    else:
        print("[merge] no row median > 3x min: OK", file=sys.stderr)
    envs = [r.get("env") for r in runs]
    loads = [r.get("loadavg_initial") for r in runs]
    obj = {
        "metric": "total", "value": total, "unit": "sec",
        "queries": merged, "queries_min": merged_min,
        "errors": {}, "runs": len(run_paths), "run_totals": totals,
        "spread_pct": round(spread * 100, 2),
        "envs": envs, "loadavg_initials": loads,
        "gates": {"spread_ok": spread <= 0.05, "spiky_rows": len(spiky)},
    }
    with open(out_path, "w") as f:
        json.dump(obj, f)
    print(f"[merge] wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])

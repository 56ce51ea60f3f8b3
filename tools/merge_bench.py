#!/usr/bin/env python3
"""Merge N full-suite bench JSONs into one median-across-runs artifact.

Round-11 bench protocol: run the full suite three times and take each
query's MEDIAN across the runs' medians — with a RUN-ACCEPTANCE rule in
front, so one drifted run can no longer be averaged into the table:

  - a run whose total exceeds the minimum run's total by > 7% is
    REJECTED (re-run it on an idle machine); the merge uses accepted
    runs only and exits non-zero so a wrapper knows to re-run.
  - accepted-run totals must then agree within 5% (the round-9 gate).
  - no query's cross-run median may exceed 3x its cross-run min.

Per-run errors are unioned into the output (a query that errored in any
run is visible in the merged artifact, not silently medianed over the
remaining runs), and rows missing from some accepted run are listed in
the gate report and the artifact.

Shared one-time builds ("shared:<name>" rows) are medianed like any
other row and folded into the reported total.

Usage: python3 tools/merge_bench.py out.json run1.json run2.json ...
Prints the gate report to stderr; writes the merged bench JSON (same
shape gen_baseline_table.py consumes) to out.json. Exit 1 if any run
was rejected or fewer than 2 runs were accepted.
"""
import json
import statistics
import sys

REJECT_PCT = 0.07  # run total > min total * (1 + this) -> rejected


def main(out_path, run_paths):
    runs = [json.load(open(p)) for p in run_paths]
    all_totals = [r["value"] for r in runs]
    tmin = min(all_totals)
    accepted, rejected = [], []
    for p, r in zip(run_paths, runs):
        if r["value"] > tmin * (1.0 + REJECT_PCT):
            rejected.append((p, r["value"]))
        else:
            accepted.append((p, r))
    for p, t in rejected:
        print(f"[merge] REJECTED {p}: total {t:.1f} > min {tmin:.1f} "
              f"* {1 + REJECT_PCT} — re-run it on an idle machine",
              file=sys.stderr)
    runs = [r for _, r in accepted]
    totals = [r["value"] for r in runs]
    names = set()
    for r in runs:
        names |= set(r["queries"])
    merged = {}
    merged_min = {}
    merged_cpu = {}
    spiky = []
    partial = []
    for n in sorted(names):
        vals = [r["queries"][n] for r in runs if n in r["queries"]]
        mins = [r.get("queries_min", {}).get(n, v)
                for r, v in zip(runs, vals) if n in r["queries"]]
        cpus = [r["queries_cpu"][n] for r in runs
                if n in r.get("queries_cpu", {})]
        if len(vals) < len(runs):
            partial.append((n, len(vals)))
        merged[n] = statistics.median(vals)
        merged_min[n] = min(mins)
        if cpus:
            merged_cpu[n] = statistics.median(cpus)
        if merged[n] > 3.0 * min(mins) and merged[n] > 1.0:
            spiky.append((n, merged[n], min(mins)))
    errors = {}
    for p, r in accepted:
        for q, msg in (r.get("errors") or {}).items():
            errors.setdefault(q, {})[p] = msg
    total = sum(merged.values())
    spread = ((max(totals) - min(totals)) / min(totals)) if totals else 0.0
    print(f"[merge] {len(run_paths)} runs submitted, {len(runs)} accepted, "
          f"totals {['%.1f' % t for t in totals]} "
          f"(sum-of-merged-medians {total:.1f}), spread {spread * 100:.1f}% "
          f"{'OK (<=5%)' if spread <= 0.05 else 'FAIL (>5%)'}",
          file=sys.stderr)
    if partial:
        print(f"[merge] {len(partial)} rows present in fewer than "
              f"{len(runs)} accepted runs:", file=sys.stderr)
        for n, k in partial:
            print(f"  {n}: {k}/{len(runs)} runs", file=sys.stderr)
    if errors:
        print(f"[merge] {len(errors)} rows errored in >=1 accepted run: "
              f"{sorted(errors)}", file=sys.stderr)
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
        "queries_cpu": merged_cpu,
        "cpu_total": sum(merged_cpu.values()),
        "errors": errors, "runs": len(runs),
        "runs_submitted": len(run_paths), "run_totals": totals,
        "rejected_runs": [{"path": p, "total": t} for p, t in rejected],
        "partial_rows": [{"query": n, "runs": k} for n, k in partial],
        "spread_pct": round(spread * 100, 2),
        "envs": envs, "loadavg_initials": loads,
        "gates": {"accept_ok": not rejected and len(runs) >= 2,
                  "spread_ok": spread <= 0.05, "spiky_rows": len(spiky)},
    }
    with open(out_path, "w") as f:
        json.dump(obj, f)
    print(f"[merge] wrote {out_path}", file=sys.stderr)
    if rejected or len(runs) < 2:
        sys.exit(1)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])

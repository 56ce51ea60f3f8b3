#!/usr/bin/env python3
"""Build the scaling table from tools/scale_run.sh output: for every
query measured at sf0.1 and at the Kx corpus, the per-query scaling
exponent alpha = log10(t_Kx / t_1x) / log10(K) — alpha 1.0 = linear,
alpha < 1 = sublinear (fixed job floors amortizing), alpha > 1 =
superlinear (needs a reason or a fix). K defaults to 10.

Two series per query when the bench JSONs carry them (round 12+):
  wall   — wall-clock median (the blessed-table contract, but swings
           2-3x under hypervisor steal on this box)
  cpu    — task cpu-second median (steal-robust; the exponent the
           scale ladder TRUSTS when the two disagree)

Usage: python3 tools/scale_table.py [/tmp/scale_r9] [K]
"""
import glob
import json
import math
import sys


def load(pattern):
    wall, cpu = {}, {}
    for f in sorted(glob.glob(pattern)):
        d = json.load(open(f))
        wall.update(d["queries"])
        cpu.update(d.get("queries_cpu", {}))
        if d.get("errors"):
            print(f"<!-- errors in {f}: {d['errors']} -->")
    return wall, cpu


def main(outdir, k):
    lg = math.log10(k)
    one, one_cpu = load(f"{outdir}/*_sf01.json")
    ten, ten_cpu = load(f"{outdir}/*_sfx10.json")
    names = sorted(set(one) & set(ten),
                   key=lambda n: -math.log10(ten[n] / one[n]))
    print(f"| query | sf0.1 wall | {k}x wall | exp(wall) "
          f"| sf0.1 cpu | {k}x cpu | exp(cpu) |")
    print("|---|---|---|---|---|---|---|")
    for n in names:
        aw = math.log10(ten[n] / one[n]) / lg
        flag = " **check**" if aw > math.log10(1.5 * k) / lg else ""
        if n in one_cpu and n in ten_cpu and one_cpu[n] > 0:
            ac = math.log10(ten_cpu[n] / one_cpu[n]) / lg
            cpu_cells = (f"{one_cpu[n]:.2f} | {ten_cpu[n]:.2f} "
                         f"| {ac:.2f}")
        else:
            cpu_cells = "- | - | -"
        print(f"| {n} | {one[n]:.2f} | {ten[n]:.2f} | {aw:.2f}{flag} "
              f"| {cpu_cells} |")
    missing = sorted(set(one) ^ set(ten))
    if missing:
        print(f"<!-- only one scale measured: {missing} -->")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_r9",
         float(sys.argv[2]) if len(sys.argv) > 2 else 10.0)

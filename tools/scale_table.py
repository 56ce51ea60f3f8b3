#!/usr/bin/env python3
"""Build the round-9 scaling table from tools/scale_run.sh output:
for every query measured at sf0.1 and at the 10x corpus, the per-query
scaling exponent alpha = log10(t_10x / t_1x) — alpha 1.0 = linear,
alpha < 1 = sublinear (fixed job floors amortizing), alpha > 1 =
superlinear (needs a reason or a fix).

Usage: python3 tools/scale_table.py [/tmp/scale_r9]
"""
import glob
import json
import math
import sys


def main(outdir):
    one, ten = {}, {}
    one_min, ten_min = {}, {}
    for f in sorted(glob.glob(f"{outdir}/*_sf01.json")):
        d = json.load(open(f))
        one.update(d["queries"])
        one_min.update(d["queries_min"])
    for f in sorted(glob.glob(f"{outdir}/*_sfx10.json")):
        d = json.load(open(f))
        ten.update(d["queries"])
        ten_min.update(d["queries_min"])
        if d.get("errors"):
            print(f"<!-- errors in {f}: {d['errors']} -->")
    names = sorted(set(one) & set(ten),
                   key=lambda n: -math.log10(ten[n] / one[n]))
    print("| query | sf0.1 sec | 10x sec | ratio | exponent |")
    print("|---|---|---|---|---|")
    for n in names:
        r = ten[n] / one[n]
        a = math.log10(r)
        flag = " **check**" if a > math.log10(15) else ""
        print(f"| {n} | {one[n]:.2f} | {ten[n]:.2f} | {r:.1f}x "
              f"| {a:.2f}{flag} |")
    missing = sorted(set(one) ^ set(ten))
    if missing:
        print(f"<!-- only one scale measured: {missing} -->")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_r9")

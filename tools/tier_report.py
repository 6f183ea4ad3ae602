#!/usr/bin/env python3
"""Assemble the scale-tier table from tier_sweep.sh output dirs.

Usage: tier_report.py <sf1Dir> <sf10Dir>
Prints a markdown table: per query, wall and user-CPU seconds at each
tier plus the decade ratios. CPU (min across timed passes, parquet
route only) is the storm-immune column — see Bench.scala's cpuMin doc.
"""
import json, sys, os, glob

def load(d):
    out = {}
    for f in glob.glob(os.path.join(d, "*.detail.json")):
        q = os.path.basename(f)[:-len(".detail.json")]
        try:
            j = json.load(open(f))
            w = j["queries"].get(q)
            c = j.get("queries_cpu_sec", {}).get(q)
            r = j.get("jvm_stime_ratio")
            if w is not None and w >= 0:
                out[q] = (w, c, r)
        except Exception:
            pass
    return out

a, b = load(sys.argv[1]), load(sys.argv[2])
print("| query | sf1 wall | sf1 cpu | sf10 wall | sf10 cpu | wall x | cpu x |")
print("|---|---|---|---|---|---|---|")
rows = []
for q in sorted(set(a) | set(b)):
    wa, ca, _ = a.get(q, (None, None, None))
    wb, cb, _ = b.get(q, (None, None, None))
    wx = f"{wb/wa:.1f}x" if wa and wb else "-"
    cx = f"{cb/ca:.1f}x" if ca and cb else "-"
    f2 = lambda v: f"{v:.2f}" if v is not None else "-"
    print(f"| {q} | {f2(wa)} | {f2(ca)} | {f2(wb)} | {f2(cb)} | {wx} | {cx} |")

#!/usr/bin/env python3
"""Join two Bench JSON lines (sf0.1 and the synthetic 10x sf1) into a
markdown table of per-query times and growth ratios, sorted by ratio
descending. A ratio near 10 is linear scaling at local[32]; materially
above that marks a scale-cliff candidate.

Usage: scale_table.py <bench_sf01.log> <bench_sf1.log> [topN]
"""
import json
import re
import sys

def load(path):
    with open(path) as f:
        for line in f:
            m = re.search(r'\{"metric".*\}', line)
            if m:
                return json.loads(m.group(0))
    raise SystemExit(f"no bench JSON in {path}")

a = load(sys.argv[1])["queries"]
b = load(sys.argv[2])["queries"]
top = int(sys.argv[3]) if len(sys.argv) > 3 else 1000

common = sorted(
    (k for k in a if k in b and a[k] >= 0 and b[k] >= 0),
    key=lambda k: -(b[k] / max(a[k], 1e-9)))
print("| query | sf0.1 s | sf1 s | ratio |")
print("|---|---|---|---|")
for k in common[:top]:
    print(f"| {k} | {a[k]:.2f} | {b[k]:.2f} | {b[k]/max(a[k],1e-9):.1f}x |")
ta = sum(a[k] for k in common)
tb = sum(b[k] for k in common)
print(f"| **total ({len(common)} common)** | **{ta:.1f}** | "
      f"**{tb:.1f}** | **{tb/ta:.1f}x** |")
missing = [k for k in set(a) | set(b)
           if k not in common]
if missing:
    print(f"\nnot compared (failed/absent): {sorted(missing)}")

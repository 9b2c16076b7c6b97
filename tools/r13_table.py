#!/usr/bin/env python3
"""Emit the r13 full-set scale markdown table: per query, sf1 and sf10
2-pass minima from tools/r13_runs/full_sf{1,10}.json and the per-decade
ratio. Queries in the sf10 skip list (absent from full_sf10) are listed
separately with their sf1 row so the skip is visible, not silent.

Usage: python3 tools/r13_table.py [min_sf10_sec_for_flag]
"""
import json, sys

sf1j = json.load(open("tools/r13_runs/full_sf1.json"))
sf10j = json.load(open("tools/r13_runs/full_sf10.json"))
sf1, sf10 = sf1j["queries"], sf10j["queries"]
e1, e10 = sf1j.get("errors", {}), sf10j.get("errors", {})
flag_min = float(sys.argv[1]) if len(sys.argv) > 1 else 5.0

print("| query | sf1 s | sf10 s | sf1→sf10 |")
print("|---|---|---|---|")
flagged = []
for q in sorted(sf10, key=lambda q: -sf10[q]):
    a, t = sf1.get(q), sf10[q]
    r = t / a if a else None
    rs = f"{r:.1f}x" if r else "—"
    asx = f"{a:.2f}" if a is not None else "—"
    print(f"| {q} | {asx} | {t:.2f} | {rs} |")
    if r and r > 12 and t > flag_min:
        flagged.append((q, round(r, 1), round(t, 1)))
skipped = sorted(set(sf1) - set(sf10))
tot1 = sum(sf1.get(q, 0) for q in sf10)
tot10 = sum(sf10.values())
print(f"\nsf10 total {tot10:.1f} s vs same-set sf1 {tot1:.1f} s = "
      f"{tot10 / tot1:.2f}x for 10x data")
print(f"errors sf1: {e1}  sf10: {e10}")
print(f">12x/decade (> {flag_min}s at sf10): {flagged}")
print(f"sf10 skip list (ran at sf1 only): "
      + ", ".join(f"{q} ({sf1[q]:.2f}s)" for q in skipped))

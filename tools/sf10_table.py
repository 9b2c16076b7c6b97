#!/usr/bin/env python3
"""Emit the sf10 heavy-tail markdown table: per query, sf0.1 (v11 med),
sf1 and sf10 2-pass minima from the same-session heavy-tail runs, and
the per-decade ratios. Flags super-linear (>10x/decade) movers.

Usage: python3 tools/sf10_table.py
"""
import json, re

sf1 = json.load(open("tools/v11_runs/heavy_sf1.json"))["queries"]
sf10 = json.load(open("tools/v11_runs/heavy_sf10.json"))["queries"]
e1 = json.load(open("tools/v11_runs/heavy_sf1.json")).get("errors", {})
e10 = json.load(open("tools/v11_runs/heavy_sf10.json")).get("errors", {})

text = open("BASELINE.md").read()
ROW = r"^\| (\w+) \| ([0-9.]+)(?: \*)? \| ([0-9.]+) \|$"
med = {}
sec = text.split("## v11 — authoritative full-set recording", 1)[1]
sec = sec[:sec.find("\n## ")]
for m in re.finditer(ROW, sec, re.M):
    med[m.group(1)] = float(m.group(2))
assert med, "v11 table parse drifted"

print("| query | sf0.1 s (v11 med) | sf1 s | sf10 s | sf1→sf10 ratio |")
print("|---|---|---|---|---|")
flagged = []
for q in sorted(sf10, key=lambda q: -sf10[q]):
    b, a, t = med.get(q), sf1.get(q), sf10[q]
    r = t / a if a else None
    rs = f"{r:.1f}x" if r else "—"
    bs = f"{b:.2f}" if b is not None else "—"
    as_ = f"{a:.2f}" if a is not None else "—"
    print(f"| {q} | {bs} | {as_} | {t:.2f} | {rs} |")
    if r and r > 10 and t > 5:
        flagged.append((q, round(r, 1)))
print(f"\nsf10 total {sum(sf10.values()):.1f} s vs sf1 {sum(sf1.get(q,0) for q in sf10):.1f} s"
      f" = {sum(sf10.values())/sum(sf1.get(q,0) for q in sf10):.2f}x for 10x data")
print(f"errors sf1: {e1}  sf10: {e10}")
print(f">10x/decade (>5s): {flagged}")

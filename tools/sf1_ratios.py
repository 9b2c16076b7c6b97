#!/usr/bin/env python3
"""Join a full-set sf1 bench JSON against BASELINE.md's v10 sf0.1 medians
and emit the ratio table (markdown) sorted by sf1 cost, plus a summary.

Usage: python3 tools/sf1_ratios.py /tmp/bench_sf1.json
"""
import json, re, sys

bench = json.load(open(sys.argv[1]))
sf1 = bench["queries"]
errors = bench.get("errors", {})

# Parse the v10 per-query median table out of BASELINE.md.
text = open("BASELINE.md").read()
v10 = {}
sec = text.split("## v10 — authoritative full-set recording", 1)[1]
for m in re.finditer(r"^\| (\w+) \| ([0-9.]+) \| ([0-9.]+) \|$", sec, re.M):
    v10[m.group(1)] = float(m.group(2))
# Format drift in the table (e.g. a column-count change) fails the regex
# silently; make that loud instead of emitting an all-dash table.
assert v10, "no v10 rows parsed from BASELINE.md — table format drifted?"
# v11 delta rows (re-planned / newly-recorded queries) supersede v10.
if "## v11 — delta recording" in text:
    v11sec = text.split("## v11 — delta recording", 1)[1]
    for m in re.finditer(r"^\| (\w+) \| ([0-9.]+) \| ([0-9.]+) \|$", v11sec, re.M):
        v10[m.group(1)] = float(m.group(2))

rows = []
for q, t in sf1.items():
    base = v10.get(q)
    rows.append((q, t, base, (t / base) if base else None))
rows.sort(key=lambda r: -r[1])

print("| query | sf1 s | sf0.1 s (v10 med) | ratio for 10x data |")
print("|---|---|---|---|")
for q, t, base, ratio in rows:
    b = f"{base:.2f}" if base else "—"
    r = f"{ratio:.1f}x" if ratio else "—"
    print(f"| {q} | {t:.2f} | {b} | {r} |")

total = sum(sf1.values())
base_total = sum(v10[q] for q in sf1 if q in v10)
if base_total:
    print(f"\ntotal {total:.1f} s vs v10 {base_total:.1f} s = {total/base_total:.2f}x aggregate")
else:
    print(f"\ntotal {total:.1f} s; no benched query matches a baseline row")
print(f"errors: {len(errors)}: {list(errors)[:10]}")
hot = [(q, r) for q, t, b, r in rows if r and r >= 8 and t >= 1.0]
print(f">=8x scalers (>=1s at sf1): {hot}")

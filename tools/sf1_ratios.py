#!/usr/bin/env python3
"""Join a full-set scale-up bench JSON (sf1 or sf10) against BASELINE.md's
authoritative sf0.1 medians (v11, falling back to v10 for rows v11 lacks)
and emit the ratio table (markdown) sorted by cost, plus a summary.

Usage: python3 tools/sf1_ratios.py /tmp/bench_sf1.json [label]
"""
import json, re, sys

bench = json.load(open(sys.argv[1]))
sf1 = bench["queries"]
errors = bench.get("errors", {})
label = sys.argv[2] if len(sys.argv) > 2 else "sf1"

# Baseline medians: v10 table rows, superseded by v11 rows where present.
# Both tables are 3-column (| query | med | worst |); v11 marks
# 2-run-only medians with a trailing `*` inside the med cell.
text = open("BASELINE.md").read()
ROW = r"^\| (\w+) \| ([0-9.]+)(?: \*)? \| ([0-9.]+) \|$"
base_med = {}
parsed_any = False
for header in ("## v10 — full-set recording",
               "## v11 — authoritative full-set recording"):
    if header not in text:
        continue
    sec = text.split(header, 1)[1]
    nxt = sec.find("\n## ")
    if nxt != -1:
        sec = sec[:nxt]
    for m in re.finditer(ROW, sec, re.M):
        base_med[m.group(1)] = float(m.group(2))
        parsed_any = True
# Format drift in the table (e.g. a column-count or header change) fails
# the regex/split silently; make that loud instead of an all-dash table.
assert parsed_any and base_med, \
    "no baseline rows parsed from BASELINE.md — table format drifted?"

rows = []
for q, t in sf1.items():
    base = base_med.get(q)
    rows.append((q, t, base, (t / base) if base else None))
rows.sort(key=lambda r: -r[1])

print(f"| query | {label} s | sf0.1 s (v11 med) | ratio |")
print("|---|---|---|---|")
for q, t, base, ratio in rows:
    b = f"{base:.2f}" if base else "—"
    r = f"{ratio:.1f}x" if ratio else "—"
    print(f"| {q} | {t:.2f} | {b} | {r} |")

total = sum(sf1.values())
base_total = sum(base_med[q] for q in sf1 if q in base_med)
if base_total:
    print(f"\ntotal {total:.1f} s vs sf0.1 {base_total:.1f} s = {total/base_total:.2f}x aggregate")
else:
    print(f"\ntotal {total:.1f} s; no benched query matches a baseline row")
print(f"errors: {len(errors)}: {list(errors)[:10]}")
hot = [(q, round(r, 1)) for q, t, b, r in rows if r and r >= 8 and t >= 1.0]
print(f">=8x scalers (>=1s): {hot}")

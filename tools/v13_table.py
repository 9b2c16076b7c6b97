#!/usr/bin/env python3
"""Build the BASELINE v13 per-query med/worst table from the five
spaced fresh-JVM 2-pass Bench runs in tools/v13_runs/, and audit every
query against its v12 median (flagging >1.5x and >2x movers).

Usage: python3 tools/v13_table.py [--md]   (writes markdown to stdout)
"""
import glob, json, re, statistics, sys

# Recording runs only (run1..run5), same discipline as v12_table.py:
# any post-hoc validation runs must use a non-matching name.
RUNS = sorted(glob.glob("/root/repo/tools/v13_runs/run[0-9].json"))

def load():
    runs = []
    for p in RUNS:
        with open(p) as f:
            runs.append(json.load(f))
    return runs

def v12_medians():
    """Parse the v12 per-query table (| query | med | worst |) from
    BASELINE.md."""
    med = {}
    in_sec = False
    for line in open("/root/repo/BASELINE.md"):
        if line.startswith("## v12"):
            in_sec = True
            continue
        if in_sec and line.startswith("## "):
            break
        if in_sec:
            m = re.match(r"\|\s*([a-z0-9_]+)\s*\|\s*([\d.]+)\s*\*?\s*\|\s*([\d.]+)\s*\|\s*$", line)
            if m:
                med[m.group(1)] = float(m.group(2))
    assert med, "no v12 rows parsed from BASELINE.md - table format drifted?"
    return med

def main():
    runs = load()
    totals = [r["value"] for r in runs]
    errs = [r.get("errors", {}) for r in runs]
    for i, e in enumerate(errs):
        if e:
            print(f"!! run {i+1} errors: {e}", file=sys.stderr)
    names = sorted(set().union(*[set(r["queries"]) for r in runs]))
    rows = []
    for n in names:
        vals = [r["queries"][n] for r in runs if n in r["queries"]]
        rows.append((n, statistics.median(vals), max(vals), len(vals)))
    v12 = v12_medians()
    print(f"runs totals: {' / '.join(f'{t:.1f}' for t in totals)}")
    print(f"median total {statistics.median(totals):.1f} s, worst {max(totals):.1f} s, {len(names)} queries")
    viol15, viol2 = [], []
    for n, med, worst, k in rows:
        if n in v12 and v12[n] > 0.05:
            r = med / v12[n]
            if r > 2.0:
                viol2.append((n, v12[n], med, r))
            elif r > 1.5:
                viol15.append((n, v12[n], med, r))
    print(f"audit vs v12 medians: {len(viol2)} queries >2x, {len(viol15)} in (1.5x, 2x]")
    for n, b, m, r in sorted(viol2 + viol15, key=lambda x: -x[3]):
        print(f"  {n}: v12 {b:.2f} -> v13 {m:.2f} = {r:.2f}x")
    new = [n for n, *_ in rows if n not in v12]
    print(f"first-recorded in v13: {new}")
    if "--md" in sys.argv:
        print()
        print("| query | v13 med s | v13 worst s |")
        print("|---|---|---|")
        for n, med, worst, k in sorted(rows, key=lambda x: -x[1]):
            star = " *" if k < len(runs) else ""
            print(f"| {n} | {med:.2f}{star} | {worst:.2f} |")

if __name__ == "__main__":
    main()

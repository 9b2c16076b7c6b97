#!/usr/bin/env python3
"""Build the BASELINE v12 per-query med/worst table from the five
spaced fresh-JVM 2-pass Bench runs in tools/v12_runs/, and audit every
query against its v11 median (flagging >1.5x and >2x movers).

Usage: python3 tools/v12_table.py [--md]   (writes markdown to stdout)
"""
import glob, json, re, statistics, sys

# Recording runs only (run1..run5): run6_newcfg.json is the post-change
# memory-policy validation run, NOT part of the binding v12 recording —
# mixing it in would contaminate the documented five-run medians.
RUNS = sorted(glob.glob("/root/repo/tools/v12_runs/run[0-9].json"))

def load():
    runs = []
    for p in RUNS:
        with open(p) as f:
            runs.append(json.load(f))
    return runs

def v11_medians():
    """Parse the v11 per-query table (| query | med | worst |) from
    BASELINE.md."""
    med = {}
    in_v11 = False
    for line in open("/root/repo/BASELINE.md"):
        if line.startswith("## v11"):
            in_v11 = True
            continue
        if in_v11 and line.startswith("## "):
            break
        if in_v11:
            m = re.match(r"\|\s*([a-z0-9_]+)\s*\|\s*([\d.]+)\s*\|\s*([\d.]+)\s*\|\s*$", line)
            if m:
                med[m.group(1)] = float(m.group(2))
    assert med, "no v11 rows parsed from BASELINE.md - table format drifted?"
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
    v11 = v11_medians()
    med_total = statistics.median([sum(r["queries"].get(n, 0) for n, *_ in rows) for r in runs])
    print(f"runs totals: {' / '.join(f'{t:.1f}' for t in totals)}")
    print(f"median total {statistics.median(totals):.1f} s, worst {max(totals):.1f} s, {len(names)} queries")
    viol15, viol2 = [], []
    for n, med, worst, k in rows:
        if n in v11 and v11[n] > 0.05:
            r = med / v11[n]
            if r > 2.0:
                viol2.append((n, v11[n], med, r))
            elif r > 1.5:
                viol15.append((n, v11[n], med, r))
    print(f"audit vs v11 medians: {len(viol2)} queries >2x, {len(viol15)} in (1.5x, 2x]")
    for n, b, m, r in sorted(viol2 + viol15, key=lambda x: -x[3]):
        print(f"  {n}: v11 {b:.2f} -> v12 {m:.2f} = {r:.2f}x")
    new = [n for n, *_ in rows if n not in v11]
    print(f"first-recorded in v12: {new}")
    if "--md" in sys.argv:
        print()
        print("| query | v12 med s | v12 worst s |")
        print("|---|---|---|")
        for n, med, worst, k in sorted(rows, key=lambda x: -x[1]):
            star = " *" if k < len(runs) else ""
            print(f"| {n} | {med:.2f}{star} | {worst:.2f} |")

if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Per-query scaling table: compare two BENCH_SELF-style JSON lines
(same query set, different data scale) and flag super-linear growth.

Usage: scale_compare.py <bench_sf0.1.json> <bench_10x.json> [factor=10]
Reads the `queries` map of each file's single JSON line; prints a
markdown table sorted by scale factor descending, flagging any query
whose time grew more than `factor`x.
"""
import json, sys

def load(path):
    with open(path) as f:
        return json.loads(f.read().strip().splitlines()[-1])

def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qa, qb = a["queries"], b["queries"]
    rows = []
    for q in sorted(qa):
        if q not in qb or qa[q] <= 0 or qb[q] <= 0:
            continue
        r = qb[q] / qa[q]
        rows.append((r, q, qa[q], qb[q]))
    rows.sort(reverse=True)
    print("| query | 1x sec | 10x sec | ratio | flag |")
    print("|---|---|---|---|---|")
    for r, q, ta, tb in rows:
        flag = "**SUPER-LINEAR**" if r > factor else ""
        print(f"| {q} | {ta:.2f} | {tb:.2f} | {r:.1f}x | {flag} |")
    over = [q for r, q, _, _ in rows if r > factor]
    print(f"\ntotal: {a['value']:.1f}s -> {b['value']:.1f}s; "
          f"{len(over)} queries over {factor}x: {over}")

if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Window-attribution report over BENCH_SELF.json's per-rep columns.

Round-13 judging asked for quantitative IN-DRAW evidence that the
iterative tail's inflated rows are a degraded host window rather than
a plan defect. Bench.scala records, per rep: wall seconds (`spread`),
JVM GC pause seconds (`gc`), PSI some-stall seconds (`psi_cpu/io/mem`),
and a fixed-work copy-bandwidth probe run just before the rep
(`bw_mbs`). This script folds those into a per-query table:

  sec      the rep's wall time
  gc%      GC pause share of the wall (JVM-wide; local mode = the query)
  stall%   max(psi_cpu, psi_io, psi_mem) share of the wall
  bw       the pre-rep copy probe, MB/s (healthy ~4000-12000; host
           waves collapse it to the low hundreds)

A window-taxed rep reads: inflated sec + collapsed bw and/or high gc%/
stall%. A plan defect reads: inflated sec with healthy bw and low gc%.

Usage: window_report.py [BENCH_SELF.json] [--top N] [--all]
"""
import json
import sys


def main() -> None:
    path = "BENCH_SELF.json"
    top = 15
    show_all = False
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--top":
            top = int(args.pop(0))
        elif a == "--all":
            show_all = True
        else:
            path = a
    d = json.load(open(path))
    spread = d.get("spread", {})
    gc = d.get("gc", {})
    psi = {r: d.get(f"psi_{r}", {}) for r in ("cpu", "io", "mem")}
    bw = d.get("bw_mbs", {})
    if not spread:
        sys.exit(f"{path}: no per-rep spread — pre-r13 file?")

    rows = []
    for q, secs in spread.items():
        for i, sec in enumerate(secs):
            g = gc.get(q, [0] * len(secs))[i]
            stalls = [psi[r].get(q, [0] * len(secs))[i] for r in psi]
            b = bw.get(q, [0] * len(secs))[i]
            rows.append((q, i, sec, g, max(stalls), b))

    # rank queries by worst rep wall-time; print per-rep evidence
    by_q = {}
    for q, i, sec, g, st, b in rows:
        by_q.setdefault(q, []).append((i, sec, g, st, b))
    order = sorted(by_q, key=lambda q: -max(r[1] for r in by_q[q]))
    if not show_all:
        order = order[:top]
    print(f"{'query':28} {'rep':>3} {'sec':>8} {'gc%':>6} {'stall%':>7} {'bw_mbs':>8}")
    for q in order:
        for i, sec, g, st, b in by_q[q]:
            gp = 100 * g / sec if sec > 0 else 0
            sp = 100 * st / sec if sec > 0 else 0
            print(f"{q:28} {i + 1:>3} {sec:>8.2f} {gp:>5.0f}% {sp:>6.0f}% {b:>8.0f}")

    # draw-level summary
    allr = [(sec, g, st, b) for _, _, sec, g, st, b in rows]
    tot = sum(r[0] for r in allr)
    gct = sum(r[1] for r in allr)
    stt = sum(r[2] for r in allr)
    bws = sorted(r[3] for r in allr)
    print(f"\nreps={len(allr)} wall_total={tot:.1f}s gc_total={gct:.1f}s "
          f"({100 * gct / tot:.0f}%) stall_total={stt:.1f}s "
          f"bw min/med/max={bws[0]:.0f}/{bws[len(bws) // 2]:.0f}/{bws[-1]:.0f} MB/s")


if __name__ == "__main__":
    main()

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
  cpu/s    process CPU seconds per wall second (effective parallelism);
           -1 column absent (pre-cpu-column file)
  bw→bw2   the copy probe bracketing the rep, MB/s (healthy ~4000-12000;
           host waves collapse it)

The first degraded instrumented draw showed the wave is INVISIBLE to
in-guest stall meters (a 5x-inflated rep with gc 0%, PSI 0%, healthy
pre-probe): the cpu column discriminates — cpu/s near the healthy
rep's parallelism means the guest computed the whole time but each
cycle's memory was slow (host bandwidth steal); cpu/s far below means
threads waited. A plan defect reads: inflated sec with healthy
brackets, low gc%, and the same cpu/s as the healthy rep.

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
    cpu = d.get("cpu", {})
    bw2 = d.get("bw_post_mbs", {})
    prep = d.get("prep", {})
    if not spread:
        sys.exit(f"{path}: no per-rep spread — pre-r13 file?")

    rows = []
    for q, secs in spread.items():
        for i, sec in enumerate(secs):
            g = gc.get(q, [0] * len(secs))[i]
            stalls = [psi[r].get(q, [0] * len(secs))[i] for r in psi]
            b = bw.get(q, [0] * len(secs))[i]
            c = cpu.get(q, [-1] * len(secs))[i]
            b2 = bw2.get(q, [0] * len(secs))[i]
            p = prep.get(q, [0] * len(secs))[i]
            rows.append((q, i, sec, g, max(stalls), b, c, b2, p))

    # rank queries by worst rep wall-time; print per-rep evidence
    by_q = {}
    for q, i, sec, g, st, b, c, b2, p in rows:
        by_q.setdefault(q, []).append((i, sec, g, st, b, c, b2, p))
    order = sorted(by_q, key=lambda q: -max(r[1] for r in by_q[q]))
    if not show_all:
        order = order[:top]
    print(f"{'query':28} {'rep':>3} {'sec':>8} {'gc%':>6} {'stall%':>7} "
          f"{'cpu/s':>6} {'bw':>7} {'bw2':>7} {'prep':>6}")
    for q in order:
        for i, sec, g, st, b, c, b2, p in by_q[q]:
            gp = 100 * g / sec if sec > 0 else 0
            sp = 100 * st / sec if sec > 0 else 0
            cs = c / sec if (sec > 0 and c >= 0) else -1
            print(f"{q:28} {i + 1:>3} {sec:>8.2f} {gp:>5.0f}% {sp:>6.0f}% "
                  f"{cs:>6.1f} {b:>7.0f} {b2:>7.0f} {p:>6.2f}")

    # draw-level summary: both probe brackets (pre `bw`, post `bw2`)
    # fold into the bandwidth line — the post-rep probes sample the
    # windows the reps actually RAN in; guard tot=0 (all-sub-ms or
    # zeroed probe files must not ZeroDivisionError)
    tot = sum(r[2] for r in rows)
    gct = sum(r[3] for r in rows)
    stt = sum(r[4] for r in rows)
    bws = sorted([r[5] for r in rows] + [r[7] for r in rows if r[7] > 0])
    gcp = 100 * gct / tot if tot > 0 else 0
    bw_med = bws[len(bws) // 2]
    wclass = ("healthy" if bw_med >= 8000 else
              "mid" if bw_med >= 4000 else "low")
    print(f"\nreps={len(rows)} wall_total={tot:.1f}s gc_total={gct:.1f}s "
          f"({gcp:.0f}%) stall_total={stt:.1f}s "
          f"bw(pre+post) min/med/max={bws[0]:.0f}/{bw_med:.0f}/{bws[-1]:.0f} MB/s "
          f"window_class={d.get('window_class', wclass)}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Copy-bandwidth probe: single-worker and N-way aggregate MB/s.

This guest's RAM is host-overcommitted and its effective memory
bandwidth collapses in waves (PERF_NOTES §5: 881 MB/s single-worker
degrading to 166 MB/s aggregate at 32 workers, with no in-guest
signal). Log this probe next to any wall-clock measurement so a host
wave cannot masquerade as a config effect.

Usage: mem_probe.py [workers]   (default 8; prints one JSON line)
"""
import time, sys, multiprocessing as mp

SZ = 256 * 1024 * 1024


def worker(q):
    buf = bytearray(SZ)
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < 2.0:
        b2 = bytes(buf)  # one SZ-sized copy through RAM
        n += 1
        del b2
    dt = time.perf_counter() - t0
    q.put(n * SZ / dt / 1e6)


def run(workers):
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(q,)) for _ in range(workers)]
    for p in ps:
        p.start()
    vals = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(vals)


if __name__ == "__main__":
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    s1 = run(1)
    sN = run(w)
    print('{"probe_mb_s_1w": %.0f, "probe_mb_s_%dw": %.0f, "ts": "%s"}'
          % (s1, w, sN, time.strftime("%H:%M:%S")))

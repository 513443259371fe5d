"""Measure the sandbox's *effective* CPU capacity.

The VM reports 32 vCPUs (`nproc`), but the hypervisor enforces an
aggregate compute quota: a plain multiprocessing burn test shows total
throughput saturating at ~16 processes (measured 2026-08-17:
8 procs → 652 u/s, 16 → 1123 u/s, 32 → 1185 u/s — i.e. 32 vCPUs
deliver ~1.06x the work of 16). Any N→4N scaling measurement whose 4N
exceeds the quota measures the hypervisor, not the engine — so the
scaling evidence (tools/scaling_bench.py, BENCH/BASELINE.md) uses
local[4] → local[16], which stays inside the real capacity envelope.

Usage: python tools/cpu_capacity.py
"""

from __future__ import annotations

import multiprocessing as mp
import time


def _burn(q, seconds: float):
    x = 0
    t0 = time.time()
    n = 0
    while time.time() - t0 < seconds:
        for i in range(100_000):
            x += i * i
        n += 1
    q.put(n)


def aggregate_throughput(nproc: int, seconds: float = 8.0) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=_burn, args=(q, seconds)) for _ in range(nproc)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    return sum(q.get() for _ in ps) / seconds


def main():
    prev = None
    for nproc in (1, 4, 8, 16, 32):
        agg = aggregate_throughput(nproc)
        note = ""
        if prev is not None:
            note = f"  ({agg / prev[1]:.2f}x vs {prev[0]} procs)"
        print(f"{nproc:>2} procs: {agg:8.1f} units/s aggregate{note}")
        prev = (nproc, agg)


if __name__ == "__main__":
    main()

"""Host effective-parallelism probe — gate for scaling measurements.

The sandbox host is a shared VM whose DELIVERED cpu throughput varies
by multiples over hours (documented in BASELINE.md).  Load average
only sees guest-visible contention; the failure mode that corrupts
scaling runs is the host capping total throughput (oversubscription /
frequency scaling), which is invisible to loadavg on an idle guest.

This probe runs a fixed amount of pure zlib work at 8 and 32
processes and reports:

  * eff8  / eff32  — effective concurrent cores at each width
                     (cpu_sum / wall)
  * inflation      — cpu_sum32 / cpu_sum8: >1.3 means the host slows
                     per-vCPU as more vCPUs go busy (per-core
                     throughput is parallelism-dependent — scaling
                     measurements are meaningless)
  * speedup        — wall8 / wall32: ~1.0 means adding vCPUs adds no
                     throughput at all

A healthy window shows inflation ≈ 1.0 and speedup ≈ 3.5-4.
Measured 2026-08-19 09:35 (bad window): inflation 2.76, speedup 0.96
— the host delivered ~7 core-equivalents total at BOTH widths.

Usage: python tools/host_probe.py   → one JSON line + exit 0 if
healthy (inflation < 1.3 and speedup > 2.5), exit 1 otherwise.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time
import zlib

TOTAL = 640_000


def work(n: int) -> float:
    d = b"the quick brown fox jumps over the lazy dog " * 8
    t0 = time.process_time()
    for _ in range(n):
        c = zlib.compressobj(9, zlib.DEFLATED, -15, 6)
        c.compress(d)
        c.flush()
    return time.process_time() - t0


def measure(procs: int) -> tuple[float, float]:
    w0 = time.perf_counter()
    with mp.Pool(procs) as p:
        cpu = sum(p.map(work, [TOTAL // procs] * procs))
    return time.perf_counter() - w0, cpu


def main() -> int:
    wall8, cpu8 = measure(8)
    wall32, cpu32 = measure(32)
    out = {
        "wall8": round(wall8, 2), "wall32": round(wall32, 2),
        "eff8": round(cpu8 / wall8, 1), "eff32": round(cpu32 / wall32, 1),
        "inflation": round(cpu32 / cpu8, 2),
        "speedup": round(wall8 / wall32, 2),
        "healthy": cpu32 / cpu8 < 1.3 and wall8 / wall32 > 2.5,
    }
    print(json.dumps(out))
    return 0 if out["healthy"] else 1


if __name__ == "__main__":
    sys.exit(main())

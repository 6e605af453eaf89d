"""Spark-free CPU-scaling probe for the sandbox VM.

Measures aggregate throughput of a fixed numpy kernel at 1/8/16/32 worker
processes. Used to establish how many EFFECTIVE cores the VM delivers —
`nproc` reports 32, but hypervisor capping + memory bandwidth bound the real
budget (measured ~9-10 core-equivalents), which caps any 8→32 scaling
demonstration at ~1.5× regardless of engine quality. See BASELINE.md.
"""

from __future__ import annotations

import multiprocessing as mp
import time

import numpy as np


def burn(_):
    a = np.random.RandomState(0).standard_normal(500_000)
    t0 = time.perf_counter()
    it = 0
    while time.perf_counter() - t0 < 6.0:
        (a * 1.0001 + 0.5).sum()
        it += 1
    return it


def main() -> None:
    base = None
    for workers in (1, 2, 8, 16, 32):
        with mp.Pool(workers) as p:
            t0 = time.perf_counter()
            its = p.map(burn, [0] * workers)
            wall = time.perf_counter() - t0
        rate = sum(its) / wall
        base = base or rate
        print(
            f"workers={workers:2d} aggregate={rate:8.1f} it/s "
            f"speedup_vs_1={rate / base:5.2f}x"
        )


if __name__ == "__main__":
    main()

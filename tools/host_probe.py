"""Host throughput probe: measures delivered parallel CPU (sha256 hashing, GIL-free).

Prints units/s for 1 thread and N threads. ~200+ units/s at 32 threads means a
quiet window; <100 means external contention (see OPTIMIZATION_r12.md).
"""
from __future__ import annotations

import hashlib
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor


def unit() -> None:
    h = hashlib.sha256()
    b = b"x" * 65536
    for _ in range(400):
        h.update(b)


def rate(threads: int, units: int) -> float:
    t0 = time.time()
    with ThreadPoolExecutor(max_workers=threads) as ex:
        list(ex.map(lambda _: unit(), range(units)))
    return units / (time.time() - t0)


if __name__ == "__main__":
    n = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    r1 = rate(1, 4)
    rn = rate(n, max(64, 2 * n))
    print(f"single-thread: {r1:.1f} units/s; {n}-thread: {rn:.1f} units/s "
          f"(ideal ~{r1 * n:.0f}); delivered-cores ~{rn / r1:.1f}/{n}")

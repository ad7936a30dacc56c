#!/usr/bin/env python
"""Ambient-machine yardstick: a fixed, deterministic CPU workload whose
wall time calibrates every timing artifact produced in the same hour.

Why it exists (round 12): two identical full-registry sweeps of the
SAME tree, 90 minutes apart, measured common-set ratios of 1.20x and
1.60x vs round 11 — while the guest sat idle (load 0.09). The VM's
host steals cycles invisibly, so cross-round wall-clock comparisons
need an absolute reference measured next to them. Every offender from
the slow sweeps re-measured at its historical level minutes later
(BASELINE round-12), so this is ambient, not tree drift.

Workload: single-core md5 over a fixed 8 MiB buffer, 40 rounds, plus
an 8-thread variant — prints one JSON line with both wall times.
Bigger = slower machine. The r12 reference values are recorded in
BASELINE.md next to the artifacts they calibrate.
"""

from __future__ import annotations

import hashlib
import json
import time
from concurrent.futures import ThreadPoolExecutor

BUF = bytes(range(256)) * (8 * 1024 * 1024 // 256)
ROUNDS = 40


def one_core() -> float:
    t0 = time.perf_counter()
    h = b""
    for _ in range(ROUNDS):
        h = hashlib.md5(BUF + h).digest()
    return time.perf_counter() - t0


def eight_thread() -> float:
    # hashlib releases the GIL on large buffers, so 8 threads genuinely
    # exercise 8 cores
    t0 = time.perf_counter()
    with ThreadPoolExecutor(8) as ex:
        list(ex.map(lambda _: one_core(), range(8)))
    return time.perf_counter() - t0


def main() -> None:
    print(
        json.dumps(
            {
                "metric": "cpu_probe_md5_sec",
                "single_core_sec": round(one_core(), 3),
                "eight_thread_sec": round(eight_thread(), 3),
                "buf_mib": 8,
                "rounds": ROUNDS,
            }
        )
    )


if __name__ == "__main__":
    main()

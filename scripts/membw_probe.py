#!/usr/bin/env python
"""Memory-bandwidth ceiling probe (no Spark).

BENCH.md attributes the SPIMI-only scaling plateau (~0.40-0.49 efficiency
8->32 workers) to DRAM saturation: the varint encode is a byte-stream
producer whose arithmetic is trivial, so 32 threads on shared vCPUs run
out of memory bandwidth long before ALUs. This probe MEASURES that
ceiling instead of asserting it: each worker loops a STREAM-copy-style
pass (b[:] = a on a 256 MB float64 pair -> 512 MB traffic/pass, far
beyond LLC) and we report AGGREGATE GB/s at 1, 8, 16, 32 processes,
alongside a pure-ALU burn for the same window (the CPU ceiling the
existing protocol uses).

If aggregate copy bandwidth stops growing past ~8 workers while the ALU
burn still scales, the sub-0.8 SPIMI efficiency is a hardware property of
this VM, not an engine property.

Usage: python scripts/membw_probe.py [seconds_per_level]
Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _copy_worker(seconds: float, q: mp.Queue) -> None:
    import numpy as np

    n = 32 * 1024 * 1024  # 256 MB per array
    a = np.ones(n, dtype=np.float64)
    b = np.zeros(n, dtype=np.float64)
    passes = 0
    t0 = time.monotonic()
    while time.monotonic() - t0 < seconds:
        b[:] = a
        passes += 1
    elapsed = time.monotonic() - t0
    q.put((passes * 2 * n * 8) / elapsed)  # read+write bytes/s


def _burn_worker(seconds: float, q: mp.Queue) -> None:
    x, it = 1.0, 0
    t0 = time.monotonic()
    while time.monotonic() - t0 < seconds:
        for _ in range(100_000):
            x = x * 1.0000001 + 1e-9
        it += 1
    q.put(it / (time.monotonic() - t0))


def _run(fn, workers: int, seconds: float) -> float:
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=fn, args=(seconds, q)) for _ in range(workers)]
    for p in ps:
        p.start()
    vals = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(vals)


def main() -> dict:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    levels = [1, 4, 8, 16, 32]
    out: dict = {"metric": "membw_probe", "seconds_per_level": seconds, "levels": {}}
    for w in levels:
        gbps = _run(_copy_worker, w, seconds) / 1e9
        burn = _run(_burn_worker, w, seconds)
        out["levels"][str(w)] = {
            "copy_gbps_aggregate": round(gbps, 2),
            "alu_burn_aggregate": round(burn, 1),
        }
    l = out["levels"]
    out["copy_scaling_8_to_32"] = round(
        l["32"]["copy_gbps_aggregate"] / l["8"]["copy_gbps_aggregate"], 3
    )
    out["alu_scaling_8_to_32"] = round(
        l["32"]["alu_burn_aggregate"] / l["8"]["alu_burn_aggregate"], 3
    )
    # the 4->16 pair sits entirely below the VM's >16-thread vCPU cliff
    # (raw ALU scales ~3.95x there vs ~2.5-3.4x at 8->32), so it is the
    # ceiling a --levels 4 16 scaling window must be normalized against
    out["copy_scaling_4_to_16"] = round(
        l["16"]["copy_gbps_aggregate"] / l["4"]["copy_gbps_aggregate"], 3
    )
    out["alu_scaling_4_to_16"] = round(
        l["16"]["alu_burn_aggregate"] / l["4"]["alu_burn_aggregate"], 3
    )
    return out


if __name__ == "__main__":
    print(json.dumps(main()))

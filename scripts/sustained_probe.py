#!/usr/bin/env python
"""Sustained-load CPU probe: does the VM throttle under SUSTAINED load?

The 8-second membw_probe repeatedly showed 2.5-3.4x ALU scaling (8->32
workers) immediately BEFORE a scaling run, and ~1.1x immediately AFTER —
in every probe-bracketed window. That pattern is the signature of
burst-credit-style vCPU throttling: short bursts get the full machine,
multi-minute sustained load drains the budget and is clamped. This probe
measures it directly: N pure-Python busy-loop workers for DURATION
seconds, reporting aggregate iteration throughput per BUCKET-second
window. A flat curve = honest cores; a decaying curve = throttling, and
the decay ratio bounds what ANY engine can show for sustained scaling
efficiency on this box.

Usage: python scripts/sustained_probe.py [workers] [duration_s] [bucket_s]
Prints one JSON line (also suitable for bench_data/).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _burn(counter, stop):
    """pure-ALU busy loop; bumps a shared counter every 50k iterations."""
    local = 0
    x = 1.0
    while not stop.is_set():
        for _ in range(50_000):
            x = x * 1.0000001 + 0.1
            if x > 1e6:
                x = 1.0
        local += 50_000
        with counter.get_lock():
            counter.value += 50_000


def main() -> None:
    workers = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    duration = float(sys.argv[2]) if len(sys.argv) > 2 else 180.0
    bucket = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

    counter = mp.Value("q", 0)
    stop = mp.Event()
    procs = [mp.Process(target=_burn, args=(counter, stop)) for _ in range(workers)]
    for p in procs:
        p.start()

    buckets = []
    t0 = time.monotonic()
    last = 0
    while time.monotonic() - t0 < duration:
        time.sleep(bucket)
        with counter.get_lock():
            cur = counter.value
        buckets.append(round((cur - last) / bucket / 1e6, 2))  # M iter/s
        last = cur
    stop.set()
    for p in procs:
        p.join(timeout=5)
        if p.is_alive():
            p.terminate()

    first = buckets[0] if buckets else 0.0
    tail = sum(buckets[-3:]) / max(1, len(buckets[-3:]))
    print(
        json.dumps(
            {
                "metric": "sustained_probe",
                "workers": workers,
                "duration_s": duration,
                "bucket_s": bucket,
                "miters_per_sec_buckets": buckets,
                "first_bucket": first,
                "tail_mean": round(tail, 2),
                "decay_ratio": round(tail / first, 3) if first else None,
            }
        )
    )


if __name__ == "__main__":
    main()

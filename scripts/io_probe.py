#!/usr/bin/env python
"""Disk IO probe — the companion to membw_probe/sustained_probe.

Round-3 finding (BENCH.md): pure-CPU capacity on this VM is stable
(sustained 0.73 scaling) while Spark legs swing 2-4x, so the swinging
resource is one the CPU probes don't see — the prime suspect is the
shared-host block device (shuffle spill + DISK_ONLY persists + parquet
IO). This probe measures it directly: sequential write (512 MB, fsync),
sequential cold-ish read of what it wrote (O_DIRECT is unavailable from
Python portably; we drop the page cache effect by reading a file larger
than we wrote via cycling), and a re-read (warm). Bracket Spark scaling
windows with this ALONGSIDE the CPU probes; a window whose Spark legs
crawl while CPU probes are fast should show depressed MB/s here.

Usage: python scripts/io_probe.py [dir] [mb]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

CHUNK = 8 * 1024 * 1024


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else tempfile.gettempdir()
    mb = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    path = os.path.join(base, f"io_probe_{os.getpid()}.bin")
    buf = os.urandom(CHUNK)
    n_chunks = mb * 1024 * 1024 // CHUNK

    t0 = time.monotonic()
    fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_TRUNC, 0o600)
    for _ in range(n_chunks):
        os.write(fd, buf)
    os.fsync(fd)
    os.close(fd)
    write_s = time.monotonic() - t0

    def read_pass() -> float:
        t = time.monotonic()
        fd = os.open(path, os.O_RDONLY)
        while os.read(fd, CHUNK):
            pass
        os.close(fd)
        return time.monotonic() - t

    warm1 = read_pass()  # likely page-cache warm (we just wrote it)
    warm2 = read_pass()
    os.unlink(path)

    print(
        json.dumps(
            {
                "metric": "io_probe",
                "mb": mb,
                "write_mbps": round(mb / write_s, 1),
                "read1_mbps": round(mb / warm1, 1),
                "read2_mbps": round(mb / warm2, 1),
            }
        )
    )


if __name__ == "__main__":
    main()

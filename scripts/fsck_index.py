#!/usr/bin/env python
"""Verify an on-disk index's integrity (codec, ordering, stats, meta).

    python scripts/fsck_index.py --index <dir> [--show N]

Exit code 0 = healthy, 1 = violations found (printed). All block-level
checks run distributed; see angle_spark/index/fsck.py for the invariant
list.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--show", type=int, default=20)
    args = ap.parse_args()

    from angle_spark.index.fsck import fsck_index
    from angle_spark.session import get_spark

    spark = get_spark(app_name="angle_spark_fsck")
    viol = fsck_index(spark, args.index).persist()
    n = viol.count()
    if n == 0:
        print(f"OK: {args.index} passed all integrity checks")
        sys.exit(0)
    print(f"FAIL: {n} violations in {args.index}")
    viol.show(args.show, truncate=False)
    sys.exit(1)


if __name__ == "__main__":
    main()

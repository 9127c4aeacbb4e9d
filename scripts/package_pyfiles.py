#!/usr/bin/env python
"""Package angle_spark for cluster submission (the north-rule deploy
shape: ``spark-submit --py-files``).

Builds a single zip of the library (sources only, no tests, no caches)
that executors can import, and prints the submit command. On a real
cluster the driver script is any of scripts/build_and_query.py /
scripts/fsck_index.py / a user job importing angle_spark.

    python scripts/package_pyfiles.py [--out dist/angle_spark.zip]
    spark-submit --master <cluster> \
        --py-files dist/angle_spark.zip \
        scripts/build_and_query.py --transcripts <iceberg/parquet path> \
        --index <out dir> --queries queries.json --out results

The zip route keeps the deployment self-contained: no wheel build, no
cluster-wide pip install, identical bytes on every executor — the same
invariant the per-process tokenizer versioning relies on
(functions/tokenizer.py TOKENIZER_VERSION).
"""

from __future__ import annotations

import argparse
import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_path: str) -> list[str]:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    written: list[str] = []
    pkg_root = os.path.join(REPO, "angle_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg_root):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                arc = os.path.relpath(full, REPO)
                zf.write(full, arc)
                written.append(arc)
    return written


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "dist", "angle_spark.zip"))
    args = ap.parse_args()
    files = build_zip(args.out)
    size = os.path.getsize(args.out)
    print(f"{args.out}: {len(files)} files, {size:,} bytes")
    print(
        "submit: spark-submit --master <cluster> "
        f"--py-files {args.out} scripts/build_and_query.py ..."
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

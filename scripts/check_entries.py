#!/usr/bin/env python
"""Local replica of the driver's correctness gate for a subset of
entries: run __spark_entry__.queries()[name] at sf0.01 and compare to
oracle_sql()[name] via DuckDB (columns, row count, order-insensitive
values). Usage: python scripts/check_entries.py name [name ...]
(no args = every registered entry)."""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
        elif str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("datetime"):
            # Spark toPandas yields datetime64[ns], DuckDB .df() yields
            # datetime64[us]; same instants, different units — normalize
            # so the value comparison compares values
            df[c] = df[c].astype("datetime64[ns]")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    import __spark_entry__ as entry_mod
    from angle_spark.session import get_spark

    names = sys.argv[1:] or sorted(entry_mod.queries().keys())
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    n_bad = 0
    for name in names:
        t0 = time.time()
        try:
            got = _normalize(qs[name](spark, SF_DIR).toPandas())
            sql = os_.get(name)
            if sql is None:
                print(f"{name}: rows-only {len(got)} rows ({time.time()-t0:.1f}s)")
                continue
            want = _normalize(con.execute(sql).df())
            ok_cols = list(got.columns) == list(want.columns)
            ok_rows = len(got) == len(want)
            ok_vals = ok_cols and ok_rows and got.equals(want)
            if not ok_vals and ok_cols and ok_rows:
                # float-tolerant retry before declaring mismatch
                try:
                    pd.testing.assert_frame_equal(
                        got, want, check_exact=False, rtol=1e-9, atol=1e-9
                    )
                    ok_vals = True
                except AssertionError:
                    pass
            status = "OK" if (ok_cols and ok_rows and ok_vals) else "FAIL"
            if status == "FAIL":
                n_bad += 1
                print(f"{name}: FAIL cols={ok_cols} rows={len(got)}/{len(want)} vals={ok_vals}")
                if ok_cols and not got.equals(want) and len(got) == len(want):
                    diff = (got != want) & ~(got.isna() & want.isna())
                    bad_rows = diff.any(axis=1)
                    print(got[bad_rows].head(3))
                    print(want[bad_rows].head(3))
                elif not ok_cols:
                    print(" got:", list(got.columns))
                    print(" want:", list(want.columns))
            else:
                print(f"{name}: OK {len(got)} rows ({time.time()-t0:.1f}s)")
        except Exception as exc:  # noqa: BLE001
            n_bad += 1
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
    print(f"done: {n_bad} failures / {len(names)} checked")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

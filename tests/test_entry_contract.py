"""Replicates the driver's correctness gate: each __spark_entry__
queries()[name] at sf0.01 must match oracle_sql()[name] run by DuckDB
(same column names, same row count, same values order-insensitively)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)  # Decimal etc -> canonical string
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
        elif str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


NAMES = sorted(entry_mod.queries().keys())


def test_oracle_cover():
    assert set(entry_mod.oracle_sql().keys()) <= set(NAMES)


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, con, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    got = _normalize(q(spark, SF_DIR).toPandas())
    assert len(got) > 0 or name in ("dedup_exact_text",), f"{name}: empty result"
    if sql is None:
        return  # rows-only check (non-SQL-expressible op)
    raw_want = con.execute(sql).df()
    want = _normalize(raw_want)
    assert list(got.columns) == list(want.columns), f"{name}: column mismatch"
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    # dtype KINDS must agree pre-normalization (int vs float vs str) — the
    # driver's schema record is stricter than value equality
    raw_got = q(spark, SF_DIR).toPandas()
    for c in sorted(raw_got.columns):
        kg = raw_got[c].dtype.kind
        kw = raw_want[c].dtype.kind
        assert (kg == kw) or {kg, kw} <= {"i", "u"}, (
            f"{name}.{c}: dtype kind {kg} != {kw}"
        )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=0, rtol=0)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0  # the driver's smoke gate requires rows
    assert {"query_id", "rank", "doc_id", "score"} <= set(df.columns)

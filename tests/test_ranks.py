"""Distributed average-tie ranks: value-identity with the window spec,
partition-count invariance, and a no-global-window plan shape."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from angle_spark.operators.ranks import (
    avg_rank_table,
    avg_rank_window_spec,
    spearman,
    with_avg_rank,
)


@pytest.fixture(scope="module")
def tied_df(spark):
    # heavy ties (x % 7) and a skewed column, spread over 8 partitions
    return (
        spark.range(0, 2000)
        .select(
            (F.col("id") % 7).cast("double").alias("x"),
            ((F.col("id") * 37) % 113).cast("double").alias("y"),
        )
        .repartition(8)
        .persist()
    )


def test_avg_rank_matches_window_spec(spark, tied_df):
    got = with_avg_rank(tied_df, "x", "rx").select("x", "rx").toPandas()
    want = tied_df.select(
        "x", avg_rank_window_spec("x").alias("rx")
    ).toPandas()
    g = got.sort_values(["x", "rx"]).reset_index(drop=True)
    w = want.sort_values(["x", "rx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w)  # exact: integer + half arithmetic


def test_avg_rank_partition_invariant(spark, tied_df):
    a = avg_rank_table(tied_df, "y", num_partitions=2).toPandas()
    b = avg_rank_table(tied_df, "y", num_partitions=16).toPandas()
    a = a.sort_values("y").reset_index(drop=True)
    b = b.sort_values("y").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_spearman_matches_window_impl(spark, tied_df):
    got = spearman(tied_df, "x", "y").collect()[0]["spearman"]
    ranked = tied_df.select(
        avg_rank_window_spec("x").alias("rx"),
        avg_rank_window_spec("y").alias("ry"),
    )
    want = ranked.agg(F.round(F.corr("rx", "ry"), 6).alias("s")).collect()[0]["s"]
    assert got == want


def test_avg_rank_plan_windows_all_partitioned(spark, tied_df):
    """every window in the plan is keyed on the range bucket — no
    WindowExec single-partition fallback (round-1 verdict item 5)."""
    df = with_avg_rank(tied_df, "x", "rx")
    plan = df._jdf.queryExecution().executedPlan().toString()
    specs = [
        line for line in plan.splitlines() if "windowspecdefinition(" in line
    ]
    assert specs, "expected a (partitioned) window in the plan"
    for line in specs:
        assert "_bucket" in line, f"window not partitioned by bucket: {line}"

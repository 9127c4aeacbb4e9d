"""global_topk: value-identity with the window spec + plan shape.

The round-1 plans used Window.orderBy with no partition (single-task
shuffle of the whole input); global_topk must produce identical rows while
planning as TakeOrderedAndProject (per-partition heaps)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from angle_spark.operators.topk import global_topk


def _spec_topk(df, order_cols, k):
    w = Window.orderBy(*order_cols)
    return (
        df.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def test_global_topk_matches_window_spec(spark):
    df = spark.range(0, 1000).select(
        F.col("id"),
        (F.col("id") % 97).cast("double").alias("score"),
    ).repartition(8)
    order = [F.desc("score"), F.asc("id")]
    got = global_topk(df, order, 10).select("rank", "id", "score")
    want = _spec_topk(df, order, 10).select("rank", "id", "score")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_global_topk_plans_take_ordered(spark):
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 7).cast("double").alias("score")
    )
    plan = global_topk(df, [F.desc("score"), F.asc("id")], 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # rank rederivation is window-free: no WindowExec anywhere in the plan
    assert "Window" not in plan, plan


def test_entry_topk_queries_plan_no_global_window(spark):
    """the three round-1 offenders now plan as TakeOrderedAndProject."""
    from angle_spark.entries import QUERIES

    for name in ("cosine_topk", "tpch_q3", "embedding_topk_pairs"):
        df = QUERIES[name](spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan, name

"""Pipeline aggregations (query/pipeline_aggs.py) — bucket-frame math.

Hand-computable goldens per operator, the gap/head semantics (ES:
derivative NULL on each query's first bucket, moving window shrinks at
the head), composition over a real group_matches histogram, and the
string-order trap (validation)."""
from __future__ import annotations

import pytest

from angle_spark.query.pipeline_aggs import (
    bucket_selector,
    bucket_sort,
    cumulative_sum,
    derivative,
    moving_avg,
    serial_diff,
    stats_bucket,
)


@pytest.fixture(scope="module")
def buckets(spark):
    rows = [
        ("a", 0, 4), ("a", 1, 6), ("a", 3, 2),  # gap at band 2
        ("b", 0, 10),
    ]
    return spark.createDataFrame(rows, "query_id string, band long, n long")


def _by(df, cols=("query_id", "band")):
    return {
        tuple(r[c] for c in cols): r.asDict() for r in df.collect()
    }


def test_cumulative_sum(spark, buckets):
    got = _by(cumulative_sum(buckets, "n", "band"))
    assert got[("a", 0)]["cumulative"] == 4
    assert got[("a", 1)]["cumulative"] == 10
    assert got[("a", 3)]["cumulative"] == 12  # gaps don't reset
    assert got[("b", 0)]["cumulative"] == 10  # per-query partition


def test_derivative_null_on_first(spark, buckets):
    got = _by(derivative(buckets, "n", "band"))
    assert got[("a", 0)]["derivative"] is None
    assert got[("a", 1)]["derivative"] == 2
    assert got[("a", 3)]["derivative"] == -4
    assert got[("b", 0)]["derivative"] is None


def test_moving_avg_shrinks_at_head(spark, buckets):
    got = _by(moving_avg(buckets, "n", "band", window=2))
    assert got[("a", 0)]["moving_avg"] == 4.0
    assert got[("a", 1)]["moving_avg"] == 5.0
    assert got[("a", 3)]["moving_avg"] == 4.0  # trailing 2 present rows
    assert got[("b", 0)]["moving_avg"] == 10.0


def test_bucket_selector(spark, buckets):
    from pyspark.sql import functions as F

    kept = bucket_selector(buckets, F.col("n") >= 4).collect()
    assert {(r["query_id"], r["band"]) for r in kept} == {
        ("a", 0), ("a", 1), ("b", 0)
    }


def test_composition_matches_pandas(spark, buckets):
    out = moving_avg(
        derivative(cumulative_sum(buckets, "n", "band"), "n", "band"),
        "n", "band", window=3,
    ).toPandas().sort_values(["query_id", "band"])
    pdf = buckets.toPandas().sort_values(["query_id", "band"])
    g = pdf.groupby("query_id")["n"]
    assert list(out["cumulative"]) == list(g.cumsum())
    exp_der = g.diff()
    for a, b in zip(out["derivative"], exp_der):
        # toPandas renders the NULL first-bucket derivative as NaN
        assert (a != a and b != b) or a == b
    exp_ma = g.rolling(3, min_periods=1).mean().reset_index(drop=True)
    for a, b in zip(out["moving_avg"], exp_ma):
        assert a == pytest.approx(b)


def test_serial_diff(spark, buckets):
    got = _by(serial_diff(buckets, "n", "band", lag=2))
    assert got[("a", 0)]["serial_diff"] is None
    assert got[("a", 1)]["serial_diff"] is None  # only one predecessor
    assert got[("a", 3)]["serial_diff"] == -2    # 2 - 4 (gaps don't pad)
    assert got[("b", 0)]["serial_diff"] is None
    # lag=1 IS derivative
    d1 = _by(serial_diff(buckets, "n", "band", lag=1, out_col="d"))
    dv = _by(derivative(buckets, "n", "band"))
    for k in d1:
        assert d1[k]["d"] == dv[k]["derivative"]


def test_bucket_sort_cut_and_ties(spark):
    rows = [
        ("a", 0, 5), ("a", 1, 9), ("a", 2, 5), ("a", 3, 1),
        ("b", 0, 2), ("b", 1, 2),
    ]
    bks = spark.createDataFrame(rows, "query_id string, band long, n long")
    # desc by n, tie -> band ASC: a-order is (1, 0, 2, 3); b is (0, 1)
    top = bucket_sort(bks, "n", "band", size=2)
    assert {(r["query_id"], r["band"]) for r in top.collect()} == {
        ("a", 1), ("a", 0), ("b", 0), ("b", 1)
    }
    # frm skips the head; size cuts after it
    mid = bucket_sort(bks, "n", "band", size=2, frm=1)
    assert {(r["query_id"], r["band"]) for r in mid.collect()} == {
        ("a", 0), ("a", 2), ("b", 1)
    }
    # ascending + from-only (size=None keeps the tail)
    tail = bucket_sort(bks, "n", "band", ascending=True, frm=1)
    assert {(r["query_id"], r["band"]) for r in tail.collect()} == {
        ("a", 0), ("a", 2), ("a", 1), ("b", 1)
    }
    # the "_bs_rank" helper never leaks
    assert "_bs_rank" not in top.columns
    with pytest.raises(ValueError, match="frm"):
        bucket_sort(bks, "n", "band", frm=-1)
    with pytest.raises(ValueError, match="size"):
        bucket_sort(bks, "n", "band", size=0)


def test_moving_fn(spark, buckets):
    from angle_spark.query.pipeline_aggs import moving_fn

    got = _by(moving_fn(buckets, "n", "band", window=2, fn="max", out_col="m"))
    assert got[("a", 0)]["m"] == 4
    assert got[("a", 1)]["m"] == 6
    assert got[("a", 3)]["m"] == 6   # trailing 2 present rows: 6, 2
    assert got[("b", 0)]["m"] == 10
    gsum = _by(moving_fn(buckets, "n", "band", window=3, fn="sum", out_col="s"))
    assert gsum[("a", 3)]["s"] == 12
    # avg IS moving_avg
    ga = _by(moving_fn(buckets, "n", "band", window=2, fn="avg", out_col="x"))
    gm = _by(moving_avg(buckets, "n", "band", window=2))
    for k in ga:
        assert ga[k]["x"] == gm[k]["moving_avg"]
    # stddev: NULL on a single-row window (the ES NaN), n-1 form after
    gs = _by(moving_fn(buckets, "n", "band", window=2, fn="stddev", out_col="sd"))
    assert gs[("a", 0)]["sd"] is None
    assert gs[("a", 1)]["sd"] == pytest.approx(2.0 ** 0.5)
    with pytest.raises(ValueError, match="fn"):
        moving_fn(buckets, "n", "band", fn="median")
    with pytest.raises(ValueError, match="window"):
        moving_fn(buckets, "n", "band", window=0)


def test_stats_bucket_skips_nulls(spark):
    rows = [
        ("a", 0, 4.0), ("a", 1, None), ("a", 2, 6.0),
        ("b", 0, None),
    ]
    bks = spark.createDataFrame(rows, "query_id string, band long, n double")
    got = {r["query_id"]: r.asDict() for r in stats_bucket(bks, "n").collect()}
    # ES gap_policy=skip: the NULL bucket vanishes from every stat
    assert got["a"]["n_buckets"] == 2
    assert got["a"]["sum"] == 10.0 and got["a"]["avg"] == 5.0
    assert got["a"]["min"] == 4.0 and got["a"]["max"] == 6.0
    # all-NULL query -> NULL stats, zero buckets counted
    assert got["b"]["n_buckets"] == 0
    assert got["b"]["sum"] is None and got["b"]["avg"] is None


def test_validation(spark):
    sbuckets = spark.createDataFrame(
        [("a", "10", 1), ("a", "2", 2)], "query_id string, band string, n long"
    )
    with pytest.raises(ValueError, match="NUMERIC"):
        cumulative_sum(sbuckets, "n", "band")
    with pytest.raises(ValueError, match="not in frame"):
        derivative(sbuckets, "n", "missing")
    nbuckets = spark.createDataFrame(
        [("a", 1, 1)], "query_id string, band long, n long"
    )
    with pytest.raises(ValueError, match="window"):
        moving_avg(nbuckets, "n", "band", window=0)
    with pytest.raises(ValueError, match="lag"):
        serial_diff(nbuckets, "n", "band", lag=0)
    with pytest.raises(ValueError, match="NUMERIC"):
        serial_diff(sbuckets, "n", "band")

"""ES rescore combine (query/rescore.py): window cut, the five
score_modes, unmatched-doc rules — pure frame algebra, tested against
hand-computed truth."""

from __future__ import annotations

import pandas as pd
import pytest

from angle_spark.query.rescore import rescore_topk


def _stage1(spark):
    rows = [
        ("q", 1, 10, 10.0),
        ("q", 2, 11, 8.0),
        ("q", 3, 12, 6.0),
        ("q", 4, 13, 4.0),
    ]
    return spark.createDataFrame(
        rows, "query_id string, rank long, doc_id long, score double"
    )


def _stage2(spark):
    # doc 11 and 13 match the rescore query
    rows = [("q", 11, 5.0), ("q", 13, 9.0)]
    return spark.createDataFrame(
        rows, "query_id string, doc_id long, score double"
    )


def _run(spark, **kw):
    df = rescore_topk(_stage1(spark), _stage2(spark), k=10, **kw)
    return {
        r["doc_id"]: (r["rank"], r["score"]) for r in df.collect()
    }


def test_total_with_window(spark):
    # window 2: docs 10, 11 rescored; 12, 13 keep raw stage-1 scores
    # (13 matched the rescore query but sits OUTSIDE the window)
    got = _run(
        spark, window_size=2, query_weight=1.0, rescore_weight=2.0,
        score_mode="total",
    )
    # 10: 10 + 0 = 10; 11: 8 + 2*5 = 18; 12: 6; 13: 4
    assert got == {11: (1, 18.0), 10: (2, 10.0), 12: (3, 6.0), 13: (4, 4.0)}


def test_query_weight_applies_only_in_window(spark):
    got = _run(
        spark, window_size=2, query_weight=0.5, rescore_weight=1.0,
        score_mode="total",
    )
    # 10: 5; 11: 4 + 5 = 9; outside docs keep UNweighted stage-1
    assert got == {11: (1, 9.0), 12: (2, 6.0), 10: (3, 5.0), 13: (4, 4.0)}


@pytest.mark.parametrize(
    "mode,d11,d10",
    [
        # doc 11 matched (s1=8, s2=5), doc 10 unmatched (s1=10)
        ("total", 8 + 2 * 5.0, 10.0),
        ("avg", (8 + 2 * 5.0) / 2, 10.0),
        ("multiply", 8 * 5.0, 10.0),
        ("max", max(8.0, 2 * 5.0), 10.0),
        ("min", min(8.0, 2 * 5.0), 10.0),
    ],
)
def test_score_modes(spark, mode, d11, d10):
    got = _run(
        spark, window_size=4, query_weight=1.0, rescore_weight=2.0,
        score_mode=mode,
    )
    assert got[11][1] == d11
    assert got[10][1] == d10  # unmatched keeps query_weight * s1 = s1


def test_k_cut_and_validation(spark):
    df = rescore_topk(
        _stage1(spark), _stage2(spark), k=2, window_size=4,
        rescore_weight=2.0,
    )
    assert df.count() == 2
    with pytest.raises(ValueError, match="score_mode"):
        rescore_topk(_stage1(spark), _stage2(spark), 5, 2, score_mode="sum")
    with pytest.raises(ValueError, match="window_size"):
        rescore_topk(_stage1(spark), _stage2(spark), 5, 0)

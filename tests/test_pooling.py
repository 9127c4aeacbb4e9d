from __future__ import annotations

import numpy as np
import pytest

from angle_spark.functions.pooling import (
    embedding_slice,
    get_pooling,
    l2_normalize,
)
from pyspark.sql import functions as F

STATES = [
    [1.0, 2.0, 3.0],
    [4.0, 5.0, 6.0],
    [7.0, 8.0, 9.0],
    [0.0, 0.0, 0.0],  # padding
]
MASK = [1, 1, 1, 0]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(0, STATES, MASK)], "id long, states array<array<double>>, mask array<int>"
    )


def _run(df, col):
    return df.select(col.alias("out")).collect()[0]["out"]


def test_cls(df):
    assert _run(df, get_pooling("cls", F.col("states"), F.col("mask"))) == [1.0, 2.0, 3.0]


def test_last_mask_aware(df):
    # last UNMASKED position, not the padded one
    assert _run(df, get_pooling("last", F.col("states"), F.col("mask"))) == [7.0, 8.0, 9.0]


def test_avg_masked(df):
    want = list(np.mean(np.array(STATES[:3]), axis=0))
    assert _run(df, get_pooling("avg", F.col("states"), F.col("mask"))) == want


def test_max_masked(df):
    assert _run(df, get_pooling("max", F.col("states"), F.col("mask"))) == [7.0, 8.0, 9.0]


def test_cls_avg(df):
    avg = np.mean(np.array(STATES[:3]), axis=0)
    want = list((np.array(STATES[0]) + avg) / 2)
    assert _run(df, get_pooling("cls_avg", F.col("states"), F.col("mask"))) == want


def test_int_index(df):
    assert _run(df, get_pooling(1, F.col("states"), F.col("mask"))) == [4.0, 5.0, 6.0]


def test_unknown_strategy_raises(df):
    with pytest.raises(NotImplementedError):
        get_pooling("nope", F.col("states"), F.col("mask"))


def test_l2_normalize(spark):
    df = spark.createDataFrame([(0, [3.0, 4.0])], "id long, v array<double>")
    out = df.select(l2_normalize(F.col("v")).alias("o")).collect()[0]["o"]
    assert out == [0.6, 0.8]


def test_embedding_slice(spark):
    df = spark.createDataFrame([(0, [1.0, 2.0, 3.0, 4.0])], "id long, v array<double>")
    out = df.select(embedding_slice(F.col("v"), 1, 2).alias("o")).collect()[0]["o"]
    assert out == [2.0, 3.0]

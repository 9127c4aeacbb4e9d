from __future__ import annotations

import math

import numpy as np
import pytest

from angle_spark.functions.vector_math import (
    kl_divergence,
    log_softmax,
    logsumexp,
    mse,
    softmax,
)
from angle_spark.operators.dataset import (
    cast_label_double,
    detect_dataset_format,
    head_limit,
    rename_columns,
    sample_from_list,
)
from angle_spark.operators.pca import gram_matrix, pca_components, pca_compress
from pyspark.sql import functions as F


def test_detect_format(spark):
    a = spark.createDataFrame([("x", "y", 0.5)], "text1 string, text2 string, label double")
    b = spark.createDataFrame([("q", "p")], "query string, positive string")
    c = spark.createDataFrame([("q", "p", "n")], "query string, positive string, negative string")
    bad = spark.createDataFrame([(1,)], "z int")
    assert detect_dataset_format(a) == "A"
    assert detect_dataset_format(b) == "B"
    assert detect_dataset_format(c) == "C"
    with pytest.raises(NotImplementedError):
        detect_dataset_format(bad)


def test_rename_and_cast_and_limit(spark):
    df = spark.createDataFrame([("x", "y", 1)], "s1 string, s2 string, label int")
    out = cast_label_double(rename_columns(df, {"s1": "text1", "s2": "text2"}))
    assert detect_dataset_format(out) == "A"
    assert dict(out.dtypes)["label"] == "double"
    assert head_limit(out, 0).count() == 1  # falsy -> no limit
    assert head_limit(out.union(out), 1).count() == 1


def test_sample_from_list_deterministic(spark):
    df = spark.createDataFrame([(i, ["a", "b", "c"]) for i in range(50)], "id long, t array<string>")
    x = sample_from_list(df, "t", seed=7).toPandas()
    y = sample_from_list(df, "t", seed=7).toPandas()
    assert list(x["t"]) == list(y["t"])
    assert set(x["t"]) <= {"a", "b", "c"}
    assert len(set(x["t"])) > 1  # actually samples


@pytest.fixture(scope="module")
def arr_df(spark):
    return spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0], [0.2, 0.3, 0.5], [0.5, 0.25, 0.25])],
        "id long, x array<double>, p array<double>, q array<double>",
    )


def test_softmax_and_logsumexp(arr_df):
    row = arr_df.select(
        softmax(F.col("x")).alias("sm"),
        log_softmax(F.col("x")).alias("lsm"),
        logsumexp(F.col("x")).alias("lse"),
    ).collect()[0]
    x = np.array([1.0, 2.0, 3.0])
    want_sm = np.exp(x - x.max()) / np.exp(x - x.max()).sum()
    np.testing.assert_allclose(row["sm"], want_sm, rtol=1e-12)
    want_lse = math.log(np.exp(x - 3.0).sum()) + 3.0
    assert row["lse"] == pytest.approx(want_lse, rel=1e-12)
    np.testing.assert_allclose(row["lsm"], x - want_lse, rtol=1e-12)


def test_mse_kl(arr_df):
    row = arr_df.select(
        mse(F.col("p"), F.col("q")).alias("mse"),
        kl_divergence(F.col("p"), F.col("q")).alias("kl"),
    ).collect()[0]
    p = np.array([0.2, 0.3, 0.5])
    q = np.array([0.5, 0.25, 0.25])
    assert row["mse"] == pytest.approx(float(((p - q) ** 2).mean()), rel=1e-12)
    assert row["kl"] == pytest.approx(float((p * np.log(p / q)).sum()), rel=1e-12)


def test_pca_matches_numpy(spark):
    rng = np.random.default_rng(5)
    X = rng.standard_normal((200, 16)) @ np.diag(np.linspace(3, 0.1, 16))
    emb = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(200)],
        "vec_id long, embedding array<double>",
    )
    g = gram_matrix(emb)
    np.testing.assert_allclose(g, X.T @ X, rtol=1e-9)
    W = pca_components(g, 4)
    out = pca_compress(emb, 4).toPandas().sort_values("vec_id")
    P = np.stack(out["pca"].to_numpy())
    np.testing.assert_allclose(P, X @ W, rtol=1e-8)
    # top component captures the dominant variance direction
    var = P.var(axis=0)
    assert var[0] == max(var)

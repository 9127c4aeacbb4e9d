from __future__ import annotations

import pytest

from angle_spark.functions.text_stats import (
    lang_id,
    quality_features,
    rolling_fingerprint,
    token_count_subword_est,
    token_count_ws,
)
from angle_spark.functions.tokenizer import tokens_col
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (0, "the cat sat on the mat and it is warm in that spot for now"),
        (1, "der Hund ist nicht auf das Sofa und die Katze"),
        (2, "le chat est sur la table et les livres pour que"),
        (3, "xyzzy plugh qwerty"),
        (4, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lang_id(spark, df):
    got = {
        r["doc_id"]: r["lang"]
        for r in df.select(
            "doc_id", lang_id(tokens_col("text")).alias("lang")
        ).collect()
    }
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[2] == "fr"
    assert got[3] == "und"
    assert got[4] == "und"


def test_quality_features(spark, df):
    out = quality_features(df).toPandas().set_index("doc_id")
    assert out.loc[0, "n_tokens"] == 15
    assert out.loc[4, "n_tokens"] == 0
    assert out.loc[4, "punct_ratio"] == 0.0
    # "the" appears twice in doc 0 -> repetition > 0
    assert out.loc[0, "repetition_ratio"] > 0
    assert out.loc[3, "repetition_ratio"] == 0.0


def test_token_counts(spark):
    df = spark.createDataFrame([(0, "hello wonderful world 42")], "id long, text string")
    row = df.select(
        token_count_ws(F.col("text")).alias("ws"),
        token_count_subword_est(F.col("text")).alias("sub"),
    ).collect()[0]
    assert row["ws"] == 4
    # ceil(5/4)+ceil(9/4)+ceil(5/4)+ceil(2/4) = 2+3+2+1
    assert row["sub"] == 8


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "gamma beta alpha"), (2, "alpha beta gamma")],
        "id long, text string",
    )
    got = {
        r["id"]: r["fp"]
        for r in df.select(
            "id", rolling_fingerprint(tokens_col("text")).alias("fp")
        ).collect()
    }
    assert got[0] == got[2]  # deterministic
    assert got[0] != got[1]  # order matters

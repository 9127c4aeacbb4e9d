from __future__ import annotations

import numpy as np
import pandas as pd

from angle_spark.synth import (
    queries_pdf,
    transcripts_df,
    transcripts_pdf,
)


def test_pdf_schema_and_determinism():
    a = transcripts_pdf(20, seed=42)
    b = transcripts_pdf(20, seed=42)
    pd.testing.assert_frame_equal(a, b)
    assert list(a.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert a["turn_idx"].dtype == np.int32
    # 8..32 turns per conv
    sizes = a.groupby("conv_id").size()
    assert sizes.min() >= 8 and sizes.max() <= 32
    # (conv_id, turn_idx) unique
    assert not a.duplicated(["conv_id", "turn_idx"]).any()


def test_ts_monotone_within_conv():
    a = transcripts_pdf(10, seed=42)
    for _, g in a.groupby("conv_id"):
        assert g.sort_values("turn_idx")["ts"].is_monotonic_increasing


def test_zipf_skew_present():
    a = transcripts_pdf(50, seed=42)
    counts = pd.Series(" ".join(a["text"]).split()).value_counts()
    # heaviest term should dominate the median term by a wide margin
    assert counts.iloc[0] > 50 * counts.median()
    assert counts.index[0] == "w0000"


def test_spark_matches_pandas_any_partitioning(spark):
    """Distributed generation must equal single-process generation,
    independent of partition count (per-turn text equality invariant)."""
    pdf = transcripts_pdf(12, seed=42).sort_values(["conv_id", "turn_idx"])
    for parts in (1, 5):
        sdf = (
            transcripts_df(spark, 12, seed=42, partitions=parts)
            .toPandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        assert list(sdf["text"]) == list(pdf["text"])
        assert list(sdf["conv_id"]) == list(pdf["conv_id"])
        assert list(sdf["role"]) == list(pdf["role"])
        assert list(sdf["ts"]) == list(pdf["ts"])


def test_query_set_shape():
    q = queries_pdf()
    assert list(q.columns) == ["query_id", "text", "k"]
    assert q["query_id"].is_unique
    assert (q["k"] > 0).all()

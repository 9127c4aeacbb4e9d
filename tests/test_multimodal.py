from __future__ import annotations

import pytest

from angle_spark.multimodal.binary_ops import (
    FEATURE_DIM,
    decode_features,
    frame_sample_plan,
    resize_meta,
    synth_media_df,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media_df(spark, 30, seed=42).persist()


def test_schema_and_determinism(spark, media):
    a = media.toPandas().sort_values("media_id")
    b = synth_media_df(spark, 30, seed=42).toPandas().sort_values("media_id")
    assert list(a["payload"]) == list(b["payload"])
    assert set(a["kind"]) == {"image", "audio", "video"}
    assert all(len(p) == 256 for p in a["payload"])


def test_decode_features_shape_and_determinism(spark, media):
    f1 = decode_features(media).toPandas().sort_values("media_id")
    f2 = decode_features(media).toPandas().sort_values("media_id")
    assert all(len(v) == FEATURE_DIM for v in f1["features"])
    for a, b in zip(f1["features"], f2["features"]):
        assert list(a) == list(b)
    # normalized histogram sums to ~1
    assert sum(f1["features"].iloc[0]) == pytest.approx(1.0, abs=1e-5)


def test_resize_meta(spark, media):
    out = resize_meta(media, 128, 128).toPandas()
    for _, r in out.iterrows():
        rw, rh = r["resized"]["width"], r["resized"]["height"]
        assert rw <= 128 and rh <= 128
        # aspect ratio preserved within rounding
        orig = r["meta"]["width"] / r["meta"]["height"]
        assert rw / rh == pytest.approx(orig, rel=0.05)


def test_frame_sample_plan(spark, media):
    out = frame_sample_plan(media, every_n=30, max_frames=8).toPandas()
    assert (out["kind"] == "video").all()
    for _, r in out.iterrows():
        plan = list(r["frame_plan"])
        assert len(plan) <= 8
        assert plan[0] == 0
        assert all(p < r["meta"]["n_frames"] for p in plan)
        assert all(b - a == 30 for a, b in zip(plan, plan[1:]))


def test_arrow_max_records_per_batch_envelope(spark):
    """spark.sql.execution.arrow.maxRecordsPerBatch is the decode path's
    memory envelope: with the knob set to 64, no Arrow batch seen by the
    UDF may exceed 64 rows — peak executor memory for decode is then
    bounded by 64 * (payload + frame) bytes regardless of partition size
    (round-1 verdict item 10)."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        media = synth_media_df(spark, 1000).repartition(2)  # 500 rows/partition
        out = decode_features(media, emit_batch_size=True).toPandas()
        assert len(out) == 1000
        assert out["batch_rows"].max() <= 64
        # multiple batches per partition proves the envelope actually split
        assert (out["batch_rows"] == 64).any()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

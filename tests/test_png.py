"""PNG codec (pure stdlib) + real-pixel decode through the Spark path."""

from __future__ import annotations

import numpy as np
import pytest

from angle_spark.multimodal.binary_ops import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    decode_features,
    png_features,
)
from angle_spark.multimodal.png import decode_png, encode_png, is_png


def _img(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize(
    "shape", [(5, 7), (8, 3, 3), (4, 4, 4), (1, 1), (3, 2, 2)]
)
def test_roundtrip_all_filters(shape, filter_type):
    arr = _img(shape, seed=filter_type + len(shape))
    data = encode_png(arr, filter_type=filter_type)
    assert is_png(data)
    got = decode_png(data)
    want = arr if arr.ndim == 3 else arr[:, :, None]
    np.testing.assert_array_equal(got, want)


def test_decode_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    # 16-bit depth is outside the supported subset
    data = bytearray(encode_png(_img((4, 4))))
    data[24] = 16  # IHDR bit-depth byte
    with pytest.raises(ValueError):
        decode_png(bytes(data))


def test_decode_features_uses_real_pixels(spark):
    """PNG payloads must produce the intensity histogram of the DECODED
    pixels (not the raw-byte stub histogram) through mapInPandas."""
    imgs = [_img((16, 16, 3), seed=i) for i in range(6)]
    rows = [
        (i, "image", bytearray(encode_png(im)), {"width": 16, "height": 16,
         "sample_rate": 0, "n_frames": 1})
        for i, im in enumerate(imgs)
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = {
        r["media_id"]: np.array(r["features"], dtype=np.float32)
        for r in decode_features(media).collect()
    }
    for i, im in enumerate(imgs):
        want = png_features(im)
        np.testing.assert_allclose(got[i], want, rtol=0, atol=1e-7)
        assert abs(float(got[i].sum()) - 1.0) < 1e-5
        assert len(got[i]) == FEATURE_DIM

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from angle_spark.codec import (
    decode_doc_deltas,
    decode_tfs,
    decode_varints,
    encode_doc_deltas,
    encode_tfs,
    encode_varints,
    impact_upper_bound,
)


def test_varint_roundtrip_basic():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**32, 2**63 - 1], dtype=np.uint64)
    assert np.array_equal(decode_varints(encode_varints(vals)), vals)


def test_varint_empty():
    assert encode_varints(np.array([], dtype=np.uint64)) == b""
    assert decode_varints(b"").size == 0


def test_varint_single_byte_density():
    # values < 128 use exactly one byte
    vals = np.arange(128, dtype=np.uint64)
    assert len(encode_varints(vals)) == 128


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
def test_varint_roundtrip_property(xs):
    vals = np.array(xs, dtype=np.uint64)
    assert np.array_equal(decode_varints(encode_varints(vals)), vals)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300).map(
        lambda xs: sorted(set(xs))
    )
)
def test_doc_delta_roundtrip(doc_ids):
    d = np.array(doc_ids, dtype=np.int64)
    assert np.array_equal(decode_doc_deltas(encode_doc_deltas(d)), d)


def test_doc_delta_compression_wins():
    # dense ascending docIDs encode to ~1 byte each
    d = np.arange(10_000, 20_000, dtype=np.int64)
    assert len(encode_doc_deltas(d)) < 10_000 * 2


def test_tf_roundtrip():
    tfs = np.array([1, 1, 2, 5, 200, 1], dtype=np.int64)
    assert np.array_equal(decode_tfs(encode_tfs(tfs)), tfs)


def test_impact_upper_bound_monotone_in_tf():
    dls = np.array([50.0, 50.0])
    lo = impact_upper_bound(np.array([1]), np.array([50.0]), 50.0)
    hi = impact_upper_bound(np.array([1, 9]), dls, 50.0)
    assert hi > lo
    # bound below (k1+1)
    assert hi < 2.2


def test_varint_large_values_width():
    # 10-byte worst case for 2**63-1
    assert len(encode_varints(np.array([2**63 - 1], dtype=np.uint64))) == 9

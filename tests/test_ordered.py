"""Ordered intervals (wand_topk mode="ordered" — Lucene ordered
IntervalsSource / ES intervals max_gaps): proximity-algebra identities
against phrase and near, order sensitivity, slop monotonicity, repeated
tokens, OOV death."""

from __future__ import annotations

import pandas as pd
import pytest

from angle_spark.index.build import build_index, load_index
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.query.wand import wand_topk
from angle_spark.synth import transcripts_df

BIG_K = 1_000_000


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    docs = with_tokens(
        assign_doc_ids(transcripts_df(spark, 25, seed=3, partitions=4))
    ).select("doc_id", "tokens", "dl")
    out = str(tmp_path_factory.mktemp("ord") / "idx")
    build_index(spark, docs, out, segment_docs=128, block_size=16, positional=True)
    return load_index(spark, out)


def _q(text):
    return pd.DataFrame([("q", text, BIG_K)], columns=["query_id", "text", "k"])


def _scores(spark, idx, text, **kw):
    merged, tstats, meta = idx
    df = wand_topk(spark, merged, tstats, meta, _q(text), **kw).toPandas()
    return df.set_index("doc_id")["score"].to_dict()


def test_zero_gaps_equals_phrase(spark, idx):
    text = "w0001 w0042"
    ordered = _scores(spark, idx, text, mode="ordered", slop=0)
    phrase = _scores(spark, idx, text, mode="phrase")
    assert ordered == phrase and len(ordered) > 0


def test_order_is_load_bearing(spark, idx):
    a = set(_scores(spark, idx, "w0001 w0042", mode="ordered", slop=3))
    b = set(_scores(spark, idx, "w0042 w0001", mode="ordered", slop=3))
    assert a and b and a != b


def test_slop_monotone_and_converges_to_and(spark, idx):
    text = "w0001 w0042"
    s0 = set(_scores(spark, idx, text, mode="ordered", slop=0))
    s3 = set(_scores(spark, idx, text, mode="ordered", slop=3))
    huge = set(_scores(spark, idx, text, mode="ordered", slop=10**6))
    and_docs = set(_scores(spark, idx, text, mode="and"))
    assert s0 <= s3 <= huge
    assert len(s0) < len(huge)
    # at unbounded gaps, ordered still requires the ORDER — a doc with
    # only "w0042 ... w0001" drops, so huge is a strict subset of AND
    assert huge < and_docs


def test_ordered_subset_of_near_window(spark, idx):
    # total gaps G over n terms <=> positional width G + (n-1)
    text, G, n = "w0001 w0042", 2, 2
    ordered = set(_scores(spark, idx, text, mode="ordered", slop=G))
    near = set(_scores(spark, idx, text, mode="near", slop=G + n - 1))
    assert ordered <= near and len(ordered) < len(near)


def test_scores_equal_and_scores(spark, idx):
    # membership narrows; surviving docs keep the full conjunctive fold
    text = "w0001 w0042"
    ordered = _scores(spark, idx, text, mode="ordered", slop=4)
    and_scores = _scores(spark, idx, text, mode="and")
    for d, s in ordered.items():
        assert s == and_scores[d]


def test_repeated_token_needs_two_positions(spark, idx):
    single = set(_scores(spark, idx, "w0015"))
    twice = set(_scores(spark, idx, "w0015 w0015", mode="ordered", slop=10**6))
    assert twice < single and len(twice) > 0


def test_oov_is_dead(spark, idx):
    got = _scores(spark, idx, "w0001 zzzzqq", mode="ordered", slop=5)
    assert got == {}


def test_nonpositional_index_rejected(spark, tmp_path_factory):
    docs = with_tokens(
        assign_doc_ids(transcripts_df(spark, 5, seed=3, partitions=2))
    ).select("doc_id", "tokens", "dl")
    out = str(tmp_path_factory.mktemp("ordnp") / "idx")
    build_index(spark, docs, out, segment_docs=128, block_size=16)
    merged, tstats, meta = load_index(spark, out)
    with pytest.raises(ValueError, match="positional"):
        wand_topk(spark, merged, tstats, meta, _q("w0001 w0002"),
                  mode="ordered", slop=2)

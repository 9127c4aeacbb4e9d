"""Minimum-should-match (wand_topk mode="mm"): the continuum between OR
and AND — m=1 matches the OR answer set, m=|tokens| matches AND, and
intermediate m sits strictly between on a corpus where that differs."""

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
    out = str(tmp_path_factory.mktemp("mm") / "idx")
    build_index(spark, docs, out, segment_docs=128, block_size=16)
    return load_index(spark, out)


def _q(text):
    return pd.DataFrame([("q", text, BIG_K)], columns=["query_id", "text", "k"])


def _docs(spark, idx, queries, **kw):
    merged, tstats, meta = idx
    df = wand_topk(spark, merged, tstats, meta, queries, **kw).toPandas()
    return df.set_index("doc_id")["score"].to_dict()


def test_mm_continuum(spark, idx):
    text = "w0003 w0042 w0137"
    or_set = _docs(spark, idx, _q(text))
    and_set = _docs(spark, idx, _q(text), mode="and")
    m1 = _docs(spark, idx, _q(text), mode="mm", min_match=1)
    m2 = _docs(spark, idx, _q(text), mode="mm", min_match=2)
    m3 = _docs(spark, idx, _q(text), mode="mm", min_match=3)
    assert m1 == or_set  # same docs AND same scores
    assert m3 == and_set
    assert set(and_set) < set(m2) < set(or_set), (
        len(and_set), len(m2), len(or_set),
    )
    # every m2 doc keeps its full disjunctive score
    for d, s in m2.items():
        assert s == or_set[d]


def test_mm_oov_floor(spark, idx):
    # one OOV token, floor 2: both surviving tokens required
    got = _docs(spark, idx, _q("zzzz w0003 w0042"), mode="mm", min_match=2)
    want = _docs(spark, idx, _q("w0003 w0042"), mode="and")
    assert got == want
    # floor above the in-vocab count: dead query
    assert _docs(spark, idx, _q("zzzz w0003"), mode="mm", min_match=2) == {}


def test_mm_validation(spark, idx):
    merged, tstats, meta = idx
    with pytest.raises(ValueError):
        wand_topk(spark, merged, tstats, meta, _q("w0003"), mode="mm")
    with pytest.raises(ValueError):
        wand_topk(
            spark, merged, tstats, meta, _q("w0003"), mode="or", min_match=2
        )

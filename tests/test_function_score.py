"""function_score (query/function_score.py + wand sort_multiply).

Contracts under test:
- multiplied scores equal BM25 * factor exactly, per (query, doc),
  against the plain search joined to the factor frame;
- docs missing a factor keep their BM25 unchanged (factor-1 rule);
- the three decay shapes hit their defining identities: decay(origin)
  = 1, decay(origin +- (offset + scale)) = decay_value, linear hits 0;
- field_value_factor modifiers; factor > 1 promotes (exhaustiveness:
  a doc outside the plain top-k can win under a big factor);
- search_after pages tile the function-scored ranking;
- Searcher.function_score delegates; DocValues factor path identical;
- validation (bad decay/scale/decay_value/modifier; sort_ascending and
  non-topk collectors rejected with sort_multiply).
"""
from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from angle_spark.index.build import build_index, load_index
from angle_spark.index.docvalues import write_docvalues
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.query.function_score import (
    decay_factors,
    field_value_factor,
    function_score_topk,
)
from angle_spark.query.wand import wand_topk
from angle_spark.synth import transcripts_df

N_CONVS = 24
SEED = 13


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    docs = with_tokens(
        assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4))
    ).select("doc_id", "tokens", "dl")
    out = str(tmp_path_factory.mktemp("fscore") / "idx")
    build_index(spark, docs, out, segment_docs=128, block_size=16)
    return out


@pytest.fixture(scope="module")
def loaded(spark, index_dir):
    return load_index(spark, index_dir)


def _value_of(d):
    # numeric signal, missing for doc_id % 4 == 3
    return None if d % 4 == 3 else float((d * 11) % 500)


@pytest.fixture(scope="module")
def values(spark, loaded):
    _, _, meta = loaded
    rows = [
        (d, _value_of(d)) for d in range(meta.n_docs)
        if _value_of(d) is not None
    ]
    return spark.createDataFrame(rows, "doc_id long, value double")


@pytest.fixture(scope="module")
def hot_term(spark, loaded):
    from collections import Counter

    docs = with_tokens(
        assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4))
    ).select("tokens")
    cnt = Counter(t for r in docs.collect() for t in set(r["tokens"]))
    return cnt.most_common(1)[0][0]


def _qdf(spark, rows):
    return spark.createDataFrame(rows, "query_id string, text string, k int")


ORIGIN, SCALE, P = 250.0, 100.0, 0.5


def test_product_rule_and_missing_rule(spark, loaded, values, hot_term):
    merged, tstats, meta = loaded
    q = _qdf(spark, [("q", hot_term, 10**9)])
    factors = decay_factors(
        values, "gauss", origin=ORIGIN, scale=SCALE, decay_value=P
    )
    fs = function_score_topk(
        spark, merged, tstats, meta, q, factors
    ).toPandas()
    plain = wand_topk(spark, merged, tstats, meta, q, prune=False).toPandas()
    sigma2 = -(SCALE * SCALE) / (2.0 * math.log(P))
    base = dict(zip(plain["doc_id"], plain["score"]))
    assert set(fs["doc_id"]) == set(base)  # same membership
    for d, s in zip(fs["doc_id"], fs["score"]):
        v = _value_of(int(d))
        f = 1.0 if v is None else math.exp(-((v - ORIGIN) ** 2) / (2 * sigma2))
        assert s == pytest.approx(base[d] * f, rel=1e-12), d


def test_decay_identities(spark):
    vals = spark.createDataFrame(
        [(0, ORIGIN), (1, ORIGIN + SCALE), (2, ORIGIN - SCALE),
         (3, ORIGIN + 10 * SCALE)],
        "doc_id long, value double",
    )
    for shape in ("gauss", "exp", "linear"):
        f = dict(
            decay_factors(vals, shape, origin=ORIGIN, scale=SCALE,
                          decay_value=P)
            .toPandas().itertuples(index=False)
        )
        assert f[0] == pytest.approx(1.0)
        assert f[1] == pytest.approx(P)
        assert f[2] == pytest.approx(P)
        assert f[3] < P
    lin = dict(
        decay_factors(vals, "linear", origin=ORIGIN, scale=SCALE,
                      decay_value=P).toPandas().itertuples(index=False)
    )
    assert lin[3] == 0.0  # linear clamps at zero, never negative


def test_offset_flat_zone(spark):
    vals = spark.createDataFrame(
        [(0, ORIGIN + 40.0), (1, ORIGIN - 49.0)], "doc_id long, value double"
    )
    f = dict(
        decay_factors(vals, "gauss", origin=ORIGIN, scale=SCALE, offset=50.0,
                      decay_value=P).toPandas().itertuples(index=False)
    )
    assert f[0] == 1.0 and f[1] == 1.0  # inside the offset: no decay


def test_field_value_factor_modifiers(spark):
    vals = spark.createDataFrame([(0, 9.0)], "doc_id long, value double")
    got = {
        m: field_value_factor(vals, factor=4.0, modifier=m)
        .toPandas()["factor"].iloc[0]
        for m in ("none", "log1p", "sqrt", "square", "reciprocal")
    }
    assert got["none"] == 36.0
    assert got["log1p"] == pytest.approx(math.log1p(36.0))
    assert got["sqrt"] == 6.0
    assert got["square"] == 36.0**2
    assert got["reciprocal"] == pytest.approx(1 / 36.0)


def test_factor_gt_one_promotes(spark, loaded, hot_term):
    """Exhaustiveness: a doc OUTSIDE the plain top-1 must win rank 1
    under a huge factor — pruning by BM25 bounds would have missed it."""
    merged, tstats, meta = loaded
    q1 = _qdf(spark, [("q", hot_term, 1)])
    plain_top = wand_topk(spark, merged, tstats, meta, q1).toPandas()
    top_doc = int(plain_top["doc_id"].iloc[0])
    qfull = _qdf(spark, [("q", hot_term, 10**9)])
    full = wand_topk(
        spark, merged, tstats, meta, qfull, prune=False
    ).toPandas()
    loser = int(full["doc_id"].iloc[-1])  # the worst-ranked match
    assert loser != top_doc
    boost = spark.createDataFrame(
        [(loser, 1e6)], "doc_id long, factor double"
    )
    fs = function_score_topk(
        spark, merged, tstats, meta, q1, boost
    ).toPandas()
    assert int(fs["doc_id"].iloc[0]) == loser


def test_search_after_tiles(spark, loaded, values, hot_term):
    merged, tstats, meta = loaded
    factors = decay_factors(values, "exp", origin=ORIGIN, scale=SCALE)
    full = function_score_topk(
        spark, merged, tstats, meta, _qdf(spark, [("q", hot_term, 10)]),
        factors,
    ).toPandas()
    page1 = full.iloc[:5]
    cur = {
        "q": (float(page1["score"].iloc[-1]), int(page1["doc_id"].iloc[-1]))
    }
    page2 = function_score_topk(
        spark, merged, tstats, meta, _qdf(spark, [("q", hot_term, 5)]),
        factors, search_after=cur,
    ).toPandas()
    assert list(page2["doc_id"]) == list(full["doc_id"].iloc[5:10])


def test_docvalues_and_searcher(spark, index_dir, loaded, values, hot_term):
    from angle_spark.query.searcher import Searcher

    merged, tstats, meta = loaded
    factors = decay_factors(values, "gauss", origin=ORIGIN, scale=SCALE)
    dv = write_docvalues(spark, index_dir, "fsfactor", factors)
    q = _qdf(spark, [("q", hot_term, 10**9)])
    a = function_score_topk(
        spark, merged, tstats, meta, q, factors
    ).toPandas()
    b = function_score_topk(spark, merged, tstats, meta, q, dv).toPandas()
    pd.testing.assert_frame_equal(a, b)
    s = Searcher(spark, index_dir)
    try:
        c = s.function_score(q, factors).toPandas()
    finally:
        s.close()
    pd.testing.assert_frame_equal(a, c)


def test_validation(spark, loaded, values):
    merged, tstats, meta = loaded
    q = _qdf(spark, [("q", "x", 1)])
    with pytest.raises(ValueError, match="decay"):
        decay_factors(values, "cosine")
    with pytest.raises(ValueError, match="scale"):
        decay_factors(values, "gauss", scale=0.0)
    with pytest.raises(ValueError, match="decay_value"):
        decay_factors(values, "gauss", decay_value=1.0)
    with pytest.raises(ValueError, match="offset"):
        decay_factors(values, "gauss", offset=-1.0)
    with pytest.raises(ValueError, match="modifier"):
        field_value_factor(values, modifier="cube")
    sm = values.selectExpr("doc_id", "value AS sort_key")
    with pytest.raises(ValueError, match="sort_ascending"):
        wand_topk(
            spark, merged, tstats, meta, q, sort_meta=sm,
            sort_multiply=True, sort_ascending=True,
        )
    with pytest.raises(ValueError, match="collector"):
        wand_topk(
            spark, merged, tstats, meta, q, sort_meta=sm,
            sort_multiply=True, collector="count",
        )
    with pytest.raises(ValueError, match="sort_meta"):
        wand_topk(spark, merged, tstats, meta, q, sort_multiply=True)

"""Multi-index search with merged statistics (query/multi_index.py).

The load-bearing contract: for any partition of one corpus into
disjoint per-index docID spaces, search_indices(dfs=True) over the
parts equals the single merged index's search bitwise. Also: dfs=False
(ES query_then_fetch) visibly diverges when index sizes diverge; the
fuse respects per-query k; modes compose; validation.
"""
from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from angle_spark.index.build import build_index, load_index
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.query.multi_index import search_indices
from angle_spark.query.wand import wand_topk
from angle_spark.synth import transcripts_df

N_CONVS = 24
SEED = 14


@pytest.fixture(scope="module")
def corpus(spark):
    d = (
        with_tokens(
            assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4))
        )
        .select("doc_id", "tokens", "dl")
        .persist()
    )
    d.count()
    yield d
    d.unpersist()


@pytest.fixture(scope="module")
def full_index(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mi") / "full")
    build_index(spark, corpus, out, segment_docs=128, block_size=16)
    return out


def _split(spark, corpus, tmp_path_factory, cuts):
    """build one index per [lo, hi) range, docIDs re-based to zero."""
    dirs, offsets = [], {}
    for i, (lo, hi) in enumerate(cuts):
        part = corpus.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).withColumn("doc_id", F.col("doc_id") - F.lit(lo))
        d = str(tmp_path_factory.mktemp("mi") / f"part{i}")
        build_index(spark, part, d, segment_docs=64, block_size=16)
        dirs.append(d)
        offsets[d] = lo
    return dirs, offsets


@pytest.fixture(scope="module")
def n_docs(spark, full_index):
    return load_index(spark, full_index)[2].n_docs


def _qdf(spark, rows):
    return spark.createDataFrame(rows, "query_id string, text string, k int")


@pytest.fixture(scope="module")
def queries(spark):
    return _qdf(
        spark,
        [("q1", "w0000 w0007", 15), ("q2", "w0019", 7), ("q3", "zzzz", 5)],
    )


def _plain(spark, full_index, queries, **kw):
    merged, tstats, meta = load_index(spark, full_index)
    return (
        wand_topk(spark, merged, tstats, meta, queries, **kw)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def _multi(spark, dirs, offsets, queries, **kw):
    return (
        search_indices(spark, dirs, queries, id_offsets=offsets, **kw)
        .toPandas()
        .drop(columns=["index"])
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def test_partition_equality_two_way(
    spark, corpus, full_index, queries, n_docs, tmp_path_factory
):
    cut = n_docs // 2
    dirs, offs = _split(spark, corpus, tmp_path_factory, [(0, cut), (cut, n_docs)])
    pd.testing.assert_frame_equal(
        _multi(spark, dirs, offs, queries), _plain(spark, full_index, queries)
    )


def test_partition_equality_three_way_uneven(
    spark, corpus, full_index, queries, n_docs, tmp_path_factory
):
    a, b = n_docs // 7, n_docs // 2
    dirs, offs = _split(
        spark, corpus, tmp_path_factory, [(0, a), (a, b), (b, n_docs)]
    )
    pd.testing.assert_frame_equal(
        _multi(spark, dirs, offs, queries), _plain(spark, full_index, queries)
    )


def test_single_index_is_identity(spark, full_index, queries):
    got = _multi(spark, [full_index], {}, queries)
    pd.testing.assert_frame_equal(got, _plain(spark, full_index, queries))


def test_query_then_fetch_diverges(
    spark, corpus, full_index, queries, n_docs, tmp_path_factory
):
    """dfs=False scores each index on its OWN stats — with a tiny and a
    big index the fused scores must differ from the global truth (the
    documented reason dfs exists)."""
    a = max(2, n_docs // 10)
    dirs, offs = _split(spark, corpus, tmp_path_factory, [(0, a), (a, n_docs)])
    naive = _multi(spark, dirs, offs, queries, dfs=False)
    truth = _plain(spark, full_index, queries)
    merged = naive.merge(
        truth, on=["query_id", "rank"], suffixes=("_n", "_t")
    )
    assert (abs(merged["score_n"] - merged["score_t"]) > 1e-9).any()


def test_mode_composes(
    spark, corpus, full_index, n_docs, tmp_path_factory
):
    cut = n_docs // 2
    dirs, offs = _split(spark, corpus, tmp_path_factory, [(0, cut), (cut, n_docs)])
    q = _qdf(spark, [("qa", "w0000 w0001", 10**6)])
    pd.testing.assert_frame_equal(
        _multi(spark, dirs, offs, q, mode="and"),
        _plain(spark, full_index, q, mode="and"),
    )


def test_index_column_disambiguates(spark, full_index, queries):
    out = search_indices(spark, [full_index], queries).toPandas()
    assert set(out["index"]) == {full_index}


def test_validation(spark, queries):
    with pytest.raises(ValueError, match="index"):
        search_indices(spark, [], queries)

"""Query-time synonym expansion (query/synonyms.py): the query's token
bag grows by its synonyms; the index and scoring never change."""

from __future__ import annotations

import pytest

from angle_spark.index.stats import (
    corpus_stats,
    term_frequencies,
    term_stats,
    with_tokens,
)
from angle_spark.query.bm25 import bm25_topk
from angle_spark.query.synonyms import expand_queries, synonyms_df

PAIRS = [("copy", "dup"), ("join", "merge")]


@pytest.fixture(scope="module")
def syn(spark):
    return synonyms_df(spark, PAIRS)


def _queries(spark, rows):
    return spark.createDataFrame(rows, "query_id string, text string, k int")


def test_expansion_is_sorted_distinct_union(spark, syn):
    q = _queries(spark, [("q1", "Copy the JOIN, copy!", 5)])
    out = expand_queries(q, syn).collect()
    assert len(out) == 1
    # tokens {copy, the, join} + synonyms {dup, merge}, sorted
    assert out[0]["text"] == "copy dup join merge the"
    assert out[0]["k"] == 5


def test_expansion_is_directional(spark, syn):
    # 'dup' appears only as a TARGET; it must not pull in 'copy'
    out = expand_queries(_queries(spark, [("q1", "dup", 5)]), syn).collect()
    assert out[0]["text"] == "dup"


def test_no_synonym_query_passes_through(spark, syn):
    out = expand_queries(_queries(spark, [("q1", "scan filter", 5)]), syn).collect()
    assert out[0]["text"] == "filter scan"


def test_tokenless_query_is_dropped(spark, syn):
    out = expand_queries(_queries(spark, [("q1", "!!! ???", 5)]), syn).collect()
    assert out == []


def test_retrieval_through_expansion_only(spark, syn):
    texts = [
        "dup rows in the table",   # 0: reachable from 'copy' only via synonym
        "dup dup everywhere",      # 1
        "scan filter merge",       # 2
    ]
    docs = with_tokens(
        spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
    ).select("doc_id", "tokens", "dl")
    tf = term_frequencies(docs).localCheckpoint()
    n, avgdl = corpus_stats(docs)
    tstats = term_stats(tf, n)

    raw_q = _queries(spark, [("q1", "copy", 10)])
    # unexpanded: 'copy' is OOV -> nothing
    assert bm25_topk(tf, tstats, raw_q, n, avgdl).count() == 0
    expanded = expand_queries(raw_q, syn)
    got = bm25_topk(tf, tstats, expanded, n, avgdl).collect()
    assert {r["doc_id"] for r in got} == {0, 1}

    # scores identical to a user literally typing the expanded bag
    typed = bm25_topk(
        tf, tstats, _queries(spark, [("q1", "copy dup", 10)]), n, avgdl
    ).collect()
    assert {(r["doc_id"], r["score"]) for r in got} == {
        (r["doc_id"], r["score"]) for r in typed
    }


def test_searcher_synonyms_passthrough(spark, syn, tmp_path_factory):
    from angle_spark.index.build import build_index
    from angle_spark.index.stats import with_tokens
    from angle_spark.operators.docids import assign_doc_ids
    from angle_spark.query.searcher import Searcher

    idx = str(tmp_path_factory.mktemp("syn_idx"))
    raw = spark.createDataFrame(
        [("c0", 0, "dup rows here"), ("c0", 1, "scan filter merge")],
        "conv_id string, turn_idx int, text string",
    )
    docs = with_tokens(assign_doc_ids(raw)).select("doc_id", "tokens", "dl")
    build_index(spark, docs, idx, segment_docs=8, block_size=4)
    q = _queries(spark, [("q1", "copy", 10)])
    with Searcher(spark, idx) as s:
        assert s.search(q).count() == 0  # 'copy' is OOV
        got = s.search(q, synonyms=syn).collect()
        assert [r["doc_id"] for r in got] == [0]  # reached via 'dup'
        with pytest.raises(ValueError, match="bag-of-words"):
            s.search(q, mode="phrase", synonyms=syn)

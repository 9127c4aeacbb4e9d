"""BM25F fielded scoring (query/bm25f.py).

Contracts: with a single field the formula reduces algebraically to
plain BM25 (rank-identical, scores equal at 6dp); a keyword that lives
only in the weighted field retrieves through it; raising a field's
weight promotes docs matched through that field; combined saturation —
stuffing one field cannot escape the shared k1 curve.
"""

from __future__ import annotations

import pandas as pd
import pytest

from angle_spark.index.stats import corpus_stats, term_frequencies, term_stats, with_tokens
from angle_spark.query.bm25 import bm25_topk
from angle_spark.query.bm25f import bm25f_topk


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "hash join over the build side", "planner"),
        (1, "hash table probe hash hash", "executor"),
        (2, "merge sort join fallback", "planner"),
        (3, "scan filter pushdown notes", "storage"),
        (4, "the quick unrelated text", "join"),      # keyword field hit only
        (5, "join join join join join join", "misc"),  # body stuffing
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def _pdf(df):
    return (
        df.toPandas()
        .astype({"doc_id": "int64", "rank": "int64"})
        .sort_values(["query_id", "rank"], kind="mergesort")
        .reset_index(drop=True)
    )


def _q(spark, rows):
    return spark.createDataFrame(rows, "query_id string, text string, k int")


def test_single_field_reduces_to_bm25(spark, docs):
    """score = idf*(k1+1)*tf~/(k1+tf~) with one field is algebraically
    idf*(k1+1)*tf/(tf + k1*(1-b+b*dl/avgdl)) — plain BM25."""
    queries = _q(spark, [("q1", "hash join", 10), ("q2", "scan the", 10)])
    f = _pdf(bm25f_topk(docs.select("doc_id", "text"), [("text", 1.0)], queries))
    d = with_tokens(docs).select("doc_id", "tokens", "dl")
    tf = term_frequencies(d).localCheckpoint()
    n, avgdl = corpus_stats(d)
    b = _pdf(bm25_topk(tf, term_stats(tf, n), queries, n, avgdl))
    assert list(zip(f["query_id"], f["doc_id"])) == list(zip(b["query_id"], b["doc_id"]))
    assert (abs(f["score"] - b["score"]) < 1e-9).all()


def test_keyword_field_retrieves_and_weight_promotes(spark, docs):
    queries = _q(spark, [("k1", "join", 10)])
    lo = _pdf(bm25f_topk(docs, [("text", 1.0), ("source", 0.5)], queries))
    hi = _pdf(bm25f_topk(docs, [("text", 1.0), ("source", 8.0)], queries))
    # doc 4 matches only through source: retrieved under both weights
    assert 4 in set(lo["doc_id"]) and 4 in set(hi["doc_id"])
    rank_lo = int(lo[lo.doc_id == 4]["rank"].iloc[0])
    rank_hi = int(hi[hi.doc_id == 4]["rank"].iloc[0])
    assert rank_hi < rank_lo  # heavier keyword field promotes it
    assert rank_hi == 1


def test_combined_saturation_caps_stuffing(spark, docs):
    """doc 5 stuffs 'join' six times in the body; under BM25F its
    combined tf~ still saturates against k1, so a clean source-field
    match with weight w=8 outranks it (naive per-field BM25 summing
    would let body stuffing dominate regardless)."""
    queries = _q(spark, [("s1", "join", 10)])
    got = _pdf(bm25f_topk(docs, [("text", 1.0), ("source", 8.0)], queries))
    r5 = int(got[got.doc_id == 5]["rank"].iloc[0])
    r4 = int(got[got.doc_id == 4]["rank"].iloc[0])
    assert r4 < r5


def test_oov_and_empty_query(spark, docs):
    queries = _q(spark, [("e1", "zzznever", 10), ("e2", "   ", 10), ("e3", "merge", 5)])
    got = _pdf(bm25f_topk(docs, [("text", 1.0), ("source", 3.0)], queries))
    assert set(got["query_id"]) == {"e3"}


# ---------- dis_max (Lucene DisjunctionMaxQuery / multi_match best_fields)


def test_dismax_tie0_is_pure_best_field(spark, docs):
    """With tie=0, a doc's score equals its single best field's BM25 —
    verified against running each field alone."""
    from angle_spark.query.bm25f import dismax_topk

    queries = _q(spark, [("q", "join planner", 100)])
    both = _pdf(
        dismax_topk(docs, [("text", 1.0), ("source", 1.0)], queries, tie=0.0)
    )
    t_only = _pdf(dismax_topk(docs, [("text", 1.0)], queries))
    s_only = _pdf(dismax_topk(docs, [("source", 1.0)], queries))
    t = dict(zip(t_only["doc_id"], t_only["score"]))
    s = dict(zip(s_only["doc_id"], s_only["score"]))
    for d, sc in zip(both["doc_id"], both["score"]):
        assert sc == pytest.approx(max(t.get(d, 0.0), s.get(d, 0.0)), abs=1e-9)


def test_dismax_tie1_is_field_sum(spark, docs):
    from angle_spark.query.bm25f import dismax_topk

    queries = _q(spark, [("q", "join", 100)])
    summed = _pdf(
        dismax_topk(docs, [("text", 1.0), ("source", 1.0)], queries, tie=1.0)
    )
    t_only = _pdf(dismax_topk(docs, [("text", 1.0)], queries))
    s_only = _pdf(dismax_topk(docs, [("source", 1.0)], queries))
    t = dict(zip(t_only["doc_id"], t_only["score"]))
    s = dict(zip(s_only["doc_id"], s_only["score"]))
    for d, sc in zip(summed["doc_id"], summed["score"]):
        assert sc == pytest.approx(t.get(d, 0.0) + s.get(d, 0.0), abs=1e-9)


def test_dismax_vs_bm25f_semantics(spark, docs):
    """The semantic split the two scorers exist for: doc 5 stuffs 'join'
    into ONE field. Under dis_max (best single field) it cannot also
    harvest the keyword field; under a tie'd sum the keyword-only doc 4
    still retrieves through the source field alone."""
    from angle_spark.query.bm25f import dismax_topk

    queries = _q(spark, [("q", "join", 100)])
    dm = _pdf(dismax_topk(docs, [("text", 1.0), ("source", 3.0)], queries, tie=0.3))
    assert 4 in set(dm["doc_id"])  # keyword-field-only doc retrieves
    # doc 4's score is driven by the boosted source field (best field),
    # identical to its source-only score
    s_only = _pdf(dismax_topk(docs, [("source", 3.0)], queries))
    s4 = float(s_only[s_only["doc_id"] == 4]["score"].iloc[0])
    d4 = float(dm[dm["doc_id"] == 4]["score"].iloc[0])
    assert d4 == pytest.approx(s4, abs=1e-9)


def test_dismax_single_field_reduces_to_bm25(spark, docs):
    from angle_spark.query.bm25f import dismax_topk

    queries = _q(spark, [("q1", "hash join", 10)])
    f = _pdf(dismax_topk(docs.select("doc_id", "text"), [("text", 1.0)], queries))
    d = with_tokens(docs).select("doc_id", "tokens", "dl")
    tf = term_frequencies(d).localCheckpoint()
    n, avgdl = corpus_stats(d)
    b = _pdf(bm25_topk(tf, term_stats(tf, n), queries, n, avgdl))
    assert list(zip(f["query_id"], f["doc_id"])) == list(
        zip(b["query_id"], b["doc_id"])
    )
    assert (abs(f["score"] - b["score"]) < 1e-9).all()


def test_dismax_validation(spark, docs):
    from angle_spark.query.bm25f import dismax_topk

    queries = _q(spark, [("q", "join", 10)])
    with pytest.raises(ValueError, match="tie"):
        dismax_topk(docs, [("text", 1.0)], queries, tie=1.5)
    with pytest.raises(ValueError, match="field"):
        dismax_topk(docs, [], queries)

"""Result collapsing (query/collapse.py): best hit per (query, field
value), re-ranked densely, corpus never shuffled."""

from __future__ import annotations

import contextlib
import io

import pytest

from angle_spark.query.collapse import collapse_topk

# (query_id, rank, doc_id, score) — two queries, ranks dense
RESULTS = [
    ("q1", 1, 10, 9.0),
    ("q1", 2, 11, 8.0),
    ("q1", 3, 20, 7.0),
    ("q1", 4, 12, 6.0),
    ("q1", 5, 30, 5.0),
    ("q2", 1, 20, 4.0),
    ("q2", 2, 10, 3.0),
]
# doc -> site: docs 10,11,12 share site a; 20 site b; 30 site c
CORPUS = [(10, "a"), (11, "a"), (12, "a"), (20, "b"), (30, "c"), (99, "z")]


@pytest.fixture(scope="module")
def frames(spark):
    res = spark.createDataFrame(
        RESULTS, "query_id string, rank long, doc_id long, score double"
    )
    corpus = spark.createDataFrame(CORPUS, "doc_id long, site string")
    return res, corpus


def test_collapse_keeps_best_per_group_and_renumbers(spark, frames):
    res, corpus = frames
    out = collapse_topk(res, corpus, "site", k=10).collect()
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["site"]) for r in out
    }
    # q1: site a's best is doc 10 (rank 1); 11 and 12 collapse away;
    # b=20 (orig rank 3 -> new 2), c=30 (orig 5 -> new 3)
    assert got == {
        ("q1", 1): (10, "a"),
        ("q1", 2): (20, "b"),
        ("q1", 3): (30, "c"),
        ("q2", 1): (20, "b"),
        ("q2", 2): (10, "a"),
    }


def test_collapse_k_bounds(spark, frames):
    res, corpus = frames
    out = collapse_topk(res, corpus, "site", k=2).collect()
    q1 = sorted(r["rank"] for r in out if r["query_id"] == "q1")
    assert q1 == [1, 2]


def test_scores_survive_collapse(spark, frames):
    res, corpus = frames
    out = collapse_topk(res, corpus, "site", k=10).collect()
    scores = {r[2]: r[3] for r in RESULTS if r[0] == "q1"}
    for r in out:
        if r["query_id"] == "q1":
            assert r["score"] == scores[r["doc_id"]]


def test_results_broadcast_into_corpus_scan(spark, frames):
    res, corpus = frames
    plan = io.StringIO()
    with contextlib.redirect_stdout(plan):
        collapse_topk(res, corpus, "site", k=10).explain("formatted")
    text = plan.getvalue()
    assert "BroadcastHashJoin" in text
    assert "SortMergeJoin" not in text


def test_null_field_rows_do_not_collapse_together(spark):
    """Lucene/Solr collapse treats missing values as non-collapsing —
    every null-field hit survives as its own group (round-4 ADVICE:
    the old partitionBy grouped ALL null-field docs into one)."""
    from angle_spark.query.collapse import collapse_topk

    results = spark.createDataFrame(
        [("q1", 1, 10, 5.0), ("q1", 2, 11, 4.0), ("q1", 3, 12, 3.0),
         ("q1", 4, 13, 2.0)],
        "query_id string, rank long, doc_id long, score double",
    )
    corpus = spark.createDataFrame(
        [(10, None), (11, "a"), (12, None), (13, "a")],
        "doc_id long, src string",
    )
    got = {
        (r["doc_id"], r["rank"])
        for r in collapse_topk(results, corpus, "src", k=10).collect()
    }
    # both null-src docs survive; the two src='a' docs collapse to the
    # better-ranked one
    assert got == {(10, 1), (11, 2), (12, 3)}

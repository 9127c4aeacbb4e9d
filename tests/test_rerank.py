"""Two-stage retrieve-then-rerank (query/rerank.py): exact cosine over
ONLY the stage-1 candidates, broadcast-joined — never a corpus shuffle."""

from __future__ import annotations

import contextlib
import io
import math

import pytest

from pyspark.sql import functions as F

from angle_spark.index.stats import (
    corpus_stats,
    term_frequencies,
    term_stats,
    with_tokens,
)
from angle_spark.query.bm25 import bm25_topk
from angle_spark.query.rerank import rerank_dense

TEXTS = [
    "join hash merge",        # 0
    "hash table scan",        # 1
    "merge sort runs",        # 2
    "join the small table",   # 3
    "filter window vector",   # 4  (never matches the query)
]
# embeddings chosen so cosine order INVERTS the bm25 order among
# matching docs, and doc 4 (a non-candidate) is the best cosine of all —
# it must still never appear
EMB = {
    0: [1.0, 0.0, 0.0],
    1: [0.8, 0.6, 0.0],
    2: [0.0, 1.0, 0.0],
    3: [0.9, 0.435889894354067, 0.0],
    4: [0.95, 0.3122498999199199, 0.0],  # exactly the query direction
}
QV = [0.95, 0.3122498999199199, 0.0]  # unit vector


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


@pytest.fixture(scope="module")
def stage1(spark):
    docs = with_tokens(
        spark.createDataFrame(
            [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
        )
    ).select("doc_id", "tokens", "dl")
    tf = term_frequencies(docs).localCheckpoint()
    n, avgdl = corpus_stats(docs)
    q = spark.createDataFrame(
        [("q1", "join hash", 100)], "query_id string, text string, k int"
    )
    return bm25_topk(tf, term_stats(tf, n), q, n, avgdl)


@pytest.fixture(scope="module")
def emb_df(spark):
    return spark.createDataFrame(
        [(i, v) for i, v in EMB.items()], "vec_id long, embedding array<double>"
    )


@pytest.fixture(scope="module")
def qv_df(spark):
    return spark.createDataFrame(
        [("q1", QV)], "query_id string, qv array<double>"
    )


def test_rerank_matches_python_truth(spark, stage1, emb_df, qv_df):
    cand_ids = {r["doc_id"] for r in stage1.collect()}
    assert 4 not in cand_ids  # doc 4 never matched the query
    out = rerank_dense(stage1, emb_df, qv_df, k=10).collect()
    got = [(r["rank"], r["doc_id"]) for r in sorted(out, key=lambda r: r["rank"])]
    truth = sorted(
        ((-_cos(EMB[d], QV), d) for d in cand_ids),
    )
    expect = [(i + 1, d) for i, (_, d) in enumerate(truth)]
    assert got == expect
    for r in out:
        assert r["cosine"] == pytest.approx(_cos(EMB[r["doc_id"]], QV), abs=1e-12)


def test_non_candidate_never_appears(spark, stage1, emb_df, qv_df):
    # doc 4 has the best cosine in the corpus but was not retrieved by
    # stage 1 -> must not appear (the whole point of two-stage)
    best = max(EMB, key=lambda d: _cos(EMB[d], QV))
    assert best == 4
    out = rerank_dense(stage1, emb_df, qv_df, k=10).collect()
    assert 4 not in {r["doc_id"] for r in out}


def test_k_bounds_and_stage1_score_carried(spark, stage1, emb_df, qv_df):
    out = rerank_dense(stage1, emb_df, qv_df, k=2).collect()
    assert len(out) == 2
    s1 = {r["doc_id"]: r["score"] for r in stage1.collect()}
    for r in out:
        assert r["stage1_score"] == pytest.approx(s1[r["doc_id"]], abs=1e-12)


def test_candidates_broadcast_into_embedding_scan(spark, stage1, emb_df, qv_df):
    plan = io.StringIO()
    with contextlib.redirect_stdout(plan):
        rerank_dense(stage1, emb_df, qv_df, k=5).explain("formatted")
    text = plan.getvalue()
    assert "BroadcastHashJoin" in text
    # the corpus-sized side must never be exchanged for the join
    assert "SortMergeJoin" not in text


def test_rerank_fixes_keyword_stuffing(spark):
    """Planted-relevance proof (the test shape test_hybrid.py uses for
    RRF): a keyword-stuffed doc wins BM25 but the dense stage demotes
    it below the semantically-close docs."""
    from angle_spark.index.stats import (
        corpus_stats,
        term_frequencies,
        term_stats,
        with_tokens,
    )
    from angle_spark.query.bm25 import bm25_topk

    texts = [
        (0, "join join join join join join"),        # stuffed
        (1, "join strategies for large tables"),     # relevant
        (2, "join order and hash join planning"),    # relevant
        (3, "filter window vector"),                 # off-topic
    ]
    # embeddings: relevant docs near the query vector, stuffed doc far
    emb = spark.createDataFrame(
        [
            (0, [0.0, 1.0]),
            (1, [1.0, 0.05]),
            (2, [1.0, 0.1]),
            (3, [0.0, -1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    qv = spark.createDataFrame(
        [("q1", [1.0, 0.0])], "query_id string, qv array<double>"
    )
    docs = with_tokens(
        spark.createDataFrame(texts, "doc_id long, text string")
    ).select("doc_id", "tokens", "dl")
    tf = term_frequencies(docs).localCheckpoint()
    n, avgdl = corpus_stats(docs)
    q = spark.createDataFrame(
        [("q1", "join", 3)], "query_id string, text string, k int"
    )
    stage1 = bm25_topk(tf, term_stats(tf, n), q, n, avgdl)
    bm25_first = next(r["doc_id"] for r in stage1.collect() if r["rank"] == 1)
    assert bm25_first == 0  # stuffing wins the sparse stage
    out = rerank_dense(stage1, emb, qv, k=3).collect()
    order = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert order[0] == 1 and order[1] == 2  # dense stage fixes it
    assert order[-1] == 0

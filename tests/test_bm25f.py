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


def _brute_cross_fields(rows, fields, query_terms, k1=1.2, b=0.75):
    """Pure-python cross_fields truth over tiny corpora: blended
    df = max over fields, per-term best-field saturation, one idf
    multiply after the max."""
    import math
    import re

    def toks(s):
        return re.findall(r"[a-z0-9]+", (s or "").lower())

    n = len(rows)
    per_field = {}
    for fi, (col_idx, w) in enumerate(fields):
        tf = {}
        dl = {}
        for r in rows:
            ts = toks(r[col_idx])
            dl[r[0]] = len(ts)
            for t in ts:
                tf[(r[0], t)] = tf.get((r[0], t), 0) + 1
        avgdl = sum(dl.values()) / n
        df = {}
        for (_d, t), _c in tf.items():
            df[t] = df.get(t, 0) + 1
        per_field[fi] = (tf, dl, avgdl, df, w)
    out = {}
    for t in query_terms:
        bdf = max(
            (pf[3].get(t, 0) for pf in per_field.values()), default=0
        )
        if bdf == 0:
            continue
        idf = math.log((n - bdf + 0.5) / (bdf + 0.5) + 1.0)
        for r in rows:
            d = r[0]
            best = None
            for tfm, dlm, avgdl, _dfm, w in per_field.values():
                c = tfm.get((d, t))
                if c is None:
                    continue
                sat = w * c * (k1 + 1.0) / (
                    c + k1 * (1.0 - b + b * dlm[d] / avgdl)
                )
                best = sat if best is None else max(best, sat)
            if best is not None:
                out[d] = out.get(d, 0.0) + idf * best
    return out


def test_cross_fields_brute_force_parity(spark, docs):
    from angle_spark.query.bm25f import cross_fields_topk

    queries = _q(
        spark,
        [("x1", "hash join", 10), ("x2", "join planner", 10),
         ("x3", "zzzz", 10)],
    )
    got = _pdf(
        cross_fields_topk(docs, [("text", 1.0), ("source", 3.0)], queries)
    )
    rows = [tuple(r) for r in docs.collect()]
    for qid, terms in (("x1", ["hash", "join"]), ("x2", ["join", "planner"])):
        want = _brute_cross_fields(
            rows, [(1, 1.0), (2, 3.0)], terms
        )
        g = got[got.query_id == qid]
        assert set(g["doc_id"]) == set(want), qid
        for d, s in zip(g["doc_id"], g["score"]):
            assert abs(s - want[d]) < 1e-9, (qid, d)
        # rank order follows the demoted scores with doc_id ties
        ordered = sorted(want.items(), key=lambda x: (-round(x[1], 6), x[0]))
        assert list(g.sort_values("rank")["doc_id"]) == [d for d, _ in ordered]
    assert "x3" not in set(got["query_id"])


def test_cross_fields_term_centric_split(spark, docs):
    """The load-bearing semantic difference: 'join planner' — doc 2 has
    BOTH terms in text; doc 0 has join in text + planner in source.
    cross_fields lets each term match its best field, so doc 0 competes;
    a text-only search would rank doc 0 down on the missing term."""
    from angle_spark.query.bm25f import cross_fields_topk

    queries = _q(spark, [("s1", "join planner", 10)])
    both = _pdf(
        cross_fields_topk(docs, [("text", 1.0), ("source", 1.0)], queries)
    )
    text_only = _pdf(
        cross_fields_topk(docs, [("text", 1.0)], queries)
    )
    s_both = dict(zip(both["doc_id"], both["score"]))
    s_text = dict(zip(text_only["doc_id"], text_only["score"]))
    # doc 0 gains the planner contribution only via the source field
    assert s_both[0] > s_text[0]
    # blended df is non-inflating: planner's blended idf uses max df, so
    # doc 2 (both terms in text) keeps a competitive score — membership
    # is a superset of text-only membership
    assert set(s_text) <= set(s_both)


def test_cross_fields_single_field_reduces_to_bm25(spark, docs):
    from angle_spark.query.bm25f import cross_fields_topk

    queries = _q(spark, [("r1", "hash join", 10), ("r2", "scan the", 10)])
    f = _pdf(
        cross_fields_topk(docs.select("doc_id", "text"), [("text", 1.0)], queries)
    )
    d = with_tokens(docs).select("doc_id", "tokens", "dl")
    tf = term_frequencies(d).localCheckpoint()
    n, avgdl = corpus_stats(d)
    bref = _pdf(bm25_topk(tf, term_stats(tf, n), queries, n, avgdl))
    assert list(zip(f["query_id"], f["doc_id"])) == list(
        zip(bref["query_id"], bref["doc_id"])
    )
    assert (abs(f["score"] - bref["score"]) < 1e-9).all()


def test_cross_fields_validation(spark, docs):
    from angle_spark.query.bm25f import cross_fields_topk

    queries = _q(spark, [("v1", "join", 5)])
    with pytest.raises(ValueError, match="field"):
        cross_fields_topk(docs, [], queries)

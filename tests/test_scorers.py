"""TF-IDF (SMART ltn) and Dirichlet query-likelihood scorers vs a pure-
Python golden. Contract in query/scorers.py: OOV terms contribute
nothing; LM candidates are docs matching >=1 in-vocabulary term with
qlen counting only in-vocabulary distinct terms."""

from __future__ import annotations

import math

import pytest

from angle_spark.functions.tokenizer import tokenize_py
from angle_spark.index.stats import term_frequencies, with_tokens
from angle_spark.query.scorers import DEFAULT_MU, lmd_topk, tfidf_topk

TEXTS = [
    "join hash join merge",
    "hash table scan scan scan",
    "merge sort merge sort merge",
    "join the small table",
    "the the the filter",
    "vector data stream",
]
QUERIES = [
    ("q1", "join merge", 3),
    ("q2", "scan", 2),
    ("q3", "zzzz join", 4),  # one OOV term
    ("q4", "zzzz", 5),  # fully OOV -> no rows
]


@pytest.fixture(scope="module")
def corpus(spark):
    docs = with_tokens(
        spark.createDataFrame(
            [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
        )
    ).select("doc_id", "tokens", "dl")
    tf = term_frequencies(docs).localCheckpoint()
    return docs, tf


def _stats():
    toks = [tokenize_py(t) for t in TEXTS]
    tf = [{t: d.count(t) for t in set(d)} for d in toks]
    df: dict[str, int] = {}
    cf: dict[str, int] = {}
    for d in tf:
        for t, n in d.items():
            df[t] = df.get(t, 0) + 1
            cf[t] = cf.get(t, 0) + n
    return toks, tf, df, cf


def _golden_tfidf():
    toks, tf, df, _ = _stats()
    n = len(toks)
    out = {}
    for qid, text, k in QUERIES:
        terms = sorted(set(tokenize_py(text)) & set(df))
        scored = []
        for d in range(n):
            s = sum(
                (1.0 + math.log(tf[d][t])) * math.log(n / df[t])
                for t in terms
                if t in tf[d]
            )
            if any(t in tf[d] for t in terms):
                scored.append((d, s))
        scored.sort(key=lambda x: (-x[1], x[0]))
        out[qid] = scored[:k]
    return out


def _golden_lmd(mu=DEFAULT_MU):
    toks, tf, df, cf = _stats()
    c = sum(cf.values())
    out = {}
    for qid, text, k in QUERIES:
        terms = sorted(set(tokenize_py(text)) & set(cf))
        scored = []
        for d in range(len(toks)):
            if not any(t in tf[d] for t in terms):
                continue
            part = sum(
                math.log(1.0 + tf[d][t] / (mu * cf[t] / c))
                for t in terms
                if t in tf[d]
            )
            s = part + len(terms) * math.log(mu / (len(toks[d]) + mu))
            scored.append((d, s))
        scored.sort(key=lambda x: (-x[1], x[0]))
        out[qid] = scored[:k]
    return out


def _queries_df(spark):
    return spark.createDataFrame(QUERIES, "query_id string, text string, k int")


def _collect(out):
    rows = {}
    for r in out.collect():
        rows.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    return {q: sorted(v) for q, v in rows.items()}


def test_tfidf_matches_golden(spark, corpus):
    from angle_spark.index.stats import term_stats

    docs, tf = corpus
    n = docs.count()
    got = _collect(tfidf_topk(tf, term_stats(tf, n), _queries_df(spark), n))
    want = _golden_tfidf()
    assert set(got) == {q for q, v in want.items() if v}
    assert "q4" not in got
    for qid, ranked in want.items():
        if not ranked:
            continue
        assert [d for _, d, _ in got[qid]] == [d for d, _ in ranked]
        for (_, _, s_got), (_, s_want) in zip(got[qid], ranked, strict=True):
            assert s_got == pytest.approx(s_want, abs=1e-12)


def test_lmd_matches_golden(spark, corpus):
    _, tf = corpus
    got = _collect(lmd_topk(tf, _queries_df(spark)))
    want = _golden_lmd()
    assert set(got) == {q for q, v in want.items() if v}
    for qid, ranked in want.items():
        if not ranked:
            continue
        assert [d for _, d, _ in got[qid]] == [d for d, _ in ranked]
        for (_, _, s_got), (_, s_want) in zip(got[qid], ranked, strict=True):
            assert s_got == pytest.approx(s_want, abs=1e-12)


def test_lmd_oov_shrinks_qlen(spark, corpus):
    """q3 = 'zzzz join': the OOV term must not inflate the length prior —
    scores must equal the pure 'join' query's."""
    _, tf = corpus
    out = _collect(lmd_topk(tf, _queries_df(spark)))
    solo = spark.createDataFrame(
        [("j", "join", 4)], "query_id string, text string, k int"
    )
    want = _collect(lmd_topk(tf, solo))["j"]
    assert [(d, s) for _, d, s in out["q3"]] == [(d, s) for _, d, s in want]


def test_all_oov_batch_is_empty(spark, corpus):
    from angle_spark.index.stats import term_stats

    _, tf = corpus
    q = spark.createDataFrame(
        [("q", "zzzz qqqq", 5)], "query_id string, text string, k int"
    )
    n = 6
    assert tfidf_topk(tf, term_stats(tf, n), q, n).count() == 0
    assert lmd_topk(tf, q).count() == 0

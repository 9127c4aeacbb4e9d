"""End-to-end golden gate: Spark BM25 top-k must be rank-identical
(docIDs AND scores) to the single-process Python oracle on the reference
query set — the tightened analog of the reference's golden-threshold CI
test (reference tests/test_eval.py:4-20)."""

from __future__ import annotations

import math

import pytest

from angle_spark.index.stats import corpus_stats, term_frequencies, term_stats, with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.oracle import Bm25Oracle
from angle_spark.query.bm25 import bm25_topk
from angle_spark.synth import queries_df, queries_pdf, transcripts_df, transcripts_pdf

N_CONVS = 60  # ~1200 turns


@pytest.fixture(scope="module")
def corpus(spark):
    docs = with_tokens(
        assign_doc_ids(transcripts_df(spark, N_CONVS, seed=42, partitions=4))
    ).persist()
    tf = term_frequencies(docs).persist()
    n_docs, avgdl = corpus_stats(docs)
    tstats = term_stats(tf, n_docs)
    return docs, tf, tstats, n_docs, avgdl


@pytest.fixture(scope="module")
def oracle():
    return Bm25Oracle(transcripts_pdf(N_CONVS, seed=42))


def test_corpus_stats_match_oracle(corpus, oracle):
    _, _, _, n_docs, avgdl = corpus
    assert n_docs == oracle.n_docs
    assert math.isclose(avgdl, oracle.avgdl, rel_tol=0, abs_tol=1e-12)


def test_df_matches_oracle(corpus, oracle):
    _, tf, tstats, _, _ = corpus
    got = {r["term"]: r["df"] for r in tstats.collect()}
    assert got == oracle.df


def test_topk_rank_identical_to_oracle(spark, corpus, oracle):
    _, tf, tstats, n_docs, avgdl = corpus
    result = (
        bm25_topk(tf, tstats, queries_df(spark), n_docs, avgdl, deterministic=True)
        .toPandas()
        .sort_values(["query_id", "rank"])
    )
    golden = oracle.golden(queries_pdf())

    got = list(zip(result["query_id"], result["rank"], result["doc_id"]))
    want = list(zip(golden["query_id"], golden["rank"], golden["doc_id"]))
    assert got == want, "top-k docID sequence differs from oracle"

    # scores: deterministic fold -> exact float64 equality
    for g, w in zip(result["score"], golden["score"]):
        assert g == w, f"score mismatch: {g} != {w}"


def test_no_hit_query_returns_empty(spark, corpus):
    _, tf, tstats, n_docs, avgdl = corpus
    res = (
        bm25_topk(tf, tstats, queries_df(spark), n_docs, avgdl)
        .filter("query_id = 'q_0007'")
        .count()
    )
    assert res == 0


def test_k_respected(spark, corpus):
    _, tf, tstats, n_docs, avgdl = corpus
    res = bm25_topk(tf, tstats, queries_df(spark), n_docs, avgdl).toPandas()
    per_q = res.groupby("query_id").size()
    assert per_q.get("q_0009", 0) <= 5
    assert (per_q <= 10).all()


def test_nondeterministic_sum_close(spark, corpus, oracle):
    """F.sum path (bench mode) agrees within float tolerance."""
    _, tf, tstats, n_docs, avgdl = corpus
    res = (
        bm25_topk(tf, tstats, queries_df(spark), n_docs, avgdl, deterministic=False)
        .toPandas()
        .sort_values(["query_id", "rank"])
    )
    golden = oracle.golden(queries_pdf())
    assert len(res) == len(golden)
    for g, w in zip(res["score"], golden["score"]):
        assert math.isclose(g, w, rel_tol=1e-9)


def test_null_text_counts_as_empty_doc(spark):
    """size(null tokens) must coalesce to 0 so avgdl matches the oracle."""
    from angle_spark.index.stats import corpus_stats as cs
    from angle_spark.index.stats import with_tokens as wt

    df = spark.createDataFrame(
        [("c1", 0, "user", None, "", None), ("c1", 1, "assistant", "w1 w2", "", None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    n, avgdl = cs(wt(df))
    assert n == 2 and avgdl == 1.0

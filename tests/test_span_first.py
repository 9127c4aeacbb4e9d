"""span_first retrieval (query/wand.py mode="span_first") vs a naive
Python golden.

Contracts: a doc matches iff EVERY query token first occurs before
position ``slop`` (exclusive, 0-based — Lucene SpanFirstQuery end);
scores equal the AND scores for the same docs; membership grows with
the bound and converges to plain AND; OOV token => empty; guards
(positional index, slop >= 1).
"""
from __future__ import annotations

import pytest

from angle_spark.functions.tokenizer import tokenize_py
from angle_spark.index.build import build_index, load_index
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.query.wand import wand_topk
from angle_spark.synth import transcripts_df, transcripts_pdf

N_CONVS = 40
SEED = 42
K = 10 ** 6  # full answer sets


@pytest.fixture(scope="module")
def corpus():
    tp = transcripts_pdf(N_CONVS, seed=SEED)
    ordered = tp.sort_values(
        ["conv_id", "turn_idx"], kind="mergesort"
    ).reset_index(drop=True)
    toks = [tokenize_py(t if isinstance(t, str) else "") for t in ordered["text"]]
    return toks


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    docs = with_tokens(
        assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4))
    ).select("doc_id", "tokens", "dl")
    out = str(tmp_path_factory.mktemp("sf") / "idx")
    build_index(spark, docs, out, segment_docs=128, block_size=16,
                positional=True)
    return load_index(spark, out)


def _golden(toks, terms, end):
    return {
        d
        for d, tk in enumerate(toks)
        if all(t in tk and tk.index(t) < end for t in terms)
    }


def _run(spark, index, qs, slop):
    merged, tstats, meta = index
    q = spark.createDataFrame(qs, "query_id string, text string, k int")
    return wand_topk(
        spark, merged, tstats, meta, q, mode="span_first", slop=slop
    ).toPandas()


def test_membership_matches_golden(spark, corpus, index):
    toks = corpus
    t_open = toks[0][0]  # a token that opens a doc
    qs = [("s1", t_open, K), ("s2", f"{toks[3][0]} {toks[3][1]}", K),
          ("s3", "zzznever " + t_open, K)]
    for end in (1, 3, 8):
        got = _run(spark, index, qs, end)
        by = {qid: set(g["doc_id"]) for qid, g in got.groupby("query_id")}
        assert by.get("s1", set()) == _golden(toks, [t_open], end), end
        assert by.get("s2", set()) == _golden(
            toks, [toks[3][0], toks[3][1]], end
        ), end
        assert "s3" not in by  # OOV token kills the conjunction


def test_scores_equal_and_mode(spark, corpus, index):
    toks = corpus
    terms = [toks[3][0], toks[3][1]]
    qs = [("s1", " ".join(terms), K)]
    sf = _run(spark, index, qs, 5).set_index("doc_id")["score"]
    merged, tstats, meta = index
    q = spark.createDataFrame(qs, "query_id string, text string, k int")
    conj = (
        wand_topk(spark, merged, tstats, meta, q, mode="and")
        .toPandas().set_index("doc_id")["score"]
    )
    assert set(sf.index) <= set(conj.index)
    assert all(sf[d] == conj[d] for d in sf.index)


def test_grows_to_and(spark, corpus, index):
    toks = corpus
    terms = [toks[3][0], toks[3][1]]
    qs = [("s1", " ".join(terms), K)]
    sizes = [len(_run(spark, index, qs, e)) for e in (1, 4, 10 ** 6)]
    assert sizes[0] <= sizes[1] <= sizes[2]
    merged, tstats, meta = index
    q = spark.createDataFrame(qs, "query_id string, text string, k int")
    n_and = wand_topk(spark, merged, tstats, meta, q, mode="and").count()
    assert sizes[2] == n_and  # unbounded span_first == plain AND


def test_guards(spark, index, tmp_path):
    merged, tstats, meta = index
    q = spark.createDataFrame([("g", "x", 5)], "query_id string, text string, k int")
    with pytest.raises(ValueError, match="slop >= 1"):
        wand_topk(spark, merged, tstats, meta, q, mode="span_first")
    flat = str(tmp_path / "flat")
    docs = with_tokens(
        assign_doc_ids(transcripts_df(spark, 5, seed=SEED, partitions=2))
    ).select("doc_id", "tokens", "dl")
    build_index(spark, docs, flat, segment_docs=128, block_size=16)
    m2, t2, meta2 = load_index(spark, flat)
    with pytest.raises(ValueError, match="positional"):
        wand_topk(spark, m2, t2, meta2, q, mode="span_first", slop=3)

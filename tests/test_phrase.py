"""Phrase retrieval over the positional index vs a naive Python golden.

Contracts (index/spimi.py positional blocks + query/wand.py mode="phrase"):
exact token-sequence match (order-sensitive, repeated tokens honored),
BM25 scores bit-identical to the disjunctive fold over the phrase's
distinct terms, OOV token => empty, composes with tombstone masking,
positions survive streamed appends and physical purges.
"""

from __future__ import annotations

import pandas as pd
import pytest

from angle_spark.functions.tokenizer import tokenize_py
from angle_spark.index.build import build_index, load_index, refresh_corpus_stats
from angle_spark.index.deletes import delete_docs, load_deletes, purge_deletes
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.oracle import Bm25Oracle
from angle_spark.query.wand import wand_topk
from angle_spark.streaming.maintain import append_micro_batch
from angle_spark.synth import transcripts_df, transcripts_pdf

N_CONVS = 40
SEED = 42


@pytest.fixture(scope="module")
def corpus():
    tp = transcripts_pdf(N_CONVS, seed=SEED)
    ordered = tp.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(
        drop=True
    )
    toks = [tokenize_py(t if isinstance(t, str) else "") for t in ordered["text"]]
    return ordered, toks, Bm25Oracle(ordered)


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    docs = (
        with_tokens(assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4)))
        .select("doc_id", "tokens", "dl")
    )
    out = str(tmp_path_factory.mktemp("phrase") / "idx")
    build_index(spark, docs, out, segment_docs=128, block_size=16, positional=True)
    return out


def _queries(corpus):
    """Phrases guaranteed to exist: lifted straight out of the corpus."""
    _, toks, _ = corpus
    return [
        ("f1", " ".join(toks[0][3:5]), 1000),   # real bigram
        ("f2", " ".join(toks[0][4:2:-1]), 1000),  # the same bigram REVERSED
        ("f3", " ".join(toks[7][0:3]), 1000),   # real trigram
        ("f4", toks[1][0], 1000),               # single-token phrase
        ("f5", "zzznever " + toks[0][3], 10),   # OOV
    ]


def _phrase_docs(toks, phrase: list[str], drop_mod: int | None = None) -> set[int]:
    m = len(phrase)
    out = set()
    for d, tk in enumerate(toks):
        if drop_mod is not None and d % drop_mod == 0:
            continue
        if any(tk[i : i + m] == phrase for i in range(len(tk) - m + 1)):
            out.add(d)
    return out


def _golden(corpus, queries, drop_mod: int | None = None) -> pd.DataFrame:
    _, toks, oracle = corpus
    rows = []
    for qid, text, k in queries:
        phrase = tokenize_py(text)
        if not phrase or any(t not in oracle.df for t in phrase):
            continue
        matched = _phrase_docs(toks, phrase, drop_mod)
        ranked = [
            (d, s)
            for d, s in oracle.score_query(text, oracle.n_docs)
            if d in matched
        ]
        for rank, (doc_id, score) in enumerate(ranked[:k], start=1):
            rows.append((qid, rank, doc_id, score))
    return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])


def _frame(df) -> pd.DataFrame:
    return (
        df.toPandas()
        .astype({"doc_id": "int64", "rank": "int64"})
        .sort_values(["query_id", "rank"], kind="mergesort")
        .reset_index(drop=True)
    )


def _qdf(spark, queries):
    return spark.createDataFrame(queries, schema="query_id string, text string, k int")


def test_phrase_matches_golden(spark, index_dir, corpus):
    qs = _queries(corpus)
    merged, tstats, meta = load_index(spark, index_dir)
    got = _frame(wand_topk(spark, merged, tstats, meta, _qdf(spark, qs), mode="phrase"))
    want = _golden(corpus, qs)
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=0, rtol=0)
    # order sensitivity: the reversed bigram matches a different doc set
    f1 = set(got[got.query_id == "f1"].doc_id)
    f2 = set(got[got.query_id == "f2"].doc_id)
    assert f1 and f1 != f2
    assert "f5" not in set(got.query_id)  # OOV token matches nothing


def test_phrase_composes_with_deletes(spark, index_dir, corpus, tmp_path_factory):
    import shutil

    qs = _queries(corpus)
    out = str(tmp_path_factory.mktemp("phrase_del") / "idx")
    shutil.copytree(index_dir, out)
    delete_docs(spark, out, spark.range(0, corpus[2].n_docs, 3).selectExpr("id as doc_id"))
    merged, tstats, meta = load_index(spark, out)
    got = _frame(
        wand_topk(
            spark,
            merged,
            tstats,
            meta,
            _qdf(spark, qs),
            mode="phrase",
            deletes=load_deletes(spark, out),
        )
    )
    want = _golden(corpus, qs, drop_mod=3)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=0, rtol=0)


def test_positions_survive_purge(spark, index_dir, corpus, tmp_path_factory):
    import shutil

    qs = _queries(corpus)
    out = str(tmp_path_factory.mktemp("phrase_purge") / "idx")
    shutil.copytree(index_dir, out)
    delete_docs(spark, out, spark.range(0, corpus[2].n_docs, 3).selectExpr("id as doc_id"))
    purge_deletes(spark, out)
    merged, tstats, meta = load_index(spark, out)
    assert meta.positional
    got = _frame(wand_topk(spark, merged, tstats, meta, _qdf(spark, qs), mode="phrase"))
    # post-purge scores use LIVE stats: golden = oracle over survivors only
    ordered, toks, _ = corpus
    import numpy as np

    live_mask = (np.arange(len(ordered)) % 3) != 0
    live_ids = np.flatnonzero(live_mask)
    oracle_live = Bm25Oracle(ordered[live_mask])
    toks_live = [toks[i] for i in live_ids]
    rows = []
    for qid, text, k in qs:
        phrase = tokenize_py(text)
        if not phrase or any(t not in oracle_live.df for t in phrase):
            continue
        matched = _phrase_docs(toks_live, phrase)
        ranked = [
            (d, s)
            for d, s in oracle_live.score_query(text, oracle_live.n_docs)
            if d in matched
        ]
        for rank, (doc_id, score) in enumerate(ranked[:k], start=1):
            rows.append((qid, rank, int(live_ids[doc_id]), score))
    want = (
        pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])
        .sort_values(["query_id", "rank"], kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=0, rtol=0)


def _near_docs(toks, terms: list[str], slop: int) -> set[int]:
    """naive truth: any choice of one position per distinct term spanning
    <= slop tokens."""
    import itertools

    out = set()
    for d, tk in enumerate(toks):
        pos = {t: [i for i, x in enumerate(tk) if x == t] for t in terms}
        if any(not p for p in pos.values()):
            continue
        for combo in itertools.product(*(pos[t] for t in terms)):
            if max(combo) - min(combo) <= slop:
                out.add(d)
                break
    return out


def test_near_matches_naive_truth(spark, index_dir, corpus):
    _, toks, oracle = corpus
    # a bigram that exists somewhere, queried at three slop levels
    a, b = toks[0][3], toks[0][4]
    qs = [("s1", f"{a} {b}", 1000)]
    merged, tstats, meta = load_index(spark, index_dir)
    sizes = {}
    for slop in (1, 8, 10_000):
        got = _frame(
            wand_topk(
                spark, merged, tstats, meta, _qdf(spark, qs), mode="near", slop=slop
            )
        )
        terms = sorted({a, b})
        want_docs = _near_docs(toks, terms, slop)
        assert set(got.doc_id) == want_docs, slop
        sizes[slop] = len(got)
        # scores are the AND scores (BM25 over distinct terms)
        want_scores = {
            d: s for d, s in oracle.score_query(f"{a} {b}", oracle.n_docs)
        }
        for r in got.itertuples(index=False):
            assert want_scores[r.doc_id] == r.score
    # slop is load-bearing and monotone; huge slop == conjunctive AND
    assert sizes[1] <= sizes[8] <= sizes[10_000]
    assert sizes[1] < sizes[10_000]
    and_rows = wand_topk(
        spark, merged, tstats, meta, _qdf(spark, qs), mode="and"
    ).count()
    assert sizes[10_000] == and_rows


def test_positions_survive_streamed_append(spark, tmp_path, corpus):
    """meta.positional propagates to streamed delta segments: a phrase
    only present in the APPENDED tail must be found without any merge."""
    batch = transcripts_df(spark, 30, seed=SEED)
    docs = with_tokens(assign_doc_ids(batch)).select("doc_id", "tokens", "dl")
    out = str(tmp_path / "idx")
    meta = build_index(spark, docs, out, segment_docs=256, block_size=32, positional=True)
    tail = transcripts_df(spark, N_CONVS, seed=SEED).filter("conv_id >= 'conv_00000030'")
    append_micro_batch(tail, 0, out, meta.n_docs)
    refresh_corpus_stats(spark, out)

    ordered, toks, _ = corpus
    # a doc index in the appended range (docIDs continue the stable order)
    tail_doc = meta.n_docs + 2
    phrase_q = [("t1", " ".join(toks[tail_doc][1:3]), 1000)]
    merged, tstats, meta2 = load_index(spark, out)
    got = _frame(
        wand_topk(spark, merged, tstats, meta2, _qdf(spark, phrase_q), mode="phrase")
    )
    want = _golden(corpus, phrase_q)
    assert tail_doc in set(want.doc_id)  # the phrase really lives in the tail
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=0, rtol=0)


def test_near_oov_query_dropped_driver_side(spark, index_dir, corpus):
    """A NEAR query with an OOV token is dead by definition; round-3
    verdict: it must be dropped DRIVER-side so its surviving terms never
    inflate the candidate-block In(term) pushdown (shards already
    returned nothing, but blocks were shipped for no possible result)."""
    import re

    _, toks, _ = corpus
    live_terms = sorted(set(tokenize_py(" ".join(toks[0][3:5]))))
    # a term that appears ONLY in the dead query (and in the corpus)
    dead_partner = next(
        t for t in toks[9] if t not in live_terms
    )
    queries = [
        ("ok", " ".join(live_terms), 10),
        ("dead", f"zzznever {dead_partner}", 10),
    ]
    merged, tstats, meta = load_index(spark, index_dir)
    out = wand_topk(
        spark, merged, tstats, meta, _qdf(spark, queries), mode="near", slop=3
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    m = re.search(r"term#\d+ IN \(([^)]*)\)", plan)
    assert m, plan
    in_list = {t.strip() for t in m.group(1).split(",")}
    for t in live_terms:
        assert t in in_list
    assert dead_partner not in in_list
    got = _frame(out)
    assert set(got["query_id"]) <= {"ok"}

"""delete_by_query (index/deletes.delete_by_query, Searcher method).

Contracts:
  1. the tombstoned set equals the query's golden matched set;
  2. matching runs against the LIVE view — already-deleted docs are not
     re-matched, so re-running the same query returns 0 (idempotence);
  3. returned count = newly deleted docs this call;
  4. post-delete searches exclude the matched docs and equal a plain
     delete_docs of the same set bit-for-bit;
  5. composes through the Searcher (refresh_deletes picked up).
"""
from __future__ import annotations

import pandas as pd
import pytest

from angle_spark.functions.tokenizer import tokenize_py
from angle_spark.index.build import build_index, load_index
from angle_spark.index.deletes import delete_by_query, delete_docs, load_deletes
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.query.searcher import Searcher
from angle_spark.query.wand import wand_topk
from angle_spark.synth import queries_df, transcripts_df, transcripts_pdf

N_CONVS = 40
SEED = 42
DBQ = "w0004 AND (w0007 OR w0011)"


@pytest.fixture(scope="module")
def corpus_tokens():
    tp = transcripts_pdf(N_CONVS, seed=SEED)
    ordered = tp.sort_values(
        ["conv_id", "turn_idx"], kind="mergesort"
    ).reset_index(drop=True)
    return [tokenize_py(t if isinstance(t, str) else "") for t in ordered["text"]]


def _golden_matches(toks):
    return {
        d
        for d, tk in enumerate(toks)
        if "w0004" in tk and ("w0007" in tk or "w0011" in tk)
    }


@pytest.fixture()
def idx(spark, tmp_path):
    docs = with_tokens(
        assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4))
    ).select("doc_id", "tokens", "dl")
    out = str(tmp_path / "idx")
    build_index(spark, docs, out, segment_docs=128, block_size=16)
    return out


def test_tombstones_equal_golden_and_idempotent(spark, idx, corpus_tokens):
    want = _golden_matches(corpus_tokens)
    assert want, "probe query matches nothing — pick new terms"
    n = delete_by_query(spark, idx, DBQ)
    assert n == len(want)
    got = {r["doc_id"] for r in load_deletes(spark, idx).collect()}
    assert got == want
    # live-view matching: the second run sees only live docs -> 0
    assert delete_by_query(spark, idx, DBQ) == 0


def test_counts_only_newly_deleted(spark, idx, corpus_tokens):
    want = sorted(_golden_matches(corpus_tokens))
    pre = want[: len(want) // 2]
    delete_docs(spark, idx, spark.createDataFrame([(d,) for d in pre], "doc_id long"))
    n = delete_by_query(spark, idx, DBQ)
    assert n == len(want) - len(pre)


def test_search_equals_manual_delete(spark, idx, tmp_path, corpus_tokens):
    docs = with_tokens(
        assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4))
    ).select("doc_id", "tokens", "dl")
    manual = str(tmp_path / "manual")
    build_index(spark, docs, manual, segment_docs=128, block_size=16)
    want = sorted(_golden_matches(corpus_tokens))
    delete_docs(
        spark, manual, spark.createDataFrame([(d,) for d in want], "doc_id long")
    )
    delete_by_query(spark, idx, DBQ)

    def run(d):
        merged, tstats, meta = load_index(spark, d)
        return (
            wand_topk(
                spark, merged, tstats, meta, queries_df(spark),
                deletes=load_deletes(spark, d),
            )
            .toPandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )

    a, b = run(idx), run(manual)
    pd.testing.assert_frame_equal(a, b)
    assert not set(a["doc_id"]) & set(want)


def test_searcher_method(spark, idx, corpus_tokens):
    want = _golden_matches(corpus_tokens)
    with Searcher(spark, idx) as s:
        base = s.search(queries_df(spark)).toPandas()
        assert s.delete_by_query(DBQ) == len(want)
        after = s.search(queries_df(spark)).toPandas()
    assert not set(after["doc_id"]) & want
    assert set(base["doc_id"]) - want <= set(base["doc_id"])
    # masked search returns the base results minus the deleted docs
    # only where they appeared; every surviving (query, doc) pair persists
    surv = base[~base["doc_id"].isin(want)]
    assert set(map(tuple, surv[["query_id", "doc_id"]].values)) <= set(
        map(tuple, after[["query_id", "doc_id"]].values)
    ) | set()

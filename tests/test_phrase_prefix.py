"""match_phrase_prefix (query/prefix.phrase_prefix_topk).

Contracts: membership equals the golden OR-of-phrases over the capped
top-terms expansion (df DESC, term ASC); the cap binds; a single-token
query equals mode="prefix"; a dead stem retrieves nothing; Searcher
kwargs (deletes/doc_filter) compose through the boolean engine.
"""
from __future__ import annotations

import pytest

from angle_spark.functions.tokenizer import tokenize_py
from angle_spark.index.build import build_index, load_index
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.query.prefix import phrase_prefix_topk
from angle_spark.query.wand import wand_topk
from angle_spark.synth import transcripts_df, transcripts_pdf

N_CONVS = 40
SEED = 42
K = 10 ** 6


@pytest.fixture(scope="module")
def corpus():
    tp = transcripts_pdf(N_CONVS, seed=SEED)
    ordered = tp.sort_values(
        ["conv_id", "turn_idx"], kind="mergesort"
    ).reset_index(drop=True)
    return [tokenize_py(t if isinstance(t, str) else "") for t in ordered["text"]]


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    docs = with_tokens(
        assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4))
    ).select("doc_id", "tokens", "dl")
    out = str(tmp_path_factory.mktemp("pp") / "idx")
    build_index(spark, docs, out, segment_docs=128, block_size=16,
                positional=True)
    return load_index(spark, out)


def _expansions(toks, stem, cap):
    df = {}
    for tk in toks:
        for t in set(tk):
            df[t] = df.get(t, 0) + 1
    cands = sorted(
        ((t, d) for t, d in df.items() if t.startswith(stem)),
        key=lambda x: (-x[1], x[0]),
    )
    return [t for t, _ in cands[:cap]]


def _phrase_docs(toks, phrase):
    m = len(phrase)
    return {
        d
        for d, tk in enumerate(toks)
        if any(tk[i: i + m] == phrase for i in range(len(tk) - m + 1))
    }


def _run(spark, index, qs, cap):
    merged, tstats, meta = index
    q = spark.createDataFrame(qs, "query_id string, text string, k int")
    return phrase_prefix_topk(
        spark, merged, tstats, meta, q, max_expansions=cap
    ).toPandas()


def test_membership_matches_golden(spark, corpus, index):
    toks = corpus
    lead = toks[0][3]  # a real token; stem = its first 2 chars + next tok
    nxt = toks[0][4]
    stem = nxt[:2]
    for cap in (1, 3, 64):
        got = _run(spark, index, [("p1", f"{lead} {nxt[:2]}", K)], cap)
        exp = _expansions(toks, stem, cap)
        want = set()
        for e in exp:
            want |= _phrase_docs(toks, [lead, e])
        assert set(got["doc_id"]) == want, (cap, exp)


def test_single_token_equals_prefix_mode(spark, corpus, index):
    merged, tstats, meta = index
    qs = [("p1", "w0", K)]
    q = spark.createDataFrame(qs, "query_id string, text string, k int")
    a = _run(spark, index, qs, 8).sort_values("rank").reset_index(drop=True)
    b = (
        wand_topk(spark, merged, tstats, meta,
                  spark.createDataFrame([("p1", "w0*", K)],
                                        "query_id string, text string, k int"),
                  mode="prefix", max_expansions=8)
        .toPandas().sort_values("rank").reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_dead_stem_and_empty(spark, corpus, index):
    got = _run(spark, index,
               [("d1", "w0000 zzzneverx", K), ("d2", "", K)], 16)
    assert got.empty


def test_scores_equal_manual_boolean(spark, corpus, index):
    toks = corpus
    merged, tstats, meta = index
    lead, nxt = toks[0][3], toks[0][4]
    exp = _expansions(toks, nxt[:2], 4)
    manual_text = " OR ".join(f'"{lead} {e}"' for e in exp)
    q = spark.createDataFrame(
        [("p1", manual_text, K)], "query_id string, text string, k int"
    )
    want = wand_topk(
        spark, merged, tstats, meta, q, mode="boolean"
    ).toPandas().sort_values("rank").reset_index(drop=True)
    got = _run(spark, index, [("p1", f"{lead} {nxt[:2]}", K)], 4)
    got = got.sort_values("rank").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(got, want)

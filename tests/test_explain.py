"""Per-hit score explain (query/explain.py): contributions must sum to
the engine's reported score EXACTLY (same inputs, same ascending-term
float64 fold), with tf/dl matching the corpus truth."""

from __future__ import annotations

import pandas as pd
import pytest

from angle_spark.functions.tokenizer import tokenize_py
from angle_spark.index.build import build_index, load_index
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.query.explain import explain_hits
from angle_spark.query.wand import wand_topk
from angle_spark.synth import queries_df, queries_pdf, transcripts_df, transcripts_pdf

N_CONVS = 30
SEED = 21


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    docs = with_tokens(
        assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4))
    ).select("doc_id", "tokens", "dl")
    out = str(tmp_path_factory.mktemp("explain") / "idx")
    build_index(spark, docs, out, segment_docs=128, block_size=16)
    return out


def test_explain_sums_to_reported_score_exactly(spark, index_dir):
    merged, tstats, meta = load_index(spark, index_dir)
    queries = queries_df(spark)
    results = wand_topk(spark, merged, tstats, meta, queries)
    got = results.toPandas()
    assert len(got) > 0
    exp = explain_hits(spark, merged, tstats, meta, queries, results).toPandas()
    assert len(exp) > 0
    by_hit = exp.sort_values("term", kind="mergesort").groupby(
        ["query_id", "doc_id"], sort=False
    )
    summed = {}
    for (qid, doc), grp in by_hit:
        acc = 0.0
        for c in grp["contribution"]:
            acc += float(c)  # ascending-term sequential fold, like the engine
        summed[(qid, int(doc))] = acc
    for row in got.itertuples(index=False):
        key = (row.query_id, int(row.doc_id))
        assert key in summed, key
        assert summed[key] == row.score, (key, summed[key], row.score)
    # every hit explained, nothing extra
    assert set(summed) == {(r.query_id, int(r.doc_id)) for r in got.itertuples(index=False)}


def test_explain_inputs_match_corpus_truth(spark, index_dir):
    merged, tstats, meta = load_index(spark, index_dir)
    queries = queries_df(spark)
    results = wand_topk(spark, merged, tstats, meta, queries)
    exp = explain_hits(spark, merged, tstats, meta, queries, results).toPandas()
    tp = transcripts_pdf(N_CONVS, seed=SEED).sort_values(
        ["conv_id", "turn_idx"], kind="mergesort"
    ).reset_index(drop=True)
    toks = [tokenize_py(t if isinstance(t, str) else "") for t in tp["text"]]
    qtext = dict(zip(queries_pdf()["query_id"], queries_pdf()["text"]))
    for row in exp.itertuples(index=False):
        doc_toks = toks[int(row.doc_id)]
        assert row.tf == doc_toks.count(row.term)
        assert row.dl == len(doc_toks)
        assert row.term in tokenize_py(qtext[row.query_id])
        assert row.contribution > 0


def test_explain_through_searcher(spark, index_dir):
    from angle_spark.query.searcher import Searcher

    with Searcher(spark, index_dir) as s:
        res = s.search(queries_df(spark))
        exp = s.explain(queries_df(spark), res).toPandas()
        assert len(exp) > 0
        assert set(exp.columns) == {
            "query_id", "doc_id", "term", "tf", "dl", "idf", "contribution"
        }

"""Filtered retrieval (doc_filter allow-list): only listed docs ranked,
full-corpus stats, exact under pruning, composes with tombstones."""

from __future__ import annotations

import pandas as pd
import pytest

from angle_spark.index.build import build_index, load_index
from angle_spark.index.deletes import delete_docs, load_deletes
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.oracle import Bm25Oracle
from angle_spark.query.wand import wand_topk
from angle_spark.synth import queries_df, queries_pdf, transcripts_df, transcripts_pdf

N_CONVS = 40
SEED = 42


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    docs = (
        with_tokens(assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4)))
        .select("doc_id", "tokens", "dl")
    )
    out = str(tmp_path_factory.mktemp("filt") / "idx")
    build_index(spark, docs, out, segment_docs=128, block_size=16)
    return out


@pytest.fixture(scope="module")
def oracle():
    return Bm25Oracle(transcripts_pdf(N_CONVS, seed=SEED))


def _golden(oracle, queries, pred):
    rows = []
    for _, q in queries.iterrows():
        ranked = [
            (d, s) for d, s in oracle.score_query(q["text"], oracle.n_docs) if pred(d)
        ]
        for rank, (doc_id, score) in enumerate(ranked[: int(q["k"])], start=1):
            rows.append((q["query_id"], rank, doc_id, score))
    return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])


def _frame(df):
    return (
        df.toPandas()
        .astype({"doc_id": "int64", "rank": "int64"})
        .sort_values(["query_id", "rank"], kind="mergesort")
        .reset_index(drop=True)
    )


def test_filter_matches_golden_and_prune_exact(spark, index_dir, oracle):
    merged, tstats, meta = load_index(spark, index_dir)
    allowed = spark.range(0, oracle.n_docs, 2).selectExpr("id as doc_id")  # evens
    got = _frame(
        wand_topk(spark, merged, tstats, meta, queries_df(spark), doc_filter=allowed)
    )
    want = _golden(oracle, queries_pdf(), lambda d: d % 2 == 0)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=0, rtol=0)
    got_ex = _frame(
        wand_topk(
            spark, merged, tstats, meta, queries_df(spark), prune=False, doc_filter=allowed
        )
    )
    pd.testing.assert_frame_equal(got, got_ex, atol=0, rtol=0)


def test_filter_composes_with_deletes(spark, index_dir, oracle, tmp_path_factory):
    import shutil

    out = str(tmp_path_factory.mktemp("filt_del") / "idx")
    shutil.copytree(index_dir, out)
    delete_docs(spark, out, spark.range(0, oracle.n_docs, 6).selectExpr("id as doc_id"))
    merged, tstats, meta = load_index(spark, out)
    allowed = spark.range(0, oracle.n_docs, 2).selectExpr("id as doc_id")
    got = _frame(
        wand_topk(
            spark,
            merged,
            tstats,
            meta,
            queries_df(spark),
            doc_filter=allowed,
            deletes=load_deletes(spark, out),
        )
    )
    want = _golden(oracle, queries_pdf(), lambda d: d % 2 == 0 and d % 6 != 0)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=0, rtol=0)


def test_filter_deletes_phrase_three_way(spark, tmp_path_factory, oracle):
    """the full composition: positional index + allow-list + tombstones +
    phrase mode, against a naive golden."""
    from angle_spark.functions.tokenizer import tokenize_py

    docs = (
        with_tokens(assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4)))
        .select("doc_id", "tokens", "dl")
    )
    out = str(tmp_path_factory.mktemp("filt3") / "idx")
    build_index(spark, docs, out, segment_docs=128, block_size=16, positional=True)
    delete_docs(spark, out, spark.range(0, oracle.n_docs, 5).selectExpr("id as doc_id"))

    tp = transcripts_pdf(N_CONVS, seed=SEED)
    ordered = tp.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(
        drop=True
    )
    toks = [tokenize_py(t if isinstance(t, str) else "") for t in ordered["text"]]
    phrase = toks[1][2:4]
    q = spark.createDataFrame(
        [("x", " ".join(phrase), 1000)], "query_id string, text string, k int"
    )
    merged, tstats, meta = load_index(spark, out)
    got = _frame(
        wand_topk(
            spark,
            merged,
            tstats,
            meta,
            q,
            mode="phrase",
            doc_filter=spark.range(0, oracle.n_docs, 2).selectExpr("id as doc_id"),
            deletes=load_deletes(spark, out),
        )
    )

    def ok(d):
        if d % 2 != 0 or d % 5 == 0:
            return False
        tk, m = toks[d], len(phrase)
        return any(tk[i : i + m] == phrase for i in range(len(tk) - m + 1))

    want = _golden(oracle, pd.DataFrame([("x", " ".join(phrase), 1000)],
                                        columns=["query_id", "text", "k"]), ok)
    assert len(want) > 0 or not any(ok(d) for d in range(oracle.n_docs))
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=0, rtol=0)


def test_empty_filter_matches_nothing(spark, index_dir):
    merged, tstats, meta = load_index(spark, index_dir)
    empty = spark.createDataFrame([], "doc_id long")
    assert (
        wand_topk(spark, merged, tstats, meta, queries_df(spark), doc_filter=empty).count()
        == 0
    )

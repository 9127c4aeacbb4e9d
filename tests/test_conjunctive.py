"""Conjunctive (AND) retrieval: wand_topk(mode="and") vs a Python golden.

Contract (query/wand.py): only docs matching EVERY distinct query token
are returned, BM25-scored bit-identically to the disjunctive fold; an
out-of-vocabulary token makes the query match nothing; results compose
with tombstone masking (a deleted doc can't satisfy the conjunction).
"""

from __future__ import annotations

import pandas as pd
import pytest

from angle_spark.functions.tokenizer import tokenize_py
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
    out = str(tmp_path_factory.mktemp("conj") / "idx")
    build_index(spark, docs, out, segment_docs=128, block_size=16)
    return out


@pytest.fixture(scope="module")
def oracle():
    return Bm25Oracle(transcripts_pdf(N_CONVS, seed=SEED))


def _and_golden(
    oracle: Bm25Oracle, queries: pd.DataFrame, drop_mod: int | None = None
) -> pd.DataFrame:
    """Disjunctive scores filtered to docs containing every distinct query
    token (then optionally minus doc_id % drop_mod == 0), re-ranked."""
    rows = []
    for _, q in queries.iterrows():
        terms = sorted(set(tokenize_py(q["text"])))
        if not terms or any(t not in oracle.df for t in terms):
            continue
        eligible = set(oracle.tf[terms[0]])
        for t in terms[1:]:
            eligible &= set(oracle.tf[t])
        ranked = [
            (d, s)
            for d, s in oracle.score_query(q["text"], oracle.n_docs)
            if d in eligible and (drop_mod is None or d % drop_mod != 0)
        ]
        for rank, (doc_id, score) in enumerate(ranked[: int(q["k"])], start=1):
            rows.append((q["query_id"], rank, doc_id, score))
    return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])


def _frame(df) -> pd.DataFrame:
    return (
        df.toPandas()
        .astype({"doc_id": "int64", "rank": "int64"})
        .sort_values(["query_id", "rank"], kind="mergesort")
        .reset_index(drop=True)
    )


def test_and_matches_golden(spark, index_dir, oracle):
    merged, tstats, meta = load_index(spark, index_dir)
    got = _frame(
        wand_topk(spark, merged, tstats, meta, queries_df(spark), mode="and")
    )
    want = _and_golden(oracle, queries_pdf())
    assert len(want) > 0  # the synth set must actually exercise AND
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=0, rtol=0)
    # AND must differ from OR somewhere on this corpus, or the test is vacuous
    got_or = _frame(wand_topk(spark, merged, tstats, meta, queries_df(spark)))
    assert not got.equals(got_or)


def test_and_oov_token_matches_nothing(spark, index_dir):
    merged, tstats, meta = load_index(spark, index_dir)
    q = spark.createDataFrame(
        [("x", "w0000 zzznever", 10)], schema="query_id string, text string, k int"
    )
    assert wand_topk(spark, merged, tstats, meta, q, mode="and").count() == 0


def test_and_composes_with_deletes(spark, index_dir, oracle, tmp_path_factory):
    import shutil

    out = str(tmp_path_factory.mktemp("conj_del") / "idx")
    shutil.copytree(index_dir, out)
    delete_docs(
        spark,
        out,
        spark.range(0, oracle.n_docs, 3).selectExpr("id as doc_id"),
    )
    merged, tstats, meta = load_index(spark, out)
    got = _frame(
        wand_topk(
            spark,
            merged,
            tstats,
            meta,
            queries_df(spark),
            mode="and",
            deletes=load_deletes(spark, out),
        )
    )
    want = _and_golden(oracle, queries_pdf(), drop_mod=3)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=0, rtol=0)


def test_mode_validated(spark, index_dir):
    merged, tstats, meta = load_index(spark, index_dir)
    with pytest.raises(ValueError):
        wand_topk(spark, merged, tstats, meta, queries_df(spark), mode="xor")

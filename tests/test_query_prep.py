"""wand_topk query-side prep (round-3 VERDICT task 4).

A Spark-DataFrame query batch must be tokenized ON EXECUTORS (tokens_col),
with the driver collecting only O(|queries|) prepared rows — never looping
tokenize_py over query text. The pandas-DataFrame path stays the bounded
served-path opt-in; both must produce identical frames and match the
Python oracle."""

from __future__ import annotations

import pandas as pd
import pytest

from angle_spark.index.build import build_index, load_index
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.oracle import Bm25Oracle
from angle_spark.query.wand import wand_topk
from angle_spark.synth import queries_df, queries_pdf, transcripts_df, transcripts_pdf

N_CONVS = 40


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("qprep") / "idx")
    docs = with_tokens(
        assign_doc_ids(transcripts_df(spark, N_CONVS, seed=42))
    ).select("doc_id", "tokens", "dl")
    build_index(spark, docs, out, segment_docs=256, block_size=32)
    return load_index(spark, out)


def _frame(df) -> pd.DataFrame:
    return (
        df.toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def test_spark_and_pandas_query_paths_identical(spark, index):
    merged, tstats, meta = index
    via_spark = _frame(wand_topk(spark, merged, tstats, meta, queries_df(spark)))
    via_pandas = _frame(wand_topk(spark, merged, tstats, meta, queries_pdf()))
    pd.testing.assert_frame_equal(via_spark, via_pandas)  # exact, incl. scores

    oracle = Bm25Oracle(transcripts_pdf(N_CONVS, seed=42))
    golden = oracle.golden(queries_pdf())
    assert list(zip(via_spark["query_id"], via_spark["rank"], via_spark["doc_id"])) == list(
        zip(golden["query_id"], golden["rank"], golden["doc_id"])
    )
    for g, w in zip(via_spark["score"], golden["score"]):
        assert g == w


def test_spark_path_never_tokenizes_on_driver(spark, index, monkeypatch):
    """tokenize_py is the DRIVER/served rendition; the Spark-DF path must
    run entirely on the executor-side Column rendition. Poisoning the
    driver symbol proves no driver loop over query text remains — the
    executor side is a JVM Column expression, so it cannot be affected."""
    import angle_spark.functions.tokenizer as tok_mod

    def boom(text):
        raise AssertionError("driver-side tokenize_py called for a Spark query batch")

    monkeypatch.setattr(tok_mod, "tokenize_py", boom)
    merged, tstats, meta = index
    out = _frame(wand_topk(spark, merged, tstats, meta, queries_df(spark)))
    assert len(out) > 0

    # and the pandas served path DOES use it (the poison must trip)
    with pytest.raises(AssertionError, match="driver-side tokenize_py"):
        wand_topk(spark, merged, tstats, meta, queries_pdf())

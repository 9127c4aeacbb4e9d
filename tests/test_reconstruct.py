"""Doc reconstruction + reindex (index/reconstruct.py): a positional
index is information-complete — reconstruct == the original tokenized
corpus bitwise (ORDER included); reindex-to-v2 from the index alone ==
a fresh v2 build of the corpus, byte-for-byte."""

from __future__ import annotations

import pandas as pd
import pytest

from angle_spark.functions.tokenizer import tokenize_v2_py
from angle_spark.index.build import build_index, load_index
from angle_spark.index.reconstruct import reconstruct_docs, reindex
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.synth import transcripts_df

COLS = (
    "term segment_id block_in_seg first_doc last_doc n_postings max_tf "
    "min_dl sum_tf max_impact docs_bin tfs_bin dls_bin pos_bin"
).split()


@pytest.fixture(scope="module")
def corpus(spark):
    return with_tokens(
        assign_doc_ids(transcripts_df(spark, 20, seed=5, partitions=4))
    ).select("doc_id", "tokens", "dl").localCheckpoint()


@pytest.fixture(scope="module")
def v1_idx_dir(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("rc") / "v1")
    build_index(spark, corpus, d, segment_docs=128, block_size=16,
                positional=True)
    return d


def _sorted_docs(df):
    pdf = df.toPandas().sort_values("doc_id").reset_index(drop=True)
    pdf["tokens"] = pdf["tokens"].map(list)
    return pdf


def test_reconstruct_is_exact(spark, corpus, v1_idx_dir):
    got = _sorted_docs(reconstruct_docs(spark, v1_idx_dir))
    want = _sorted_docs(corpus)
    pd.testing.assert_frame_equal(got, want)


def test_reindex_v2_equals_fresh_v2_build(
    spark, corpus, v1_idx_dir, tmp_path_factory
):
    root = tmp_path_factory.mktemp("rc_v2")
    # fresh v2: re-tokenize the corpus with the v2 analyzer from scratch
    from pyspark.sql import functions as F
    from angle_spark.functions.tokenizer import v2_from_v1_tokens_col

    t2 = v2_from_v1_tokens_col(F.col("tokens"))
    fresh_docs = corpus.select(
        "doc_id", t2.alias("tokens"), F.size(t2).cast("long").alias("dl")
    )
    want_dir = str(root / "fresh")
    build_index(spark, fresh_docs, want_dir, segment_docs=128,
                block_size=16, positional=True, analyzer="v2-sstem-stop")
    dst = str(root / "reindexed")
    meta = reindex(spark, v1_idx_dir, dst)
    assert meta.analyzer == "v2-sstem-stop"

    def blocks(d):
        merged, _, _ = load_index(spark, d)
        pdf = merged.toPandas()[COLS]
        pdf["segment_id"] = pdf["segment_id"].astype("int64")
        return pdf.sort_values(
            ["term", "segment_id", "block_in_seg"], kind="mergesort"
        ).reset_index(drop=True)

    pd.testing.assert_frame_equal(blocks(dst), blocks(want_dir))
    _, t_got, m_got = load_index(spark, dst)
    _, t_want, _ = load_index(spark, want_dir)
    assert (
        t_got.toPandas().sort_values("term").reset_index(drop=True).equals(
            t_want.toPandas().sort_values("term").reset_index(drop=True)
        )
    )
    assert m_got.avgdl < 200  # v2 dls are post-stopword (sanity)


def test_v2_tokens_match_python_rendition(spark, corpus, v1_idx_dir,
                                          tmp_path_factory):
    # the reindexed token streams == tokenize_v2_py over the raw text
    raw = transcripts_df(spark, 20, seed=5, partitions=4)
    docs = assign_doc_ids(raw).select("doc_id", "text").toPandas()
    dst = str(tmp_path_factory.mktemp("rc_py") / "idx")
    reindex(spark, v1_idx_dir, dst)
    rec = _sorted_docs(reconstruct_docs(spark, dst))
    want = {
        int(r.doc_id): tokenize_v2_py(r.text) for r in docs.itertuples()
    }
    for r in rec.itertuples():
        assert list(r.tokens) == want[int(r.doc_id)]


def test_nonpositional_source_rejected(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("rc_np") / "idx")
    build_index(spark, corpus, d, segment_docs=128, block_size=16)
    with pytest.raises(ValueError, match="positional"):
        reconstruct_docs(spark, d)


def test_v2_source_rejected(spark, corpus, v1_idx_dir, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("rc_guard") / "v2")
    reindex(spark, v1_idx_dir, dst)
    with pytest.raises(ValueError, match="v1 index"):
        reindex(spark, dst, dst + "_again")

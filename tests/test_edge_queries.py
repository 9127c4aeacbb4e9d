"""Degenerate query batches must return empty results, not throw:
an empty batch (pandas or Spark), k=0, and empty batches through the
boolean/prefix driver-side prep paths."""

from __future__ import annotations

import pandas as pd
import pytest

from angle_spark.index.build import build_index, load_index
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.query.wand import wand_topk
from angle_spark.synth import transcripts_df


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    docs = with_tokens(
        assign_doc_ids(transcripts_df(spark, 10, seed=1, partitions=2))
    ).select("doc_id", "tokens", "dl")
    out = str(tmp_path_factory.mktemp("edge") / "idx")
    build_index(spark, docs, out, segment_docs=64, block_size=16)
    return load_index(spark, out)


def test_empty_batches_and_k0(spark, idx):
    merged, tstats, meta = idx
    empty_pd = pd.DataFrame(columns=["query_id", "text", "k"])
    empty_sp = spark.createDataFrame([], "query_id string, text string, k int")
    assert wand_topk(spark, merged, tstats, meta, empty_pd).count() == 0
    assert wand_topk(spark, merged, tstats, meta, empty_sp).count() == 0
    assert (
        wand_topk(spark, merged, tstats, meta, empty_sp, mode="boolean").count()
        == 0
    )
    assert (
        wand_topk(spark, merged, tstats, meta, empty_pd, mode="prefix").count()
        == 0
    )
    k0 = pd.DataFrame([("z", "w0000", 0)], columns=["query_id", "text", "k"])
    assert wand_topk(spark, merged, tstats, meta, k0).count() == 0
    ok = pd.DataFrame([("z", "w0000", 10)], columns=["query_id", "text", "k"])
    assert wand_topk(spark, merged, tstats, meta, ok).count() == 10

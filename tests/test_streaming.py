"""Streaming index maintenance: batch-build a prefix of the corpus, stream
the remainder via Structured Streaming, refresh stats + merge — the final
index must answer the reference query set identically to the one-shot
batch build (and the oracle)."""

from __future__ import annotations

import os

import pytest

from angle_spark.index.build import build_index, load_index, merge_index, refresh_corpus_stats
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.oracle import Bm25Oracle
from angle_spark.query.wand import wand_topk
from angle_spark.streaming.maintain import maintain_stream
from angle_spark.synth import (
    TRANSCRIPTS_SCHEMA,
    queries_df,
    queries_pdf,
    transcripts_df,
    transcripts_pdf,
)

N_ALL = 40
N_BATCH = 30  # convs indexed in batch; the rest arrive as a stream


def test_streamed_index_matches_oracle(spark, tmp_path):
    out = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    stream_in = str(tmp_path / "incoming")
    os.makedirs(stream_in, exist_ok=True)

    # conv ids are zero-padded so conv_00000030.. sort AFTER the batch ones;
    # streamed docIDs therefore extend the stable global order
    batch = transcripts_df(spark, N_BATCH, seed=42)
    docs = with_tokens(assign_doc_ids(batch)).select("doc_id", "tokens", "dl")
    meta = build_index(spark, docs, out, segment_docs=256, block_size=32)
    hw = meta.n_docs

    # stage the remaining conversations as files for the stream source
    tail = transcripts_df(spark, N_ALL, seed=42).filter(
        f"conv_id >= 'conv_{N_BATCH:08d}'"
    )
    tail.write.mode("overwrite").parquet(stream_in)

    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(stream_in)
    )
    q = maintain_stream(stream, out, hw, ckpt, trigger_seconds=1)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    meta2 = refresh_corpus_stats(spark, out)
    assert meta2.n_docs > hw
    merge_index(spark, out, meta2)

    merged, tstats, meta3 = load_index(spark, out)
    got = (
        wand_topk(spark, merged, tstats, meta3, queries_df(spark))
        .toPandas()
        .sort_values(["query_id", "rank"])
    )
    oracle = Bm25Oracle(transcripts_pdf(N_ALL, seed=42))
    golden = oracle.golden(queries_pdf())
    assert meta2.n_docs == oracle.n_docs
    assert meta2.avgdl == oracle.avgdl
    assert list(zip(got["query_id"], got["rank"], got["doc_id"])) == list(
        zip(golden["query_id"], golden["rank"], golden["doc_id"])
    )
    for g, w in zip(got["score"], golden["score"]):
        assert g == w

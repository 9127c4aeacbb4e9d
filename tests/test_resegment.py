"""Resegmenting (index/resegment.py — ES _shrink/_split analog): the
output must be BYTE-identical to a fresh build at the new granularity,
query-identical through the scorer, and refuse unmerged delta state."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

from angle_spark.index.build import build_index, load_index
from angle_spark.index.resegment import resegment_index
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.query.wand import wand_topk
from angle_spark.synth import transcripts_df

BIG_K = 1_000_000


@pytest.fixture(scope="module")
def docs(spark):
    return with_tokens(
        assign_doc_ids(transcripts_df(spark, 25, seed=3, partitions=4))
    ).select("doc_id", "tokens", "dl").localCheckpoint()


COLS = (
    "term segment_id block_in_seg first_doc last_doc n_postings max_tf "
    "min_dl sum_tf max_impact docs_bin tfs_bin dls_bin pos_bin"
).split()


def _blocks_pdf(spark, d):
    merged, _, _ = load_index(spark, d)
    pdf = merged.toPandas()[COLS]  # partition-column position varies
    # the builder's merged/ reads segment_id back as int32 (Hive
    # partition-dir inference); resegment writes it as a long column —
    # same values, storage-path artifact
    pdf["segment_id"] = pdf["segment_id"].astype("int64")
    return pdf.sort_values(
        ["term", "segment_id", "block_in_seg"], kind="mergesort"
    ).reset_index(drop=True)


def _build(spark, docs, d, segment_docs):
    build_index(
        spark, docs, d, segment_docs=segment_docs, block_size=16,
        positional=True,
    )
    return d


@pytest.mark.parametrize("src_sd,dst_sd", [(64, 256), (256, 64)])
def test_bitwise_identical_to_fresh_build(
    spark, docs, tmp_path_factory, src_sd, dst_sd
):
    root = tmp_path_factory.mktemp(f"rs_{src_sd}_{dst_sd}")
    src = _build(spark, docs, str(root / "src"), src_sd)
    want_dir = _build(spark, docs, str(root / "want"), dst_sd)
    dst = str(root / "dst")
    new_meta = resegment_index(spark, src, dst, dst_sd)
    got = _blocks_pdf(spark, dst)
    want = _blocks_pdf(spark, want_dir)
    pd.testing.assert_frame_equal(got, want)
    _, t_got, m_got = load_index(spark, dst)
    _, t_want, m_want = load_index(spark, want_dir)
    assert (
        t_got.toPandas().sort_values("term").reset_index(drop=True).equals(
            t_want.toPandas().sort_values("term").reset_index(drop=True)
        )
    )
    assert m_got.segment_docs == dst_sd == new_meta.segment_docs
    assert m_got.n_docs == m_want.n_docs
    assert m_got.avgdl == m_want.avgdl
    assert m_got.merged_docs == m_got.n_docs
    assert m_got.positional


def test_query_identical_through_scorer(spark, docs, tmp_path_factory):
    root = tmp_path_factory.mktemp("rs_q")
    src = _build(spark, docs, str(root / "src"), 64)
    dst = str(root / "dst")
    resegment_index(spark, src, dst, 512)
    q = pd.DataFrame(
        [("q1", "w0003 w0042", BIG_K), ("q2", "w0001 w0002", BIG_K)],
        columns=["query_id", "text", "k"],
    )
    frames = []
    for d in (src, dst):
        merged, tstats, meta = load_index(spark, d)
        frames.append(
            wand_topk(spark, merged, tstats, meta, q, mode="phrase")
            .toPandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(frames[0], frames[1])


def test_lineage_doc_counts_tile_corpus(spark, docs, tmp_path_factory):
    root = tmp_path_factory.mktemp("rs_lin")
    src = _build(spark, docs, str(root / "src"), 64)
    dst = str(root / "dst")
    meta = resegment_index(spark, src, dst, 200)
    lin = spark.read.parquet(os.path.join(dst, "lineage")).toPandas()
    assert lin["doc_count"].sum() == meta.n_docs
    assert lin["partition_id"].is_unique


def test_refuses_unmerged_delta_state(spark, docs, tmp_path_factory):
    root = tmp_path_factory.mktemp("rs_guard")
    src = _build(spark, docs, str(root / "src"), 64)
    stats = os.path.join(src, "corpus_stats.json")
    d = json.load(open(stats))
    d["merged_docs"] = d["n_docs"] // 2  # simulate streamed-unmerged tail
    json.dump(d, open(stats, "w"))
    crc = os.path.join(src, ".corpus_stats.json.crc")
    if os.path.exists(crc):  # stale Hadoop checksum would mask the edit
        os.remove(crc)
    with pytest.raises(ValueError, match="unmerged delta"):
        resegment_index(spark, src, str(root / "dst"), 128)
    with pytest.raises(ValueError, match="segment_docs"):
        resegment_index(spark, src, str(root / "dst2"), 0)

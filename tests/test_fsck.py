"""fsck: a healthy index (batch, positional, streamed+deleted) reports
zero violations; seeded corruption of every class is detected."""

from __future__ import annotations

import glob
import os

import pandas as pd
import pytest

from angle_spark.index.build import build_index
from angle_spark.index.deletes import delete_docs
from angle_spark.index.fsck import fsck_index
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.synth import transcripts_df

N_CONVS = 30
SEED = 42


def _build(spark, tmp_path, positional=False):
    docs = (
        with_tokens(assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4)))
        .select("doc_id", "tokens", "dl")
    )
    out = str(tmp_path / "idx")
    build_index(spark, docs, out, segment_docs=256, block_size=32, positional=positional)
    return out


def test_healthy_index_clean(spark, tmp_path):
    out = _build(spark, tmp_path)
    delete_docs(spark, out, spark.createDataFrame([(1,)], "doc_id long"))
    assert fsck_index(spark, out).count() == 0


def test_healthy_positional_clean(spark, tmp_path):
    out = _build(spark, tmp_path, positional=True)
    assert fsck_index(spark, out).count() == 0


def test_healthy_streamed_delta_clean(spark, tmp_path):
    """committed-but-unmerged delta segments pass fsck too (the stats
    check runs against the same delta union load_index serves)."""
    from angle_spark.index.build import refresh_corpus_stats
    from angle_spark.streaming.maintain import append_micro_batch

    out = _build(spark, tmp_path)
    tail = transcripts_df(spark, 40, seed=SEED).filter(
        f"conv_id >= 'conv_{N_CONVS:08d}'"
    )
    import json

    meta_docs = json.load(open(f"{out}/corpus_stats.json"))["n_docs"]
    append_micro_batch(tail, 0, out, meta_docs)
    refresh_corpus_stats(spark, out)
    assert fsck_index(spark, out).count() == 0


def _drop_crc(f):
    """the rewrite invalidates Hadoop's .crc sidecar — remove it so the
    corruption reaches the reader instead of tripping ChecksumException"""
    crc = os.path.join(os.path.dirname(f), "." + os.path.basename(f) + ".crc")
    if os.path.exists(crc):
        os.unlink(crc)


def _corrupt_one_block(out, mutate):
    """rewrite the first merged parquet file with one mutated block row."""
    f = sorted(glob.glob(os.path.join(out, "merged", "**", "*.parquet"), recursive=True))[0]
    pdf = pd.read_parquet(f)
    assert len(pdf) > 0
    mutate(pdf)
    pdf.to_parquet(f, index=False)
    _drop_crc(f)


def _set_first(pdf, col, val):
    pdf.loc[pdf.index[0], col] = val


@pytest.mark.parametrize(
    "col, val, expect",
    [
        ("n_postings", 9_999, "posting_count"),
        ("max_tf", 10_000, "max_tf_mismatch"),
        ("docs_bin", b"\x00\x00", "posting_count"),  # decodes to wrong count
        ("first_doc", 123_456, "doc_range_mismatch"),
    ],
)
def test_corruption_detected(spark, tmp_path, col, val, expect):
    out = _build(spark, tmp_path)
    _corrupt_one_block(out, lambda p: _set_first(p, col, val))
    viol = fsck_index(spark, out).toPandas()
    assert len(viol) > 0
    assert expect in set(viol["check"]), viol


def test_stats_mismatch_detected(spark, tmp_path):
    out = _build(spark, tmp_path)
    f = sorted(glob.glob(os.path.join(out, "term_stats", "*.parquet")))[0]
    pdf = pd.read_parquet(f)
    pdf.loc[0, "df"] = int(pdf.loc[0, "df"]) + 7
    pdf.to_parquet(f, index=False)
    _drop_crc(f)
    viol = fsck_index(spark, out).toPandas()
    assert "stats_mismatch" in set(viol["check"]), viol

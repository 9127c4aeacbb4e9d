"""Snapshot/restore (index/snapshot.py).

Contracts: restore answers queries bit-identically to the source;
point-in-time isolation (post-snapshot deletes/appends don't leak into
the restore); incomplete snapshots (no meta) are refused as debris;
truncated restores fail size verification loudly; destination/overwrite
guards; docvalues and tombstones ride along.
"""
from __future__ import annotations

import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from angle_spark import fsio
from angle_spark.index.build import build_index
from angle_spark.index.deletes import delete_docs
from angle_spark.index.snapshot import (
    MANIFEST,
    META,
    restore_index,
    snapshot_index,
)
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.query.searcher import Searcher
from angle_spark.synth import queries_df, transcripts_df

N_CONVS = 16
SEED = 16


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    docs = with_tokens(
        assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4))
    ).select("doc_id", "tokens", "dl")
    out = str(tmp_path_factory.mktemp("snap") / "idx")
    build_index(spark, docs, out, segment_docs=128, block_size=16)
    # tombstone a few docs so deletes/ rides the snapshot
    delete_docs(
        spark, out, spark.range(0, 200, 37).selectExpr("id as doc_id")
    )
    return out


def _answers(spark, d):
    with Searcher(spark, d) as s:
        return (
            s.search(queries_df(spark))
            .toPandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )


def test_snapshot_restore_bit_identical(spark, index_dir, tmp_path):
    snap = str(tmp_path / "snap1")
    dest = str(tmp_path / "restored1")
    before = _answers(spark, index_dir)
    manifest = snapshot_index(spark, index_dir, snap)
    assert manifest["entries"] == len(manifest["files"]) > 0
    restore_index(spark, snap, dest)
    pd.testing.assert_frame_equal(_answers(spark, dest), before)


def test_point_in_time_isolation(spark, index_dir, tmp_path):
    """deletes applied AFTER the snapshot must not appear in a restore."""
    snap = str(tmp_path / "snap2")
    dest = str(tmp_path / "restored2")
    before = _answers(spark, index_dir)
    snapshot_index(spark, index_dir, snap)
    victims = [int(d) for d in before["doc_id"].head(5)]
    delete_docs(
        spark, index_dir,
        spark.createDataFrame([(d,) for d in victims], "doc_id long"),
    )
    after_live = _answers(spark, index_dir)
    assert not set(victims) <= set(after_live["doc_id"])  # live index changed
    restore_index(spark, snap, dest)
    pd.testing.assert_frame_equal(_answers(spark, dest), before)


def test_incomplete_snapshot_is_debris(spark, index_dir, tmp_path):
    snap = str(tmp_path / "snap3")
    snapshot_index(spark, index_dir, snap)
    os.remove(os.path.join(snap, META))  # simulate crash before commit
    crc = os.path.join(snap, f".{META}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    with pytest.raises(ValueError, match="not a complete snapshot"):
        restore_index(spark, snap, str(tmp_path / "nope"))


def test_truncated_restore_fails_verification(spark, index_dir, tmp_path):
    snap = str(tmp_path / "snap4")
    snapshot_index(spark, index_dir, snap)
    # corrupt the manifest's size expectation for one real file
    m = json.loads(fsio.read_text(spark, f"{snap}/{MANIFEST}"))
    m["files"][0][1] += 1
    fsio.write_text(spark, f"{snap}/{MANIFEST}", json.dumps(m))
    with pytest.raises(IOError, match="verification failed"):
        restore_index(spark, snap, str(tmp_path / "bad"))


def test_guards(spark, index_dir, tmp_path):
    snap = str(tmp_path / "snap5")
    snapshot_index(spark, index_dir, snap)
    with pytest.raises(ValueError, match="already holds a snapshot"):
        snapshot_index(spark, index_dir, snap)
    dest = str(tmp_path / "restored5")
    restore_index(spark, snap, dest)
    with pytest.raises(ValueError, match="already holds a committed index"):
        restore_index(spark, snap, dest)
    with pytest.raises(ValueError, match="not a committed index"):
        snapshot_index(spark, str(tmp_path / "void"), str(tmp_path / "s"))

"""Index aliases + rollover (index/alias.py).

Contracts: an alias over a partitioned corpus answers identically to
the one merged index (the multi_index invariant, reached through the
alias file); offsets auto-assign from the running watermark;
rollover_due flips exactly at max_docs and add_index(write=True)
commits the new write member atomically; duplicate/missing-member and
version guards.
"""
from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from angle_spark import fsio
from angle_spark.index.alias import (
    add_index,
    create_alias,
    rollover_due,
    search_alias,
)
from angle_spark.index.build import build_index, load_index
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.query.wand import wand_topk
from angle_spark.synth import transcripts_df

N_CONVS = 20
SEED = 17


@pytest.fixture(scope="module")
def corpus(spark):
    d = (
        with_tokens(
            assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4))
        )
        .select("doc_id", "tokens", "dl")
        .persist()
    )
    d.count()
    yield d
    d.unpersist()


@pytest.fixture(scope="module")
def setup(spark, corpus, tmp_path_factory):
    """full index + two generation indexes (docIDs re-based per gen) +
    an alias rolled over gen0 -> gen1."""
    root = tmp_path_factory.mktemp("alias")
    full = str(root / "full")
    build_index(spark, corpus, full, segment_docs=128, block_size=16)
    n = load_index(spark, full)[2].n_docs
    cut = n // 2
    gens = []
    for i, (lo, hi) in enumerate([(0, cut), (cut, n)]):
        part = corpus.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).withColumn("doc_id", F.col("doc_id") - F.lit(lo))
        d = str(root / f"gen{i}")
        build_index(spark, part, d, segment_docs=64, block_size=16)
        gens.append(d)
    alias = str(root / "transcripts.alias.json")
    create_alias(spark, alias, gens[0])
    add_index(spark, alias, gens[1], write=True)
    return full, gens, alias, cut, n


def _q(spark):
    return spark.createDataFrame(
        [("q1", "w0000 w0007", 12), ("q2", "w0019", 6)],
        "query_id string, text string, k int",
    )


def test_alias_equals_merged_index(spark, setup):
    full, _gens, alias, _cut, _n = setup
    got = (
        search_alias(spark, alias, _q(spark))
        .toPandas()
        .drop(columns=["index"])
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    merged, tstats, meta = load_index(spark, full)
    want = (
        wand_topk(spark, merged, tstats, meta, _q(spark))
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_offsets_from_watermark(spark, setup):
    import json

    _full, gens, alias, cut, n = setup
    data = json.loads(fsio.read_text(spark, alias))
    assert data["members"] == [[gens[0], 0], [gens[1], cut]]
    assert data["write_index"] == gens[1]
    assert data["next_offset"] == n


def test_rollover_due(spark, setup):
    _full, _gens, alias, cut, n = setup
    write_docs = n - cut
    assert rollover_due(spark, alias, max_docs=write_docs)
    assert not rollover_due(spark, alias, max_docs=write_docs + 1)


def test_guards(spark, setup, tmp_path):
    full, gens, alias, _cut, _n = setup
    with pytest.raises(ValueError, match="already exists"):
        create_alias(spark, alias, gens[0])
    with pytest.raises(ValueError, match="already an alias member"):
        add_index(spark, alias, gens[1])
    with pytest.raises(ValueError, match="not a committed index"):
        add_index(spark, alias, str(tmp_path / "void"))
    bad = str(tmp_path / "bad.json")
    fsio.write_text(spark, bad, '{"version": 99}')
    with pytest.raises(ValueError, match="version"):
        search_alias(spark, bad, _q(spark))

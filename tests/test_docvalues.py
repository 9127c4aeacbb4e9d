"""Index-time docvalues (index/docvalues.py) — round 5.

Contracts under test:
- sort/stats/group collectors given a DocValues handle return frames
  IDENTICAL to the ad-hoc (doc_id, value) DataFrame path (both sort
  directions, missing-value rules included);
- keyword fields round-trip their label dictionary through dv_meta.json
  and decode group buckets; numeric fields are refused as group source;
- the dv path plans strictly fewer exchanges than the frame path (the
  per-batch side-channel shuffle is gone — each shard task reads its
  own segments' files task-locally);
- overwriting a field replaces its values; deletes compose through the
  Searcher.
"""
from __future__ import annotations

import contextlib
import io

import pandas as pd
import pytest

from pyspark.sql import functions as F

from angle_spark.index.build import build_index, load_index
from angle_spark.index.docvalues import (
    load_docvalues,
    read_segment_values,
    write_docvalues,
)
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.query.wand import aggregate_matches, group_matches, wand_topk
from angle_spark.synth import transcripts_df

N_CONVS = 24
SEED = 5


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    docs = with_tokens(
        assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4))
    ).select("doc_id", "tokens", "dl")
    out = str(tmp_path_factory.mktemp("dv") / "idx")
    build_index(spark, docs, out, segment_docs=128, block_size=16)
    return out


@pytest.fixture(scope="module")
def frames(spark, index_dir):
    _, _, meta = load_index(spark, index_dir)
    n = meta.n_docs
    vdf = spark.createDataFrame(
        [(d, float((d * 7) % 97)) for d in range(n) if d % 5 != 4],
        "doc_id long, value double",
    )
    gdf = spark.createDataFrame(
        [(d, f"g{d % 4}") for d in range(n) if d % 7 != 6],
        "doc_id long, lab string",
    )
    return vdf, gdf


@pytest.fixture(scope="module")
def handles(spark, index_dir, frames):
    vdf, gdf = frames
    return (
        write_docvalues(spark, index_dir, "metric", vdf),
        write_docvalues(spark, index_dir, "label", gdf),
    )


def _q(spark):
    return spark.createDataFrame(
        [("q1", "w0000 w0002", 15), ("q2", "w0001", 8)],
        "query_id string, text string, k int",
    )


def _eq(a, b):
    cols = list(a.columns)
    pd.testing.assert_frame_equal(
        a.toPandas().sort_values(cols).reset_index(drop=True),
        b.toPandas().sort_values(cols).reset_index(drop=True),
    )


def test_dv_meta_roundtrip(spark, index_dir, handles):
    dv_m, dv_g = handles
    rt = load_docvalues(spark, index_dir, "label")
    assert rt.kind == "keyword" and rt.labels == dv_g.labels == [
        "g0", "g1", "g2", "g3"
    ]
    rt = load_docvalues(spark, index_dir, "metric")
    assert rt.kind == "numeric" and rt.labels is None
    # the task-local reader returns doc-sorted values for a segment range
    r = read_segment_values(dv_m.data_path, 0, 1)
    assert r is not None and (r[0][:-1] <= r[0][1:]).all()
    assert (r[0] < dv_m.segment_docs).all()
    assert read_segment_values(dv_m.data_path, 10**6, 10**6 + 1) is None


def test_dv_sort_parity(spark, index_dir, frames, handles):
    vdf, _ = frames
    dv_m, _ = handles
    merged, tstats, meta = load_index(spark, index_dir)
    skdf = vdf.withColumnRenamed("value", "sort_key")
    for asc in (False, True):
        _eq(
            wand_topk(spark, merged, tstats, meta, _q(spark),
                      sort_meta=skdf, sort_ascending=asc),
            wand_topk(spark, merged, tstats, meta, _q(spark),
                      sort_meta=dv_m, sort_ascending=asc),
        )


def test_dv_stats_and_group_parity(spark, index_dir, frames, handles):
    vdf, gdf = frames
    dv_m, dv_g = handles
    merged, tstats, meta = load_index(spark, index_dir)
    q = _q(spark)
    _eq(
        aggregate_matches(spark, merged, tstats, meta, q, vdf),
        aggregate_matches(spark, merged, tstats, meta, q, dv_m),
    )
    _eq(
        group_matches(spark, merged, tstats, meta, q, gdf, vdf),
        group_matches(spark, merged, tstats, meta, q, dv_g, dv_m),
    )
    _eq(
        group_matches(spark, merged, tstats, meta, q, gdf),
        group_matches(spark, merged, tstats, meta, q, dv_g),
    )
    with pytest.raises(ValueError, match="numeric"):
        group_matches(spark, merged, tstats, meta, q, dv_m)


def test_dv_drops_side_channel_shuffle(spark, index_dir, frames, handles):
    vdf, _ = frames
    dv_m, _ = handles
    merged, tstats, meta = load_index(spark, index_dir)

    def n_exchanges(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue().count("Exchange")

    e_dv = n_exchanges(
        wand_topk(spark, merged, tstats, meta, _q(spark), sort_meta=dv_m)
    )
    e_fr = n_exchanges(
        wand_topk(spark, merged, tstats, meta, _q(spark),
                  sort_meta=vdf.withColumnRenamed("value", "sort_key"))
    )
    assert e_dv < e_fr, (e_dv, e_fr)


def test_dv_overwrite_and_deletes(spark, index_dir, handles, tmp_path_factory):
    import shutil

    from angle_spark.index.deletes import delete_docs
    from angle_spark.query.searcher import Searcher

    idx = str(tmp_path_factory.mktemp("dvdel") / "idx")
    shutil.copytree(index_dir, idx)
    merged, tstats, meta = load_index(spark, idx)
    n = meta.n_docs
    # overwrite replaces values wholesale
    write_docvalues(
        spark, idx, "metric",
        spark.createDataFrame([(d, 1.0) for d in range(n)],
                              "doc_id long, value double"),
    )
    dv = load_docvalues(spark, idx, "metric")
    got = aggregate_matches(spark, merged, tstats, meta, _q(spark), dv).toPandas()
    assert (got["min"] == 1.0).all() and (got["max"] == 1.0).all()
    assert (got["n_docs"] == got["n_values"]).all()
    base = dict(zip(got["query_id"], got["n_docs"]))
    # tombstones shrink the matched set the dv stats fold over
    delete_docs(
        spark, idx,
        spark.createDataFrame([(d,) for d in range(0, n, 2)], "doc_id long"),
    )
    s = Searcher(spark, idx)
    got = s.aggregate(_q(spark), s.docvalues("metric")).toPandas()
    s.close()
    assert all(int(r["n_docs"]) < base[r["query_id"]] for _, r in got.iterrows())

"""adjacency_matrix + composite_buckets (query/wand.py).

Contracts: adjacency equals the brute-force pairwise intersection of
matched-id sets (diagonal = per-query counts, a <= b canonical order,
empty intersections absent); composite pages are key-ordered, tile the
full bucket set exactly under scalar and per-query cursors, and agree
with group_matches bucket-for-bucket; Searcher parity; guards.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from angle_spark.index.build import build_index, load_index
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.query.searcher import Searcher
from angle_spark.query.wand import (
    adjacency_matrix,
    composite_buckets,
    group_matches,
    matched_ids,
)
from angle_spark.synth import transcripts_df

N_CONVS = 25
SEED = 13


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    d = (
        with_tokens(
            assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4))
        )
        .select("doc_id", "tokens", "dl")
        .persist()
    )
    n = d.count()
    idx = str(tmp_path_factory.mktemp("adj") / "idx")
    build_index(spark, d, idx, segment_docs=128, block_size=16)
    merged, tstats, meta = load_index(spark, idx)
    groups = d.select("doc_id", (F.col("doc_id") % 7).cast("string").alias("g"))
    yield d, idx, merged, tstats, meta, groups, n
    d.unpersist()


def _q(spark):
    return spark.createDataFrame(
        [("qa", "w0000", 1), ("qb", "w0007", 1), ("qc", "w0003 w0019", 1),
         ("qd", "zzznever", 1)],
        "query_id string, text string, k int",
    )


def test_adjacency_vs_brute_force(spark, setup):
    _d, _i, merged, tstats, meta, _g, _n = setup
    ids = matched_ids(spark, merged, tstats, meta, _q(spark)).toPandas()
    sets = {q: set(g["doc_id"]) for q, g in ids.groupby("query_id")}
    want = {}
    for a in sets:
        for b in sets:
            if a <= b and sets[a] & sets[b]:
                want[(a, b)] = len(sets[a] & sets[b])
    got = {
        (r["query_a"], r["query_b"]): r["n_docs"]
        for r in adjacency_matrix(
            spark, merged, tstats, meta, _q(spark)
        ).collect()
    }
    assert got == want
    # diagonal is the per-query match count
    for q, s in sets.items():
        assert got[(q, q)] == len(s)
    assert not any(a > b for a, b in got)


def test_composite_pages_tile(spark, setup):
    _d, _i, merged, tstats, meta, groups, _n = setup
    full = (
        group_matches(spark, merged, tstats, meta, _q(spark), groups)
        .toPandas().sort_values(["query_id", "group"]).reset_index(drop=True)
    )
    size = 3
    pages = []
    after = None
    while True:
        pg = composite_buckets(
            spark, merged, tstats, meta, _q(spark), groups,
            size=size, after=after,
        ).toPandas().sort_values(["query_id", "group"])
        if pg.empty:
            break
        pages.append(pg)
        # scalar cursor: the max last-key across queries ends the walk
        # only when every query is exhausted; use per-query dict cursor
        after = {
            q: g["group"].max() for q, g in pg.groupby("query_id")
        }
        if all(len(g) < size for _, g in pg.groupby("query_id")):
            break
    import pandas as pd

    tiled = (
        pd.concat(pages, ignore_index=True)
        .sort_values(["query_id", "group"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(tiled, full)
    # every page respects the size cap per query
    for pg in pages:
        assert (pg.groupby("query_id").size() <= size).all()


def test_composite_scalar_after_and_guard(spark, setup):
    _d, _i, merged, tstats, meta, groups, _n = setup
    pg = composite_buckets(
        spark, merged, tstats, meta, _q(spark), groups, size=100, after="3"
    ).toPandas()
    assert (pg["group"] > "3").all()
    with pytest.raises(ValueError, match="size"):
        composite_buckets(
            spark, merged, tstats, meta, _q(spark), groups, size=0
        )


def test_searcher_parity(spark, setup):
    _d, idx, merged, tstats, meta, groups, _n = setup
    with Searcher(spark, idx) as s:
        a1 = s.adjacency(_q(spark)).toPandas()
        c1 = s.composite(_q(spark), groups, size=2).toPandas()
    a2 = adjacency_matrix(spark, merged, tstats, meta, _q(spark)).toPandas()
    c2 = composite_buckets(
        spark, merged, tstats, meta, _q(spark), groups, size=2
    ).toPandas()
    key = ["query_a", "query_b"]
    assert a1.sort_values(key).reset_index(drop=True).equals(
        a2.sort_values(key).reset_index(drop=True)
    )
    key = ["query_id", "group"]
    assert c1.sort_values(key).reset_index(drop=True).equals(
        c2.sort_values(key).reset_index(drop=True)
    )

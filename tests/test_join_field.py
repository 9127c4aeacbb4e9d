"""Parent-child retrieval (query/join_field.py, collector="group_score").

Contracts: parent aggregation equals a pandas brute force over the
exhaustive scored hit list for every score_mode (max/min bitwise,
sum/avg to double tolerance); children without a parent mapping are
skipped; k cuts parents per query with (score DESC, parent ASC) ties;
composes with doc_filter; numeric docvalues can carry the parent id;
keyword docvalues and bad score modes are rejected loudly.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from angle_spark.index.build import build_index, load_index
from angle_spark.index.docvalues import write_docvalues
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.query.join_field import parent_matches, parent_topk
from angle_spark.query.wand import wand_topk
from angle_spark.synth import transcripts_df

N_CONVS = 25
SEED = 31


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    d = (
        with_tokens(
            assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4))
        )
        .select("doc_id", "conv_id", "tokens", "dl")
        .persist()
    )
    n = d.count()
    idx = str(tmp_path_factory.mktemp("jf") / "idx")
    build_index(
        spark, d.select("doc_id", "tokens", "dl"), idx,
        segment_docs=64, block_size=16,
    )
    merged, tstats, meta = load_index(spark, idx)
    # numeric parent id derived from the conv_id digits — each
    # conversation's turns are docID-contiguous under the stable
    # (conv_id, turn_idx) assignment
    parents = d.select(
        "doc_id",
        F.regexp_extract("conv_id", r"(\d+)", 1).cast("long").alias("parent_id"),
    )
    assert parents.filter(F.col("parent_id").isNull()).count() == 0
    yield d, idx, merged, tstats, meta, parents, n
    d.unpersist()


def _q(spark, k=4):
    return spark.createDataFrame(
        [("q1", "w0000 w0007", k), ("q2", "w0019 w0003", k), ("q3", "", k)],
        "query_id string, text string, k int",
    )


def _brute(spark, merged, tstats, meta, queries, parents_pdf, **kw):
    """exhaustive scored hits -> pandas per-parent fold."""
    allq = queries.withColumn("k", F.lit(10 ** 9))
    hits = wand_topk(
        spark, merged, tstats, meta, allq, prune=False, **kw
    ).toPandas()
    m = hits.merge(parents_pdf, on="doc_id", how="inner")
    g = m.groupby(["query_id", "parent_id"])["score"].agg(
        ["size", "sum", "min", "max"]
    )
    g["avg"] = g["sum"] / g["size"]
    return g


def test_parent_matches_vs_brute_force(spark, setup):
    _d, _idx, merged, tstats, meta, parents, _n = setup
    got = parent_matches(
        spark, merged, tstats, meta, _q(spark), parents
    ).toPandas().set_index(["query_id", "parent_id"]).sort_index()
    want = _brute(
        spark, merged, tstats, meta, _q(spark), parents.toPandas()
    ).sort_index()
    assert list(got.index) == list(want.index)
    # counts exact; min/max bitwise (same per-child fold, exact fold)
    assert (got["n_children"].to_numpy() == want["size"].to_numpy()).all()
    assert (got["min"].to_numpy() == want["min"].to_numpy()).all()
    assert (got["max"].to_numpy() == want["max"].to_numpy()).all()
    # sum/avg: cross-shard double fold — ULP tolerance
    np.testing.assert_allclose(
        got["sum"].to_numpy(), want["sum"].to_numpy(), rtol=1e-12
    )
    np.testing.assert_allclose(
        got["avg"].to_numpy(), want["avg"].to_numpy(), rtol=1e-12
    )


@pytest.mark.parametrize("score_mode", ["max", "sum", "avg", "min"])
def test_parent_topk_modes(spark, setup, score_mode):
    _d, _idx, merged, tstats, meta, parents, _n = setup
    k = 4
    got = parent_topk(
        spark, merged, tstats, meta, _q(spark, k), parents,
        score_mode=score_mode,
    ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    want = _brute(spark, merged, tstats, meta, _q(spark, k), parents.toPandas())
    col = {"max": "max", "min": "min", "sum": "sum", "avg": "avg"}[score_mode]
    rows = []
    for qid, grp in want.reset_index().groupby("query_id"):
        grp = grp.sort_values(
            [col, "parent_id"], ascending=[False, True]
        ).head(k)
        for r, t in enumerate(grp.itertuples(index=False), start=1):
            rows.append((qid, r, t.parent_id, getattr(t, col), t.size))
    exp = pd.DataFrame(
        rows, columns=["query_id", "rank", "parent_id", "score", "n_children"]
    ).sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert got["query_id"].tolist() == exp["query_id"].tolist()
    assert got["rank"].tolist() == exp["rank"].tolist()
    assert got["parent_id"].tolist() == exp["parent_id"].tolist()
    assert got["n_children"].tolist() == exp["n_children"].tolist()
    if score_mode in ("max", "min"):
        assert got["score"].tolist() == exp["score"].tolist()
    else:
        np.testing.assert_allclose(
            got["score"].to_numpy(), exp["score"].to_numpy(), rtol=1e-12
        )


def test_missing_parent_skipped(spark, setup):
    """the ES parent-join missing rule: an unmapped child contributes to
    no parent, and a parent of only-unmapped children never appears."""
    _d, _idx, merged, tstats, meta, parents, _n = setup
    half = parents.filter(F.col("parent_id") % 2 == 0)
    got = parent_matches(
        spark, merged, tstats, meta, _q(spark), half
    ).toPandas()
    assert len(got) and (got["parent_id"].to_numpy() % 2 == 0).all()
    want = _brute(spark, merged, tstats, meta, _q(spark), half.toPandas())
    assert len(got) == len(want)


def test_composes_with_doc_filter(spark, setup):
    _d, _idx, merged, tstats, meta, parents, n = setup
    keep = spark.range(0, n).filter(F.col("id") % 3 != 0).select(
        F.col("id").alias("doc_id")
    )
    got = parent_matches(
        spark, merged, tstats, meta, _q(spark), parents, doc_filter=keep
    ).toPandas().set_index(["query_id", "parent_id"]).sort_index()
    want = _brute(
        spark, merged, tstats, meta, _q(spark), parents.toPandas(),
        doc_filter=keep,
    ).sort_index()
    assert list(got.index) == list(want.index)
    assert (got["n_children"].to_numpy() == want["size"].to_numpy()).all()
    assert (got["max"].to_numpy() == want["max"].to_numpy()).all()


def test_numeric_docvalues_parent(spark, setup):
    """the parent id read task-locally from a stored docvalues column
    must agree with the ad-hoc frame path exactly."""
    _d, idx, merged, tstats, meta, parents, _n = setup
    dv = write_docvalues(spark, idx, "parent", parents)
    via_dv = parent_matches(
        spark, merged, tstats, meta, _q(spark), dv
    ).toPandas().sort_values(["query_id", "parent_id"]).reset_index(drop=True)
    via_df = parent_matches(
        spark, merged, tstats, meta, _q(spark), parents
    ).toPandas().sort_values(["query_id", "parent_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(via_dv, via_df)


def test_expand_to_children(spark, setup):
    """every child of each top parent comes back, carrying the parent's
    rank and score; children of unmatched parents never appear."""
    from angle_spark.query.join_field import expand_to_children

    _d, _idx, merged, tstats, meta, parents, _n = setup
    k = 3
    top = parent_topk(
        spark, merged, tstats, meta, _q(spark, k), parents, score_mode="max"
    ).toPandas()
    exp = expand_to_children(
        spark, merged, tstats, meta, _q(spark, k), parents, score_mode="max"
    ).toPandas()
    pp = parents.toPandas()
    fam = pp.groupby("parent_id")["doc_id"].apply(set)
    got = exp.groupby(["query_id", "parent_id"])
    assert set(got.groups) == set(
        zip(top["query_id"], top["parent_id"])
    )
    for (qid, pid), grp in got:
        assert set(grp["doc_id"]) == fam[pid]
        trow = top[(top["query_id"] == qid) & (top["parent_id"] == pid)]
        assert (grp["rank"] == trow["rank"].iloc[0]).all()
        assert (grp["score"] == trow["score"].iloc[0]).all()


def test_expand_plan_broadcasts(spark, setup):
    """the matched-parent frame must broadcast into the assignment scan
    — no corpus-sized shuffle for the expansion join."""
    import contextlib
    import io

    from angle_spark.query.join_field import expand_to_children

    _d, _idx, merged, tstats, meta, parents, _n = setup
    out = expand_to_children(
        spark, merged, tstats, meta, _q(spark, 3), parents
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    tail = plan.split("BroadcastHashJoin", 1)[0]
    assert "SortMergeJoin" not in tail


def test_guards(spark, setup):
    d, idx, merged, tstats, meta, parents, _n = setup
    with pytest.raises(ValueError, match="score_mode"):
        parent_topk(
            spark, merged, tstats, meta, _q(spark), parents, score_mode="mul"
        )
    with pytest.raises(ValueError, match="group_meta"):
        wand_topk(
            spark, merged, tstats, meta, _q(spark), collector="group_score"
        )
    with pytest.raises(ValueError, match="sort_meta is meaningless"):
        wand_topk(
            spark, merged, tstats, meta, _q(spark), collector="group_score",
            group_meta=parents.withColumnRenamed("parent_id", "gcode"),
            sort_meta=parents.withColumnRenamed("parent_id", "sort_key"),
        )
    kw = write_docvalues(
        spark, idx, "kwparent",
        d.select("doc_id", F.col("conv_id").cast("string").alias("g")),
    )
    with pytest.raises(ValueError, match="keyword"):
        parent_matches(spark, merged, tstats, meta, _q(spark), kw)
    from angle_spark.query.join_field import expand_to_children

    num = write_docvalues(spark, idx, "numparent", parents)
    with pytest.raises(ValueError, match="assignment frame"):
        expand_to_children(spark, merged, tstats, meta, _q(spark), num)

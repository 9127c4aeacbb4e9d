"""Top-hits aggregation (wand.top_hits_matches) — round 5.

Contracts under test:
- per-bucket top-n equals the brute force: full wand_topk results
  joined to groups, re-ranked per (query, group) — the strongest
  cross-check (the topk collector is itself oracle-verified);
- docs with no group label are skipped (ES missing-bucket rule);
- n=1 returns each bucket's single best hit; growing n nests (top-2
  extends top-1 exactly);
- shard-local phase ships at most n rows per (query, bucket, shard);
- doc_filter / deletes compose; Searcher.top_hits delegates;
- DocValues keyword group path returns the identical frame;
- validation (group_k < 1, sort_meta rejected, numeric dv rejected).
"""
from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from angle_spark.index.build import build_index, load_index
from angle_spark.index.docvalues import write_docvalues
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.query.wand import top_hits_matches, wand_topk
from angle_spark.synth import transcripts_df

N_CONVS = 24
SEED = 12
LABELS = ["red", "green", "blue", "teal"]


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    docs = with_tokens(
        assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4))
    ).select("doc_id", "tokens", "dl")
    out = str(tmp_path_factory.mktemp("tophits") / "idx")
    build_index(spark, docs, out, segment_docs=128, block_size=16)
    return out


@pytest.fixture(scope="module")
def loaded(spark, index_dir):
    return load_index(spark, index_dir)


def _group_of(d):
    # deterministic label, missing for every doc_id % 7 == 6
    return None if d % 7 == 6 else LABELS[(d * 5) % len(LABELS)]


@pytest.fixture(scope="module")
def groups(spark, loaded):
    _, _, meta = loaded
    rows = [
        (d, _group_of(d)) for d in range(meta.n_docs)
        if _group_of(d) is not None
    ]
    return spark.createDataFrame(rows, "doc_id long, grp string")


@pytest.fixture(scope="module")
def doc_tokens(spark, loaded):
    docs = with_tokens(
        assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4))
    ).select("doc_id", "tokens")
    return {int(r["doc_id"]): set(r["tokens"]) for r in docs.collect()}


def _terms(doc_tokens, n=3):
    from collections import Counter

    cnt = Counter(t for tk in doc_tokens.values() for t in tk)
    return [t for t, _ in cnt.most_common(n)]


def _qdf(spark, queries):
    return spark.createDataFrame(
        queries, schema="query_id string, text string, k int"
    )


def _brute(spark, loaded, queries, n, **kw):
    """truth: exhaustive wand_topk (k >= corpus), joined to groups,
    re-ranked per (query, group) in pandas."""
    merged, tstats, meta = loaded
    big = [(q, t, 10**9) for q, t, _ in queries]
    full = wand_topk(
        spark, merged, tstats, meta, _qdf(spark, big), prune=False, **kw
    ).toPandas()
    full["grp"] = [_group_of(d) for d in full["doc_id"]]
    full = full[full["grp"].notna()]
    full = full.sort_values(
        ["query_id", "grp", "score", "doc_id"],
        ascending=[True, True, False, True],
    )
    full["rank"] = full.groupby(["query_id", "grp"]).cumcount() + 1
    out = full[full["rank"] <= n][
        ["query_id", "grp", "rank", "doc_id", "score"]
    ]
    return out.rename(columns={"grp": "group"}).reset_index(drop=True)


def _got(spark, loaded, queries, groups, n, **kw):
    merged, tstats, meta = loaded
    return (
        top_hits_matches(
            spark, merged, tstats, meta, _qdf(spark, queries), groups, n=n,
            **kw,
        )
        .toPandas()
        .sort_values(["query_id", "group", "rank"])
        .reset_index(drop=True)
    )


def test_matches_brute_force(spark, loaded, groups, doc_tokens):
    a, b, c = _terms(doc_tokens)
    queries = [("q1", f"{a} {b}", 1), ("q2", c, 1)]
    got = _got(spark, loaded, queries, groups, n=3)
    exp = _brute(spark, loaded, queries, n=3)
    pd.testing.assert_frame_equal(
        got, exp.sort_values(["query_id", "group", "rank"]).reset_index(drop=True),
        check_dtype=False,
    )
    # every bucket present (hot terms hit all four labels)
    assert set(got["group"]) == set(LABELS)


def test_missing_group_docs_skipped(spark, loaded, groups, doc_tokens):
    a = _terms(doc_tokens, 1)[0]
    got = _got(spark, loaded, [("q", a, 1)], groups, n=10**6)
    assert all(_group_of(d) is not None for d in got["doc_id"])


def test_n1_and_nesting(spark, loaded, groups, doc_tokens):
    a, b, _ = _terms(doc_tokens)
    queries = [("q1", f"{a} {b}", 1)]
    one = _got(spark, loaded, queries, groups, n=1)
    two = _got(spark, loaded, queries, groups, n=2)
    assert set(one["rank"]) == {1}
    sub = two[two["rank"] == 1].reset_index(drop=True)
    pd.testing.assert_frame_equal(one, sub, check_dtype=False)


def test_boolean_mode_composes(spark, loaded, groups, doc_tokens):
    a, _, c = _terms(doc_tokens)
    queries = [("qb", f"{a} AND NOT {c}", 1)]
    got = _got(spark, loaded, queries, groups, n=2, mode="boolean")
    exp = _brute(spark, loaded, queries, n=2, mode="boolean")
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_doc_filter_composes(spark, loaded, groups, doc_tokens):
    a = _terms(doc_tokens, 1)[0]
    allow = [d for d in doc_tokens if d % 2 == 0]
    adf = spark.createDataFrame([(d,) for d in allow], "doc_id long")
    got = _got(spark, loaded, [("q", a, 1)], groups, n=3, doc_filter=adf)
    assert len(got) and all(d % 2 == 0 for d in got["doc_id"])


def test_docvalues_group_path_identical(
    spark, index_dir, loaded, groups, doc_tokens
):
    a, b, _ = _terms(doc_tokens)
    dv = write_docvalues(spark, index_dir, "thgroup", groups)
    queries = [("q1", f"{a} {b}", 1)]
    via_df = _got(spark, loaded, queries, groups, n=3)
    via_dv = _got(spark, loaded, queries, dv, n=3)
    pd.testing.assert_frame_equal(via_df, via_dv, check_dtype=False)


def test_searcher_delegates(spark, index_dir, loaded, groups, doc_tokens):
    from angle_spark.query.searcher import Searcher

    a, b, _ = _terms(doc_tokens)
    queries = [("q1", f"{a} {b}", 1)]
    s = Searcher(spark, index_dir)
    try:
        via = (
            s.top_hits(_qdf(spark, queries), groups, n=3)
            .toPandas()
            .sort_values(["query_id", "group", "rank"])
            .reset_index(drop=True)
        )
    finally:
        s.close()
    pd.testing.assert_frame_equal(
        via, _got(spark, loaded, queries, groups, n=3), check_dtype=False
    )


def test_validation(spark, loaded, groups):
    merged, tstats, meta = loaded
    q = _qdf(spark, [("q", "x", 1)])
    with pytest.raises(ValueError, match="group_k"):
        top_hits_matches(spark, merged, tstats, meta, q, groups, n=0)
    with pytest.raises(ValueError, match="sort_meta"):
        wand_topk(
            spark, merged, tstats, meta, q, collector="group_topk",
            group_meta=groups.selectExpr("doc_id", "0 AS gcode"),
            sort_meta=groups.selectExpr("doc_id", "1.0 AS sort_key"),
        )
    with pytest.raises(ValueError, match="group_meta"):
        wand_topk(spark, merged, tstats, meta, q, collector="group_topk")
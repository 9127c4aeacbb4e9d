"""Prefix (wildcard) retrieval: parse -> capped df-ranked expansion ->
disjunctive scoring. Contract in query/prefix.py: expansion ranks by
(df DESC, term ASC) capped at max_expansions per stem, a matchless stem
expands to nothing, and mode="prefix" is exactly mode="or" over the
rewritten query."""

from __future__ import annotations

import pandas as pd
import pytest

from angle_spark.index.build import build_index, load_index
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.query.prefix import (
    expand_prefixes,
    expand_stems,
    parse_prefix_text,
)
from angle_spark.query.wand import wand_topk
from angle_spark.synth import transcripts_df

N_CONVS = 30
SEED = 7


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    docs = (
        with_tokens(
            assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4))
        )
        .select("doc_id", "tokens", "dl")
    )
    out = str(tmp_path_factory.mktemp("prefix") / "idx")
    build_index(spark, docs, out, segment_docs=128, block_size=16)
    return out


def test_parse():
    assert parse_prefix_text("jo* merge") == (["merge"], ["jo"])
    assert parse_prefix_text("the fast key") == (["the", "fast", "key"], [])
    assert parse_prefix_text("a-b c*") == (["a", "b"], ["c"])
    assert parse_prefix_text("") == ([], [])
    # 'x*y' does not end in '*' -> literal tokens
    assert parse_prefix_text("x*y") == (["x", "y"], [])
    with pytest.raises(ValueError):
        parse_prefix_text("*")  # empty stem = whole vocabulary
    with pytest.raises(ValueError):
        parse_prefix_text("a-b*")  # stem tokenizes to two tokens


def test_expand_stems_rank_and_cap(spark):
    tstats = spark.createDataFrame(
        [
            ("scan", 10),
            ("small", 12),
            ("slow", 12),
            ("sort", 5),
            ("merge", 99),
        ],
        "term string, df long",
    )
    exp = expand_stems(spark, tstats, ["s", "zz"], max_expansions=3)
    # df DESC then term ASC on the 12-12 tie ('slow' < 'small'), then
    # scan(10) — sort(5) capped out
    assert exp["s"] == ["slow", "small", "scan"]
    assert exp["zz"] == []
    # pandas vocabulary path (cache_vocab serving) must agree exactly
    exp_pd = expand_stems(spark, tstats.toPandas(), ["s", "zz"], max_expansions=3)
    assert exp_pd == exp


def test_rewrite_dedups_and_keeps_flavor(spark):
    tstats = spark.createDataFrame(
        [("join", 4), ("jolt", 2), ("merge", 9)], "term string, df long"
    )
    q = pd.DataFrame(
        [("q1", "join jo*", 10), ("q2", "zz*", 5)],
        columns=["query_id", "text", "k"],
    )
    rewritten, exp = expand_prefixes(spark, tstats, q, max_expansions=8)
    assert isinstance(rewritten, pd.DataFrame)
    by_id = dict(zip(rewritten["query_id"], rewritten["text"]))
    # literal 'join' stays first; expansion adds jolt; duplicate join collapses
    assert by_id["q1"] == "join jolt"
    assert by_id["q2"] == ""  # dead stem -> empty text -> retrieves nothing
    assert exp == {"jo": ["join", "jolt"], "zz": []}
    sq = spark.createDataFrame(q)
    rewritten2, _ = expand_prefixes(spark, tstats, sq, max_expansions=8)
    assert not isinstance(rewritten2, pd.DataFrame)
    got = {r["query_id"]: r["text"] for r in rewritten2.collect()}
    assert got == by_id


def test_mode_prefix_equals_manual_rewrite(spark, index_dir):
    merged, tstats, meta = load_index(spark, index_dir)
    queries = pd.DataFrame(
        [("p1", "w00*", 10), ("p2", "w0042 w01*", 10), ("p3", "qqqq*", 10)],
        columns=["query_id", "text", "k"],
    )
    got = (
        wand_topk(
            spark, merged, tstats, meta, queries, mode="prefix", max_expansions=5
        )
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    manual, exp = expand_prefixes(spark, tstats, queries, max_expansions=5)
    assert all(len(v) <= 5 for v in exp.values())
    assert exp["qqqq"] == []
    want = (
        wand_topk(spark, merged, tstats, meta, manual, mode="or")
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert set(got["query_id"]) == {"p1", "p2"}  # dead-prefix query is empty


def test_searcher_prefix_with_cached_vocab(spark, index_dir):
    from angle_spark.query.searcher import Searcher

    queries = pd.DataFrame(
        [("p1", "w00* w0137", 10)], columns=["query_id", "text", "k"]
    )
    with Searcher(spark, index_dir) as s:
        want = s.search(queries, mode="prefix", max_expansions=4).toPandas()
    with Searcher(spark, index_dir, cache_vocab=True) as s:
        got = s.search(queries, mode="prefix", max_expansions=4).toPandas()
    key = ["query_id", "rank", "doc_id"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        want.sort_values(key).reset_index(drop=True),
    )


def test_prefix_composes_with_deletes(spark, index_dir, tmp_path):
    """Prefix expansion rides the or-mode machinery, so tombstone masking
    must compose: deleted docs vanish, survivors keep their full-corpus
    scores (pre-purge delete semantics)."""
    import shutil

    from angle_spark.index.deletes import delete_docs, load_deletes

    idx2 = str(tmp_path / "idx2")
    shutil.copytree(index_dir, idx2)
    merged, tstats, meta = load_index(spark, idx2)
    q = pd.DataFrame([("p1", "w00*", 100000)], columns=["query_id", "text", "k"])
    base = wand_topk(spark, merged, tstats, meta, q, mode="prefix").toPandas()
    victims = sorted(base.doc_id)[:5]
    delete_docs(
        spark,
        idx2,
        spark.createDataFrame([(int(d),) for d in victims], "doc_id long"),
    )
    masked = wand_topk(
        spark,
        merged,
        tstats,
        meta,
        q,
        mode="prefix",
        deletes=load_deletes(spark, idx2),
    ).toPandas()
    assert set(masked.doc_id) == set(base.doc_id) - set(victims)
    m = masked.set_index("doc_id")["score"]
    b = base.set_index("doc_id")["score"]
    assert all(abs(m[d] - b[d]) < 1e-12 for d in m.index)

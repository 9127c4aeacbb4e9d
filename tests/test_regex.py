"""Regexp retrieval: /pat/ leaves full-match vocabulary terms, expand
to the capped df-ranked top terms (query/regex.py, same rewrite shape
as prefix leaves) and evaluate as boolean trees. Contract: dialect
divergences rejected at parse time, a matchless pattern folds like an
OOV term, Spark and pandas vocabulary paths agree exactly, and a regex
tree equals the same tree with the expansion written out literally."""

from __future__ import annotations

import pandas as pd
import pytest

from angle_spark.index.build import build_index, load_index
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.query.boolean import (
    BooleanQueryError,
    expand_regex_ast,
    parse_query,
    regex_patterns,
)
from angle_spark.query.regex import expand_regex, validate_pattern
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
    out = str(tmp_path_factory.mktemp("regex") / "idx")
    build_index(spark, docs, out, segment_docs=128, block_size=16)
    return out


def test_parse_and_validate():
    assert parse_query("/s.o./ AND hash") == (
        "and",
        [("regex", "s.o."), ("term", "hash")],
        [],
    )
    # regex body may contain parens/alternation/spaces without confusing
    # the lexer, and a boost suffix wraps the leaf
    assert parse_query("/(a|b) c/^2") == ("boost", ("regex", "(a|b) c"), 2.0)
    assert regex_patterns(parse_query("merge AND NOT /x+/")) == {"x+"}
    # divergent constructs rejected at parse time
    for bad in (r"(?=x)", r"(?!x)", r"(?<=x)y", r"a\1", r"a*+"):
        with pytest.raises(BooleanQueryError, match="not supported"):
            parse_query(f"/{bad}/")
    with pytest.raises(BooleanQueryError, match="empty"):
        parse_query("// AND hash")
    with pytest.raises(BooleanQueryError, match="invalid regex"):
        parse_query("/a[/ AND hash")
    # validate_pattern is the shared gate
    assert validate_pattern("w0[0-9]+") == "w0[0-9]+"
    with pytest.raises(ValueError):
        validate_pattern("")


def test_expand_regex_rank_cap_and_flavors(spark):
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
    # FULL match: 's.*' alone would prefix-match nothing extra here, but
    # 's.' must NOT match 'scan' (length 4) — anchoring is the contract
    exp = expand_regex(spark, tstats, ["s.*", "s.", "zz+"], max_expansions=3)
    assert exp["s."] == []
    assert exp["zz+"] == []
    # df DESC then term ASC on the 12-12 tie ('slow' < 'small'), then
    # scan(10) — sort(5) capped out
    assert exp["s.*"] == ["slow", "small", "scan"]
    # pandas vocabulary path (cache_vocab serving) must agree exactly
    exp_pd = expand_regex(
        spark, tstats.toPandas(), ["s.*", "s.", "zz+"], max_expansions=3
    )
    assert exp_pd == exp


def test_dead_pattern_folds_through_tree():
    exp = {"x+": [], "jo.*": ["join", "jolt"]}
    assert expand_regex_ast(parse_query("/x+/ AND scan"), exp) is None
    assert expand_regex_ast(parse_query("/x+/ OR scan"), exp) == ("term", "scan")
    # NOT with a dead pattern is a no-op
    assert expand_regex_ast(parse_query("scan AND NOT /x+/"), exp) == (
        "term",
        "scan",
    )
    # boost wrapper survives expansion and inherits onto the OR
    assert expand_regex_ast(parse_query("/jo.*/^2"), exp) == (
        "boost",
        ("or", [("term", "join"), ("term", "jolt")]),
        2.0,
    )


def test_regex_tree_equals_literal_expansion(spark, index_dir):
    """mode='boolean' with a regex leaf == the same tree with the
    expansion written out literally (both flavors of the vocabulary)."""
    merged, tstats, meta = load_index(spark, index_dir)
    q_rx = pd.DataFrame(
        [
            ("r1", "/w004[0-9]/ AND w0003", 10),
            ("r2", "/qqqq+/ OR w0042", 10),
            ("r3", "/qqqq+/ AND w0042", 10),
        ],
        columns=["query_id", "text", "k"],
    )
    exp = expand_regex(spark, tstats, ["w004[0-9]"], max_expansions=5)
    assert 1 <= len(exp["w004[0-9]"]) <= 5
    literal = " OR ".join(exp["w004[0-9]"])
    q_lit = pd.DataFrame(
        [
            ("r1", f"({literal}) AND w0003", 10),
            ("r2", "w0042", 10),
        ],
        columns=["query_id", "text", "k"],
    )
    got = (
        wand_topk(
            spark, merged, tstats, meta, q_rx, mode="boolean", max_expansions=5
        )
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    want = (
        wand_topk(spark, merged, tstats, meta, q_lit, mode="boolean")
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # dead-pattern AND query vanished entirely
    assert set(got["query_id"]) == {"r1", "r2"}


def test_searcher_regex_with_cached_vocab(spark, index_dir):
    from angle_spark.query.searcher import Searcher

    queries = pd.DataFrame(
        [("r1", "/w00[0-9]+/ AND w0137", 10)], columns=["query_id", "text", "k"]
    )
    with Searcher(spark, index_dir) as s:
        want = s.search(queries, mode="boolean", max_expansions=4).toPandas()
    with Searcher(spark, index_dir, cache_vocab=True) as s:
        got = s.search(queries, mode="boolean", max_expansions=4).toPandas()
    assert len(want) > 0
    key = ["query_id", "rank", "doc_id"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        want.sort_values(key).reset_index(drop=True),
    )

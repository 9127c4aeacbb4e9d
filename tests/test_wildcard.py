"""Wildcard queries: ``te?t`` / ``h*llo`` / ``*ion`` words (Lucene
WildcardQuery) desugar at parse time to regex leaves via
query/regex.wildcard_to_regex, so the capped top-terms rewrite, boosts,
NOT, the SQL oracle and the percolator all reuse the regex engine.
Contract: translation goldens, pure trailing-* stays a prefix leaf,
all-wildcard and non-alphabet patterns rejected, and a wildcard tree
retrieves identically to its hand-translated regex twin."""

from __future__ import annotations

import pandas as pd
import pytest

from angle_spark.index.build import build_index, load_index
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.query.boolean import BooleanQueryError, parse_query
from angle_spark.query.regex import wildcard_to_regex
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
    out = str(tmp_path_factory.mktemp("wildcard") / "idx")
    build_index(spark, docs, out, segment_docs=128, block_size=16)
    return out


def test_translation_goldens():
    assert wildcard_to_regex("te?t") == "te.t"
    assert wildcard_to_regex("h*llo") == "h.*llo"
    assert wildcard_to_regex("*ion") == ".*ion"
    assert wildcard_to_regex("f*o*") == "f.*o.*"
    assert wildcard_to_regex("?a??") == ".a.."
    # lowercased like the vocabulary
    assert wildcard_to_regex("Te?T") == "te.t"
    # literal regex metacharacters never appear (alphabet check), but
    # the output must be escape-safe by construction for digits/letters
    assert wildcard_to_regex("w00?9") == "w00.9"


def test_translation_rejections():
    for bad in ("", "*", "?", "**", "?*", "*?*"):
        with pytest.raises(ValueError):
            wildcard_to_regex(bad)
    # literal segments outside [a-z0-9] can never match an indexed term
    with pytest.raises(ValueError, match="alphabet"):
        wildcard_to_regex("fo,o?")
    with pytest.raises(ValueError, match="alphabet"):
        wildcard_to_regex("a.b*")


def test_parse_shapes():
    # wildcard word -> regex leaf
    assert parse_query("te?t") == ("regex", "te.t")
    assert parse_query("h*llo AND scan") == (
        "and",
        [("regex", "h.*llo"), ("term", "scan")],
        [],
    )
    # leading-* is a (disclosed-cost) wildcard, not an error
    assert parse_query("*ion") == ("regex", ".*ion")
    # pure trailing-* is the PREFIX leaf — the cheaper rewrite
    assert parse_query("jo*") == ("prefix", "jo")
    # ...but any other wildcard in the word routes to regex
    assert parse_query("j?o*") == ("regex", "j.o.*")
    # boost suffix wraps the desugared leaf
    assert parse_query("te?t^2") == ("boost", ("regex", "te.t"), 2.0)
    # negation composes like any regex leaf
    assert parse_query("scan AND NOT f?st") == (
        "and",
        [("term", "scan")],
        [("regex", "f.st")],
    )
    # rejections surface as grammar errors naming the wildcard
    with pytest.raises(BooleanQueryError, match="wildcard"):
        parse_query("scan AND f,o?")


def test_wildcard_equals_hand_translated_regex(spark, index_dir):
    """A wildcard tree retrieves identically to the same tree written
    with the translated /regex/ leaves — they ARE the same AST."""
    merged, tstats, meta = load_index(spark, index_dir)
    q_wc = pd.DataFrame(
        [
            ("w1", "w004? AND w0003", 10),
            ("w2", "w00*1 OR w0042", 10),
            ("w3", "zz?q AND w0042", 10),  # dead wildcard kills the AND
        ],
        columns=["query_id", "text", "k"],
    )
    q_rx = pd.DataFrame(
        [
            ("w1", "/w004./ AND w0003", 10),
            ("w2", "/w00.*1/ OR w0042", 10),
            ("w3", "/zz.q/ AND w0042", 10),
        ],
        columns=["query_id", "text", "k"],
    )
    got = (
        wand_topk(
            spark, merged, tstats, meta, q_wc, mode="boolean", max_expansions=5
        )
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    want = (
        wand_topk(
            spark, merged, tstats, meta, q_rx, mode="boolean", max_expansions=5
        )
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert set(got["query_id"]) == {"w1", "w2"}  # w3's AND is dead
    assert len(got) > 0


def test_percolate_wildcard(spark):
    """Wildcard queries percolate: per-doc semantics come free from the
    regex desugar (uncapped, matched against the doc's own tokens)."""
    from angle_spark.query.percolate import compile_catalog, percolate

    catalog = compile_catalog(
        [("c1", "hash AND jo?n"), ("c2", "*ology"), ("c3", "qu?z")]
    )
    docs = spark.createDataFrame(
        [
            (0, "hash join wins"),
            (1, "the topology of graphs"),
            (2, "a quiz about nothing"),
            (3, "hash table only"),
        ],
        "doc_id long, text string",
    )
    got = percolate(docs, catalog).toPandas()
    pairs = set(zip(got["doc_id"], got["query_id"]))
    assert pairs == {(0, "c1"), (1, "c2"), (2, "c3")}

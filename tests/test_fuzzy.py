"""Fuzzy leaves (``word~d``, Lucene FuzzyQuery): parse, driver-side
expansion (Spark and pandas paths), AST folding, and end-to-end
equivalence with the literally-written expansion.

Contracts (query/fuzzy.py + query/boolean.py + query/wand.py
mode="boolean"): expansion ranks (edit distance ASC, df DESC, term
ASC) capped at max_expansions; a word with no near-enough vocabulary
term folds exactly like an OOV term; distance caps at 2; ``~0`` is the
exact term; the pandas-tstats path is bit-identical to the Spark path.
"""

from __future__ import annotations

import pandas as pd
import pytest

from angle_spark.index.build import build_index, load_index
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.query.boolean import (
    BooleanQueryError,
    expand_fuzzy_ast,
    fuzzy_pairs,
    parse_query,
)
from angle_spark.query.fuzzy import expand_fuzzy, levenshtein_py
from angle_spark.query.wand import wand_topk
from angle_spark.synth import transcripts_df

N_CONVS = 40
SEED = 42


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    docs = (
        with_tokens(
            assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4))
        ).select("doc_id", "tokens", "dl")
    )
    out = str(tmp_path_factory.mktemp("fuzzy") / "idx")
    build_index(spark, docs, out, segment_docs=128, block_size=16)
    return out


def test_fuzzy_parse():
    assert parse_query("jion~1") == ("fuzzy", "jion", 1)
    assert parse_query("jion~") == ("fuzzy", "jion", 2)  # Lucene default
    assert parse_query("scan~0") == ("term", "scan")  # exact
    ast = parse_query("(sow~1 OR spark) AND NOT kay~2")
    assert fuzzy_pairs(ast) == {("sow", 1), ("kay", 2)}
    with pytest.raises(BooleanQueryError, match="distance"):
        parse_query("word~3")
    with pytest.raises(BooleanQueryError, match="one"):
        parse_query("a-b~1")  # body tokenizes to two tokens
    # quoted ~ is still proximity, not fuzziness
    assert parse_query('"a b"~3') == ("phrase", ["a", "b"], 3)


def test_fuzzy_fold():
    exp = {("jo", 1): ["join", "jolt"], ("zz", 1): [], ("one", 2): ["one"]}
    ast = parse_query("(jo~1 OR spark) AND NOT zz~1")
    # dead NOT child is a no-op; the single-positive AND collapses
    assert expand_fuzzy_ast(ast, exp) == (
        "or",
        [("or", [("term", "join"), ("term", "jolt")]), ("term", "spark")],
    )
    # dead positive arm kills an AND group; dead OR arm drops
    assert expand_fuzzy_ast(parse_query("zz~1 AND spark"), exp) is None
    assert expand_fuzzy_ast(parse_query("zz~1 OR spark"), exp) == ("term", "spark")
    # single-expansion leaf collapses to a bare term
    assert expand_fuzzy_ast(parse_query("one~2"), exp) == ("term", "one")
    # prefix leaves pass through untouched
    assert expand_fuzzy_ast(parse_query("jo* AND one~2"), exp) == (
        "and",
        [("prefix", "jo"), ("term", "one")],
        [],
    )


def test_levenshtein_py_matches_spark(spark):
    words = ["w0137", "w013", "w1137", "spark", "", "abc"]
    pairs = [(a, b) for a in words for b in words]
    df = spark.createDataFrame(pairs, "a string, b string")
    from pyspark.sql import functions as F

    got = {
        (r["a"], r["b"]): r["d"]
        for r in df.withColumn("d", F.levenshtein("a", "b")).collect()
    }
    for a, b in pairs:
        assert levenshtein_py(a, b) == got[(a, b)], (a, b)


def test_expand_fuzzy_spark_pandas_parity_and_cap(spark, index_dir):
    _, tstats, _ = load_index(spark, index_dir)
    ts_pdf = tstats.select("term", "df").toPandas()
    seed = ts_pdf["term"].iloc[len(ts_pdf) // 2]
    pairs = [(seed, 1), (seed, 2), ("zzzzzzzz", 2)]
    full = expand_fuzzy(spark, tstats, pairs, max_expansions=1000)
    capped = expand_fuzzy(spark, tstats, pairs, max_expansions=2)
    # synth vocabulary (w0137-style) is dense in edit space: the cap binds
    assert len(full[(seed, 2)]) > 2
    assert capped[(seed, 2)] == full[(seed, 2)][:2]
    assert full[("zzzzzzzz", 2)] == []
    # the exact hit ranks first (distance 0)
    assert full[(seed, 1)][0] == seed
    # expansion order is (dist ASC, df DESC, term ASC)
    dfm = dict(zip(ts_pdf["term"], ts_pdf["df"]))
    keys = [
        (levenshtein_py(seed, t), -int(dfm[t]), t) for t in full[(seed, 2)]
    ]
    assert keys == sorted(keys)
    # pandas-tstats opt-in path is bit-identical
    for cap in (2, 1000):
        assert expand_fuzzy(spark, ts_pdf, pairs, max_expansions=cap) == (
            capped if cap == 2 else full
        )


def test_expand_fuzzy_rejects_bad_dist(spark, index_dir):
    _, tstats, _ = load_index(spark, index_dir)
    with pytest.raises(ValueError, match="max_dist"):
        expand_fuzzy(spark, tstats, [("w", 3)])
    with pytest.raises(ValueError, match="max_dist"):
        expand_fuzzy(spark, tstats, [("w", 0)])
    with pytest.raises(ValueError, match="prefix_length"):
        expand_fuzzy(spark, tstats, [("w", 1)], prefix_length=-1)


def test_expand_fuzzy_prefix_length(spark, index_dir):
    """prefix_length (Lucene FuzzyQuery.prefixLength): candidates must
    start with word[:p]. The filtered set == the unfiltered set minus
    non-prefix terms (order preserved — the filter never reranks), the
    synth vocabulary makes the filter BIND, and the pandas twin is
    bit-identical. A word shorter than p requires the whole word as
    candidate prefix (degenerate rule)."""
    _, tstats, _ = load_index(spark, index_dir)
    ts_pdf = tstats.select("term", "df").toPandas()
    seed = ts_pdf["term"].iloc[len(ts_pdf) // 2]  # w0137-style
    pairs = [(seed, 2)]
    full = expand_fuzzy(spark, tstats, pairs, max_expansions=1000)
    for p in (1, 3, len(seed)):
        pref = expand_fuzzy(
            spark, tstats, pairs, max_expansions=1000, prefix_length=p
        )
        want = [t for t in full[(seed, 2)] if t.startswith(seed[:p])]
        assert pref[(seed, 2)] == want, p
        # pandas twin bit-identical
        assert expand_fuzzy(
            spark, ts_pdf, pairs, max_expansions=1000, prefix_length=p
        ) == pref
    # the filter binds somewhere in 1..3 on the dense synth vocab
    p3 = expand_fuzzy(spark, tstats, pairs, max_expansions=1000, prefix_length=3)
    assert len(p3[(seed, 2)]) < len(full[(seed, 2)])
    # degenerate: word shorter than prefix_length -> candidates must
    # start with the whole word
    short = seed[:2]
    ds = expand_fuzzy(
        spark, tstats, [(short, 2)], max_expansions=1000, prefix_length=10
    )
    assert all(t.startswith(short) for t in ds[(short, 2)])
    # wand_topk threads the knob: a fuzzy boolean batch at p=len(seed)
    # retrieves exactly the exact-term tree's docs
    merged, tstats_df, meta = load_index(spark, index_dir)
    q = pd.DataFrame(
        [("f", f"{seed}~2", 1000)], columns=["query_id", "text", "k"]
    )
    qe = pd.DataFrame([("f", seed, 1000)], columns=["query_id", "text", "k"])
    got = wand_topk(
        spark, merged, tstats_df, meta, q, mode="boolean",
        fuzzy_prefix_length=len(seed),
    ).toPandas()
    want = wand_topk(
        spark, merged, tstats_df, meta, qe, mode="boolean"
    ).toPandas()
    assert set(got["doc_id"]) == set(want["doc_id"])


def test_fuzzy_in_boolean_end_to_end(spark, index_dir):
    """mode='boolean' with a fuzzy leaf == the same tree with the
    expansion written out literally."""
    merged, tstats, meta = load_index(spark, index_dir)
    seed = tstats.select("term").toPandas()["term"].iloc[5]
    exp = expand_fuzzy(spark, tstats, [(seed, 2)], max_expansions=4)[(seed, 2)]
    assert 1 < len(exp) <= 4
    lit = " OR ".join(exp)
    other = tstats.select("term").toPandas()["term"].iloc[9]
    q = pd.DataFrame(
        [(f"f1", f"{seed}~2 AND NOT {other}", 1000),
         (f"f2", f"zzqqzz~2 OR {other}", 1000)],
        columns=["query_id", "text", "k"],
    )
    q_lit = pd.DataFrame(
        [(f"f1", f"({lit}) AND NOT {other}", 1000), (f"f2", other, 1000)],
        columns=["query_id", "text", "k"],
    )
    got = wand_topk(
        spark, merged, tstats, meta, q, mode="boolean", max_expansions=4
    ).toPandas()
    want = wand_topk(spark, merged, tstats, meta, q_lit, mode="boolean").toPandas()
    key = ["query_id", "rank", "doc_id"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        want.sort_values(key).reset_index(drop=True),
    )

"""Faceted counts and snippets — the serving surface around the ranked
list (query/facets.py, query/snippets.py). Facet/snippet joins must
broadcast the small RESULT side; the corpus is never shuffled."""

from __future__ import annotations

import pandas as pd

from angle_spark.query.facets import facet_counts
from angle_spark.query.snippets import _snippet_py, snippets


def test_snippet_py_semantics():
    text = "alpha beta gamma delta epsilon zeta eta theta"
    # first match mid-document: +-2 tokens
    assert _snippet_py(text, ["delta"], 2) == "beta gamma delta epsilon zeta"
    # clamp at the left edge
    assert _snippet_py(text, ["alpha"], 3) == "alpha beta gamma delta"
    # clamp at the right edge
    assert _snippet_py(text, ["theta"], 3) == "epsilon zeta eta theta"
    # FIRST occurrence of ANY query term wins (min position)
    assert _snippet_py(text, ["zeta", "beta"], 1) == "alpha beta gamma"
    # no match -> empty; null text -> empty
    assert _snippet_py(text, ["qqq"], 2) == ""
    assert _snippet_py(None, ["alpha"], 2) == ""
    # tokenizer is shared: punctuation/case fold before matching
    assert _snippet_py("The FAST, key!", ["fast"], 1) == "the fast key"


def test_snippets_dataframe(spark):
    corpus = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),
            (1, "gamma gamma beta"),
            (2, "no match here"),
        ],
        "doc_id long, text string",
    )
    results = spark.createDataFrame(
        [("q1", 1, 0), ("q1", 2, 1), ("q2", 1, 2)],
        "query_id string, rank int, doc_id long",
    )
    queries = pd.DataFrame(
        [("q1", "beta gamma", 10), ("q2", "zzz", 10)],
        columns=["query_id", "text", "k"],
    )
    out = snippets(spark, results, corpus, queries, width=1)
    got = {(r["query_id"], r["doc_id"]): r["snippet"] for r in out.collect()}
    assert got == {
        ("q1", 0): "alpha beta gamma",  # beta at pos 2 wins over gamma
        ("q1", 1): "gamma gamma",  # first gamma, clamped left
        ("q2", 2): "",  # query term absent from doc
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_facet_counts(spark):
    corpus = spark.createDataFrame(
        [(0, "en", "a"), (1, "en", "b"), (2, "de", "a"), (3, "en", "a")],
        "doc_id long, lang string, source string",
    )
    results = spark.createDataFrame(
        [("q1", 0), ("q1", 1), ("q1", 2), ("q2", 3)],
        "query_id string, doc_id long",
    )
    out = facet_counts(results, corpus, ("lang", "source"))
    got = {
        (r["query_id"], r["lang"], r["source"]): r["n_docs"] for r in out.collect()
    }
    assert got == {
        ("q1", "en", "a"): 1,
        ("q1", "en", "b"): 1,
        ("q1", "de", "a"): 1,
        ("q2", "en", "a"): 1,
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan

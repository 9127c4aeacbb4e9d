"""Regexp queries: ``/w00[0-9]/`` retrieves via every indexed term the
pattern fully matches — Lucene's RegexpQuery, third member of the
vocabulary-rewrite leaf family (prefix: query/prefix.py, fuzzy:
query/fuzzy.py).

The reference's query surface is free text through the encoder
(reference README.md:119-128); dense retrieval has no notion of "terms
shaped like X". An inverted index answers it exactly: rewrite the leaf
into the matching vocabulary terms, then score the rewritten query as a
standard disjunction. Expansion is capped at ``max_expansions`` terms
per pattern, preferring high-df terms (the same top-terms rewrite as
prefix leaves — for a ranked top-k, the high-df expansions are the ones
that can change the result set, and an uncapped ``/.*/`` over a 100 TB
vocabulary would otherwise ship the whole dictionary).

Semantics: FULL-term match (Lucene RegexpQuery anchors both ends). The
engine anchors the pattern as ``^(?:pat)$`` for Spark's Java-regex
``rlike``; the DuckDB oracle uses ``regexp_full_match`` (RE2), which is
full-match by construction. The two dialects agree on the supported
subset because ``validate_pattern`` rejects everything they disagree on
(backreferences, lookaround, possessive quantifiers) before any scan
runs.

Scale shape: mirror of query/prefix.expand_stems — the patterns
broadcast into ONE scan of term_stats; a per-pattern
top-``max_expansions`` window bounds what reaches the driver to
|patterns| x max_expansions rows. The vocabulary itself never does.
Unlike a prefix (a contiguous range in the term-sorted scan), a general
regex cannot prune row groups — that is inherent to the operator, and
the scan is still one column of one metadata table, not the postings.
Determinism: expansions rank by (df DESC, term ASC) — fully ordered, so
the rewrite (and therefore the scores) are reproducible and
oracle-replicable.
"""

from __future__ import annotations

import re as _re
from functools import reduce
from operator import or_

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DEFAULT_MAX_EXPANSIONS = 64

# constructs where Java regex (Spark rlike) and RE2 (DuckDB
# regexp_full_match) diverge: RE2 has no backreferences or lookaround,
# Java has possessive quantifiers RE2 lacks. Rejecting them keeps every
# accepted pattern meaning the same thing on both sides.
_DIVERGENT = _re.compile(
    r"""
    \\[1-9]            # backreference \1..\9
    | \(\?=            # lookahead
    | \(\?!            # negative lookahead
    | \(\?<[=!]        # lookbehind
    | [*+?}][+]        # possessive quantifiers a*+ a++ a?+ a{2}+
    """,
    _re.VERBOSE,
)


def validate_pattern(pattern: str) -> str:
    """Reject patterns outside the Java/RE2 common subset; returns the
    pattern unchanged for chaining. Raises ValueError with the reason."""
    if not pattern:
        raise ValueError("empty pattern")
    if _DIVERGENT.search(pattern):
        raise ValueError(
            "backreferences, lookaround and possessive quantifiers are "
            "not supported (the Spark and oracle regex dialects diverge "
            "on them)"
        )
    try:
        _re.compile(pattern)
    except _re.error as exc:
        raise ValueError(f"invalid regex: {exc}") from exc
    return pattern


def wildcard_to_regex(pattern: str) -> str:
    """Lucene ``WildcardQuery`` pattern -> the equivalent regex body
    (``te?t`` -> ``te.t``, ``h*llo`` -> ``h.*llo``, ``*ion`` -> ``.*ion``).
    ``*`` matches any (possibly empty) run, ``?`` exactly one character —
    the grammar desugars wildcard words to regex leaves so the capped
    top-terms rewrite, boosts, NOT, the SQL oracle and the percolator all
    apply unchanged (one expansion engine, not a fourth).

    Validation mirrors the rest of the leaf family: the pattern is
    lowercased (the vocabulary is lowercase), must contain at least one
    literal character (a bare ``*``/``?``/``**`` matches the whole
    vocabulary — a query-cost foot-gun, same rejection as a bare prefix
    ``*``), and every literal segment must be tokenizer-alphabet
    ([a-z0-9]) — any other character can never occur inside an indexed
    term, so the leaf would silently match nothing."""
    if not pattern:
        raise ValueError("empty wildcard pattern")
    low = pattern.lower()
    literals = [seg for seg in _re.split(r"[*?]+", low) if seg]
    if not literals:
        raise ValueError(
            f"wildcard {pattern!r} has no literal characters — it would "
            "match the entire vocabulary"
        )
    for seg in literals:
        if not _re.fullmatch(r"[a-z0-9]+", seg):
            raise ValueError(
                f"wildcard {pattern!r}: literal segment {seg!r} contains "
                "characters outside the tokenizer alphabet [a-z0-9] and "
                "can never match an indexed term"
            )
    out = []
    for ch in low:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(_re.escape(ch))
    return "".join(out)


def expand_regex(
    spark: SparkSession,
    tstats: DataFrame | pd.DataFrame,
    patterns: list[str],
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> dict[str, list[str]]:
    """pattern -> fully-matching vocabulary terms, top ``max_expansions``
    by (df DESC, term ASC). A pattern with no matches maps to [].

    tstats: the index term_stats (term, df, ...) — Spark DataFrame on
    the scale path (one distributed scan for ALL patterns), or the
    cached-pandas vocabulary a bounded-vocab Searcher holds.
    """
    out: dict[str, list[str]] = {p: [] for p in patterns}
    if not patterns:
        return out
    for p in patterns:
        validate_pattern(p)
    if isinstance(tstats, pd.DataFrame):
        for p in patterns:
            m = tstats[tstats["term"].str.fullmatch(p)][["term", "df"]]
            m = m.sort_values(
                ["df", "term"], ascending=[False, True], kind="mergesort"
            ).head(max_expansions)
            out[p] = [str(t) for t in m["term"]]
        return out
    rows = expansion_frame(spark, tstats, patterns, max_expansions).collect()
    for row in sorted(rows, key=lambda x: (x["k1"], x["r"])):
        out[row["k1"]].append(row["term"])
    return out


def expansion_frame(
    spark: SparkSession,
    tstats: DataFrame,
    patterns: list[str],
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> DataFrame:
    """UNCOLLECTED regex-expansion plan -> (k1=pattern, term, r) rows,
    r in 1..max_expansions by (df DESC, term ASC). See
    prefix.expansion_frame for the one-action union contract."""
    uniq = sorted(set(patterns))
    anchored = {p: f"^(?:{p})$" for p in uniq}
    # one pass over term_stats: pre-filter terms matching ANY pattern
    # (rlike literals stay codegen-friendly), then a tiny broadcast join
    # attributes each surviving term to its pattern(s)
    cond = reduce(or_, [F.col("term").rlike(anchored[p]) for p in uniq])
    pat_df = spark.createDataFrame(
        [(p, anchored[p]) for p in uniq], "pattern string, anchored string"
    )
    w = Window.partitionBy("pattern").orderBy(F.desc("df"), F.asc("term"))
    return (
        tstats.select("term", "df")
        .filter(cond)
        .join(F.broadcast(pat_df), F.expr("rlike(term, anchored)"))
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= max_expansions)
        .select(F.col("pattern").alias("k1"), "term", "r")
    )  # bounded: <= |patterns| * max_expansions rows

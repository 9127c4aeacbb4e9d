"""Fuzzy term expansion: ``jion~2`` retrieves via every indexed term
within an edit distance of the (misspelled) word.

The reference tolerates typos implicitly — its subword tokenizer puts a
misspelled word near its neighbors in embedding space (reference
angle_emb/angle.py:208-214), so dense retrieval degrades gracefully. An
inverted index has no such grace: an OOV term matches nothing by
contract. query/suggest.py offers the interactive recovery ("did you
mean"); this module is the in-query form — Lucene's FuzzyQuery: the
leaf rewrites to the nearest vocabulary terms and scores as their
disjunction.

Expansion ranks (edit distance ASC, df DESC, term ASC) — Lucene
DirectSpellChecker order, identical to suggest_terms — capped at
``max_expansions`` terms per (word, max_dist) leaf. Distance is capped
at 2 the way Lucene caps FuzzyQuery fuzziness: levenshtein cost over a
100 TB vocabulary grows with allowed distance, and beyond 2 edits the
matches stop meaning "the same word mistyped".

Scale shape: mirror of query/prefix.expand_stems — the candidate words
broadcast into ONE scan of term_stats, a length-band predicate
(|len(term) - len(word)| <= max_dist, a cheap necessary condition for
edit distance) prunes before the levenshtein evaluation, and a
per-(word, dist) top-``max_expansions`` window bounds what reaches the
driver to |leaves| x max_expansions rows. The vocabulary itself never
does. Spark's ``levenshtein`` and DuckDB's agree exactly (both plain
unit-cost DP; verified in the spell_suggest oracle), which is what lets
the SQL oracle replicate the rewrite term-for-term.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

MAX_FUZZY_DIST = 2


def levenshtein_py(a: str, b: str) -> int:
    """Plain unit-cost edit distance — the pandas-tstats (cached-vocab
    Searcher) twin of Spark/DuckDB ``levenshtein``."""
    m, n = len(a), len(b)
    if m == 0:
        return n
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[n]


def expand_fuzzy(
    spark: SparkSession,
    tstats: DataFrame | pd.DataFrame,
    pairs: list[tuple[str, int]],
    max_expansions: int = 64,
    prefix_length: int = 0,
) -> dict[tuple[str, int], list[str]]:
    """(word, max_dist) -> matching vocabulary terms, top
    ``max_expansions`` by (edit distance ASC, df DESC, term ASC). A word
    with no near-enough term maps to []. An exact vocabulary hit ranks
    first (distance 0) — the common case where the "typo" wasn't one.

    tstats: the index term_stats (term, df, ...) — Spark DataFrame on
    the scale path (length-band prefilter + one distributed levenshtein
    pass), or the cached-pandas vocabulary a bounded-vocab Searcher
    holds (same opt-in contract as query/prefix.expand_stems).

    ``prefix_length`` (Lucene FuzzyQuery.prefixLength / the ES fuzzy
    option, default 0): candidates must share the word's first N
    characters EXACTLY — the "typos don't happen in the first letters"
    heuristic that turns the full-vocabulary levenshtein pass into a
    prefix-prefiltered one (the same contiguous-range shape the prefix
    query pushes to the scan). Distance is still full-string
    levenshtein: identical prefixes trim without changing edit distance
    (the standard common-prefix property), so the filtered result is
    exactly Lucene's suffix-measured one. Degenerate-case divergence
    (disclosed; r5 ADVICE): when ``prefix_length >= len(word)``, Lucene
    FuzzyQuery rewrites to an EXACT single-term query; this
    implementation instead matches any vocabulary term that starts
    with the whole word and is within the edit distance (e.g. word
    'ab', prefix_length=3, dist 2 also matches 'abcd'). The entries'
    oracles pin the implemented semantics."""
    out: dict[tuple[str, int], list[str]] = {p: [] for p in pairs}
    if not pairs:
        return out
    if prefix_length < 0:
        raise ValueError(f"prefix_length must be >= 0, got {prefix_length}")
    uniq = sorted(set(pairs))
    for _, d in uniq:
        if not (1 <= d <= MAX_FUZZY_DIST):
            raise ValueError(
                f"fuzzy max_dist must be in 1..{MAX_FUZZY_DIST}, got {d}"
            )
    if isinstance(tstats, pd.DataFrame):
        for w, d in uniq:
            m = tstats[["term", "df"]].copy()
            m = m[(m["term"].str.len() - len(w)).abs() <= d]
            if prefix_length > 0:
                pre = w[:prefix_length]
                m = m[m["term"].str.startswith(pre)]
            m["dist"] = [levenshtein_py(w, t) for t in m["term"]]
            m = m[m["dist"] <= d]
            m = m.sort_values(
                ["dist", "df", "term"],
                ascending=[True, False, True],
                kind="mergesort",
            ).head(max_expansions)
            out[(w, d)] = [str(t) for t in m["term"]]
        return out
    rows = expansion_frame(
        spark, tstats, uniq, max_expansions, prefix_length
    ).collect()
    for row in sorted(rows, key=lambda x: (x["k1"], x["k2"], x["r"])):
        out[(row["k1"], row["k2"])].append(row["term"])
    return out


def expansion_frame(
    spark: SparkSession,
    tstats: DataFrame,
    pairs: list[tuple[str, int]],
    max_expansions: int = 64,
    prefix_length: int = 0,
) -> DataFrame:
    """UNCOLLECTED fuzzy-expansion plan -> (k1=word, k2=max_dist, term,
    r) rows, r in 1..max_expansions by (distance ASC, df DESC, term
    ASC). See prefix.expansion_frame for the one-action union contract.
    ``prefix_length`` > 0 adds the exact-prefix prefilter BEFORE the
    levenshtein evaluation (see expand_fuzzy)."""
    pair_df = spark.createDataFrame(
        sorted(set(pairs)), "word string, max_dist int"
    )
    w = Window.partitionBy("word", "max_dist").orderBy(
        F.asc("dist"), F.desc("df"), F.asc("term")
    )
    base = tstats.select("term", "df").crossJoin(F.broadcast(pair_df)).filter(
        F.abs(F.length("term") - F.length("word")) <= F.col("max_dist")
    )
    if prefix_length > 0:
        # required prefix = word[:p] (the whole word when shorter — the
        # degenerate rule); startswith keeps the pandas twin identical
        p = int(prefix_length)
        base = base.filter(
            F.col("term").startswith(F.substring(F.col("word"), 1, p))
        )
    return (
        base
        .withColumn("dist", F.levenshtein("word", "term"))
        .filter(F.col("dist") <= F.col("max_dist"))
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= max_expansions)
        .select(
            F.col("word").alias("k1"), F.col("max_dist").alias("k2"), "term", "r"
        )
    )  # bounded: <= |pairs| * max_expansions rows

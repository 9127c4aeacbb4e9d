"""Prefix (wildcard) queries: ``jo*`` retrieves via every indexed term
starting with ``jo``.

The reference's query surface is free-text prompts fed to the encoder
(reference README.md:119-128) — a user types a stem and the dense model
generalizes. The sparse analog is Lucene-style prefix expansion: rewrite
each ``stem*`` leaf into the matching vocabulary terms, then score the
rewritten query as a standard disjunction. Expansion is capped at
``max_expansions`` terms per stem, preferring high-df terms (Lucene's
top-terms rewrite): for a ranked top-k, the high-df expansions are the
ones that can change the result set, and an uncapped ``s*`` over a
100 TB vocabulary would otherwise ship millions of posting lists.

Scale shape: the stem match runs ON the term_stats table — a
``StringStartsWith`` filter that pushes into the term-sorted parquet
scan (a prefix is a contiguous term range, so row-group min/max stats
prune everything else), then a per-stem top-``max_expansions`` window.
Only |stems| * max_expansions rows ever reach the driver; the
vocabulary itself never does. Determinism: expansions rank by
(df DESC, term ASC) — fully ordered, so the rewrite (and therefore the
scores) are reproducible and oracle-replicable.
"""

from __future__ import annotations

from functools import reduce
from operator import or_

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from angle_spark.functions.tokenizer import tokenize_py

DEFAULT_MAX_EXPANSIONS = 64


def parse_prefix_text(text: str) -> tuple[list[str], list[str]]:
    """Split a query string into (literal_tokens, prefix_stems).

    A whitespace-delimited chunk ending in ``*`` whose body tokenizes to
    exactly one token is a prefix leaf; every other chunk contributes its
    tokens literally. A bare ``*`` (empty stem) is rejected — matching
    the entire vocabulary is a query-cost foot-gun, not a query.
    """
    literals: list[str] = []
    stems: list[str] = []
    for chunk in (text or "").split():
        if chunk.endswith("*"):
            body = tokenize_py(chunk[:-1])
            if len(body) != 1:
                raise ValueError(
                    f"prefix chunk {chunk!r}: stem must tokenize to exactly one token"
                )
            stems.append(body[0])
        else:
            literals.extend(tokenize_py(chunk))
    return literals, stems


def expand_stems(
    spark: SparkSession,
    tstats: DataFrame | pd.DataFrame,
    stems: list[str],
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> dict[str, list[str]]:
    """stem -> matching vocabulary terms, top ``max_expansions`` by
    (df DESC, term ASC). A stem with no matches maps to [].

    tstats: the index term_stats (term, df, ...) — Spark DataFrame on
    the scale path (startswith filter pushed into the term-sorted scan),
    or the cached-pandas vocabulary a bounded-vocab Searcher holds.
    """
    out: dict[str, list[str]] = {s: [] for s in stems}
    if not stems:
        return out
    if isinstance(tstats, pd.DataFrame):
        for s in stems:
            m = tstats[tstats["term"].str.startswith(s)][["term", "df"]]
            m = m.sort_values(
                ["df", "term"], ascending=[False, True], kind="mergesort"
            ).head(max_expansions)
            out[s] = [str(t) for t in m["term"]]
        return out
    rows = expansion_frame(spark, tstats, stems, max_expansions).collect()
    for row in sorted(rows, key=lambda x: (x["k1"], x["r"])):
        out[row["k1"]].append(row["term"])
    return out


def expansion_frame(
    spark: SparkSession,
    tstats: DataFrame,
    stems: list[str],
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> DataFrame:
    """UNCOLLECTED prefix-expansion plan -> (k1=stem, term, r) rows,
    r in 1..max_expansions by (df DESC, term ASC). wand_topk unions this
    with the fuzzy/regex frames so a mixed boolean batch pays ONE Spark
    action for all three vocabulary rewrites instead of three
    driver round-trips (round-5 query-side fixed-overhead cut)."""
    cond = reduce(or_, [F.col("term").startswith(F.lit(s)) for s in stems])
    stem_df = spark.createDataFrame([(s,) for s in sorted(set(stems))], "stem string")
    w = Window.partitionBy("stem").orderBy(F.desc("df"), F.asc("term"))
    return (
        tstats.select("term", "df")
        .filter(cond)  # StringStartsWith -> parquet scan on the sorted term range
        .join(F.broadcast(stem_df), F.col("term").startswith(F.col("stem")))
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= max_expansions)
        .select(F.col("stem").alias("k1"), "term", "r")
    )  # bounded: <= |stems| * max_expansions rows


def expand_prefixes(
    spark: SparkSession,
    tstats: DataFrame | pd.DataFrame,
    queries: DataFrame | pd.DataFrame,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> tuple[DataFrame | pd.DataFrame, dict[str, list[str]]]:
    """Rewrite a (query_id, text, k) batch: every ``stem*`` leaf becomes
    its expansion terms; literal tokens pass through. Returns
    (rewritten queries in the same flavor they came in, stem->terms map).

    A stem with no vocabulary match expands to nothing (it cannot match
    any document, by definition); a query whose every token was such a
    stem rewrites to empty text and retrieves nothing. Duplicate terms
    collapse (query-as-set semantics, same as every other mode).

    The query batch is collected driver-side — same bounded contract as
    boolean mode (queries are the small side by definition); the
    EXPANSION stays distributed (see expand_stems).
    """
    if isinstance(queries, pd.DataFrame):
        rows = [
            (r.query_id, str(r.text), int(r.k))
            for r in queries.itertuples(index=False)
        ]
    else:
        rows = [
            (r["query_id"], r["text"], int(r["k"]))
            for r in queries.select(
                "query_id", "text", F.col("k").cast("int").alias("k")
            ).collect()
        ]
    parsed = [(qid, k, *parse_prefix_text(text)) for qid, text, k in rows]
    stems = sorted({s for _, _, _, ss in parsed for s in ss})
    expansions = expand_stems(spark, tstats, stems, max_expansions)
    out_rows = []
    for qid, k, literals, ss in parsed:
        terms = list(
            dict.fromkeys(literals + [t for s in ss for t in expansions[s]])
        )
        out_rows.append((qid, " ".join(terms), k))
    if isinstance(queries, pd.DataFrame):
        rewritten: DataFrame | pd.DataFrame = pd.DataFrame(
            out_rows, columns=["query_id", "text", "k"]
        )
    else:
        rewritten = spark.createDataFrame(
            out_rows, schema="query_id string, text string, k int"
        )
    return rewritten, expansions


def phrase_prefix_topk(
    spark: SparkSession,
    merged: DataFrame,
    tstats: DataFrame | pd.DataFrame,
    meta,
    queries: DataFrame | pd.DataFrame,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
    **kwargs,
) -> DataFrame:
    """-> (query_id, rank, doc_id, score): Elasticsearch
    ``match_phrase_prefix`` — the text is an exact phrase whose LAST
    token is still being typed: "hash jo" matches "hash join", "hash
    joins", ... (search-as-you-type over phrases).

    Rewrite semantics (Lucene MultiPhraseQuery): the last token expands
    against the vocabulary under the capped top-terms rewrite
    (expand_stems: df DESC, term ASC, ``max_expansions``), each
    expansion forming one exact-phrase alternative; the query becomes
    the OR of those phrase leaves and runs through the boolean engine
    (conjunctive survivors + positional verification per alternative,
    shard-local). A single-token query degrades to the capped prefix
    disjunction ("stem*"), exactly ES's behavior for a one-term phrase.
    A stem with no vocabulary match retrieves nothing. Needs a
    positional index for multi-token queries; composes with deletes /
    doc_filter / collectors through ``kwargs``.

    Scale shape: ONE distributed expansion action for the whole batch
    (pushed StartsWith over the term-sorted stats scan), then the
    standard boolean execution — nothing new shuffles."""
    if isinstance(queries, pd.DataFrame):
        rows = [
            (r.query_id, str(r.text), int(r.k))
            for r in queries.itertuples(index=False)
        ]
    else:
        rows = [
            (r["query_id"], r["text"], int(r["k"]))
            for r in queries.select(
                "query_id", "text", F.col("k").cast("int").alias("k")
            ).collect()
        ]
    parsed = []
    for qid, text, k in rows:
        toks = tokenize_py(text or "")
        if not toks:
            continue  # empty query matches nothing
        parsed.append((qid, k, toks[:-1], toks[-1]))
    stems = sorted({s for _, _, _, s in parsed})
    expansions = expand_stems(spark, tstats, stems, max_expansions)
    out_rows = []
    for qid, k, lead, stem in parsed:
        if not lead:
            out_rows.append((qid, f"{stem}*", k))
            continue
        alts = expansions[stem]
        if not alts:
            continue  # dead stem: no phrase alternative can match
        text = " OR ".join(
            '"' + " ".join(lead + [e]) + '"' for e in alts
        )
        out_rows.append((qid, text, k))
    from angle_spark.query.wand import wand_topk

    if isinstance(queries, pd.DataFrame):
        rewritten: DataFrame | pd.DataFrame = pd.DataFrame(
            out_rows, columns=["query_id", "text", "k"]
        )
    else:
        rewritten = spark.createDataFrame(
            out_rows, schema="query_id string, text string, k int"
        )
    return wand_topk(
        spark, merged, tstats, meta, rewritten,
        mode="boolean", max_expansions=max_expansions, **kwargs,
    )

"""Significant terms: what is a result set about?

Elasticsearch's ``significant_terms`` aggregation / Lucene's
SignificantTermsAggregation shape: compare each term's frequency in a
FOREGROUND doc set (a query's matches or top hits) against its BACKGROUND
frequency (corpus df) and surface the terms that are unusually common in
the foreground — "docs matching X are also about Y". The reference's
semantic twin is its retrieval-then-inspect loop (encode a query, look at
what the neighbors share — reference README.md:119-128); sparse engines
answer it with exactly this fg-vs-bg contrast.

Scoring is ES's JLH: (fg% - bg%) * (fg% / bg%) — the absolute lift times
the relative lift, so both rare-but-exclusive and common-and-enriched
terms rank. fg% = fg_doc_count / |foreground docs|, bg% = df / N. Terms
below ``min_doc_count`` foreground docs are noise-filtered (ES default 3).

Scale shape: ``hits`` is the aggregation context — a (query_id, doc_id)
frame. With top-k hits it is k·|queries| rows and broadcasts into the
term-frequency scan (the ES "sampler" pairing, the production shape at
100 TB); with full boolean membership it degrades gracefully to one
equi-join + one (query, term) groupBy — both sides narrow. The per-query
candidate term set (terms of the foreground docs) is bounded and
broadcasts into the term_stats scan for background dfs; the final top-N
window is per-query over that bounded set. The corpus itself is never
shuffled.

Determinism: selection ranks on (round(score, 6) DESC, term ASC) so the
DuckDB oracle's identical fold reproduces the cut (the repo's standard
full-answer-set tie rule); the returned score column is the rounded JLH.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_TOP_TERMS = 10
DEFAULT_MIN_DOC_COUNT = 3


def significant_terms(
    tf: DataFrame,
    tstats: DataFrame,
    hits: DataFrame,
    n_docs: int,
    top_terms: int = DEFAULT_TOP_TERMS,
    min_doc_count: int = DEFAULT_MIN_DOC_COUNT,
) -> DataFrame:
    """-> (query_id, rank, term, fg_count, bg_count, score): each
    query's ``top_terms`` most significant foreground terms by JLH.

    tf: (doc_id, term, tf) term frequencies; tstats: (term, df, ...);
    hits: (query_id, doc_id) — the foreground sets (top hits or full
    matches; duplicates tolerated)."""
    if top_terms < 1:
        raise ValueError(f"top_terms must be >= 1, got {top_terms}")
    if min_doc_count < 1:
        raise ValueError(f"min_doc_count must be >= 1, got {min_doc_count}")
    h = hits.select(
        "query_id", F.col("doc_id").cast("long").alias("doc_id")
    ).distinct()
    sizes = h.groupBy("query_id").agg(F.count("*").alias("fg_docs"))
    fg = (
        tf.select("doc_id", "term")
        .join(F.broadcast(h), "doc_id")
        .groupBy("query_id", "term")
        .agg(F.count("*").alias("fg_count"))
        .filter(F.col("fg_count") >= min_doc_count)
    )
    fg_pct = F.col("fg_count") / F.col("fg_docs")
    bg_pct = F.col("bg_count") / F.lit(float(n_docs))
    scored = (
        F.broadcast(fg)
        .join(tstats.select("term", F.col("df").alias("bg_count")), "term")
        .join(F.broadcast(sizes), "query_id")
        .withColumn(
            "score",
            F.round((fg_pct - bg_pct) * (fg_pct / bg_pct), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_terms)
        .select("query_id", "rank", "term", "fg_count", "bg_count", "score")
    )

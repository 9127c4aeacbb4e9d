"""Faceted result counts: how the matches distribute over a metadata
dimension (lang, source, role, ...) — the sidebar every search UI draws
next to the ranked list.

Scale shape: the ranked results are k · |queries| rows — broadcast
them; the corpus streams through one scan as the probe side (same
broadcast-the-small-side contract as hydrate(), query/searcher.py). The
groupBy that follows keys on (query_id, facet values): cardinality
|queries| × |facet domain|, a trivially small shuffle. The corpus is
never shuffled and never collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def facet_counts(
    results: DataFrame,
    corpus: DataFrame,
    facet_cols: tuple[str, ...] = ("lang",),
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, *facet_cols, n_docs): per-query result counts by facet
    value. ``results`` is any frame carrying (query_id, doc_id) — ranked
    top-k, a conjunctive answer set, a boolean membership set."""
    small = results.select("query_id", F.col(id_col).cast("long").alias(id_col))
    side = corpus.select(F.col(id_col).cast("long").alias(id_col), *facet_cols)
    return (
        side.join(F.broadcast(small), id_col)
        .groupBy("query_id", *facet_cols)
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )

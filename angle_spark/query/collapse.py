"""Result collapsing (field diversification): keep only the best-ranked
hit per (query, field value), then re-rank — Lucene/Solr's "collapse"
and every search UI's "one result per site/conversation" control.

For this engine's transcript corpus the natural collapse key is
conv_id: without it a single highly-relevant conversation's turns can
fill the whole top-k. The reference's retrieval example has the same
shape — it ranks passages but a UI shows one hit per document
(reference README.md:119-128).

Scale shape: the ranked results are k · |queries| rows — broadcast
them into ONE corpus scan to fetch the collapse field (same
broadcast-the-small-side contract as facets.py / hydrate()); the
windows that follow partition by (query_id, field) and query_id over
k · |queries| rows. The corpus is never shuffled and never collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def collapse_topk(
    results: DataFrame,
    corpus: DataFrame,
    field: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, rank, doc_id, score, <field>): best hit per field
    value, re-ranked by original rank, top-k per query.

    ``results`` carries (query_id, rank, doc_id, score) — wand_topk
    output or any ranking. ``corpus`` maps ``id_col`` -> ``field``.
    Within a field group the surviving hit is the best original rank;
    group winners keep their original relative order (re-numbered
    densely), ties impossible since ranks are unique per query.

    Null-field docs do NOT collapse together (Lucene/Solr default for
    missing values): each null-field hit is its own group — the window
    adds a doc_id key that only discriminates when the field is null,
    so sparse metadata never silently swallows results."""
    small = results.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        F.col(id_col).cast("long").alias(id_col),
        F.col("score").cast("double").alias("score"),
    )
    side = corpus.select(F.col(id_col).cast("long").alias(id_col), field)
    joined = side.join(F.broadcast(small), id_col)
    # null fields are non-collapsing: the extra key is doc_id exactly
    # when the field is null (unique per row -> singleton groups) and a
    # constant null otherwise (non-null groups unaffected)
    null_key = F.when(F.col(field).isNull(), F.col(id_col))
    w_group = Window.partitionBy("query_id", field, null_key).orderBy(
        F.asc("rank")
    )
    best = joined.withColumn("_rn", F.row_number().over(w_group)).filter(
        F.col("_rn") == 1
    )
    w_final = Window.partitionBy("query_id").orderBy(F.asc("rank"))
    return (
        best.withColumn("new_rank", F.row_number().over(w_final))
        .filter(F.col("new_rank") <= k)
        .select(
            "query_id",
            F.col("new_rank").alias("rank"),
            id_col,
            "score",
            field,
        )
    )

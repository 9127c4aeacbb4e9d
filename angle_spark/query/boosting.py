"""Boosting and constant-score queries — the two remaining members of
Lucene's compound-scoring family.

``boosting_topk`` is Elasticsearch's ``boosting`` query (Lucene's
FunctionScoreQuery-with-boosting / the classic BoostingQuery): rank by a
POSITIVE query, but demote — never exclude — documents that also match a
NEGATIVE query, multiplying their relevance by ``negative_boost``. The
training-data shape: "rank transcripts about X, but push near-boilerplate
ones (greeting-heavy, apology-heavy) to the bottom without losing them"
— soft curation where delete_by_query would be hard curation. The
reference's analog is its weighted-negative training pairs
(/root/reference/README.md:119-128 hard-negative discussion): negatives
lower a candidate's rank, they don't remove it.

Execution (both phases exhaustive — the cost ES itself pays, which is
why its docs warn boosting is two queries):

1. the negative query runs as one membership pass
   (``collector="ids"`` — O(matches) two-column rows, never collected);
2. the positive query scores with ``wand_topk(demote_sets=...)``: each
   query's negative set rides the shard-cogrouped fieldset channel under
   a private leaf id, and the shard kernel multiplies the SUMMED score
   of demoted docs by ``negative_boost`` before top-k selection — ranks,
   paging and cursors all live in the demoted space. Pruning is forced
   off (a theta built from undemoted scores would over-prune).

``constant_score_topk`` is ES ``constant_score`` / Lucene
ConstantScoreQuery: every matching doc scores exactly ``boost`` — filter
semantics with a fixed relevance, ranked in docID (index) order like
Lucene's default tie order. One membership pass, then a bounded
per-query window over the O(matches) id frame.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def boosting_topk(
    spark: SparkSession,
    merged: DataFrame,
    tstats,
    meta,
    queries: DataFrame | pd.DataFrame,
    negative_boost: float | dict = 0.5,
    mode: str = "boolean",
    neg_mode: str | None = None,
    **kwargs,
) -> DataFrame:
    """-> (query_id, rank, doc_id, score): ES boosting query.

    ``queries``: (query_id, text, negative, k) — ``text`` is the
    positive query, ``negative`` the demotion query (both in ``mode``'s
    grammar; ``neg_mode`` overrides the negative side's mode).
    ``negative_boost``: float in (0, 1] or per-query dict — ES requires
    (0, 1]; > 1 would promote, which is function_score's job and breaks
    the demotion-only pruning argument.

    Membership is the POSITIVE query's alone (a doc matching only the
    negative never appears); a doc matching both keeps its BM25 * nb.
    Composes with deletes / doc_filter / field_meta (both phases see
    them)."""
    nbs = (
        list(negative_boost.values())
        if isinstance(negative_boost, dict)
        else [negative_boost]
    )
    for nb in nbs:
        if not (0.0 < float(nb) <= 1.0):
            raise ValueError(
                f"negative_boost must be in (0, 1], got {nb!r} — demotion "
                "only (use function_score for promotion)"
            )
    from angle_spark.query.wand import matched_ids, wand_topk

    if isinstance(queries, pd.DataFrame):
        pos_q = queries[["query_id", "text", "k"]]
        neg_q = queries[["query_id", "negative", "k"]].rename(
            columns={"negative": "text"}
        )
    else:
        pos_q = queries.select("query_id", "text", "k")
        neg_q = queries.select(
            "query_id", F.col("negative").alias("text"), "k"
        )
    kwargs.pop("prune", None)  # demotion forces the exhaustive path
    neg_ids = matched_ids(
        spark, merged, tstats, meta, neg_q,
        mode=neg_mode or mode, **kwargs,
    )
    return wand_topk(
        spark, merged, tstats, meta, pos_q,
        mode=mode, prune=False,
        demote_sets=neg_ids, negative_boost=negative_boost,
        **kwargs,
    )


def constant_score_topk(
    spark: SparkSession,
    merged: DataFrame,
    tstats,
    meta,
    queries: DataFrame | pd.DataFrame,
    boost: float = 1.0,
    mode: str = "boolean",
    **kwargs,
) -> DataFrame:
    """-> (query_id, rank, doc_id, score): ES constant_score — every
    matching doc scores exactly ``boost``; ranks follow docID order (the
    Lucene index-order tie rule, fully deterministic). The per-query k
    cut applies to the id frame (O(matches) two narrow columns), never
    to scored postings."""
    from angle_spark.query.wand import matched_ids

    if isinstance(queries, pd.DataFrame):
        ks = {
            str(r.query_id): int(r.k)
            for r in queries.itertuples(index=False)
        }
    else:
        ks = {
            str(r["query_id"]): int(r["k"])
            for r in queries.select("query_id", "k").collect()
        }
    if not ks:
        return spark.createDataFrame(
            [], "query_id string, rank int, doc_id long, score double"
        )
    ids = matched_ids(spark, merged, tstats, meta, queries, mode=mode, **kwargs)
    k_lit = F.create_map(
        *[x for qid, k in ks.items() for x in (F.lit(qid), F.lit(k))]
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("doc_id"))
    return (
        ids.withColumn("rank", F.row_number().over(w))
        .filter(
            F.col("rank")
            <= F.element_at(k_lit, F.col("query_id").cast("string"))
        )
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            "doc_id",
            F.lit(float(boost)).alias("score"),
        )
    )

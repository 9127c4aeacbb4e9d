"""Boosting, constant-score and pure-negation (must_not) queries — the
remaining members of Lucene's compound-scoring family plus ES's
match_all insertion that makes bool-with-only-must_not legal
(``must_not_ids`` / ``must_not_topk``: an arithmetic
``spark.range(n_docs)`` live axis minus one membership pass — the
match_all side never scans the corpus or the index).

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


def must_not_ids(
    spark: SparkSession,
    merged: DataFrame,
    tstats,
    meta,
    queries: DataFrame | pd.DataFrame,
    mode: str = "boolean",
    deletes: DataFrame | None = None,
    doc_ids: DataFrame | None = None,
    **kwargs,
) -> DataFrame:
    """-> (query_id, doc_id): each query's COMPLEMENT — every live doc
    NOT matching it. Elasticsearch's bool-with-only-``must_not`` query
    (classic Lucene rejects pure negation, as does this engine's own
    grammar; ES makes it legal by implicitly AND-ing a
    MatchAllDocsQuery — this is that insertion, done Spark-first).

    The match_all side never touches the corpus OR the index: live
    docIDs are ARITHMETIC — ``spark.range(meta.n_docs)`` minus
    tombstones — because docIDs are dense by construction
    (operators/docids.py total order). The negated query runs as ONE
    membership pass (``matched_ids`` — O(matches) narrow rows) and a
    left-anti join subtracts it. Output is inherently O(live docs) per
    query — the cost ES itself pays for must_not-only queries; rank/cut
    with ``must_not_topk`` or feed it on as a doc_filter/export.

    After ``purge_deletes`` the dense-id invariant breaks (purged ids
    leave holes that meta no longer enumerates), so a purged index
    requires the forward universe: pass ``doc_ids`` (a (doc_id) frame,
    e.g. the corpus table's id column) and it replaces the range axis.
    ``deletes`` (pending tombstones) are subtracted from the axis AND
    applied to the membership pass, so both sides see the live view."""
    from angle_spark.query.wand import matched_ids

    if getattr(meta, "purged_docs", 0) and doc_ids is None:
        raise ValueError(
            "must_not over a purged index: docIDs are no longer dense, "
            "pass doc_ids= with the live forward universe"
        )
    if doc_ids is None:
        universe = spark.range(int(meta.n_docs)).select(
            F.col("id").cast("long").alias("doc_id")
        )
    else:
        universe = doc_ids.select(F.col("doc_id").cast("long").alias("doc_id"))
    if deletes is not None:
        universe = universe.join(
            deletes.select(F.col("doc_id").cast("long").alias("doc_id")),
            "doc_id",
            "left_anti",
        )
    if isinstance(queries, pd.DataFrame):
        qids = [str(q) for q in queries["query_id"].tolist()]
    else:
        qids = [str(r["query_id"]) for r in queries.select("query_id").collect()]
    if len(set(qids)) != len(qids):
        raise ValueError("duplicate query_id in must_not batch")
    if not qids:
        return spark.createDataFrame([], "query_id string, doc_id long")
    matched = matched_ids(
        spark, merged, tstats, meta, queries,
        mode=mode, deletes=deletes, **kwargs,
    )
    # the query-id axis is a bounded literal frame; broadcast it into
    # the range scan so the per-query fan-out never shuffles the axis
    qframe = F.broadcast(
        spark.createDataFrame([(q,) for q in qids], "query_id string")
    )
    return universe.crossJoin(qframe).join(
        matched, ["query_id", "doc_id"], "left_anti"
    )


def must_not_topk(
    spark: SparkSession,
    merged: DataFrame,
    tstats,
    meta,
    queries: DataFrame | pd.DataFrame,
    boost: float = 1.0,
    mode: str = "boolean",
    **kwargs,
) -> DataFrame:
    """-> (query_id, rank, doc_id, score): the ranked rendition of
    ``must_not_ids`` — every live doc NOT matching the query, scored
    exactly ``boost`` in docID (index) order, cut at each query's ``k``
    (ES gives must_not-only hits the constant filter score; the
    deterministic docID tie order is Lucene's index order)."""
    ids = must_not_ids(
        spark, merged, tstats, meta, queries, mode=mode, **kwargs
    )
    return _rank_ids_constant(spark, ids, queries, boost)


def _rank_ids_constant(
    spark: SparkSession,
    ids: DataFrame,
    queries: DataFrame | pd.DataFrame,
    boost: float,
) -> DataFrame:
    """docID-order rank + per-query k cut + constant score over a bare
    (query_id, doc_id) membership frame — the shared tail of
    constant_score_topk and must_not_topk."""
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

    ids = matched_ids(spark, merged, tstats, meta, queries, mode=mode, **kwargs)
    return _rank_ids_constant(spark, ids, queries, boost)

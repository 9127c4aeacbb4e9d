"""Parent-child retrieval — the Elasticsearch ``has_child`` query /
parent-join field, Lucene's ToParentBlockJoinQuery shape.

The transcripts corpus is parent-child by construction: a conversation
(parent) is many turns (children), docIDs assigned in stable
(conv_id, turn_idx) order (the reference's per-turn ordering invariant,
/root/reference/angle_emb/angle.py:379-406 Dataset row contract). The
question "which CONVERSATIONS best match this query?" is has_child:
score the turns with BM25, aggregate each conversation's matching-turn
scores under a ``score_mode`` (max / sum / avg / min — the ES
has_child score modes), rank conversations.

Scale shape: children score inside the normal shard kernel
(collector="group_score"); each shard ships per-(query, parent)
COUNT/SUM/MIN/MAX partials — never the hit list. The numeric parent id
itself is the group code (no driver-side label dictionary, unlike the
facet collectors — parent cardinality is corpus-scale at 10^12 turns;
int64 ids ride the double-typed side channel exactly up to 2^53).
Because a conversation's turns are docID-contiguous, a parent's
children live in one shard except at shard boundaries, so the partial
volume ~= matched parents. The final fold is an associative groupBy
over that match-bounded frame, and the rank window runs per query over
matched parents only.

min/max modes fold exactly (bitwise vs the oracle); sum/avg carry the
usual cross-shard double-fold ULP tolerance — rank on rounded scores
when comparing engines, as with every distributed double sum in this
repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from angle_spark.index.build import IndexMeta
from angle_spark.index.docvalues import DocValues

SCORE_MODES = ("max", "sum", "avg", "min")


def _parent_meta(parents: DataFrame | DocValues):
    if isinstance(parents, DocValues):
        if parents.labels is not None:
            raise ValueError(
                f"parent docvalues field {parents.name!r} is a keyword "
                "field — the parent join needs a NUMERIC id (label "
                "dictionaries don't scale to parent cardinality)"
            )
        return parents
    pcol = parents.columns[1]
    return parents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col(pcol).cast("long").alias("gcode"),
    ).filter(F.col("gcode").isNotNull())


def parent_matches(
    spark: SparkSession,
    merged: DataFrame,
    tstats: DataFrame,
    meta: IndexMeta,
    queries: DataFrame,
    parents: DataFrame | DocValues,
    **kwargs,
) -> DataFrame:
    """-> (query_id, parent_id, n_children, sum, min, max, avg): every
    parent with >= 1 matching child, with the count and the score fold
    of its matching children — the raw parent-join aggregation.

    ``parents`` is a (doc_id, parent_id:long) child->parent assignment
    frame, or a NUMERIC DocValues handle (task-local reads, no metadata
    shuffle). Children without a parent mapping are skipped (the ES
    parent-join missing rule). Membership is exhaustive (pruning keeps
    only the global top-k CHILDREN, which can starve a parent whose
    evidence is many mid-ranked turns); composes with every retrieval
    mode and deletes / doc_filter / field_meta. The ``k`` column of
    ``queries`` is ignored here — rank and cut in parent_topk."""
    from angle_spark.query.wand import wand_topk

    kwargs.pop("collector", None)
    kwargs.pop("group_meta", None)
    out = wand_topk(
        spark, merged, tstats, meta, queries,
        collector="group_score", group_meta=_parent_meta(parents), **kwargs,
    )
    return out.select(
        "query_id",
        F.col("gcode").alias("parent_id"),
        F.col("n_docs").alias("n_children"),
        "sum", "min", "max", "avg",
    )


def expand_to_children(
    spark: SparkSession,
    merged: DataFrame,
    tstats: DataFrame,
    meta: IndexMeta,
    queries: DataFrame,
    parents: DataFrame,
    score_mode: str = "max",
    **kwargs,
) -> DataFrame:
    """-> (query_id, rank, parent_id, score, doc_id): EVERY child of
    each query's top-k parents — Lucene's ToChildBlockJoinQuery / the
    ES ``has_parent`` direction, and the transcript RAG shape: retrieve
    the best-matching conversations (parent_topk), then hand back their
    FULL turn lists for context. Each child carries its parent's rank
    and aggregated score (the ES has_parent score=true rule: children
    inherit the parent's relevance).

    ``parents`` must be the (doc_id, parent_id) DataFrame here (the
    expansion is a join against it, not a docvalues read). Scale shape:
    the matched-parent frame is bounded by queries x k, so it
    BROADCASTS into one scan of the child->parent assignment — no
    corpus shuffle, no second index pass. Children of a parent that
    never matched are never touched."""
    if isinstance(parents, DocValues):
        raise ValueError(
            "expand_to_children needs the (doc_id, parent_id) DataFrame — "
            "the expansion joins the assignment frame itself"
        )
    top = parent_topk(
        spark, merged, tstats, meta, queries, parents,
        score_mode=score_mode, **kwargs,
    ).select("query_id", "rank", "parent_id", "score")
    kids = parents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col(parents.columns[1]).cast("long").alias("parent_id"),
    )
    return kids.join(F.broadcast(top), "parent_id").select(
        "query_id", "rank", "parent_id", "score", "doc_id"
    )


def parent_topk(
    spark: SparkSession,
    merged: DataFrame,
    tstats: DataFrame,
    meta: IndexMeta,
    queries: DataFrame,
    parents: DataFrame | DocValues,
    score_mode: str = "max",
    rank_on_rounded: bool = False,
    **kwargs,
) -> DataFrame:
    """-> (query_id, rank, parent_id, score, n_children): the top-k
    PARENTS per query — ES ``has_child`` with ``score_mode`` max / sum /
    avg / min over each parent's matching children's BM25 scores.

    The ``k`` column of ``queries`` is the number of parents returned.
    Ranks tie-break (score DESC, parent_id ASC); the window runs over
    the match-bounded parent frame, never the corpus. ``max`` and
    ``min`` are bitwise-exact vs a single-process oracle; ``sum`` /
    ``avg`` are ULP-deterministic only per shard (cross-shard fold
    order is Spark's) — ``rank_on_rounded=True`` orders the window on
    round(score, 6) instead, the cross-engine-deterministic rank
    discipline used when comparing against a SQL oracle."""
    if score_mode not in SCORE_MODES:
        raise ValueError(
            f"score_mode must be one of {SCORE_MODES}, got {score_mode!r}"
        )
    agg = parent_matches(
        spark, merged, tstats, meta, queries, parents, **kwargs
    )
    if isinstance(queries, DataFrame):
        kdf = queries.select("query_id", F.col("k").cast("int").alias("k"))
    else:  # pandas queries (the bounded-vocab serving opt-in)
        kdf = spark.createDataFrame(
            queries[["query_id", "k"]], "query_id string, k int"
        )
    skey = F.round("score", 6) if rank_on_rounded else F.col("score")
    w = Window.partitionBy("query_id").orderBy(
        skey.desc(), F.asc("parent_id")
    )
    return (
        agg.select(
            "query_id",
            "parent_id",
            "n_children",
            F.col(score_mode).alias("score"),
        )
        .join(F.broadcast(kdf), "query_id")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "parent_id", "score", "n_children")
    )

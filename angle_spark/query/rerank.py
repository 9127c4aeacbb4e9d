"""Two-stage retrieve-then-rerank: a cheap sparse first stage (BM25
top-C candidates) followed by an exact dense second stage (cosine
against the query vector) over ONLY those candidates.

This is the production complement to query/hybrid.py's RRF fusion: RRF
runs BOTH systems over the full corpus and merges ranks, while rerank
runs the dense side over just C · |queries| rows — the shape used when
the dense model is the quality signal but a full dense scan (or even an
ANN probe) per query is too expensive. The reference is exactly such a
dense scorer — its retrieval example encodes query/passage prompts and
ranks by cosine (reference README.md:119-128, docs/notes/
tutorial.rst:239-271); here that scorer is stage two instead of the
whole engine.

Scale shape: candidates are C · |queries| rows — broadcast them into
the embeddings scan (one corpus-sized scan, no corpus shuffle), then
broadcast the |queries|-row vector side. The per-query window sorts
C rows per query. Nothing corpus-sized is ever shuffled or collected.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """JVM-side float64 sequential fold — the same order DuckDB's
    list_dot_product uses, so oracle comparisons are exact to the ULP."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def rerank_dense(
    candidates: DataFrame,
    emb: DataFrame,
    query_vecs: DataFrame,
    k: int,
    rank_on_rounded: bool = False,
) -> DataFrame:
    """Rerank first-stage ``candidates`` by exact cosine -> top-k.

    candidates: (query_id, doc_id, score) — any first-stage ranking
    (wand_topk output, a boolean answer set with scores, ...).
    emb: (vec_id, embedding) corpus vectors; query_vecs: (query_id, qv).
    Returns (query_id, rank, doc_id, cosine, stage1_score) where rank
    orders by cosine DESC with ascending-doc_id ties. A candidate with
    no embedding row is dropped (it cannot be dense-scored);
    rank_on_rounded ranks by round(cosine, 6) — the oracle-deterministic
    convention used by the driver entries."""
    cand = candidates.select(
        "query_id",
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("score").cast("double").alias("stage1_score"),
    )
    vecs = emb.select(
        F.col("vec_id").cast("long").alias("doc_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    qv = query_vecs.select(
        "query_id",
        F.transform("qv", lambda x: x.cast("double")).alias("qv"),
    )
    nrm = F.sqrt(_dot(F.col("v"), F.col("v")))
    qnrm = F.sqrt(_dot(F.col("qv"), F.col("qv")))
    scored = (
        vecs.join(F.broadcast(cand), "doc_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "doc_id",
            (_dot(F.col("v"), F.col("qv")) / (nrm * qnrm)).alias("cosine"),
            "stage1_score",
        )
    )
    key = F.round("cosine", 6) if rank_on_rounded else F.col("cosine")
    w = Window.partitionBy("query_id").orderBy(F.desc(key), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "cosine", "stage1_score")
    )

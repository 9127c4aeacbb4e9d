"""Hybrid retrieval: BM25 (sparse) + embedding-cosine (dense) fused by
Reciprocal Rank Fusion.

The reference IS a dense retriever — its canonical use is encoding
query/passage prompts and ranking by cosine (reference
README.md:119-128, docs/notes/tutorial.rst:239-271) — while this engine
adds the sparse BM25 side; the production marriage of the two is a
single query returning one fused ranking. RRF (Cormack, Clarke &
Buettcher, SIGIR 2009) is the canonical scoreless fusion:

    rrf(d) = sum over systems s ranking d:  1 / (k + rank_s(d))

It needs only ranks (no score calibration between BM25's unbounded sums
and cosine's [-1, 1]), and a doc missing from one side simply
contributes nothing from it.

Scale shape: both inputs arrive as (query_id, rank, doc_id) rankings —
each bounded by k_side * |queries|, tiny next to the corpus. The fusion
is one full-outer equi-join on (query_id, doc_id) between two small
frames plus a per-query window — no corpus scan, no new shuffle of
anything corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_K = 60  # the SIGIR-09 constant; dampens the head so no single
# system's #1 can drown broad agreement further down


def dense_topk(
    emb: DataFrame,
    query_vecs: DataFrame,
    k: int,
    rank_on_rounded: bool = False,
) -> DataFrame:
    """brute-force cosine ranking of every embedding against each query
    vector -> (query_id, rank, doc_id, cosine).

    emb: (vec_id, embedding array); query_vecs: (query_id, qv array) —
    the query side is broadcast (a handful of rows), the corpus side
    streams, dots stay JVM-side float64 (zip_with + aggregate, the same
    sequential fold DuckDB's list_dot_product runs). The per-query
    window is partitioned by query_id — never a global single-partition
    sort. rank_on_rounded ranks by round(cosine, 6) with the doc_id
    tiebreak (the oracle-deterministic convention for entry checks)."""
    dot = F.aggregate(
        F.zip_with(F.col("v"), F.col("qv"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = F.sqrt(
        F.aggregate(
            F.transform(F.col("v"), lambda a: a * a),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    qnrm = F.sqrt(
        F.aggregate(
            F.transform(F.col("qv"), lambda a: a * a),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    scored = (
        emb.select(
            F.col("vec_id").alias("doc_id"),
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
        .join(
            F.broadcast(
                query_vecs.select(
                    "query_id",
                    F.transform("qv", lambda x: x.cast("double")).alias("qv"),
                )
            )
        )
        .select("query_id", "doc_id", (dot / (nrm * qnrm)).alias("cosine"))
    )
    key = F.round("cosine", 6) if rank_on_rounded else F.col("cosine")
    w = Window.partitionBy("query_id").orderBy(F.desc(key), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "cosine")
    )


def dense_ann_topk(
    emb: DataFrame,
    query_vecs: DataFrame,
    k: int,
    n_cells: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """ANN first-stage dense retriever for hybrid fusion: IVF-flat
    (operators/ann.py ivf_topk) instead of the exact full scan —
    (query_id, rank, doc_id, cosine) with the same column contract as
    dense_topk, so rrf_fuse composes unchanged.

    Scale shape: this is the 100 TB dense side — per-query work is the
    probed cells' vectors only, never the corpus (dense_topk's full scan
    stays as the exactness baseline and recall oracle). Recall < 1 by
    construction; tests gate fused recall >= 0.9 vs the exact stage."""
    from angle_spark.operators.ann import ivf_topk

    q = query_vecs.select("query_id", F.col("qv").alias("qvec"))
    out = ivf_topk(emb, q, n_cells=n_cells, nprobe=nprobe, k=k)
    return out.select(
        "query_id", "rank", F.col("vec_id").alias("doc_id"), "cosine"
    )


def rrf_fuse(
    sparse: DataFrame, dense: DataFrame, k: int, rrf_k: int = RRF_K
) -> DataFrame:
    """fuse two (query_id, rank, doc_id, ...) rankings ->
    (query_id, rank, doc_id, rrf_score), top-k per query.

    rrf_score = 1/(rrf_k + sparse_rank) + 1/(rrf_k + dense_rank), a side
    where the doc is unranked contributing 0. Ties (e.g. rank r on one
    side only vs rank r on the other side only) break by ascending
    doc_id, so the output is deterministic."""
    s = sparse.select(
        "query_id", F.col("doc_id").cast("long").alias("doc_id"), F.col("rank").alias("srank")
    )
    d = dense.select(
        "query_id", F.col("doc_id").cast("long").alias("doc_id"), F.col("rank").alias("drank")
    )
    fused = s.join(d, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        (
            F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("srank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("drank")), F.lit(0.0))
        ).alias("rrf_score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.asc("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "rrf_score")
    )

"""ES ``rescore`` — weighted second-pass score combination over the
top window of a first-stage ranking.

Complements query/rerank.py (which REPLACES the ranking signal with the
dense stage): rescore COMBINES the two signals with explicit weights —
``query_weight * stage1 + rescore_query_weight * stage2`` (score_mode
"total"; also multiply/avg/max/min, the ES set) — and only for the top
``window_size`` docs of each query. Docs outside the window keep their
untouched first-stage score (the documented ES behavior: a rescored doc
can sink below an unrescored one when the combine says so); window docs
NOT matched by the rescore query contribute stage2 = 0 under
total/avg (they keep query_weight * stage1) and are left unchanged
under multiply/max/min (ES: the rescore query just didn't match — it
must not zero the doc out).

Scale shape: pure narrow-frame algebra — both inputs are
match-bounded (query_id, doc_id, score) frames; one join on the window
slice, one per-query window re-rank. Nothing corpus-shaped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MODES = ("total", "multiply", "avg", "max", "min")


def rescore_topk(
    stage1: DataFrame,
    stage2: DataFrame,
    k: int,
    window_size: int,
    query_weight: float = 1.0,
    rescore_weight: float = 1.0,
    score_mode: str = "total",
    rank_on_rounded: bool = False,
) -> DataFrame:
    """-> (query_id, rank, doc_id, score).

    stage1: (query_id, rank, doc_id, score) — a full first-stage
    ranking (wand_topk output shape; ``rank`` defines the window cut).
    stage2: (query_id, doc_id, score) — the rescore query's scores for
    whatever docs it matched."""
    if score_mode not in _MODES:
        raise ValueError(
            f"score_mode must be one of {_MODES}, got {score_mode!r}"
        )
    if window_size < 1:
        raise ValueError(f"window_size must be >= 1, got {window_size}")
    s1 = stage1.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("score").cast("double").alias("s1"),
    )
    s2 = stage2.select(
        "query_id",
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("score").cast("double").alias("s2"),
    )
    qw, rw = float(query_weight), float(rescore_weight)
    joined = s1.join(s2, ["query_id", "doc_id"], "left")
    in_win = F.col("rank") <= F.lit(int(window_size))
    matched = F.col("s2").isNotNull()
    ws1 = F.lit(qw) * F.col("s1")
    ws2 = F.lit(rw) * F.col("s2")
    if score_mode == "total":
        combined = ws1 + F.coalesce(ws2, F.lit(0.0))
    elif score_mode == "avg":
        combined = F.when(
            matched, (ws1 + ws2) / F.lit(2.0)
        ).otherwise(ws1)
    elif score_mode == "multiply":
        combined = F.when(matched, ws1 * F.col("s2")).otherwise(ws1)
    elif score_mode == "max":
        combined = F.when(
            matched, F.greatest(ws1, ws2)
        ).otherwise(ws1)
    else:  # min
        combined = F.when(matched, F.least(ws1, ws2)).otherwise(ws1)
    out = joined.select(
        "query_id",
        "doc_id",
        F.when(in_win, combined).otherwise(F.col("s1")).alias("score"),
    )
    key = F.round("score", 6) if rank_on_rounded else F.col("score")
    w = Window.partitionBy("query_id").orderBy(F.desc(key), F.asc("doc_id"))
    return (
        out.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.lit(int(k)))
        .select("query_id", "rank", "doc_id", "score")
    )

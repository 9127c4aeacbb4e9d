"""Correlation evaluator — the reference's analytics query.

Mirrors CorrelationEvaluator (reference angle_emb/evaluation.py:16-82):
paired vectors -> four similarity metrics (cosine, dot, negated manhattan,
negated euclidean; evaluation.py:55-58) -> Pearson and Spearman rank
correlation against golden labels (evaluation.py:60-70), returning a
metric dict keyed like the reference's output (evaluation.py:72-82).

Spark shape: the pair table carries an explicit pair_id (positional zip
alignment is not a thing in a distributed table — SURVEY.md §2.3 J1);
similarities are pure higher-order-function arithmetic; Spearman = Pearson
on average ranks, computed with rank + count windows (SURVEY.md §2.5 W2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: str, b: str) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def paired_similarities(pairs: DataFrame) -> DataFrame:
    """pairs(pair_id, vec1 array, vec2 array, label double) ->
    + cosine, dot, neg_manhattan, neg_euclidean (reference
    evaluation.py:55-58; distances negated so 'higher = more similar'
    holds for every metric, as the reference does)."""
    manhattan = F.aggregate(
        F.zip_with("vec1", "vec2", lambda x, y: F.abs(x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    euclidean = F.sqrt(
        F.aggregate(
            F.zip_with(
                "vec1",
                "vec2",
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return pairs.select(
        "pair_id",
        "label",
        (_dot("vec1", "vec2") / (_norm("vec1") * _norm("vec2"))).alias("cosine"),
        _dot("vec1", "vec2").alias("dot"),
        (-manhattan).alias("neg_manhattan"),
        (-euclidean).alias("neg_euclidean"),
    )


def correlation_report(sims: DataFrame) -> dict[str, float]:
    """-> {metric_sim: pearson, metric_spearman: spearman} for the four
    similarity columns vs label — the reference's output dict shape.

    Ranks come from operators/ranks.py (range-partition + offset average-
    tie ranks): no single-partition window, so this works on corpus-sized
    tables as well as the reference's STS-sized eval splits
    (evaluation.py:41-50)."""
    from angle_spark.operators.ranks import with_avg_rank

    metrics = ["cosine", "dot", "neg_manhattan", "neg_euclidean"]
    ranked = with_avg_rank(sims.select("label", *metrics), "label", "r_label")
    for m in metrics:
        ranked = with_avg_rank(ranked, m, f"r_{m}")
    aggs = []
    for m in metrics:
        aggs.append(F.corr(m, "label").alias(f"pearson_{m}"))
        aggs.append(F.corr(f"r_{m}", "r_label").alias(f"spearman_{m}"))
    row = ranked.agg(*aggs).collect()[0]
    return {k: float(row[k]) for k in row.asDict()}

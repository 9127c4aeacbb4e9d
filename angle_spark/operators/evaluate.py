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


def rank_eval(
    results: DataFrame,
    judgments: DataFrame,
    k: int = 10,
    relevant_grade: float = 1.0,
) -> DataFrame:
    """-> (query_id, retrieved, n_relevant, precision_at_k, recall_at_k,
    mrr, dcg_at_k, idcg_at_k, ndcg_at_k): ranking-quality metrics over
    relevance judgments — the Elasticsearch ``_rank_eval`` API
    (precision/recall at k, mean reciprocal rank, exponential-gain
    NDCG), the standard IR evaluation the reference's golden gate runs
    over its retrieval prompts (reference tests/test_eval.py:4-20).

    ``results``: (query_id, rank, doc_id, ...) — an engine ranking
    (wand_topk / Searcher.search output plugs in unchanged; only ranks
    <= k are read). ``judgments``: (query_id, doc_id, grade) with grade
    >= 0; a result doc absent from the judgments counts grade 0 (the ES
    unjudged-as-irrelevant default — ES also reports them; here they
    simply gain nothing). A doc is RELEVANT iff grade >=
    ``relevant_grade``.

    Definitions (ES semantics):
      precision_at_k = relevant retrieved / retrieved       (not / k)
      recall_at_k    = relevant retrieved / n_relevant
      mrr            = 1 / rank of the first relevant hit (0 if none)
      dcg_at_k       = sum (2^grade - 1) / log2(rank + 1)
      idcg_at_k      = the same fold over the query's top-k grades
      ndcg_at_k      = dcg / idcg (0 when the query has no graded docs)

    Shape: one equi-join of the rank<=k results slice against the
    judgments (both bounded: k·|queries| and judgment rows), per-query
    aggregates, and a per-query top-k window over JUDGMENTS for the
    ideal DCG — every frame is metadata-sized, nothing touches the
    corpus. Queries present in ``results`` but without any judged doc
    report zeros (ndcg 0 by convention); queries only in ``judgments``
    don't report (no ranking to grade)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    res = results.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        F.col("doc_id").cast("long").alias("doc_id"),
    ).filter(F.col("rank") <= k)
    judg = judgments.select(
        "query_id",
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col(judgments.columns[2]).cast("double").alias("grade"),
    ).filter(F.col("grade").isNotNull())

    joined = res.join(judg, ["query_id", "doc_id"], "left").select(
        "query_id",
        "rank",
        F.coalesce("grade", F.lit(0.0)).alias("grade"),
    )
    rel = F.col("grade") >= F.lit(float(relevant_grade))
    gain = (F.pow(F.lit(2.0), F.col("grade")) - 1.0) / F.log2(
        F.col("rank") + F.lit(1.0)
    )
    per_q = joined.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("retrieved"),
        F.sum(F.when(rel, 1).otherwise(0)).alias("rel_retrieved"),
        F.min(F.when(rel, F.col("rank"))).alias("first_rel_rank"),
        F.sum(gain).alias("dcg_at_k"),
    )

    from pyspark.sql import Window

    # ideal ranking: the query's judged grades sorted descending
    # (doc_id tiebreak for determinism), cut at k — judgment-frame
    # sized, the window partitions by query
    w = Window.partitionBy("query_id").orderBy(
        F.desc("grade"), F.asc("doc_id")
    )
    ideal = (
        judg.withColumn("irank", F.row_number().over(w))
        .filter(F.col("irank") <= k)
        .groupBy("query_id")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("grade")) - 1.0)
                / F.log2(F.col("irank") + F.lit(1.0))
            ).alias("idcg_at_k"),
        )
    )
    n_rel = judg.filter(rel).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_relevant")
    )
    out = (
        per_q.join(ideal, "query_id", "left")
        .join(n_rel, "query_id", "left")
        .select(
            "query_id",
            "retrieved",
            F.coalesce("n_relevant", F.lit(0)).cast("long").alias("n_relevant"),
            (F.col("rel_retrieved") / F.col("retrieved")).alias(
                "precision_at_k"
            ),
            F.when(
                F.coalesce("n_relevant", F.lit(0)) > 0,
                F.col("rel_retrieved") / F.col("n_relevant"),
            ).otherwise(F.lit(0.0)).alias("recall_at_k"),
            F.coalesce(
                F.lit(1.0) / F.col("first_rel_rank"), F.lit(0.0)
            ).alias("mrr"),
            "dcg_at_k",
            F.coalesce("idcg_at_k", F.lit(0.0)).alias("idcg_at_k"),
            F.when(
                F.coalesce("idcg_at_k", F.lit(0.0)) > 0,
                F.col("dcg_at_k") / F.col("idcg_at_k"),
            ).otherwise(F.lit(0.0)).alias("ndcg_at_k"),
        )
    )
    return out

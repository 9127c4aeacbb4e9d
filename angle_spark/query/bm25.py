"""Okapi BM25 top-k retrieval — declarative DataFrame path.

The reference's retrieval pattern is "encode query, encode docs, rank all
docs by cosine, take best" (reference README.md:119-128, in-batch
all-pairs loss.py:163-166). Our sparse analog replaces the dense
cross-product with an equi-join on term:

    query terms  ⋈(broadcast)  postings(term, doc_id, tf, dl)
      -> per-(query,doc,term) contribution  (pure column arithmetic)
      -> groupBy(query, doc) deterministic fold
      -> per-query top-k window

Scale notes:
  * The query set is tiny and the postings are huge — the join broadcasts
    the *queries* side, so postings never shuffle for the join.
  * The only shuffle is the groupBy(query_id, doc_id) — keyed fine-grained
    (no skew: one group per scored doc).
  * Determinism: per-(q,d) contributions are collected, sorted by term,
    and folded in float64 in that fixed order — bit-identical to the
    Python oracle, which folds the same way. A plain F.sum is available
    via deterministic=False for benchmarking (values differ only by
    float summation order, <1e-12 relative).
  * Tie-break: (score desc, doc_id asc), matching the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from angle_spark.codec import B, K1
from angle_spark.functions.tokenizer import tokens_col


def query_terms(queries: DataFrame) -> DataFrame:
    """(query_id, k, term) — distinct terms per query (query-as-set
    semantics, matching the reference's set-style retrieval)."""
    return (
        queries.select("query_id", "k", F.explode(tokens_col("text")).alias("term"))
        .distinct()
    )


def contribution_col(avgdl: float) -> Column:
    """BM25 term contribution given columns idf, tf, dl."""
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    denom = tf + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * dl / F.lit(float(avgdl)))
    return F.col("idf") * tf * F.lit(K1 + 1.0) / denom


def bm25_topk(
    tf: DataFrame,
    tstats: DataFrame,
    queries: DataFrame,
    n_docs: int,
    avgdl: float,
    deterministic: bool = True,
) -> DataFrame:
    """-> (query_id, rank, doc_id, score).

    tf: (doc_id, term, tf, dl); tstats: (term, df, ...);
    queries: (query_id, text, k).

    idf for the query terms is computed driver-side in Python (math.log):
    the query-term dim is tiny, and this pins score bits to the oracle —
    JVM log and libm log can differ in the last ULP.
    """
    from angle_spark.index.stats import idf_value

    spark = tf.sparkSession
    qt_pdf = (
        query_terms(queries).join(tstats.select("term", "df"), "term").toPandas()
    )
    qt_pdf["idf"] = [idf_value(n_docs, int(d)) for d in qt_pdf["df"]]
    qt = spark.createDataFrame(
        qt_pdf[["query_id", "k", "term", "idf"]],
        schema="query_id string, k int, term string, idf double",
    )
    scored_terms = tf.join(F.broadcast(qt), "term").select(
        "query_id",
        "k",
        "doc_id",
        "term",
        contribution_col(avgdl).alias("contrib"),
    )
    if deterministic:
        score = F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "contrib"))),
            F.lit(0.0),
            lambda acc, x: acc + x["contrib"],
        )
    else:
        score = F.sum("contrib")
    per_doc = scored_terms.groupBy("query_id", "k", "doc_id").agg(
        score.alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "doc_id", "score")
    )

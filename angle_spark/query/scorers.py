"""Alternative ranking functions over the same posting statistics:
TF-IDF (SMART ltn) and query-likelihood with Dirichlet smoothing.

BM25 is the north-rule scorer (query/bm25.py, query/wand.py); real
retrieval stacks also ship a plain TF-IDF and a language-model scorer,
and the statistics this engine already maintains (tf, df, dl, cf, N,
avgdl — index/stats.py, term_stats cf added for exactly this) are the
complete sufficient statistics for both. The reference swaps pooling /
similarity strategies over one encoder the same way (reference
angle_emb/angle.py:208-244 pooling_strategy); here the scorer is the
swappable strategy over one index.

Both scorers follow the bm25_topk shape (see query/bm25.py scale notes):
queries broadcast into the postings, one keyed groupBy shuffle, a
per-query top-k window; the deterministic fold (term-sorted float64
sum) keeps scores bit-reproducible and oracle-matchable.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from angle_spark.query.bm25 import query_terms

DEFAULT_MU = 2000.0


def _fold(deterministic: bool):
    """Deterministic (term-sorted) or plain float64 sum of ``contrib``."""
    if deterministic:
        return F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "contrib"))),
            F.lit(0.0),
            lambda acc, x: acc + x["contrib"],
        )
    return F.sum("contrib")


def _rank(per_doc: DataFrame) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "doc_id", "score")
    )


def tfidf_topk(
    tf: DataFrame,
    tstats: DataFrame,
    queries: DataFrame,
    n_docs: int,
    deterministic: bool = True,
) -> DataFrame:
    """-> (query_id, rank, doc_id, score); score = Σ_t (1+ln tf) · ln(N/df).

    SMART ltn weighting: sublinear tf saturation, plain idf, no length
    norm (the classic raw TF-IDF; BM25 is the length-normalized
    upgrade). Out-of-vocabulary query terms contribute nothing.

    tf: (doc_id, term, tf, dl); tstats: (term, df, ...);
    queries: (query_id, text, k). idf is computed driver-side over the
    tiny query-term dim (math.log pins bits to the oracle, same policy
    as bm25_topk).
    """
    spark = tf.sparkSession
    qt_pdf = query_terms(queries).join(tstats.select("term", "df"), "term").toPandas()
    if qt_pdf.empty:  # every query term out-of-vocabulary
        return spark.createDataFrame(
            [], "query_id string, rank int, doc_id long, score double"
        )
    qt_pdf["idf"] = [math.log(n_docs / int(d)) for d in qt_pdf["df"]]
    qt = spark.createDataFrame(
        qt_pdf[["query_id", "k", "term", "idf"]],
        schema="query_id string, k int, term string, idf double",
    )
    scored_terms = tf.join(F.broadcast(qt), "term").select(
        "query_id",
        "k",
        "doc_id",
        "term",
        (
            (F.lit(1.0) + F.log(F.col("tf").cast("double"))) * F.col("idf")
        ).alias("contrib"),
    )
    per_doc = scored_terms.groupBy("query_id", "k", "doc_id").agg(
        _fold(deterministic).alias("score")
    )
    return _rank(per_doc)


def lmd_topk(
    tf: DataFrame,
    queries: DataFrame,
    mu: float = DEFAULT_MU,
    deterministic: bool = True,
) -> DataFrame:
    """Query-likelihood ranking with Dirichlet smoothing (Zhai & Lafferty):

        score(q,d) = Σ_{t ∈ q∩V} ln(1 + tf_{t,d} / (μ · cf_t / C))
                     + |q∩V| · ln(μ / (dl_d + μ))

    where cf_t is the collection frequency, C the total token count and
    |q∩V| the query's distinct in-vocabulary terms. The second addend is
    doc-dependent but query-constant, so ranking is the full QL order;
    candidates are restricted to docs matching ≥1 in-vocabulary term
    (the full QL scores every document — a rank-only tail of never-
    competitive length-priors that no top-k engine materializes).

    cf/C come from one aggregate over the postings — the cf statistic
    the index already persists (index/build.py term_stats carries cf
    through merge and delta union for exactly this scorer family).
    """
    spark = tf.sparkSession
    cfd = tf.groupBy("term").agg(F.sum("tf").alias("cf"))
    qt_pdf = query_terms(queries).join(cfd, "term").toPandas()
    if qt_pdf.empty:  # every query term out-of-vocabulary
        return spark.createDataFrame(
            [], "query_id string, rank int, doc_id long, score double"
        )
    total = int(tf.agg(F.sum("tf")).collect()[0][0] or 0)
    qlen = qt_pdf.groupby("query_id")["term"].nunique().to_dict()
    qt_pdf["pc"] = [float(mu) * int(cf) / total for cf in qt_pdf["cf"]]
    qt = spark.createDataFrame(
        qt_pdf[["query_id", "k", "term", "pc"]],
        schema="query_id string, k int, term string, pc double",
    )
    scored_terms = tf.join(F.broadcast(qt), "term").select(
        "query_id",
        "k",
        "doc_id",
        "dl",
        "term",
        F.log(F.lit(1.0) + F.col("tf").cast("double") / F.col("pc")).alias(
            "contrib"
        ),
    )
    # dl is functionally dependent on doc_id; keeping it in the key saves
    # a doc-length join for the length-prior addend
    per_doc = scored_terms.groupBy("query_id", "k", "doc_id", "dl").agg(
        _fold(deterministic).alias("part")
    )
    qlen_df = F.broadcast(
        spark.createDataFrame(
            [(q, int(n)) for q, n in sorted(qlen.items())],
            schema="query_id string, qlen int",
        )
    )
    per_doc = per_doc.join(qlen_df, "query_id").select(
        "query_id",
        "k",
        "doc_id",
        (
            F.col("part")
            + F.col("qlen").cast("double")
            * F.log(F.lit(float(mu)) / (F.col("dl").cast("double") + F.lit(float(mu))))
        ).alias("score"),
    )
    return _rank(per_doc)

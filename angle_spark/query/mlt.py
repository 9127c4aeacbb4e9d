"""More-Like-This: retrieve documents similar to a given document.

The reference's semantic twin is encode-the-doc-and-rank-by-cosine
(reference README.md:119-128) — the whole document is the query. The
sparse rendition (Lucene MoreLikeThis) selects the source document's
most DISTINCTIVE terms — top ``max_terms`` by tf·idf, the classic
relevance-feedback weighting — and runs them as a BM25 disjunction,
excluding the source document itself from the ranking.

Scale shape: the source docs are a bounded set, broadcast into the
postings scan to pull their term rows (filter pushes into the
doc-clustered scan); per-source term selection is a tiny window; only
|sources| × max_terms rows reach the driver. Retrieval then follows
bm25_topk's shape — query terms broadcast into the postings, one keyed
groupBy, per-query top-k window — with the self-exclusion applied
BEFORE ranking so every returned rank is dense.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from angle_spark.index.stats import idf_value
from angle_spark.query.bm25 import contribution_col

DEFAULT_MAX_TERMS = 5


def select_mlt_terms(
    tf: DataFrame,
    tstats: DataFrame,
    source_ids: list[int],
    n_docs: int,
    max_terms: int = DEFAULT_MAX_TERMS,
) -> DataFrame:
    """(src_id, term, df): each source doc's top ``max_terms`` terms by
    (tf · ln(N/df) DESC, term ASC) — deterministic, oracle-replicable."""
    spark = tf.sparkSession
    src = spark.createDataFrame([(int(d),) for d in source_ids], "src_id long")
    w = Window.partitionBy("src_id").orderBy(F.desc("w"), F.asc("term"))
    return (
        tf.join(F.broadcast(src), tf["doc_id"] == src["src_id"])
        .join(tstats.select("term", "df"), "term")
        .withColumn(
            "w",
            F.col("tf").cast("double")
            * F.log(F.lit(float(n_docs)) / F.col("df")),
        )
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= max_terms)
        .select("src_id", "term", "df")
    )


def more_like_this(
    tf: DataFrame,
    tstats: DataFrame,
    source_ids: list[int],
    n_docs: int,
    avgdl: float,
    k: int = 10,
    max_terms: int = DEFAULT_MAX_TERMS,
    deterministic: bool = True,
) -> DataFrame:
    """-> (query_id, rank, doc_id, score) with query_id = 'mlt_<src_id>'.

    BM25-scored over the selected terms (idf pinned driver-side like
    bm25_topk); the source document is excluded from candidates before
    the rank window, so ranks are dense over the OTHER documents."""
    spark = tf.sparkSession
    sel = select_mlt_terms(tf, tstats, source_ids, n_docs, max_terms).collect()
    rows = [
        (
            f"mlt_{r['src_id']}",
            int(r["src_id"]),
            r["term"],
            idf_value(n_docs, int(r["df"])),
        )
        for r in sel
    ]
    if not rows:
        return spark.createDataFrame(
            [], "query_id string, rank long, doc_id long, score double"
        )
    qt = spark.createDataFrame(
        rows, schema="query_id string, src_id long, term string, idf double"
    )
    scored_terms = tf.join(F.broadcast(qt), "term").filter(
        F.col("doc_id") != F.col("src_id")
    ).select(
        "query_id",
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
    per_doc = scored_terms.groupBy("query_id", "doc_id").agg(score.alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )

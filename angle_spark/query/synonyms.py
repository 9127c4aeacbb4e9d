"""Query-time synonym expansion: rewrite each query's token set to
include the synonyms of its tokens, then retrieve as usual.

Classic thesaurus expansion (Lucene's SynonymGraphFilter at query
time): the index stays untouched — only the tiny query side is
rewritten, so the thesaurus can change daily without a reindex. An
expanded term scores exactly like a user-typed term (plain BM25 OR
semantics), which keeps the whole pipeline oracle-expressible: the
DuckDB side is qterms = tokens UNION synonyms-of-tokens, DISTINCT.

Scale shape: queries are a handful of rows; the synonym table is
broadcast into them. Tokenization runs the engine's own JVM-side
``tokens_col`` on executors — the driver never tokenizes, and the
expanded frame feeds straight into wand_topk / bm25_topk unchanged.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from angle_spark.functions.tokenizer import tokens_col


def synonyms_df(
    spark: SparkSession, pairs: Iterable[tuple[str, str]]
) -> DataFrame:
    """(term, syn) thesaurus frame from (term, synonym) pairs. Pairs are
    DIRECTIONAL: expansion adds ``syn`` when ``term`` appears in the
    query; add both directions explicitly for symmetric synonyms."""
    return spark.createDataFrame(list(pairs), schema="term string, syn string")


def expand_queries(queries: DataFrame, synonyms: DataFrame) -> DataFrame:
    """Rewrite (query_id, text, k) -> same schema with text replaced by
    the space-joined, sorted, distinct union of the query's tokens and
    their synonyms. Feed the result into any retrieval entry point.

    Token order never affects OR retrieval (wand_topk distincts and
    sorts query terms), so rewriting to a sorted bag is lossless for
    scoring while keeping the output deterministic."""
    toks = queries.select(
        "query_id", "k", F.explode(tokens_col("text")).alias("term")
    )
    syn = F.broadcast(synonyms.select("term", "syn"))
    expanded = toks.join(syn, "term", "left").select(
        "query_id",
        "k",
        F.array_compact(F.array(F.col("term"), F.col("syn"))).alias("pair"),
    )
    return (
        expanded.select("query_id", "k", F.explode("pair").alias("term"))
        .groupBy("query_id", "k")
        .agg(
            F.concat_ws(" ", F.sort_array(F.collect_set("term"))).alias("text")
        )
        .select("query_id", "text", "k")
    )

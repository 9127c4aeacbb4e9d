"""Corpus statistics for BM25: tf, dl, df, idf, N, avgdl.

All pure DataFrame ops (JVM-side, whole-stage-codegen'd) — the analog of
the reference's vectorized pooling/aggregation path (reference
angle_emb/utils.py:58-99). Tokenization uses the Column rendition of the
shared tokenizer, so Catalyst sees plain expressions: the parquet scan
prunes to (doc columns actually used) and the explode feeds a partially
aggregated (map-side combined) groupBy — shuffle volume is distinct
(term, doc) pairs, not raw tokens.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from angle_spark.functions.tokenizer import (
    TOKENIZER_VERSION,
    analyzer_fns,
    tokens_col,
)


def with_tokens(
    df: DataFrame, text_col: str = "text", analyzer: str = TOKENIZER_VERSION
) -> DataFrame:
    """Add ``tokens array<string>`` and ``dl int`` (doc length).

    Null text tokenizes to [] (dl=0), matching the Python oracle —
    without the coalesce, split(null) -> null and avg(dl) would silently
    drop null-text docs from avgdl.

    ``analyzer`` picks the tokenizer rendition family (v1 plain /
    v2 stopword+s-stem — functions/tokenizer.py ANALYZERS); pass the
    SAME version to build_index so the index records what built it.
    """
    _, col_fn, _ = analyzer_fns(analyzer)
    return df.withColumn(
        "tokens",
        F.coalesce(col_fn(text_col), F.array().cast("array<string>")),
    ).withColumn("dl", F.size("tokens").cast("long"))


def term_frequencies(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, term, tf, dl) — the uncompressed impact-ready posting rows.

    dl is carried on every posting so query-time scoring needs no extra
    join against a doc-length table (one long per posting buys away a
    100TB-scale shuffle join).
    """
    return (
        docs.select(id_col, "dl", F.explode("tokens").alias("term"))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select(id_col, "term", "tf", "dl")
    )


def corpus_stats(docs: DataFrame) -> tuple[int, float]:
    """(N, avgdl) — two scalars, one aggregate job."""
    row = docs.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    return int(row["n"]), float(row["avgdl"] or 0.0)


def term_stats(tf: DataFrame, n_docs: int) -> DataFrame:
    """(term, df, idf). (term, doc_id) is unique in tf, so df = count(1).

    idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1)  — Okapi BM25 (north rule).
    """
    return tf.groupBy("term").agg(F.count(F.lit(1)).alias("df")).withColumn(
        "idf",
        F.log(
            (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
            + F.lit(1.0)
        ),
    )


def idf_value(n_docs: int, df: int) -> float:
    return math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)

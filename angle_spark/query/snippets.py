"""Result snippets: ±``width`` tokens of context around the first
query-term occurrence in each retrieved document — what a serving layer
renders under every hit.

Definition (deterministic, oracle-replicable): tokenize the document
with the shared tokenizer (functions/tokenizer.py — the same v1
rendition the index was built with), find the smallest 1-based position
at which ANY of the query's distinct terms occurs, and emit tokens
[max(1, p-width) .. p+width] joined by single spaces. No matching term
(possible under boolean NOT or a purged term) -> empty snippet.

Scale shape: results are k · |queries| rows — they broadcast into the
corpus scan for the text join (hydrate() contract); the query-term
arrays ride along from a second tiny broadcast. The token scan itself is
an Arrow-batched pandas UDF over exactly the hydrated result rows —
never over the corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from angle_spark.functions.tokenizer import tokenize_py


def _snippet_py(text: str | None, qtoks: list[str], width: int) -> str:
    toks = tokenize_py(text)
    qset = set(qtoks)
    p = next((i for i, t in enumerate(toks) if t in qset), None)
    if p is None:
        return ""
    return " ".join(toks[max(0, p - width) : p + width + 1])


def snippets(
    spark: SparkSession,
    results: DataFrame,
    corpus: DataFrame,
    queries: DataFrame | pd.DataFrame,
    width: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, rank, doc_id, snippet) for ranked results.

    queries: the same (query_id, text, k) batch the results came from
    (Spark or pandas) — its distinct tokens define the highlight set.
    """
    if isinstance(queries, pd.DataFrame):
        qrows = [(r.query_id, str(r.text)) for r in queries.itertuples(index=False)]
    else:
        qrows = [
            (r["query_id"], r["text"])
            for r in queries.select("query_id", "text").collect()
        ]
    qtok_df = spark.createDataFrame(
        [(qid, sorted(set(tokenize_py(text)))) for qid, text in qrows],
        schema="query_id string, qtoks array<string>",
    )
    small = results.select(
        "query_id", "rank", F.col(id_col).cast("long").alias(id_col)
    ).join(F.broadcast(qtok_df), "query_id")
    side = corpus.select(
        F.col(id_col).cast("long").alias(id_col), F.col(text_col).alias("text")
    )
    hydrated = side.join(F.broadcast(small), id_col)

    @F.pandas_udf("string")
    def snip(text: pd.Series, qtoks: pd.Series) -> pd.Series:
        return pd.Series(
            [_snippet_py(t, q, width) for t, q in zip(text, qtoks, strict=True)]
        )

    return hydrated.select(
        "query_id", "rank", id_col, snip("text", "qtoks").alias("snippet")
    )

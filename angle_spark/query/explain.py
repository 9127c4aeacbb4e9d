"""Per-hit score explain — Lucene's ``IndexSearcher.explain`` analog.

For each (query, doc) hit of a ranked result, break the BM25 score into
its per-term rows:

    contribution(t, d) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))

with every input (tf, dl, df, idf, live N, avgdl) surfaced so a
relevance engineer can see WHY a doc ranked where it did. The engine's
reported score is the ascending-term sequential float64 fold of exactly
these contributions (query/wand.py's oracle-identical fold), so summing
the explain rows in ascending term order reproduces the score
bit-for-bit (asserted in tests/test_explain.py).

Scale shape: candidate blocks are pruned to the explained docs' shard
span by the same In(term) pushdown the scorer uses; the ranked results
(k * |queries| rows) broadcast into the decode pass; nothing
corpus-sized shuffles. Decode runs once per block inside an
Arrow-batched applyInPandas — the codec's numpy decoders, no per-row
Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from angle_spark.codec import decode_doc_deltas, decode_tfs, decode_varints
from angle_spark.index.build import IndexMeta
from angle_spark.index.stats import idf_value
from angle_spark.codec import B, K1
from angle_spark.query.wand import query_term_stats

_EXPLAIN_SCHEMA = (
    "query_id string, doc_id long, term string, tf long, dl long, "
    "idf double, contribution double"
)


def explain_hits(
    spark: SparkSession,
    merged: DataFrame,
    tstats: DataFrame,
    meta: IndexMeta,
    queries: DataFrame | pd.DataFrame,
    results: DataFrame,
) -> DataFrame:
    """-> (query_id, doc_id, term, tf, dl, idf, contribution): one row
    per (hit, matching query term), for every (query_id, doc_id) in
    ``results`` (a wand_topk ranking or any frame carrying those two
    columns).

    Tokenizes query text with the index's own analyzer (IndexMeta
    contract). Contributions use meta.live_docs for idf and the stored
    avgdl — identical inputs to the scorer, so the ascending-term fold
    of a hit's rows equals its reported score exactly."""
    from angle_spark.functions.tokenizer import analyzer_fns

    tok_py, _, _ = analyzer_fns(getattr(meta, "analyzer", "v1-ascii-alnum"))
    if isinstance(queries, pd.DataFrame):
        qit = [(q.query_id, q.text) for q in queries.itertuples(index=False)]
    else:
        qit = [
            (r["query_id"], r["text"])
            for r in queries.select("query_id", "text").collect()
        ]
    qterms = sorted({(qid, t) for qid, text in qit for t in set(tok_py(text))})
    all_terms = sorted({t for _, t in qterms})
    if not all_terms:
        return spark.createDataFrame([], _EXPLAIN_SCHEMA)
    ts_pdf = query_term_stats(tstats, all_terms)
    df_map = dict(zip(ts_pdf["term"], ts_pdf["df"]))
    n_live = meta.live_docs
    idf_map = {t: idf_value(n_live, int(df_map[t])) for t in df_map}
    # (query_id, term, idf) rows for the matched-in-vocab query terms
    qt_rows = [
        (qid, t, idf_map[t]) for qid, t in qterms if t in idf_map
    ]
    if not qt_rows:
        return spark.createDataFrame([], _EXPLAIN_SCHEMA)
    qt_df = spark.createDataFrame(qt_rows, "query_id string, term string, idf double")

    hits = results.select(
        "query_id", F.col("doc_id").cast("long").alias("doc_id")
    ).dropDuplicates(["query_id", "doc_id"])

    avgdl = meta.avgdl
    cand = merged.filter(F.col("term").isin(all_terms)).select(
        "term", "docs_bin", "tfs_bin", "dls_bin"
    )

    def decode(it):
        for pdf in it:
            outs = []
            for row in pdf.itertuples(index=False):
                d = decode_doc_deltas(row.docs_bin)
                tf = decode_tfs(row.tfs_bin).astype(np.int64)
                dl = decode_varints(row.dls_bin).astype(np.int64)
                outs.append(
                    pd.DataFrame({"term": row.term, "doc_id": d, "tf": tf, "dl": dl})
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    postings = cand.mapInPandas(
        decode, schema="term string, doc_id long, tf long, dl long"
    )
    # hits and query terms are k*|queries| and |queries|*|terms| rows —
    # both broadcast; the decoded candidate postings stream through
    joined = postings.join(F.broadcast(qt_df), "term").join(
        F.broadcast(hits), ["query_id", "doc_id"]
    )
    contrib = (
        F.col("idf")
        * F.col("tf")
        * F.lit(K1 + 1.0)
        / (
            F.col("tf")
            + F.lit(K1)
            * (F.lit(1.0 - B) + F.lit(B) * F.col("dl") / F.lit(avgdl))
        )
    )
    return joined.select(
        "query_id",
        "doc_id",
        "term",
        "tf",
        "dl",
        "idf",
        contrib.alias("contribution"),
    )

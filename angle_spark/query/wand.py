"""Top-k BM25 over the compressed index with block-max pruning.

Distributed shape (classic shard-and-merge search architecture):

    query terms (tiny, broadcast, idf from term_stats driver-side)
      ⋈ merged blocks on term          <- parquet bucket pruning + pushdown
      -> groupBy(query_id, shard)       <- shard = segment_id // G
         applyInPandas(_score_shard)    <- block-max pruned exact top-k
      -> global window top-k            <- union of shard top-ks ⊇ answer

Pruning inside a shard is a vectorized batch variant of block-max WAND
(SAAT-style): per-doc score upper bound = Σ over the doc's blocks of
idf·block_max_impact (docIDs decode cheaply; tf/dl decode and scoring are
skipped for every doc whose bound < θ). θ comes from exact-scoring the
top-4k candidates by bound; the final exact rescore covers exactly the
docs whose bound ≥ θ, so the result is provably identical to exhaustive
scoring — which the shadow tests assert (SURVEY.md §7 step 8: "always
shadow-test against the exhaustive scorer").

Determinism: contributions are summed with np.add.reduceat over rows
sorted by (doc, term) — the same ascending-term float64 fold as the
Python oracle and the declarative engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from angle_spark.codec import B, K1, decode_doc_deltas, decode_tfs, decode_varints
from angle_spark.index.build import IndexMeta
from angle_spark.index.stats import idf_value
from angle_spark.query.bm25 import query_terms

SHARD_SEGMENTS = 16  # segments per scoring shard

_OUT_SCHEMA = "query_id string, doc_id long, score double"


def _exact_scores(
    cand: pd.DataFrame, docs_keep: np.ndarray, avgdl: float
) -> tuple[np.ndarray, np.ndarray]:
    """Decode tf/dl for candidate blocks, score only docs in docs_keep.
    Returns (doc_ids, scores) sorted by doc_id; deterministic fold."""
    doc_parts, term_parts, contrib_parts = [], [], []
    keep = np.sort(docs_keep)
    for row in cand.itertuples(index=False):
        d = decode_doc_deltas(row.docs_bin)
        mask = np.isin(d, keep, assume_unique=True)
        if not mask.any():
            continue
        tf = decode_tfs(row.tfs_bin)[mask].astype(np.float64)
        dl = decode_varints(row.dls_bin).astype(np.float64)[mask]
        denom = tf + K1 * (1.0 - B + B * dl / avgdl)
        contrib_parts.append(row.idf * tf * (K1 + 1.0) / denom)
        doc_parts.append(d[mask])
        term_parts.append(np.full(int(mask.sum()), row.term, dtype=object))
    if not doc_parts:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    docs = np.concatenate(doc_parts)
    terms = np.concatenate(term_parts)
    contribs = np.concatenate(contrib_parts)
    order = np.lexsort((terms, docs))  # primary: doc, secondary: term asc
    docs, contribs = docs[order], contribs[order]
    starts = np.flatnonzero(np.concatenate(([True], docs[1:] != docs[:-1])))
    scores = np.add.reduceat(contribs, starts)  # in-order float64 fold
    return docs[starts], scores


def _score_shard(pdf: pd.DataFrame, avgdl: float, prune: bool) -> pd.DataFrame:
    """All candidate blocks of one (query, shard) -> local exact top-k."""
    qid = pdf["query_id"].iloc[0]
    k = int(pdf["k"].iloc[0])
    # block bound recomputed from (max_tf, min_dl) with the CURRENT avgdl —
    # valid even when streamed appends have drifted avgdl since the block
    # was written (the stored max_impact is only tight for the build-time
    # avgdl). impact is increasing in tf and decreasing in dl, so
    # impact(max_tf, min_dl) >= impact(tf_i, dl_i) for every posting i.
    mt = pdf["max_tf"].to_numpy(dtype=np.float64)
    md = pdf["min_dl"].to_numpy(dtype=np.float64)
    bound = mt * (K1 + 1.0) / (mt + K1 * (1.0 - B + B * md / avgdl))
    pdf = pdf.assign(ub=pdf["idf"].to_numpy() * bound)

    if prune:
        # per-doc upper bound from docID-only decode
        doc_parts, ub_parts = [], []
        for row in pdf.itertuples(index=False):
            d = decode_doc_deltas(row.docs_bin)
            doc_parts.append(d)
            ub_parts.append(np.full(len(d), row.ub))
        docs = np.concatenate(doc_parts)
        ubs = np.concatenate(ub_parts)
        bound = pd.Series(ubs).groupby(pd.Series(docs)).sum()
        if len(bound) > 4 * k:
            top_cand = bound.nlargest(4 * k)
            d0, s0 = _exact_scores(pdf, top_cand.index.to_numpy(), avgdl)
            if len(s0) >= k:
                theta = np.partition(s0, -k)[-k]
                survivors = bound.index.to_numpy()[bound.to_numpy() >= theta]
            else:
                survivors = bound.index.to_numpy()
        else:
            survivors = bound.index.to_numpy()
        doc_ids, scores = _exact_scores(pdf, survivors, avgdl)
    else:
        all_docs = np.unique(
            np.concatenate([decode_doc_deltas(r.docs_bin) for r in pdf.itertuples(index=False)])
        )
        doc_ids, scores = _exact_scores(pdf, all_docs, avgdl)

    if len(doc_ids) > k:
        # top-k with (score desc, doc_id asc) tie-break
        order = np.lexsort((doc_ids, -scores))[:k]
        doc_ids, scores = doc_ids[order], scores[order]
    return pd.DataFrame({"query_id": qid, "doc_id": doc_ids, "score": scores})


def wand_topk(
    spark: SparkSession,
    merged: DataFrame,
    tstats: DataFrame,
    meta: IndexMeta,
    queries: DataFrame,
    prune: bool = True,
    shard_segments: int = SHARD_SEGMENTS,
) -> DataFrame:
    """-> (query_id, rank, doc_id, score) from the compressed index."""
    qt_pdf = (
        query_terms(queries).join(tstats, "term").toPandas()
    )  # tiny: |queries| x |terms|
    if len(qt_pdf) == 0:
        return spark.createDataFrame([], "query_id string, rank int, doc_id long, score double")
    qt_pdf["idf"] = [idf_value(meta.n_docs, int(d)) for d in qt_pdf["df"]]
    qt = spark.createDataFrame(
        qt_pdf[["query_id", "k", "term", "idf"]],
        schema="query_id string, k int, term string, idf double",
    )
    # term IN (...) pushes down to the parquet scan; the merged layout is
    # sorted by term, so row-group min/max stats skip everything else
    terms = sorted(set(qt_pdf["term"]))
    cand = (
        merged.filter(F.col("term").isin(terms))
        .join(F.broadcast(qt), "term")
        .withColumn(
            "shard", (F.col("segment_id") / F.lit(shard_segments)).cast("long")
        )
    )
    avgdl = meta.avgdl

    def fn(key, pdf):
        return _score_shard(pdf, avgdl, prune)

    local = cand.groupBy("query_id", "shard").applyInPandas(fn, schema=_OUT_SCHEMA)
    kdf = queries.select("query_id", "k")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        local.join(F.broadcast(kdf), "query_id")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "doc_id", "score")
    )

"""Top-k BM25 over the compressed index with block-max pruning.

Distributed shape (classic shard-and-merge search architecture):

    all query terms (tiny, idf computed driver-side from term_stats)
      -> merged blocks WHERE term IN (...)   <- parquet row-group pruning
      -> groupBy(shard)                       <- shard = segment_id // G;
         applyInPandas(_score_shard_multi)       each block crosses the
                                                 shuffle ONCE, not per query
      -> global per-query window top-k        <- union of shard-local
                                                 top-ks ⊇ exact answer

Inside a shard the whole query batch is evaluated against local blocks:
decode + (tf, denom) arrays are memoized per block across queries;
scoring is an O(postings) dense accumulator over the shard's docID span
(no sort), folding terms in ascending order — bit-identical to the
Python oracle's float64 fold. Block-max pruning (prune=True) uses the
per-block bound idf*impact(max_tf, min_dl), which needs NO decode:
single-term queries walk blocks in descending bound order and stop when
bound < θ (exact — a strictly-worse block cannot enter the top-k even by
tie-break). Shadow tests assert prune == exhaustive == declarative ==
oracle (SURVEY.md §7 step 8).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from angle_spark.codec import B, K1, decode_doc_deltas, decode_tfs, decode_varints
from angle_spark.index.build import IndexMeta
from angle_spark.index.stats import idf_value

SHARD_SEGMENTS = None  # auto: ~4 shards per core (see wand_topk)

_OUT_SCHEMA = "query_id string, doc_id long, score double"


def query_term_stats(tstats, terms: list[str]) -> pd.DataFrame:
    """(term, df) rows for exactly the given terms — never the vocabulary.

    At 100 TB the vocabulary (ids, typos, hashes) is billions of terms; a
    full ``tstats.toPandas()`` OOMs the driver before the first query
    runs. The default path filters term_stats to the query-term set IN
    SPARK (predicate pushed to the parquet scan — the term column is the
    sort key of the term_stats layout) and collects only the matched rows:
    |terms ∩ vocab| rows, bounded by the query batch, never by the corpus.

    Passing a pandas DataFrame instead is the explicit OPT-IN fast path
    for served deployments with a bounded vocabulary that cache term
    stats driver-side (e.g. bench serving loops); the filter then runs
    in pandas."""
    if isinstance(tstats, pd.DataFrame):
        return tstats[tstats["term"].isin(terms)][["term", "df"]]
    return (
        tstats.filter(F.col("term").isin(terms)).select("term", "df").toPandas()
    )


def _topk_arrays(doc_ids: np.ndarray, scores: np.ndarray, k: int):
    if len(doc_ids) > k:
        sel = np.lexsort((doc_ids, -scores))[:k]
        return doc_ids[sel], scores[sel]
    return doc_ids, scores


def _score_shard_multi(
    pdf: pd.DataFrame, qt: pd.DataFrame, avgdl: float, prune: bool
) -> pd.DataFrame:
    """One shard's blocks (each block shipped ONCE, not once per query)
    scored against the whole query set.

    Sharing: each block decodes at most once per shard task, and the
    idf-free impact array computes once — cached across every query that
    touches the term.

    Scoring is an O(postings) dense accumulator over the shard's local
    docID span (no sort): score[doc-base] += idf*impact, terms processed
    in ascending term order so the float64 fold is bit-identical to the
    Python oracle.

    Block-max WAND (prune=True): per-block upper bound
    idf * impact(max_tf, min_dl) needs NO decode. Single-term queries
    walk blocks in descending bound order and stop decoding as soon as
    bound < theta (current kth score) — strictly-worse blocks can't enter
    the top-k even via tie-break. Multi-term queries evaluate fully
    (exactness requires every term's contribution for every candidate)."""
    by_term: dict[str, pd.DataFrame] = {
        t: g for t, g in pdf.groupby("term", sort=False)
    }
    base = int(pdf["first_doc"].min())
    span = int(pdf["last_doc"].max()) - base + 1

    decoded: dict[tuple, tuple] = {}

    def decode(row):
        # (term, first_doc) is globally unique: a term's blocks cover
        # disjoint doc ranges (streamed appends may reuse block_in_seg=0
        # within a segment, so that key would collide)
        key = (row.term, row.first_doc)
        hit = decoded.get(key)
        if hit is None:
            d = decode_doc_deltas(row.docs_bin)
            tf = decode_tfs(row.tfs_bin).astype(np.float64)
            dl = decode_varints(row.dls_bin).astype(np.float64)
            denom = tf + K1 * (1.0 - B + B * dl / avgdl)
            hit = (d, tf, denom)
            decoded[key] = hit
        return hit

    term_cache: dict[str, tuple] = {}

    def term_arrays(term):
        """whole-term concatenated (docs, tf, denom) for this shard —
        one vectorized accumulate per (query, term) instead of one tiny
        numpy op per block per query."""
        hit = term_cache.get(term)
        if hit is None:
            parts = [decode(row) for row in by_term[term].itertuples(index=False)]
            hit = (
                np.concatenate([p[0] for p in parts]),
                np.concatenate([p[1] for p in parts]),
                np.concatenate([p[2] for p in parts]),
            )
            term_cache[term] = hit
        return hit

    acc = np.zeros(span, dtype=np.float64)

    out_q, out_d, out_s = [], [], []
    for q in qt.itertuples(index=False):
        k = int(q.k)
        terms = sorted(zip(q.terms, q.idfs))
        present = [(t, idf) for t, idf in terms if t in by_term]
        if not present:
            continue

        if prune and len(present) == 1:
            # block-max WAND walk: descending bound, stop when bound < theta
            term, idf = present[0]
            g = by_term[term]
            mt = g["max_tf"].to_numpy(dtype=np.float64)
            md = g["min_dl"].to_numpy(dtype=np.float64)
            ubs = idf * mt * (K1 + 1.0) / (
                mt + K1 * (1.0 - B + B * md / avgdl)
            )
            order = np.argsort(-ubs, kind="stable")
            doc_parts, score_parts = [], []
            theta = -np.inf
            n_seen = 0
            rows = list(g.itertuples(index=False))
            for bi in order:
                if n_seen >= k and ubs[bi] < theta:
                    break
                d, tf, denom = decode(rows[bi])
                doc_parts.append(d)
                # same associativity as the oracle: ((idf*tf)*(k1+1))/denom
                score_parts.append(idf * tf * (K1 + 1.0) / denom)
                n_seen += len(d)
                if n_seen >= k:
                    theta = np.partition(np.concatenate(score_parts), -k)[-k]
            doc_ids = np.concatenate(doc_parts)
            scores = np.concatenate(score_parts)
        else:
            # exact multi-term: dense accumulate in ascending term order
            idx_parts = []
            for term, idf in present:
                d, tf, denom = term_arrays(term)
                li = d - base
                acc[li] += idf * tf * (K1 + 1.0) / denom
                idx_parts.append(li)
            hit = np.unique(np.concatenate(idx_parts))
            doc_ids = hit + base
            scores = acc[hit].copy()
            # reset only touched cells (span stays clean for the next query)
            acc[hit] = 0.0

        doc_ids, scores = _topk_arrays(doc_ids, scores, k)
        out_q.append(np.full(len(doc_ids), q.query_id, dtype=object))
        out_d.append(doc_ids)
        out_s.append(scores)

    if not out_q:
        return pd.DataFrame({"query_id": [], "doc_id": [], "score": []})
    return pd.DataFrame(
        {
            "query_id": np.concatenate(out_q),
            "doc_id": np.concatenate(out_d),
            "score": np.concatenate(out_s),
        }
    )


def wand_topk(
    spark: SparkSession,
    merged: DataFrame,
    tstats: DataFrame,
    meta: IndexMeta,
    queries: DataFrame,
    prune: bool = True,
    shard_segments: int | None = SHARD_SEGMENTS,
) -> DataFrame:
    """-> (query_id, rank, doc_id, score) from the compressed index.

    Shape: candidate blocks (term IN all query terms — pushed down to the
    parquet scan) are shuffled ONCE by shard; each shard task scores the
    full query set against its local blocks with shared decode/impact
    arrays; a final per-query window merges shard-local top-ks.

    Query-side prep is pure driver Python — tokenization uses the same
    shared tokenizer module; df/idf comes from term_stats SEMI-JOINED
    against the query-term set (only |query terms ∩ vocab| rows ever
    reach the driver — see query_term_stats; pass ``tstats`` as a pandas
    DataFrame as an explicit opt-in to serve many query batches from a
    bounded cached vocabulary with zero per-call Spark jobs).

    queries: Spark or pandas DataFrame (query_id, text, k)."""
    from angle_spark.functions.tokenizer import tokenize_py

    qpdf = queries if isinstance(queries, pd.DataFrame) else queries.toPandas()
    tokenized = [
        (q.query_id, int(q.k), sorted(set(tokenize_py(q.text))))
        for q in qpdf.itertuples(index=False)
    ]
    all_terms = sorted({t for _, _, ts in tokenized for t in ts})
    ts_pdf = query_term_stats(tstats, all_terms)
    df_map = dict(zip(ts_pdf["term"], ts_pdf["df"]))

    rows = []
    for query_id, k, qterms in tokenized:
        terms = [t for t in qterms if t in df_map]
        if terms:
            rows.append(
                (
                    query_id,
                    k,
                    terms,
                    [idf_value(meta.n_docs, int(df_map[t])) for t in terms],
                )
            )
    if not rows:
        return spark.createDataFrame([], "query_id string, rank int, doc_id long, score double")
    grouped = pd.DataFrame(rows, columns=["query_id", "k", "terms", "idfs"])
    b_qt = spark.sparkContext.broadcast(grouped)

    if shard_segments is None:
        # enough shards to keep every core busy (scoring parallelism),
        # few enough that shared decode/term caches still amortize
        n_segments = max(1, (meta.n_docs + meta.segment_docs - 1) // meta.segment_docs)
        par = spark.sparkContext.defaultParallelism
        shard_segments = max(1, n_segments // (par * 4))
    terms = sorted({t for ts in grouped["terms"] for t in ts})
    cand = merged.filter(F.col("term").isin(terms)).withColumn(
        "shard", (F.col("segment_id") / F.lit(shard_segments)).cast("long")
    )
    avgdl = meta.avgdl

    def fn(key, pdf):
        return _score_shard_multi(pdf, b_qt.value, avgdl, prune)

    local = cand.groupBy("shard").applyInPandas(fn, schema=_OUT_SCHEMA)
    kdf = spark.createDataFrame(
        qpdf[["query_id", "k"]], schema="query_id string, k int"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        local.join(F.broadcast(kdf), "query_id")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "doc_id", "score")
    )

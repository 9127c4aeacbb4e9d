"""SPIMI-style per-partition posting-list segment builder.

The reference's collator is a batch UDF that turns raw rows into a padded,
deduplicated columnar batch (reference angle_emb/angle.py:124-244); our
analog turns a *doc-range segment* of tokenized turns into sorted,
delta+varint-encoded posting blocks — all inside one Arrow-batched
applyInPandas, vectorized with numpy (no per-row Python).

Segment identity is data-derived (segment_id = doc_id // segment_docs),
NOT TaskContext-derived — so a rebuilt segment is byte-identical no matter
which executor builds it, which is what makes checkpoint/resume and the
kill/rerun test possible. Segments cover disjoint, ascending docID ranges,
so the global posting order per term is (segment_id, block_in_seg) with no
re-sort at merge time.

Block rows (one per <=BLOCK_SIZE docs of one term in one segment):
    term, segment_id, block_in_seg, first_doc, last_doc, n_postings,
    max_tf, max_impact (idf-free BM25 bound for block-max WAND),
    docs_bin (delta+varint), tfs_bin (varint of tf-1), dls_bin (varint)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from angle_spark.codec import (
    BLOCK_SIZE,
    encode_doc_deltas,
    encode_tfs,
    encode_varints,
    impact_upper_bound,
)

SEGMENT_SCHEMA = (
    "term string, segment_id long, block_in_seg int, first_doc long, "
    "last_doc long, n_postings int, max_tf int, max_impact double, "
    "docs_bin binary, tfs_bin binary, dls_bin binary"
)

DEFAULT_SEGMENT_DOCS = 100_000


def _segment_blocks(pdf: pd.DataFrame, avgdl: float, block_size: int) -> pd.DataFrame:
    """One segment's docs -> encoded posting block rows (pure pandas/numpy)."""
    empty = pd.DataFrame(
        {
            "term": pd.Series(dtype="string"),
            "segment_id": pd.Series(dtype="int64"),
            "block_in_seg": pd.Series(dtype="int32"),
            "first_doc": pd.Series(dtype="int64"),
            "last_doc": pd.Series(dtype="int64"),
            "n_postings": pd.Series(dtype="int32"),
            "max_tf": pd.Series(dtype="int32"),
            "max_impact": pd.Series(dtype="float64"),
            "docs_bin": pd.Series(dtype=object),
            "tfs_bin": pd.Series(dtype=object),
            "dls_bin": pd.Series(dtype=object),
        }
    )
    seg_id = int(pdf["segment_id"].iloc[0])
    lens = pdf["tokens"].map(len).to_numpy(dtype=np.int64)
    if lens.sum() == 0:
        return empty
    terms = np.concatenate([np.asarray(t, dtype=object) for t in pdf["tokens"]])
    docs = np.repeat(pdf["doc_id"].to_numpy(dtype=np.int64), lens)
    dls = np.repeat(pdf["dl"].to_numpy(dtype=np.int64), lens)

    tdf = (
        pd.DataFrame({"term": terms, "doc_id": docs, "dl": dls})
        .groupby(["term", "doc_id"], sort=True)
        .agg(tf=("dl", "size"), dl=("dl", "first"))
        .reset_index()
    )

    rows = []
    for term, g in tdf.groupby("term", sort=True):
        d = g["doc_id"].to_numpy()
        t = g["tf"].to_numpy()
        dl = g["dl"].to_numpy()
        for b in range(0, len(d), block_size):
            db, tb, lb = d[b : b + block_size], t[b : b + block_size], dl[b : b + block_size]
            rows.append(
                (
                    term,
                    seg_id,
                    b // block_size,
                    int(db[0]),
                    int(db[-1]),
                    len(db),
                    int(tb.max()),
                    impact_upper_bound(tb, lb, avgdl),
                    encode_doc_deltas(db),
                    encode_tfs(tb),
                    encode_varints(lb.astype(np.uint64)),
                )
            )
    return pd.DataFrame(
        rows,
        columns="term segment_id block_in_seg first_doc last_doc n_postings "
        "max_tf max_impact docs_bin tfs_bin dls_bin".split(),
    )


def build_segments(
    docs: DataFrame,
    avgdl: float,
    segment_docs: int = DEFAULT_SEGMENT_DOCS,
    block_size: int = BLOCK_SIZE,
) -> DataFrame:
    """docs(doc_id, tokens, dl) -> encoded block rows.

    groupBy(segment_id).applyInPandas gives each segment to exactly one
    task; segments are uniform doc-count slices so the shuffle is unskewed
    regardless of term skew (skew shows up only as bigger posting lists
    *within* a segment, which blocks cap at block_size docs each).
    """

    def fn(key, pdf):
        return _segment_blocks(pdf, avgdl, block_size)

    with_seg = docs.select(
        "doc_id",
        "tokens",
        "dl",
        (F.col("doc_id") / F.lit(segment_docs)).cast("long").alias("segment_id"),
    )
    return with_seg.groupBy("segment_id").applyInPandas(fn, schema=SEGMENT_SCHEMA)


def decode_block(row) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """block row -> (doc_ids, tfs, dls); used by the WAND scorer and tests."""
    from angle_spark.codec import decode_doc_deltas, decode_tfs, decode_varints

    return (
        decode_doc_deltas(row["docs_bin"]),
        decode_tfs(row["tfs_bin"]),
        decode_varints(row["dls_bin"]).astype(np.int64),
    )

"""Doc reconstruction from the positional index, and reindexing on top
of it (the ES ``_reindex`` API when the source holds no ``_source``).

A positional index is information-complete about its token streams: a
doc's postings record every (term, position) pair, so scattering terms
back to their positions rebuilds the EXACT ordered token sequence. And
because segments are doc ranges, every posting of a doc lives in its
own segment — reconstruction is shard-LOCAL: one groupBy(segment_id)
applyInPandas over the blocks, no corpus table, no doc-keyed global
shuffle. ``reconstruct_docs`` is the per-turn text-equality surface at
index scale (the north rule's stable-order invariant, recovered from
postings alone; tests assert bitwise equality with the original
tokenized corpus, order included).

``reindex`` composes that with the versioned-analyzer contract: v2
(stopword drop + s-stem, functions/tokenizer.py) is BY CONSTRUCTION a
token-level transform of v1, so a v1 positional index reindexes to a
v2 index from the index alone — reconstruct, transform the token
arrays with the same pure-Column pipeline the from-text path uses,
rebuild. At transcript scale this skips the corpus scan AND the raw
tokenization; the output is byte-identical to a fresh v2 build of the
same corpus (tested), so queries, stats and streamed appends behave as
if the index had been born v2.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from angle_spark.index.build import IndexMeta, build_index, load_index

_DOCS_SCHEMA = "doc_id long, tokens array<string>, dl long"


def _rebuild_segment(pdf: pd.DataFrame) -> pd.DataFrame:
    """One segment's blocks -> (doc_id, tokens, dl) rows, token order
    exact (positions are unique per doc — each indexes one token).

    Vectorized across the segment's blocks (guide §4.2 — the round-5
    version looped ``itertuples`` with three decode calls per block,
    ~100us of per-block Python overhead): each stream family decodes in
    ONE concat pass. Positions restart absolute at every posting (see
    the SPIMI encoder), so the concatenated delta stream un-carries with
    the flat tf array as group lengths — block boundaries need no
    special-casing."""
    if len(pdf) == 0:
        return pd.DataFrame(
            {
                "doc_id": pd.Series(dtype="int64"),
                "tokens": pd.Series(dtype=object),
                "dl": pd.Series(dtype="int64"),
            }
        )
    from angle_spark.codec import decode_doc_deltas_concat, decode_varints_concat

    blk_docs = decode_doc_deltas_concat(list(pdf["docs_bin"]))
    tfs, _ = decode_varints_concat(list(pdf["tfs_bin"]))
    tfs = tfs.astype(np.int64) + 1
    pdeltas, _ = decode_varints_concat(list(pdf["pos_bin"]))
    # per-posting un-carry: first delta of every posting is absolute
    bounds = np.concatenate(([0], np.cumsum(tfs)))
    cs = np.cumsum(pdeltas.astype(np.int64))
    offsets = np.zeros(len(tfs), dtype=np.int64)
    if len(tfs) > 1:
        offsets[1:] = cs[bounds[1:-1] - 1]
    pos = cs - np.repeat(offsets, tfs)

    n_post = pdf["n_postings"].to_numpy(dtype=np.int64)
    terms = np.repeat(np.repeat(pdf["term"].to_numpy(), n_post), tfs)
    docs = np.repeat(blk_docs, tfs)
    order = np.lexsort((pos, docs))
    terms, docs = terms[order], docs[order]
    new_doc = np.concatenate(([True], docs[1:] != docs[:-1]))
    starts = np.flatnonzero(new_doc)
    bounds = np.append(starts, len(docs))
    return pd.DataFrame(
        {
            "doc_id": docs[starts],
            "tokens": [
                list(terms[s:e])
                for s, e in zip(bounds[:-1], bounds[1:], strict=False)
            ],
            "dl": (bounds[1:] - starts).astype(np.int64),
        }
    )


def reconstruct_docs(spark: SparkSession, index_dir: str) -> DataFrame:
    """positional index -> (doc_id, tokens, dl), the exact tokenized
    corpus the index was built from (order included). Docs with zero
    tokens are unrecoverable (they have no postings) and are absent —
    the same rows the index itself never scores."""
    merged, _tstats, meta = load_index(spark, index_dir)
    if not getattr(meta, "positional", False):
        raise ValueError(
            "doc reconstruction needs a positional index — token order "
            "is not recoverable from bag-of-words postings; rebuild "
            "with build_index(..., positional=True)"
        )
    return merged.groupBy("segment_id").applyInPandas(
        lambda key, pdf: _rebuild_segment(pdf), schema=_DOCS_SCHEMA
    )


def reindex(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    analyzer: str = "v2-sstem-stop",
    segment_docs: int | None = None,
    positional: bool = True,
) -> IndexMeta:
    """src (v1 positional) index -> dst index under ``analyzer``, from
    the index alone. analyzer="v2-sstem-stop" applies the registered
    token-level transform; "v1-ascii-alnum" is a pure rebuild (layout /
    positional toggle). segment_docs=None keeps the source's."""
    from angle_spark.functions.tokenizer import v2_from_v1_tokens_col

    _merged, _tstats, meta = load_index(spark, src_dir)
    if getattr(meta, "analyzer", "v1-ascii-alnum") != "v1-ascii-alnum":
        raise ValueError(
            "reindex source must be a v1 index — v2 is lossy "
            f"(stopwords are gone); got {meta.analyzer!r}"
        )
    docs = reconstruct_docs(spark, src_dir)
    if analyzer == "v2-sstem-stop":
        toks = v2_from_v1_tokens_col(F.col("tokens"))
        docs = docs.select(
            "doc_id",
            toks.alias("tokens"),
            F.size(toks).cast("long").alias("dl"),
        )
    elif analyzer != "v1-ascii-alnum":
        raise ValueError(f"unknown analyzer {analyzer!r}")
    return build_index(
        spark,
        docs,
        dst_dir,
        segment_docs=segment_docs
        if segment_docs is not None
        else meta.segment_docs,
        block_size=meta.block_size,
        positional=positional,
        analyzer=analyzer,
    )

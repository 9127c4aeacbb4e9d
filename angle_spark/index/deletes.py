"""Document deletion: tombstones, query-time masking, physical purge.

Classic log-structured-index delete semantics (the same contract Lucene
documents for `deleteDocuments` + merge):

- ``delete_docs`` appends docID tombstones under ``<out_dir>/deletes/``.
  Nothing in the index is rewritten — a delete is O(tombstones).
- Queries exclude deleted docs IMMEDIATELY: ``wand_topk(...,
  deletes=load_deletes(...))`` masks tombstoned postings at block-decode
  time inside each shard task, so block-max/MaxScore pruning stays exact
  (every bound remains a valid upper bound for the surviving postings,
  and theta is only ever raised by live docs). Corpus statistics
  (n_docs, avgdl, df) intentionally remain those of the full corpus
  until a purge — deleted docs still influence scores of live docs,
  exactly as in Lucene before a merge.
- ``purge_deletes`` is the compaction: it decode-filter-re-encodes every
  affected posting block (blocks without tombstoned docs pass through
  byte-identical, no re-encode), rewrites ``segments/`` via an atomic
  dir swap, full-merges, and updates the corpus stats to LIVE values —
  after a purge the index scores as if the deleted docs were never
  indexed. docIDs are NOT reassigned (the docID space keeps holes), so
  purge composes with streamed appends: the dense-assignment watermark
  ``meta.n_docs`` is unchanged and new docs continue above it.

Stats bookkeeping: ``meta.purged_docs`` / ``meta.purged_tokens`` are
cumulative counters; live scoring stats are
``n_docs - purged_docs`` and ``(lineage token sum - purged_tokens) /
(n_docs - purged_docs)``, which keeps ``refresh_corpus_stats`` an
O(lineage) operation with no postings scan. Token accounting is exact:
every posting of a deleted doc is removed exactly once, so the drop in
``sum(sum_tf)`` across blocks equals the deleted docs' total token
count. Caller contract: tombstoned ids must be LIVE docIDs (deleting an
id twice across purges, or an id that was never indexed, skews only the
advisory live-doc counter — postings-level behavior stays correct).

Scale shape: tombstones are never broadcast. The query side cogroups
them with posting blocks on the shard key; the purge cogroups them on
segment_id — each task sees only its own docID range's tombstones.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from angle_spark import fsio
from angle_spark.codec import (
    B,
    K1,
    decode_doc_deltas,
    decode_tfs,
    decode_varints,
    encode_doc_deltas,
    encode_tfs,
    encode_varints,
    encode_varints_with_lengths,
)
from angle_spark.index.build import IndexMeta, _read_table, _write
from angle_spark.index.spimi import SEGMENT_SCHEMA

DELETES_SCHEMA = "doc_id long"


def _deletes_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "deletes")


def _load_meta(spark: SparkSession, out_dir: str) -> IndexMeta:
    return IndexMeta(
        **json.loads(fsio.read_text(spark, os.path.join(out_dir, "corpus_stats.json")))
    )


def delete_docs(spark: SparkSession, out_dir: str, doc_ids: DataFrame) -> int:
    """Append tombstones for the given docIDs; returns how many were
    recorded. Ids outside [0, n_docs) are dropped (nothing to delete
    there — the docID space is dense below the watermark), and the batch
    is deduplicated. O(tombstones); the index itself is untouched."""
    meta = _load_meta(spark, out_dir)
    dels = (
        doc_ids.select(F.col("doc_id").cast("long").alias("doc_id"))
        .filter((F.col("doc_id") >= 0) & (F.col("doc_id") < F.lit(meta.n_docs)))
        .distinct()
    )
    _write(dels, _deletes_dir(out_dir), meta.sink_format, "append")
    return _load_deletes_df(spark, out_dir, meta).count()


def _load_deletes_df(
    spark: SparkSession, out_dir: str, meta: IndexMeta
) -> DataFrame | None:
    path = _deletes_dir(out_dir)
    if meta.sink_format == "parquet":
        if not fsio.has_files_with_suffix(spark, path, ".parquet"):
            return None
    elif not fsio.exists(spark, path):
        return None
    try:
        return _read_table(spark, path, meta.sink_format).select("doc_id").distinct()
    except Exception:
        return None  # dir exists but holds no committed tombstones


def delete_by_query(
    spark: SparkSession,
    out_dir: str,
    text: str,
    mode: str = "boolean",
    **search_kwargs,
) -> int:
    """Elasticsearch ``_delete_by_query`` / Lucene
    ``deleteDocuments(Query)``: tombstone every LIVE doc the query
    matches; returns how many docs this call newly deleted. The
    reference's analog is corpus curation before training — dropping
    documents by content predicate (hard-negative filtering,
    reference README.md:119-128); here the predicate is any query the
    engine can run (boolean trees, phrases, field leaves, ...).

    Semantics follow ES exactly: matching is evaluated against the
    CURRENT live view (existing tombstones apply, so re-running the
    same query is idempotent and returns 0), the matched docIDs are
    appended as ordinary tombstones (O(matches) — the index is never
    rewritten), and stats stay full-corpus until ``purge_deletes``.

    Scale shape: one exhaustive membership pass (``collector="ids"`` —
    O(matches) two-column rows, no scoring state), then a tombstone
    append; the matched set never reaches the driver. ``mode`` and
    ``search_kwargs`` (field_meta, doc_filter, max_expansions, slop...)
    pass through to the search."""
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import matched_ids

    merged, tstats, meta = load_index(spark, out_dir)
    existing = _load_deletes_df(spark, out_dir, meta)
    n_before = existing.count() if existing is not None else 0
    queries = spark.createDataFrame(
        [("_dbq", text, 1)], schema="query_id string, text string, k int"
    )
    search_kwargs.pop("deletes", None)
    hits = matched_ids(
        spark, merged, tstats, meta, queries,
        mode=mode, deletes=existing, **search_kwargs,
    ).select("doc_id")
    return delete_docs(spark, out_dir, hits) - n_before


def load_deletes(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """Current tombstone set as a (doc_id) DataFrame, or None when the
    index has no pending deletes. Pass the result straight to
    ``wand_topk(..., deletes=...)``."""
    return _load_deletes_df(spark, out_dir, _load_meta(spark, out_dir))


def mask_postings(
    doc_ids: np.ndarray, deleted_sorted: np.ndarray
) -> np.ndarray | None:
    """Boolean keep-mask for a decoded posting array against a SORTED
    tombstone array, or None when nothing in the block is deleted (the
    caller's fast path: reuse the original arrays/bytes untouched)."""
    if deleted_sorted.size == 0 or doc_ids.size == 0:
        return None
    # both sides sorted -> branchless membership via searchsorted
    idx = np.searchsorted(deleted_sorted, doc_ids)
    idx[idx == deleted_sorted.size] = 0
    hit = deleted_sorted[idx] == doc_ids
    if not hit.any():
        return None
    return ~hit


def _purge_block_rows(pdf: pd.DataFrame, deleted: np.ndarray, avgdl: float) -> pd.DataFrame:
    """One segment's block rows minus tombstoned postings. Blocks with no
    tombstoned doc pass through unchanged (byte-identical); emptied
    blocks are dropped; the rest re-encode with recomputed stats.

    Vectorized across the segment's blocks (guide §4.2 — the round-5
    version looped ``pdf.iloc[i]`` row-at-a-time, ~100us of pandas
    overhead per block on top of each decode): the range reject is one
    searchsorted over (first_doc, last_doc) arrays, all candidate blocks'
    doc streams decode in ONE concat pass, membership is one flat
    searchsorted, and the surviving postings re-encode in one varint pass
    per stream, sliced back to blocks at the kept-count boundaries."""
    if len(pdf) == 0 or deleted.size == 0:
        return pdf
    from angle_spark.codec import decode_doc_deltas_concat, decode_varints_concat

    first = pdf["first_doc"].to_numpy(dtype=np.int64)
    last = pdf["last_doc"].to_numpy(dtype=np.int64)
    # cheap range reject before any decode (same rule as the old per-row
    # loop: a block whose [first_doc, last_doc] span holds no tombstone
    # passes through byte-identical)
    lo = np.searchsorted(deleted, first)
    cand = (lo < deleted.size) & (deleted[np.minimum(lo, deleted.size - 1)] <= last)
    if not cand.any():
        return pdf
    cidx = np.flatnonzero(cand)
    counts = pdf["n_postings"].to_numpy(dtype=np.int64)[cidx]
    docs_flat = decode_doc_deltas_concat([pdf["docs_bin"].iat[i] for i in cidx])
    # flat membership: both sides sorted per block -> searchsorted
    pos = np.searchsorted(deleted, docs_flat)
    pos[pos == deleted.size] = 0
    hit = deleted[pos] == docs_flat
    bounds = np.concatenate(([0], np.cumsum(counts)))
    ndel = np.add.reduceat(hit.astype(np.int64), bounds[:-1])
    # candidates with no actual tombstoned posting pass through unchanged
    untouched = ndel == 0
    emptied = ndel == counts
    partial = ~untouched & ~emptied

    pass_mask = np.ones(len(pdf), dtype=bool)
    pass_mask[cidx[emptied]] = False
    pass_mask[cidx[partial]] = False
    passthrough = pdf.iloc[np.flatnonzero(pass_mask)]
    if not partial.any():
        return passthrough.reset_index(drop=True)

    pidx = cidx[partial]  # rows needing a re-encode
    has_pos = "pos_bin" in pdf.columns
    # flat kept mask restricted to partial blocks
    keep_block = np.repeat(partial, counts)
    keep_flat = (~hit)[keep_block]
    pcounts = counts[partial]
    pbounds = np.concatenate(([0], np.cumsum(pcounts)))
    d_all = docs_flat[keep_block]
    tf_all, _ = decode_varints_concat([pdf["tfs_bin"].iat[i] for i in pidx])
    tf_all = tf_all.astype(np.int64) + 1
    dl_all, _ = decode_varints_concat([pdf["dls_bin"].iat[i] for i in pidx])
    dl_all = dl_all.astype(np.int64)

    kept_counts = pcounts - ndel[partial]
    kbounds = np.concatenate(([0], np.cumsum(kept_counts)))
    d = d_all[keep_flat]
    tf = tf_all[keep_flat]
    dl = dl_all[keep_flat]
    kb = kbounds[:-1]

    # per-block stats in one reduceat pass each
    tff = tf.astype(np.float64)
    imp = tff * (K1 + 1.0) / (
        tff + K1 * (1.0 - B + B * dl.astype(np.float64) / avgdl)
    )
    new_first = d[kb]
    new_last = d[kbounds[1:] - 1]
    new_maxtf = np.maximum.reduceat(tf, kb)
    new_mindl = np.minimum.reduceat(dl, kb)
    new_sumtf = np.add.reduceat(tf, kb)
    new_maximp = np.maximum.reduceat(imp, kb)

    # ONE varint encode per stream; blocks are byte slices at the kept
    # boundaries (delta restart absolute at each block start)
    deltas = np.diff(d, prepend=np.int64(0))
    deltas[kb] = d[kb]
    docs_bytes, dlen = encode_varints_with_lengths(deltas.astype(np.uint64))
    tfs_bytes, tlen = encode_varints_with_lengths(tf.astype(np.uint64) - np.uint64(1))
    dls_bytes, llen = encode_varints_with_lengths(dl.astype(np.uint64))
    doff = np.concatenate(([0], np.cumsum(dlen)))
    toff = np.concatenate(([0], np.cumsum(tlen)))
    loff = np.concatenate(([0], np.cumsum(llen)))
    mv_d, mv_t, mv_l = memoryview(docs_bytes), memoryview(tfs_bytes), memoryview(dls_bytes)
    docs_bin = [bytes(mv_d[doff[s]:doff[e]]) for s, e in zip(kb, kbounds[1:], strict=False)]
    tfs_bin = [bytes(mv_t[toff[s]:toff[e]]) for s, e in zip(kb, kbounds[1:], strict=False)]
    dls_bin = [bytes(mv_l[loff[s]:loff[e]]) for s, e in zip(kb, kbounds[1:], strict=False)]

    pos_out = None
    if has_pos:
        # positions are within-doc, so kept postings' runs re-encode
        # unchanged — only the dropped runs disappear from each stream.
        # Rare path (positional purges only); per-partial-block decode.
        from angle_spark.codec import decode_positions

        pos_out = []
        for j, i in enumerate(pidx):
            pb = pdf["pos_bin"].iat[i]
            if not pb:
                pos_out.append(b"")
                continue
            blk_tf = tf_all[pbounds[j]:pbounds[j + 1]]
            keep = keep_flat[pbounds[j]:pbounds[j + 1]]
            flat, fb = decode_positions(pb, blk_tf)
            kept_groups = [flat[fb[g]:fb[g + 1]] for g in np.flatnonzero(keep)]
            pdeltas = np.concatenate(
                [np.concatenate(([g[0]], np.diff(g))) for g in kept_groups]
            )
            pos_out.append(encode_varints(pdeltas.astype(np.uint64)))

    recoded = {
        "term": pdf["term"].to_numpy()[pidx],
        "segment_id": pdf["segment_id"].to_numpy()[pidx],
        "block_in_seg": pdf["block_in_seg"].to_numpy()[pidx],
        "first_doc": new_first,
        "last_doc": new_last,
        "n_postings": kept_counts.astype(np.int32),
        "max_tf": new_maxtf.astype(np.int32),
        "min_dl": new_mindl.astype(np.int64),
        "sum_tf": new_sumtf.astype(np.int64),
        "max_impact": new_maximp,
        "docs_bin": docs_bin,
        "tfs_bin": tfs_bin,
        "dls_bin": dls_bin,
    }
    if has_pos:
        recoded["pos_bin"] = pos_out
    out = pd.concat(
        [passthrough, pd.DataFrame(recoded)[list(pdf.columns)]],
        ignore_index=True,
    )
    return out


def _recover_purge_swap(spark: SparkSession, seg_dir: str) -> None:
    """Finish or roll back a crashed segments/ swap so segments/ is always
    readable on entry. Swap order is rename(seg -> old), rename(tmp ->
    seg), delete(old); each rename is atomic on HDFS/file, so the only
    bad states are 'seg missing' (complete from tmp, else roll back from
    old) and 'old leftover' (delete)."""
    if not fsio.exists(spark, seg_dir):
        if fsio.exists(spark, seg_dir + "_tmp"):
            fsio.rename(spark, seg_dir + "_tmp", seg_dir)  # complete the swap
        elif fsio.exists(spark, seg_dir + "_old"):
            fsio.rename(spark, seg_dir + "_old", seg_dir)  # roll back
        else:
            raise RuntimeError(f"{seg_dir} missing with no recovery dir")
    if fsio.exists(spark, seg_dir + "_old"):
        fsio.delete(spark, seg_dir + "_old")


def purge_deletes(spark: SparkSession, out_dir: str) -> IndexMeta:
    """Physically remove tombstoned postings and switch corpus stats to
    live values (see module docstring). No-op when there are no pending
    tombstones. Returns the refreshed IndexMeta.

    Cost model: this is a COMPACTION — two index-sized passes (segment
    rewrite + full merge), the same class as the periodic full
    merge_index a maintained index runs anyway; batch deletes so purges
    piggyback on that cadence, exactly as Lucene purges deletes during
    segment merges. Per-block decode is pruned (a block whose docID range
    holds no tombstone passes through byte-identical via a searchsorted
    range check), so scattered vs clustered deletes change only the
    re-encode volume, not the scan.

    Crash-safe and idempotent: the doc/token accounting is journaled
    BEFORE the swap (a killed run can't recompute it afterwards — the
    postings it removed are gone), the journal applies at most once (it
    records the purged_docs watermark it was created at), and a recovery
    preamble completes or rolls back a half-finished segments/ swap.
    Rerunning purge_deletes after a kill at ANY point converges to the
    same final state (tests/test_deletes.py kill-matrix)."""
    from angle_spark.index.build import merge_index

    seg_dir = os.path.join(out_dir, "segments")
    _recover_purge_swap(spark, seg_dir)
    meta = _load_meta(spark, out_dir)
    dels = _load_deletes_df(spark, out_dir, meta)
    journal_path = os.path.join(out_dir, "purge_journal.json")
    has_journal = fsio.exists(spark, journal_path)
    if dels is None and not has_journal:
        return meta

    avgdl = meta.avgdl

    def _build_tmp() -> None:
        # tombstones meet blocks only in their own segment — cogrouped on
        # segment_id, never broadcast (the tombstone set is unbounded
        # between compactions at 10^12 docs; each task sees only its own
        # docID range's)
        seg = _read_table(spark, seg_dir, meta.sink_format)
        dels_seg = dels.withColumn(
            "segment_id", (F.col("doc_id") / F.lit(meta.segment_docs)).cast("long")
        )

        def fn(key, blocks: pd.DataFrame, tomb: pd.DataFrame) -> pd.DataFrame:
            if len(blocks) == 0:
                return blocks
            deleted = np.sort(tomb["doc_id"].to_numpy(dtype=np.int64))
            return _purge_block_rows(blocks, deleted, avgdl)

        purged = (
            seg.groupby("segment_id")
            .cogroup(dels_seg.groupby("segment_id"))
            .applyInPandas(fn, schema=SEGMENT_SCHEMA)
        )
        # the cogroup already partitioned by segment_id — write straight
        # from its output (the old repartition(segment_id) re-shuffled
        # every index byte a second time; guide §2.4). segment_id leads
        # the sort so the dynamic-partition writer keeps one open file
        # per partition dir.
        _write(
            purged.sortWithinPartitions("segment_id", "term", "block_in_seg"),
            seg_dir + "_tmp",
            meta.sink_format,
            "overwrite",
            partition_by=["segment_id"],
        )

    def _tokens(path: str) -> int:
        return int(
            _read_table(spark, path, meta.sink_format)
            .agg(F.sum("sum_tf"))
            .collect()[0][0]
            or 0
        )

    def _live_tokens_from_lineage() -> int | None:
        """pre-purge live token total in O(lineage rows) — lineage carries
        token_count per commit and the cumulative purge counter subtracts
        prior purges, so no segments/ scan is needed (round-3 verdict:
        purge ran two extra full sum_tf scans). None = legacy lineage
        missing token_count -> caller falls back to the block scan."""
        lin = _read_table(
            spark, os.path.join(out_dir, "lineage"), meta.sink_format
        )
        if "token_count" not in lin.columns:
            return None
        row = lin.agg(
            F.sum("token_count").alias("tokens"),
            F.count(F.when(F.col("token_count").isNull(), 1)).alias("nulls"),
        ).collect()[0]
        if row["nulls"] != 0 or row["tokens"] is None:
            return None
        return int(row["tokens"]) - meta.purged_tokens

    if has_journal:
        j = json.loads(fsio.read_text(spark, journal_path))
        if j["base_purged_docs"] == meta.purged_docs and dels is not None:
            # resumed mid-purge with the tombstones not yet consumed:
            # redo the rewrite (idempotent — already-purged blocks pass
            # through unchanged). Counters come from the journal, never
            # recounted. A journal whose base is BEHIND meta.purged_docs
            # means its counters are already applied (crash in the final
            # merge/cleanup phase) — fall through and finish idempotently.
            _build_tmp()
    else:
        if dels is None:
            return meta
        n_del = dels.count()
        if n_del == 0:
            return meta
        old_tokens = _live_tokens_from_lineage()
        if old_tokens is None:  # legacy lineage only
            old_tokens = _tokens(seg_dir)
        _build_tmp()
        new_tokens = _tokens(seg_dir + "_tmp")  # the ONE post-rewrite scan
        j = {
            "n_del": n_del,
            "removed_tokens": old_tokens - new_tokens,
            # journaled so the post-swap stats refresh needs no re-scan
            # (and a resumed purge reuses it — the rewrite is idempotent)
            "live_tokens": new_tokens,
            "base_purged_docs": meta.purged_docs,
        }
        fsio.write_text(spark, journal_path, json.dumps(j))  # atomic

    if fsio.exists(spark, seg_dir + "_tmp"):
        fsio.rename(spark, seg_dir, seg_dir + "_old")
        fsio.rename(spark, seg_dir + "_tmp", seg_dir)
        fsio.delete(spark, seg_dir + "_old")
    # consume the tombstones the moment the swap is durable: everything
    # they said is now captured by (purged segments + journal), and a
    # resume must not mistake them for a fresh batch
    fsio.delete(spark, _deletes_dir(out_dir))

    if j["base_purged_docs"] == meta.purged_docs:  # apply at most once
        meta.purged_docs += j["n_del"]
        meta.purged_tokens += j["removed_tokens"]
    live_docs = meta.n_docs - meta.purged_docs
    live_tokens = j.get("live_tokens")
    if live_tokens is None:  # journal written by a pre-upgrade run
        live_tokens = _tokens(seg_dir)
    meta.avgdl = live_tokens / live_docs if live_docs else 0.0
    # rebuild merged/ + term_stats from the purged segments (df must drop
    # with the postings); full merge = the compaction that also restores
    # the tight range layout. NOTE merge_index persists meta itself, so
    # from here on the on-disk purged_docs is advanced — which is exactly
    # why the journal applies by base watermark, not by existence.
    merge_index(spark, out_dir, meta, incremental=False)
    # everything on disk is merged now; silence the delta-union path that
    # merge_index's hi+1 watermark would otherwise leave open when the
    # tail docs were purged
    meta.merged_docs = meta.n_docs
    meta.stats_docs = meta.n_docs
    fsio.write_text(
        spark, os.path.join(out_dir, "corpus_stats.json"), json.dumps(meta.__dict__)
    )
    fsio.delete(spark, journal_path)
    return meta

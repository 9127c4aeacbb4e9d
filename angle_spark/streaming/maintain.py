"""Streaming index maintenance.

The reference has only a streaming *source* flag (HF IterableDataset,
reference angle_emb/angle_trainer.py:107-108,219 — sequential shards, no
watermarks or stateful ops). The Spark-native upgrade: new transcript
turns arrive as a stream; each micro-batch appends delta segments to the
index via foreachBatch, with dropDuplicatesWithinWatermark on
(conv_id, turn_idx) handling replays/late data (SURVEY.md §2.9).

Delta segments reuse the SPIMI builder: a micro-batch's turns get docIDs
above the current high-water mark, become one-or-more new segments, and
land with the same lineage rows the batch build writes — so resume,
merge, and the WAND scorer treat streamed segments identically to batch
ones. Queries see the union of merged/ plus any committed delta segments.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from angle_spark.index.build import IndexMeta
from angle_spark.index.spimi import build_segments
from angle_spark.index.stats import with_tokens


def _load_meta(spark, out_dir: str) -> IndexMeta:
    from angle_spark import fsio

    return IndexMeta(
        **json.loads(fsio.read_text(spark, os.path.join(out_dir, "corpus_stats.json")))
    )


def append_micro_batch(
    batch_df: DataFrame, batch_id: int, out_dir: str, high_water_doc: int
) -> int:
    """foreachBatch body: assign docIDs after the high-water mark, build
    delta segment blocks, append to segments/ + lineage. Returns the new
    high-water mark. Stats (df, avgdl) are refreshed by the next
    merge_index run — standard segment-then-merge search maintenance."""
    import time

    t0 = time.monotonic()
    spark = batch_df.sparkSession
    meta = _load_meta(spark, out_dir)
    rows = batch_df.select("conv_id", "turn_idx", "text").dropDuplicates(
        ["conv_id", "turn_idx"]
    )
    # docIDs via the two-pass offset-prefix assigner (operators/docids.py)
    # shifted above the high-water mark — a large backfill micro-batch
    # parallelizes like the batch build instead of serializing on one
    # unpartitioned-window task (round-3 verdict item)
    from angle_spark.operators.docids import assign_doc_ids

    assigned = assign_doc_ids(rows)
    try:
        ids = assigned.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(high_water_doc)).cast("long")
        )
        docs = with_tokens(ids).select("doc_id", "tokens", "dl")
        n_new = docs.count()
        if n_new == 0:
            return high_water_doc
        # NOTE: blocks built here encode max_impact with the BUILD-TIME
        # meta.avgdl, which drifts as the stream appends — the stored
        # max_impact column is ADVISORY across batch/streamed segments and the
        # query side (query/wand.py) recomputes bounds from (max_tf, min_dl)
        # with the current avgdl; never prune on the stored column directly.
        blocks = build_segments(
            docs, meta.avgdl, meta.segment_docs, meta.block_size, meta.positional
        )
        (
            blocks.write.mode("append")
            .partitionBy("segment_id")
            .parquet(os.path.join(out_dir, "segments"))
        )
        # per-segment doc counts for THIS batch only (a batch may span several
        # segments; every doc must be counted exactly once across all lineage
        # rows — refresh_corpus_stats sums them)
        seg_docs = (
            docs.select(
                (F.col("doc_id") / F.lit(meta.segment_docs)).cast("long").alias("segment_id")
            )
            .groupBy("segment_id")
            .count()
            .withColumnRenamed("count", "doc_count")
        )
        lin = blocks.groupBy("segment_id").agg(
            F.count_distinct("term").alias("term_count"),
            F.sum(
                F.octet_length("docs_bin")
                + F.octet_length("tfs_bin")
                + F.octet_length("dls_bin")
                + F.octet_length("pos_bin")
            ).alias("bytes"),
            F.sum("sum_tf").alias("token_count"),
        )
        wall_ms = int((time.monotonic() - t0) * 1000)
        (
            lin.join(seg_docs, "segment_id")
            .select(
                F.col("segment_id").alias("partition_id"),
                F.col("doc_count"),
                F.col("term_count"),
                F.col("bytes"),
                F.lit(wall_ms).cast("long").alias("wall_ms"),
                F.current_timestamp().alias("commit_ts"),
                F.col("token_count"),
            )
            .write.mode("append")
            .parquet(os.path.join(out_dir, "lineage"))
        )
        return high_water_doc + n_new
    finally:
        # the two-pass docID persist (DISK_ONLY) must not outlive the
        # micro-batch: a long-running stream would otherwise stack one
        # persisted frame per batch until GC happens to reclaim them
        src = getattr(assigned, "_persisted_source", None)
        if src is not None:
            src.unpersist()


def maintain_stream(
    stream_df: DataFrame,
    out_dir: str,
    start_high_water: int,
    checkpoint_dir: str,
    trigger_seconds: int = 10,
) -> Any:
    """wire a transcripts stream into the index. Late/replayed turns are
    dropped by key within the watermark window."""
    state = {"hw": start_high_water}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        state["hw"] = append_micro_batch(batch_df, batch_id, out_dir, state["hw"])

    deduped = (
        stream_df.withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["conv_id", "turn_idx"])
    )
    return (
        deduped.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )

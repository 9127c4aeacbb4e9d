#!/usr/bin/env python
"""spark-submit entry point: build the inverted index over a transcripts
table, then answer a query file — the production shape of the engine.

Cluster usage (the --py-files bundle ships the pure-Python package; no
JVM extensions to deploy):

    cd /root/repo && zip -qr /tmp/angle_spark.zip angle_spark
    spark-submit --py-files /tmp/angle_spark.zip \
        scripts/build_and_query.py \
        --transcripts s3://bucket/transcripts/ \
        --index s3://bucket/index/ \
        --queries queries.json --out results/

Local smoke:
    python scripts/build_and_query.py --demo

Resume semantics: rerunning the same command after a failure skips the
segments whose lineage rows are committed (see angle_spark.index.build).

Maintenance: --append adds new transcripts to an EXISTING index as a
delta micro-batch (no rebuild; queries see it immediately through the
load_index delta union), --compact folds committed deltas into the
merged layout as an O(delta) incremental merge. Appended conversations
must sort after the already-indexed ones under (conv_id, turn_idx) —
the same stable-order contract the streaming path has.
--delete tombstones docIDs (O(tombstones); queries run here exclude
them immediately with full-corpus stats, Lucene-style), --purge is the
compaction that physically removes their postings and switches the
stats to live values (index/deletes.py).

Query-only: --index + --queries + --out WITHOUT --transcripts answers
the query file against an existing index (honoring pending tombstones,
--mode or|and|phrase|near, --slop).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--transcripts", help="parquet dir of the transcripts table")
    ap.add_argument("--index", help="index output dir")
    ap.add_argument("--queries", help="json file: [{query_id, text, k}, ...]")
    ap.add_argument("--out", help="results parquet dir")
    ap.add_argument("--segment-docs", type=int, default=None)
    ap.add_argument(
        "--positional",
        action="store_true",
        help="store token positions in the index (enables --mode phrase)",
    )
    ap.add_argument(
        "--mode",
        choices=["or", "and", "phrase", "near", "boolean", "prefix"],
        default="or",
        help="disjunctive BM25 (default), conjunctive AND, exact phrase, "
        "unordered proximity (see --slop), boolean trees, or prefix "
        "wildcards (stem*, see --max-expansions)",
    )
    ap.add_argument(
        "--slop",
        type=int,
        default=4,
        help="near mode: max window (max pos - min pos) in tokens",
    )
    ap.add_argument(
        "--max-expansions",
        type=int,
        default=64,
        help="prefix mode: max vocabulary terms per stem (top-df)",
    )
    ap.add_argument("--demo", action="store_true", help="self-contained local demo")
    ap.add_argument(
        "--append",
        action="store_true",
        help="add --transcripts to an existing --index as a delta batch",
    )
    ap.add_argument(
        "--compact",
        action="store_true",
        help="incremental-merge committed deltas into the layout",
    )
    ap.add_argument(
        "--delete",
        metavar="IDS_JSON",
        help="tombstone docIDs from a json list; queries exclude them "
        "immediately, stats stay full-corpus until --purge",
    )
    ap.add_argument(
        "--purge",
        action="store_true",
        help="physically remove tombstoned postings (compaction) and "
        "switch corpus stats to live values",
    )
    args = ap.parse_args()

    from angle_spark.index.build import (
        build_index,
        load_index,
        merge_index,
        refresh_corpus_stats,
    )
    from angle_spark.index.stats import with_tokens
    from angle_spark.operators.docids import assign_doc_ids
    from angle_spark.query.wand import wand_topk
    from angle_spark.session import get_spark

    spark = get_spark(app_name="angle_spark_build_and_query")

    query_only = (
        args.index and args.queries and args.out
        and not args.transcripts and not args.demo
    )
    if args.append or args.compact or args.delete or args.purge or query_only:
        if not args.index:
            ap.error("--index required")
        if args.append:
            if not args.transcripts:
                ap.error("--append requires --transcripts")
            from angle_spark.streaming.maintain import append_micro_batch

            meta = refresh_corpus_stats(spark, args.index)
            hw = append_micro_batch(
                spark.read.parquet(args.transcripts), 0, args.index, meta.n_docs
            )
            print(f"appended {hw - meta.n_docs} turns (delta, no merge)")
            # advance the n_docs watermark NOW: a combined --append
            # --delete invocation must let tombstones target the docs it
            # just appended (delete_docs drops ids >= the stale watermark
            # silently; round-3 ADVICE)
            refresh_corpus_stats(spark, args.index)
        if args.delete:
            from angle_spark.index.deletes import delete_docs

            ids = json.load(open(args.delete))
            pending = delete_docs(
                spark,
                args.index,
                spark.createDataFrame([(int(i),) for i in ids], schema="doc_id long"),
            )
            print(f"tombstoned; {pending} docIDs pending purge")
        if args.purge:
            from angle_spark.index.deletes import purge_deletes

            meta = purge_deletes(spark, args.index)
            print(
                f"purged; live_docs={meta.live_docs} "
                f"(cumulative purged={meta.purged_docs})"
            )
        meta = refresh_corpus_stats(spark, args.index)
        if args.compact:
            merge_index(spark, args.index, meta, incremental=True)
            print(f"compacted deltas; merged_docs={meta.merged_docs}")
        print(f"index now {meta.live_docs} live turns (avgdl={meta.avgdl:.2f})")
        if args.queries and args.out:
            from angle_spark.index.deletes import load_deletes

            qrows = json.load(open(args.queries))
            queries = spark.createDataFrame(
                [(q["query_id"], q["text"], int(q.get("k", 10))) for q in qrows],
                schema="query_id string, text string, k int",
            )
            merged, tstats, meta = load_index(spark, args.index)
            wand_topk(
                spark,
                merged,
                tstats,
                meta,
                queries,
                deletes=load_deletes(spark, args.index),
                mode=args.mode,
                slop=args.slop,
                max_expansions=args.max_expansions,
            ).write.mode("overwrite").parquet(args.out)
            print(f"wrote results -> {args.out}")
        return

    if args.demo:
        import tempfile

        from angle_spark.synth import queries_df, transcripts_df

        base = tempfile.mkdtemp(prefix="angle_demo_")
        args.transcripts = f"{base}/transcripts"
        args.index = f"{base}/index"
        args.out = f"{base}/results"
        transcripts_df(spark, 100, seed=42).write.parquet(args.transcripts)
        queries = queries_df(spark)
    else:
        if not (args.transcripts and args.index and args.queries and args.out):
            ap.error("--transcripts/--index/--queries/--out required (or --demo)")
        qrows = json.load(open(args.queries))
        queries = spark.createDataFrame(
            [(q["query_id"], q["text"], int(q.get("k", 10))) for q in qrows],
            schema="query_id string, text string, k int",
        )

    raw = spark.read.parquet(args.transcripts)
    docs = with_tokens(assign_doc_ids(raw)).select("doc_id", "tokens", "dl")
    meta = build_index(
        spark,
        docs,
        args.index,
        segment_docs=args.segment_docs,
        positional=args.positional,
    )
    print(f"indexed {meta.n_docs} turns (avgdl={meta.avgdl:.2f}) -> {args.index}")

    merged, tstats, meta = load_index(spark, args.index)
    results = wand_topk(
        spark, merged, tstats, meta, queries, mode=args.mode, slop=args.slop,
        max_expansions=args.max_expansions,
    )
    results.write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(f"wrote {n} result rows -> {args.out}")
    if args.demo:
        spark.read.parquet(args.out).orderBy("query_id", "rank").show(12)


if __name__ == "__main__":
    main()

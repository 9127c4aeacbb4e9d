#!/usr/bin/env python
"""Phase-level profiling for the heavy bench legs (guide §1: measure
first, isolate with the noop sink). NOT the driver's bench — bench.py is
frozen; this file exists so OPTIMIZATION_r06.md numbers are reproducible.

Usage:
    python bench_extra.py build    # index_build phase breakdown
    python bench_extra.py purge    # delete+purge phase breakdown
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
CONVS_PER_SF = 300_000


def _sf_of(sf_dir: str) -> float:
    try:
        return float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        return 0.1


def _spark():
    from bench import _bench_spark

    return _bench_spark(f"bench_extra_{CPUS}", CPUS)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def profile_build() -> dict:
    from pyspark import StorageLevel

    from angle_spark.index.build import IndexMeta, build_index, merge_index
    from angle_spark.index.spimi import build_segments
    from angle_spark.index.stats import corpus_stats, with_tokens
    from angle_spark.operators.docids import assign_doc_ids
    from angle_spark.synth import transcripts_df

    sf = _sf_of(SF_DIR)
    n_convs = max(200, int(CONVS_PER_SF * sf))
    spark, scratch = _spark()
    sc = spark.sparkContext
    corpus_root = scratch or "/tmp"
    corpus_dir = f"{corpus_root}/angle_bench_corpus_{n_convs}.parquet"
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        transcripts_df(spark, n_convs, seed=42, partitions=64).write.mode(
            "overwrite"
        ).parquet(corpus_dir)

    t: dict[str, float] = {}
    out_dir = tempfile.mkdtemp(prefix="angle_extra_idx_", dir=scratch)
    try:
        raw = spark.read.parquet(corpus_dir)

        sc.setJobDescription("build: docids+tokenize persist")
        t0 = time.monotonic()
        docs = with_tokens(assign_doc_ids(raw, num_partitions=CPUS * 2)).select(
            "doc_id", "tokens", "dl"
        )
        docs = docs.persist(StorageLevel.DISK_ONLY)
        n_docs, avgdl = corpus_stats(docs)
        t["docids_tokenize_stats"] = time.monotonic() - t0

        segment_docs = min(8_000_000, max(4096, n_docs // 128))

        sc.setJobDescription("build: spimi encode (noop)")
        t0 = time.monotonic()
        noop(build_segments(docs, avgdl, segment_docs))
        t["spimi_encode_noop"] = time.monotonic() - t0

        sc.setJobDescription("build: full build_index")
        t0 = time.monotonic()
        docs2 = with_tokens(assign_doc_ids(raw, num_partitions=CPUS * 2)).select(
            "doc_id", "tokens", "dl"
        )
        meta = build_index(spark, docs2, out_dir, batch_segments=4096)
        t["full_build_index"] = time.monotonic() - t0

        sc.setJobDescription("build: merge only (re-run)")
        t0 = time.monotonic()
        merge_index(spark, out_dir, meta)
        t["merge_rerun"] = time.monotonic() - t0
        docs.unpersist()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return {"phase": "build", "n_docs": n_docs, "timings": {k: round(v, 2) for k, v in t.items()}}


def profile_purge() -> dict:
    from angle_spark.index.build import build_index
    from angle_spark.index.deletes import delete_docs, purge_deletes
    from angle_spark.index.stats import with_tokens
    from angle_spark.operators.docids import assign_doc_ids
    from angle_spark.synth import transcripts_df

    sf = _sf_of(SF_DIR)
    n_convs = max(200, int(CONVS_PER_SF * sf))
    spark, scratch = _spark()
    sc = spark.sparkContext
    corpus_root = scratch or "/tmp"
    corpus_dir = f"{corpus_root}/angle_bench_corpus_{n_convs}.parquet"
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        transcripts_df(spark, n_convs, seed=42, partitions=64).write.mode(
            "overwrite"
        ).parquet(corpus_dir)

    t: dict[str, float] = {}
    out_dir = tempfile.mkdtemp(prefix="angle_extra_purge_", dir=scratch)
    try:
        raw = spark.read.parquet(corpus_dir)
        docs = with_tokens(assign_doc_ids(raw, num_partitions=CPUS * 2)).select(
            "doc_id", "tokens", "dl"
        )
        meta = build_index(spark, docs, out_dir, batch_segments=4096)
        n = meta.n_docs

        sc.setJobDescription("purge: delete_docs")
        t0 = time.monotonic()
        delete_docs(spark, out_dir, spark.range(0, n, 100).selectExpr("id as doc_id"))
        t["delete_docs"] = time.monotonic() - t0

        sc.setJobDescription("purge: purge_deletes")
        t0 = time.monotonic()
        purge_deletes(spark, out_dir)
        t["purge_deletes"] = time.monotonic() - t0
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return {"phase": "purge", "n_docs": n, "timings": {k: round(v, 2) for k, v in t.items()}}


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "build"
    if which == "build":
        print(json.dumps(profile_build()))
    elif which == "purge":
        print(json.dumps(profile_purge()))
    else:
        raise SystemExit(f"unknown phase {which!r}")

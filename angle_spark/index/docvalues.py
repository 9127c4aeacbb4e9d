"""Index-time docvalues: per-segment column files read task-locally.

Lucene analog: DocValues — the columnar per-field forward index that
backs sorting, faceting and aggregations (NumericDocValues /
SortedDocValues). The round-5 sort/stats/group collectors accept their
(doc_id, value) metadata as an ad-hoc DataFrame that rides the
shard-cogrouped side channel — correct, but it re-ships a corpus-sized
narrow frame on every QUERY BATCH. A serving deployment sorts and
aggregates on the SAME fields batch after batch; docvalues move that
cost to index time:

- ``write_docvalues(spark, index_dir, name, df)`` lays the field out as
  parquet partitioned by segment (``seg = doc_id // segment_docs`` —
  the same stable unit index blocks use), one narrow repartition pass.
- At query time each shard task reads EXACTLY its own segments' files
  directly with pyarrow (hive-partition pruning, task-local IO): no
  shuffle, no driver hop, no per-batch re-ship — O(shard) bytes read
  per task, the Lucene docvalues access pattern.

Numeric fields store the value itself; keyword (string) fields
dictionary-encode driver-side (bounded by ``max_buckets``, the same
loud-cap contract as ``group_matches``) and store the code, with the
label dictionary persisted in the field's ``dv_meta.json`` so group
collectors can decode buckets.

Layout (parquet-only — the reader is pyarrow, not a Spark scan):

    <index_dir>/dv/<name>/data/seg=<k>/*.parquet   (doc_id long, val double)
    <index_dir>/dv/<name>/dv_meta.json             {kind, segment_docs, labels?}

Scale and consistency notes: executors must see the index path (shared
filesystem or object store — pyarrow reads posix, s3 and hdfs). The
write is overwrite-whole-field and committed by the dv_meta.json write
(same write-then-meta ordering as every other index artifact). Docs
appended to the index AFTER the write simply have no value — the
collectors' missing-value rules apply (sort-last / skipped bucket) —
so refresh fields after large appends. Reference analog: the reference
ranks retrieval output by metadata stored alongside embeddings
(/root/reference/README.md retrieval examples).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from angle_spark import fsio


@dataclass
class DocValues:
    """Handle to one stored field. ``labels`` is the keyword dictionary
    (code -> label, list index = code) or None for numeric fields.
    Pass the handle anywhere the query layer accepts a (doc_id, value)
    metadata frame: wand_topk(sort_meta=...), aggregate_matches(values=
    ...), group_matches(groups=/values=...)."""

    data_path: str
    name: str
    kind: str  # "numeric" | "keyword"
    segment_docs: int
    labels: list[str] | None = None


def _field_dir(index_dir: str, name: str) -> str:
    return os.path.join(index_dir, "dv", name)


def write_docvalues(
    spark: SparkSession,
    index_dir: str,
    name: str,
    df: DataFrame,
    max_buckets: int = 65536,
) -> DocValues:
    """Persist ``df`` (doc_id, value) as the docvalues field ``name`` of
    the index at ``index_dir`` and return its handle. A string value
    column becomes a keyword field (dictionary-encoded, labels in the
    field meta); anything numeric casts to double. One row per doc_id
    (duplicate doc_ids are an input contract violation, as with the
    ad-hoc frames). Overwrites any previous generation of the field."""
    stats = json.loads(
        fsio.read_text(spark, os.path.join(index_dir, "corpus_stats.json"))
    )
    segment_docs = int(stats["segment_docs"])
    vcol = df.columns[1]
    is_str = dict(df.dtypes)[vcol] in ("string", "varchar")
    labels: list[str] | None = None
    if is_str:
        g = df.select(F.col(vcol).cast("string").alias("g")).filter(
            F.col("g").isNotNull()
        )
        labels = sorted(
            r["g"] for r in g.distinct().limit(max_buckets + 1).collect()
        )
        if len(labels) > max_buckets:
            raise ValueError(
                f"keyword field {name!r} exceeds max_buckets={max_buckets} "
                "distinct values — store it numeric or raise the cap"
            )
        dim = spark.createDataFrame(
            list(enumerate(labels)), "val long, g string"
        )
        vals = (
            df.select(
                F.col("doc_id").cast("long").alias("doc_id"),
                F.col(vcol).cast("string").alias("g"),
            )
            .join(F.broadcast(dim), "g")
            .select("doc_id", F.col("val").cast("double").alias("val"))
        )
    else:
        vals = df.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col(vcol).cast("double").alias("val"),
        )
    field_dir = _field_dir(index_dir, name)
    data_dir = os.path.join(field_dir, "data")
    (
        vals.withColumn(
            "seg", F.floor(F.col("doc_id") / F.lit(segment_docs)).cast("long")
        )
        .repartition("seg")
        .write.mode("overwrite")
        .partitionBy("seg")
        .parquet(data_dir)
    )
    kind = "keyword" if is_str else "numeric"
    fsio.write_text(
        spark,
        os.path.join(field_dir, "dv_meta.json"),
        json.dumps(
            {"kind": kind, "segment_docs": segment_docs, "labels": labels}
        ),
    )
    return DocValues(data_dir, name, kind, segment_docs, labels)


def load_docvalues(spark: SparkSession, index_dir: str, name: str) -> DocValues:
    """Open an existing field's handle (reads its dv_meta.json)."""
    field_dir = _field_dir(index_dir, name)
    m = json.loads(
        fsio.read_text(spark, os.path.join(field_dir, "dv_meta.json"))
    )
    return DocValues(
        os.path.join(field_dir, "data"),
        name,
        m["kind"],
        int(m["segment_docs"]),
        m.get("labels"),
    )


def read_segment_values(
    data_path: str, seg_lo: int, seg_hi: int
) -> tuple[np.ndarray, np.ndarray] | None:
    """(doc_ids sorted asc, values) for segments [seg_lo, seg_hi) —
    the task-local read each shard task performs. Hive partition
    pruning keeps the scan to exactly the task's own files; pyarrow's
    default ignore_prefixes skips _SUCCESS/.crc sidecars. None when the
    range holds no rows."""
    import pyarrow.dataset as pds

    d = pds.dataset(data_path, format="parquet", partitioning="hive")
    t = d.to_table(
        columns=["doc_id", "val"],
        filter=(pds.field("seg") >= seg_lo) & (pds.field("seg") < seg_hi),
    )
    if t.num_rows == 0:
        return None
    docs = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    vals = t.column("val").to_numpy(zero_copy_only=False).astype(np.float64)
    o = np.argsort(docs, kind="stable")
    return docs[o], vals[o]

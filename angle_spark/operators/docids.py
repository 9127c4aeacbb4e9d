"""Stable dense docID assignment over (conv_id, turn_idx).

The reference resolves "which row is which" positionally inside a batch
(zip alignment, reference angle_emb/evaluation.py:44-58); Spark rows have
no stable position, so document identity must be *computed*: docID =
rank of the row under the total order (conv_id, turn_idx), dense 0..N-1.

Two implementations:

* ``assign_doc_ids`` — scale path. Range-partition by the sort key, sort
  within partitions, then a two-pass mapInPandas: pass 1 collects only
  P partition counts (P ints to the driver — never data), pass 2 adds the
  cumulative offset. No global window, no single-partition bottleneck,
  no zipWithIndex/RDD. The partitioned frame is persisted between passes
  so both see identical partition boundaries (range partitioning samples;
  at 100 TB this intermediate would be a checkpoint table instead).

* ``assign_doc_ids_window`` — semantic spec: a global row_number window.
  Single-partition (correct, unscalable); used by tests to cross-check
  the scale path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark import StorageLevel, TaskContext
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_doc_ids(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Add ``doc_id`` = dense rank over (conv_id, turn_idx). Scalable."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism

    parted = (
        df.repartitionByRange(num_partitions, "conv_id", "turn_idx")
        .sortWithinPartitions("conv_id", "turn_idx")
        .persist(StorageLevel.DISK_ONLY)  # wide text rows: disk beats
        # columnar-cache construction by a wide margin
    )

    # pass 1 stays JVM-side: count per physical partition, no Arrow transfer
    counts = {
        r["pid"]: r["count"]
        for r in parted.groupBy(
            F.spark_partition_id().alias("pid")
        ).count().collect()
    }
    offsets = {}
    acc = 0
    for pid in range(num_partitions):
        offsets[pid] = acc
        acc += counts.get(pid, 0)
    b_offsets = spark.sparkContext.broadcast(offsets)

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", doc_id long"

    def add_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        base = b_offsets.value[pid]
        seen = 0
        for b in batches:
            b = b.copy()
            b["doc_id"] = range(base + seen, base + seen + len(b))
            seen += len(b)
            yield b

    return parted.mapInPandas(add_ids, schema=out_schema)


def assign_doc_ids_window(df: DataFrame) -> DataFrame:
    """Spec implementation: global window (single partition — test-only)."""
    w = Window.orderBy("conv_id", "turn_idx")
    return df.withColumn("doc_id", F.row_number().over(w) - F.lit(1).cast("long"))

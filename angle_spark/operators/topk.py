"""Global top-k without a single-partition window.

An unpartitioned ``Window.orderBy(...).row_number() <= k`` shuffles EVERY
row to one task (Spark logs ``WindowExec: No Partition Defined``) — at
100 TB that task is the whole job. ``orderBy(...).limit(k)`` instead
compiles to ``TakeOrderedAndProject``: each partition keeps a local k-row
heap and only k rows per partition reach the merge, so the cost is
O(rows) map-side work + O(k * partitions) merge, no full shuffle.

The rank column is re-derived AFTER the limit, window-free: the k-row
result is coalesced to one partition (k rows — O(k) by construction,
unlike windowing the unbounded input), sorted within it, and ranked via
``monotonically_increasing_id`` whose low bits are the row ordinal when
partition_id == 0. That mono-id layout contract is the same one
operators/docids.py relies on and runtime-validates once per Spark
version. Plan shape is asserted in tests/test_topk.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def global_topk(
    df: DataFrame, order_cols: list[Column], k: int, rank_col: str = "rank"
) -> DataFrame:
    """df -> its top-k rows under ``order_cols`` with a 1-based ``rank``.

    Equivalent rows/values to row_number-over-global-window + filter(<=k),
    but plans as TakeOrderedAndProject (per-partition heaps) with no
    WindowExec at all."""
    top = (
        df.orderBy(*order_cols)
        .limit(k)
        .coalesce(1)
        .sortWithinPartitions(*order_cols)
    )
    # single partition => monotonically_increasing_id == row ordinal
    return top.withColumn(
        rank_col, (F.monotonically_increasing_id() + 1).cast("long")
    )

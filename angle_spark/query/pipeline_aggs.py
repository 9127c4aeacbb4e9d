"""Pipeline aggregations: second-order analytics over bucket frames —
Elasticsearch's pipeline aggregation family (cumulative_sum,
derivative, moving_fn avg, bucket_selector), Kibana's
trend-over-histogram staples.

These operate on the OUTPUT of the bucket collectors (group_matches /
the histogram shape: one row per (query, bucket) with metric columns),
so every input frame is metadata-sized (queries x buckets) and every
operator here is a bounded window partitioned by query — no corpus
plan node anywhere. Bucket ORDER is explicit: callers pass the numeric
order column (a histogram's band index, a date-histogram's epoch); a
string label column would sort '10' before '2' and silently corrupt
derivatives, so the order column must be numeric (validated).

ES gap semantics: a bucket missing from the frame is simply absent
(the collectors never emit empty buckets); derivative of the FIRST
bucket per query is NULL (no predecessor — ES emits no value there),
moving averages shrink their window at the head (ES moving_fn with
unweighted avg over the available window).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_NUMERIC = ("int", "bigint", "smallint", "tinyint", "double", "float", "decimal")


def _order_window(buckets: DataFrame, order_col: str) -> Window:
    dt = dict(buckets.dtypes).get(order_col)
    if dt is None:
        raise ValueError(f"order column {order_col!r} not in frame")
    if not dt.startswith(_NUMERIC):
        raise ValueError(
            f"order column {order_col!r} is {dt}; pipeline aggregations "
            "need a NUMERIC bucket order (a string label would sort '10' "
            "before '2') — cast the band index, not the label"
        )
    return Window.partitionBy("query_id").orderBy(F.asc(order_col))


def cumulative_sum(
    buckets: DataFrame, value_col: str, order_col: str,
    out_col: str = "cumulative",
) -> DataFrame:
    """+= running total of ``value_col`` over each query's buckets in
    ``order_col`` order (ES cumulative_sum)."""
    w = _order_window(buckets, order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return buckets.withColumn(out_col, F.sum(value_col).over(w))


def derivative(
    buckets: DataFrame, value_col: str, order_col: str,
    out_col: str = "derivative",
) -> DataFrame:
    """+= bucket-over-bucket difference (ES derivative): value - lag.
    NULL on each query's first bucket (ES emits no value there)."""
    w = _order_window(buckets, order_col)
    return buckets.withColumn(
        out_col, F.col(value_col) - F.lag(value_col, 1).over(w)
    )


def moving_avg(
    buckets: DataFrame, value_col: str, order_col: str, window: int = 3,
    out_col: str = "moving_avg",
) -> DataFrame:
    """+= trailing unweighted moving average over the last ``window``
    buckets including the current one (ES moving_fn / unweightedAvg);
    the window shrinks at each query's head."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    w = _order_window(buckets, order_col).rowsBetween(
        -(window - 1), Window.currentRow
    )
    return buckets.withColumn(out_col, F.avg(value_col).over(w))


def bucket_selector(
    buckets: DataFrame, predicate: Column | str
) -> DataFrame:
    """-= drop buckets failing the predicate (ES bucket_selector —
    'having' for aggregations). Plain filter; exists for API parity."""
    return buckets.filter(predicate)

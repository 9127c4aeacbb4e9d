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


_MOVING_FNS = {
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "sum": F.sum,
    "stddev": F.stddev_samp,
}


def moving_fn(
    buckets: DataFrame, value_col: str, order_col: str, window: int = 3,
    fn: str = "avg", out_col: str = "moving_fn",
) -> DataFrame:
    """+= trailing ``fn`` over the last ``window`` buckets including the
    current one — ES moving_fn with the MovingFunctions built-ins
    (unweightedAvg / min / max / sum / stdDev); ``fn="avg"`` IS
    moving_avg. The window shrinks at each query's head (ES behavior);
    ``stddev`` DIVERGES from ES deliberately (disclosed; r5 ADVICE):
    Spark stddev_samp is the n-1 sample form and NULL on a
    single-bucket window, while ES MovingFunctions.stdDev is the
    population form (divide by count) and returns 0.0 there. The
    entry's oracle pins the implemented (sample/NULL) semantics."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if fn not in _MOVING_FNS:
        raise ValueError(
            f"fn must be one of {sorted(_MOVING_FNS)}, got {fn!r}"
        )
    w = _order_window(buckets, order_col).rowsBetween(
        -(window - 1), Window.currentRow
    )
    return buckets.withColumn(out_col, _MOVING_FNS[fn](value_col).over(w))


def bucket_selector(
    buckets: DataFrame, predicate: Column | str
) -> DataFrame:
    """-= drop buckets failing the predicate (ES bucket_selector —
    'having' for aggregations). Plain filter; exists for API parity."""
    return buckets.filter(predicate)


def serial_diff(
    buckets: DataFrame, value_col: str, order_col: str, lag: int = 1,
    out_col: str = "serial_diff",
) -> DataFrame:
    """+= value - value[lag buckets earlier] (ES serial_diff — the
    seasonal-differencing generalization of derivative; lag=1 IS
    derivative). NULL on each query's first ``lag`` buckets (no
    predecessor — ES emits no value there)."""
    if lag < 1:
        raise ValueError(f"lag must be >= 1, got {lag}")
    w = _order_window(buckets, order_col)
    return buckets.withColumn(
        out_col, F.col(value_col) - F.lag(value_col, lag).over(w)
    )


def bucket_sort(
    buckets: DataFrame, sort_col: str, order_col: str,
    ascending: bool = False, size: int | None = None, frm: int = 0,
) -> DataFrame:
    """Sort each query's buckets by a metric and keep ranks
    (frm, frm+size] — the ES bucket_sort pipeline agg (`sort` +
    `from`/`size` over a parent agg's buckets; truncation without
    re-aggregation). Ties break on ascending ``order_col`` (the bucket
    key) so the cut is deterministic — ES leaves ties unspecified,
    which no oracle could pin. size=None keeps everything past ``frm``
    (ES's from-only form)."""
    if frm < 0:
        raise ValueError(f"frm must be >= 0, got {frm}")
    if size is not None and size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    key = F.asc(sort_col) if ascending else F.desc(sort_col)
    w = Window.partitionBy("query_id").orderBy(key, F.asc(order_col))
    out = buckets.withColumn("_bs_rank", F.row_number().over(w)).filter(
        F.col("_bs_rank") > frm
    )
    if size is not None:
        out = out.filter(F.col("_bs_rank") <= frm + size)
    return out.drop("_bs_rank")


def stats_bucket(
    buckets: DataFrame, value_col: str
) -> DataFrame:
    """-> (query_id, n_buckets, sum, min, max, avg) over each query's
    bucket metric — the ES stats_bucket sibling aggregation (its
    avg_bucket / sum_bucket / min_bucket / max_bucket siblings are
    column subsets of this one frame). Gap policy is ES's ``skip``:
    NULL metric values drop out of every stat including n_buckets
    (matching ES, which feeds only resolved values to the sibling);
    all-NULL queries emit NULL stats with n_buckets 0."""
    v = F.col(value_col).cast("double")
    return buckets.groupBy("query_id").agg(
        F.count(v).cast("long").alias("n_buckets"),
        F.sum(v).alias("sum"),
        F.min(v).alias("min"),
        F.max(v).alias("max"),
        F.avg(v).alias("avg"),
    )

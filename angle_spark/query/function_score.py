"""function_score: relevance modified by document signals — the ES
``function_score`` query (decay functions + field_value_factor,
boost_mode=multiply), Lucene's FunctionScoreQuery.

The classic use is recency/utility boosting: BM25 says how well a doc
matches, the function says how much the doc is worth independent of the
query (fresh > stale, long-enough > fragment), and the product ranks.
The reference's retrieval demo re-weights candidates with
model-assigned utilities the same way (reference README.md:119-128).

Factor construction is pure JVM column math over a (doc_id, value)
frame — the factors are a narrow O(corpus) frame computed once and
shippable to every query batch; at serving time store them as a
docvalues field (index/docvalues.py) and pass the handle for task-local
reads. Scoring rides wand_topk(sort_multiply=True): factors travel the
same shard-cogrouped side channel as sort keys (leaf = -2), multiply
BM25 shard-locally, and selection/ranks/cursors all live in the
multiplied-score space. Docs missing a factor keep BM25 unchanged
(factor 1 — the ES missing rule for score functions). Membership is
exhaustive: a factor can exceed 1, so no posting-list bound survives
the multiply (ES pays the same cost — function_score disables WAND).

Decay shapes (the ES trio, numeric fields; d = max(0, |v - origin| -
offset)):

    gauss:  exp(-d^2 / (2 sigma^2)),  sigma^2 = -scale^2 / (2 ln p)
    exp:    exp(ln(p) / scale * d)
    linear: max((s - d) / s, 0),      s = scale / (1 - p)

where p = ``decay_value`` is the factor exactly ``scale`` away from
``origin`` (ES's contract: decay(origin +- (offset + scale)) == p).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql import SparkSession

DECAYS = ("gauss", "exp", "linear")
MODIFIERS = ("none", "log1p", "sqrt", "square", "reciprocal")


def _values(values: DataFrame) -> tuple:
    v = values.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col(values.columns[1]).cast("double").alias("v"),
    ).filter(F.col("v").isNotNull())
    return v, F.col("v")


def decay_factors(
    values: DataFrame,
    decay: str = "gauss",
    origin: float = 0.0,
    scale: float = 1.0,
    offset: float = 0.0,
    decay_value: float = 0.5,
) -> DataFrame:
    """-> (doc_id, factor): the ES decay trio over a numeric
    (doc_id, value) frame. Docs absent from ``values`` (or with a NULL
    value) are simply absent — wand treats them as factor 1."""
    if decay not in DECAYS:
        raise ValueError(f"decay must be one of {DECAYS}, got {decay!r}")
    if scale <= 0:
        raise ValueError(f"scale must be > 0, got {scale!r}")
    if not 0.0 < decay_value < 1.0:
        raise ValueError(
            f"decay_value must be in (0, 1), got {decay_value!r}"
        )
    if offset < 0:
        raise ValueError(f"offset must be >= 0, got {offset!r}")
    v, col = _values(values)
    d = F.greatest(
        F.abs(col - F.lit(float(origin))) - F.lit(float(offset)), F.lit(0.0)
    )
    if decay == "gauss":
        sigma2 = -(scale * scale) / (2.0 * math.log(decay_value))
        factor = F.exp(-(d * d) / F.lit(2.0 * sigma2))
    elif decay == "exp":
        lam = math.log(decay_value) / scale
        factor = F.exp(F.lit(lam) * d)
    else:  # linear
        s = scale / (1.0 - decay_value)
        factor = F.greatest((F.lit(s) - d) / F.lit(s), F.lit(0.0))
    return v.select("doc_id", factor.alias("factor"))


def field_value_factor(
    values: DataFrame,
    factor: float = 1.0,
    modifier: str = "none",
    missing: float | None = None,
) -> DataFrame:
    """-> (doc_id, factor): the ES ``field_value_factor`` function —
    factor * modifier(value). ``missing`` only documents intent: docs
    absent from the frame always multiply by 1 in wand; pass a frame
    covering every doc (with the missing value substituted) to apply a
    different default."""
    if modifier not in MODIFIERS:
        raise ValueError(
            f"modifier must be one of {MODIFIERS}, got {modifier!r}"
        )
    v, col = _values(values)
    scaled = col * F.lit(float(factor))
    if modifier == "log1p":
        out = F.log1p(scaled)
    elif modifier == "sqrt":
        out = F.sqrt(scaled)
    elif modifier == "square":
        out = scaled * scaled
    elif modifier == "reciprocal":
        out = F.lit(1.0) / scaled
    else:
        out = scaled
    return v.select("doc_id", out.alias("factor"))


def function_score_topk(
    spark: SparkSession,
    merged: DataFrame,
    tstats: DataFrame,
    meta,
    queries: DataFrame,
    factors: DataFrame,
    **kwargs,
) -> DataFrame:
    """-> (query_id, rank, doc_id, score): BM25 * factor top-k.

    ``factors`` is a (doc_id, factor) frame (decay_factors /
    field_value_factor output, or any other per-doc multiplier) or a
    DocValues handle holding precomputed factors (task-local reads).
    Composes with every wand_topk mode and deletes / doc_filter /
    field_meta / search_after; ranks, paging and cursors live in the
    multiplied-score space."""
    from angle_spark.index.docvalues import DocValues
    from angle_spark.query.wand import wand_topk

    kwargs.pop("sort_meta", None)
    kwargs.pop("sort_multiply", None)
    kwargs.pop("sort_ascending", None)
    if not isinstance(factors, DocValues):
        factors = factors.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col(factors.columns[1]).cast("double").alias("sort_key"),
        )
    return wand_topk(
        spark, merged, tstats, meta, queries,
        sort_meta=factors, sort_multiply=True, **kwargs,
    )

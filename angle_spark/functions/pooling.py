"""Pooling strategy registry over sequence-of-vector columns.

Mirrors the reference's pooling dispatch (reference angle_emb/utils.py:58-99,
dispatch angle.py:265-314): a row carries ``states array<array<float>>``
([L, D] hidden states) and ``mask array<int>`` ([L]); pooling returns one
``array<double>`` ([D]). Strategies: 'cls' (first), 'last' (mask-aware),
'avg' (masked mean, utils.py:84-86), 'max' (masked max, utils.py:87-88),
'cls_avg' (mean of cls and avg, utils.py:73-76), integer index.

Everything is Spark higher-order functions — elementwise reductions via
aggregate(zip_with(...)) — no Python, no fixed-D codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NEG_INF = float("-1e30")


def _masked(states: Column, mask: Column) -> Column:
    """keep only positions with mask == 1."""
    return F.filter(
        F.zip_with(states, mask, lambda s, m: F.struct(s.alias("s"), m.alias("m"))),
        lambda x: x["m"] == 1,
    )


def _elementwise_sum(vecs: Column) -> Column:
    """array<array<double>> -> array<double> elementwise sum."""
    return F.aggregate(
        vecs,
        F.transform(F.element_at(vecs, 1), lambda _: F.lit(0.0)),
        lambda acc, v: F.zip_with(acc, v, lambda a, x: a + x.cast("double")),
    )


def pool_cls(states: Column, mask: Column) -> Column:
    return F.transform(F.element_at(states, 1), lambda x: x.cast("double"))


def pool_index(states: Column, mask: Column, i: int) -> Column:
    """0-based index pooling (reference int strategy, utils.py:80-83)."""
    return F.transform(F.element_at(states, i + 1), lambda x: x.cast("double"))


def pool_last(states: Column, mask: Column) -> Column:
    """last unmasked position (padding-side aware, utils.py:92-94)."""
    kept = _masked(states, mask)
    return F.transform(F.element_at(kept, -1)["s"], lambda x: x.cast("double"))


def pool_avg(states: Column, mask: Column) -> Column:
    """sum(h*mask)/sum(mask) (utils.py:84-86)."""
    kept = F.transform(_masked(states, mask), lambda x: x["s"])
    n = F.size(kept).cast("double")
    return F.transform(_elementwise_sum(kept), lambda s: s / n)


def pool_max(states: Column, mask: Column) -> Column:
    """elementwise max over unmasked positions (utils.py:87-88)."""
    kept = F.transform(_masked(states, mask), lambda x: x["s"])
    init = F.transform(F.element_at(kept, 1), lambda _: F.lit(NEG_INF))
    return F.aggregate(
        kept,
        init,
        lambda acc, v: F.zip_with(acc, v, lambda a, x: F.greatest(a, x.cast("double"))),
    )


def pool_sum(states: Column, mask: Column) -> Column:
    """elementwise sum over unmasked positions (SURVEY §2.4 A4)."""
    kept = F.transform(_masked(states, mask), lambda x: x["s"])
    return _elementwise_sum(kept)


def pool_cls_avg(states: Column, mask: Column) -> Column:
    return F.zip_with(
        pool_cls(states, mask), pool_avg(states, mask), lambda a, b: (a + b) / 2.0
    )


def l2_normalize(vec: Column) -> Column:
    """reference angle.py:1251-1252."""
    nrm = F.sqrt(
        F.aggregate(
            F.transform(vec, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    return F.transform(vec, lambda x: x.cast("double") / nrm)


def embedding_slice(vec: Column, start: int, size: int) -> Column:
    """Matryoshka/ESE prefix slice (reference angle.py:299-313); Spark
    slice() is 1-based."""
    return F.slice(vec, start + 1, size)


POOLERS = {
    "cls": pool_cls,
    "last": pool_last,
    "avg": pool_avg,
    "mean": pool_avg,
    "max": pool_max,
    "sum": pool_sum,
    "cls_avg": pool_cls_avg,
}


def get_pooling(strategy: str | int, states: Column, mask: Column) -> Column:
    """dispatch like the reference's get_pooling (utils.py:58-99)."""
    if isinstance(strategy, int):
        return pool_index(states, mask, strategy)
    if strategy not in POOLERS:
        raise NotImplementedError(f"unknown pooling strategy: {strategy!r}")
    return POOLERS[strategy](states, mask)

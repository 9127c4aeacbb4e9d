"""Scalar/array math from the reference's loss & scoring kernels, as
Spark column expressions (SURVEY.md §2.8 F9-F13, §2.4 A6).

All folds are left-to-right over the array (deterministic float64);
logsumexp uses the max-shift two-pass form for numeric stability, exactly
as the reference relies on torch.logsumexp
(reference angle_emb/loss.py:40-44,88-93).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _fsum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda a, x: a + x.cast("double"))


def softmax(arr: Column) -> Column:
    """array -> array, max-shifted (reference loss.py:19 softmax use)."""
    mx = F.array_max(arr).cast("double")
    exps = F.transform(arr, lambda x: F.exp(x.cast("double") - mx))
    total = _fsum(exps)
    return F.transform(exps, lambda e: e / total)


def log_softmax(arr: Column) -> Column:
    mx = F.array_max(arr).cast("double")
    lse = F.log(_fsum(F.transform(arr, lambda x: F.exp(x.cast("double") - mx)))) + mx
    return F.transform(arr, lambda x: x.cast("double") - lse)


def logsumexp(arr: Column) -> Column:
    """stable two-pass logsumexp (reference loss.py:44,93)."""
    mx = F.array_max(arr).cast("double")
    return F.log(_fsum(F.transform(arr, lambda x: F.exp(x.cast("double") - mx)))) + mx


def cosent_loss(scores_pos: Column, scores_neg: Column, tau: float = 20.0) -> Column:
    """CoSENT ranking loss for one row of pairwise score lists:
    log(1 + sum over (neg_i, pos_j) of exp(tau*(neg_i - pos_j)))
    (reference loss.py:23-50: logsumexp over score differences with a
    prepended 0). Arrays are per-group score lists."""
    diffs = F.flatten(
        F.transform(
            scores_neg,
            lambda n: F.transform(scores_pos, lambda p: (n.cast("double") - p.cast("double")) * tau),
        )
    )
    with_zero = F.concat(F.array(F.lit(0.0)), diffs)
    return logsumexp(with_zero)


def mse(a: Column, b: Column) -> Column:
    """mean squared error between two arrays (reference angle.py:374-382)."""
    return _fsum(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2)
    ) / F.size(a)


def kl_divergence(p: Column, q: Column) -> Column:
    """sum p*(log p - log q) (reference loss.py:8-20 distillation)."""
    return _fsum(
        F.zip_with(
            p,
            q,
            lambda x, y: F.when(
                x.cast("double") > 0,
                x.cast("double") * (F.log(x.cast("double")) - F.log(y.cast("double"))),
            ).otherwise(F.lit(0.0)),
        )
    )


def angle_pairwise(a: Column, b: Column) -> Column:
    """the angle-difference kernel from the reference's namesake loss
    (reference loss.py:62-81): treat the vector as interleaved complex
    [re | im] halves and compute the normalized modulus of the complex
    division's difference. Returns abs-difference-sum after normalized
    complex division — the scalar the loss ranks on."""
    n = F.size(a)
    half = (n / 2).cast("int")
    re1, im1 = F.slice(a, 1, half), F.slice(a, half + 1, half)
    re2, im2 = F.slice(b, 1, half), F.slice(b, half + 1, half)
    # (re1 + i*im1) / (re2 + i*im2) -> normalized by |denominator|^2
    dz = F.zip_with(re2, im2, lambda x, y: x.cast("double") ** 2 + y.cast("double") ** 2)
    re_num = F.zip_with(re1, re2, lambda x, y: x.cast("double") * y.cast("double"))
    re_num = F.zip_with(
        re_num, F.zip_with(im1, im2, lambda x, y: x.cast("double") * y.cast("double")),
        lambda x, y: x + y,
    )
    im_num = F.zip_with(im1, re2, lambda x, y: x.cast("double") * y.cast("double"))
    im_num = F.zip_with(
        im_num, F.zip_with(re1, im2, lambda x, y: x.cast("double") * y.cast("double")),
        lambda x, y: x - y,
    )
    re_div = F.zip_with(re_num, dz, lambda x, y: x / y)
    im_div = F.zip_with(im_num, dz, lambda x, y: x / y)
    return _fsum(
        F.zip_with(re_div, im_div, lambda x, y: F.sqrt(x * x + y * y))
    )

from __future__ import annotations

import numpy as np
import pytest

from angle_spark.operators.evaluate import correlation_report, paired_similarities


def _rankdata_avg(x: np.ndarray) -> np.ndarray:
    order = np.argsort(x, kind="mergesort")
    ranks = np.empty(len(x), dtype=np.float64)
    sx = x[order]
    i = 0
    r = 1
    while i < len(x):
        j = i
        while j + 1 < len(x) and sx[j + 1] == sx[i]:
            j += 1
        avg = (r + r + (j - i)) / 2.0
        ranks[order[i : j + 1]] = avg
        r += j - i + 1
        i = j + 1
    return ranks


def _pearson(a, b):
    a, b = np.asarray(a, float), np.asarray(b, float)
    return float(np.corrcoef(a, b)[0, 1])


@pytest.fixture(scope="module")
def pairs(spark):
    rng = np.random.default_rng(3)
    rows = []
    for i in range(60):
        v1 = rng.standard_normal(16)
        # label correlates with how close v2 is to v1
        alpha = rng.uniform(0, 1)
        v2 = alpha * v1 + (1 - alpha) * rng.standard_normal(16)
        rows.append(
            (i, [float(x) for x in v1], [float(x) for x in v2], float(alpha))
        )
    return spark.createDataFrame(
        rows, "pair_id long, vec1 array<float>, vec2 array<float>, label double"
    ).persist()


def test_similarities_match_numpy(spark, pairs):
    got = paired_similarities(pairs).toPandas().sort_values("pair_id")
    raw = pairs.toPandas().sort_values("pair_id")
    for _, (g, r) in enumerate(zip(got.itertuples(), raw.itertuples())):
        v1 = np.array(r.vec1, dtype=np.float64)
        v2 = np.array(r.vec2, dtype=np.float64)
        assert g.cosine == pytest.approx(
            float(v1 @ v2 / (np.linalg.norm(v1) * np.linalg.norm(v2))), rel=1e-12
        )
        assert g.dot == pytest.approx(float(v1 @ v2), rel=1e-12)
        assert g.neg_manhattan == pytest.approx(-float(np.abs(v1 - v2).sum()), rel=1e-12)
        assert g.neg_euclidean == pytest.approx(-float(np.linalg.norm(v1 - v2)), rel=1e-12)


def test_correlation_report_matches_numpy(spark, pairs):
    sims = paired_similarities(pairs)
    report = correlation_report(sims)
    pdf = sims.toPandas()
    lab = pdf["label"].to_numpy()
    for m in ("cosine", "dot", "neg_manhattan", "neg_euclidean"):
        x = pdf[m].to_numpy()
        assert report[f"pearson_{m}"] == pytest.approx(_pearson(x, lab), rel=1e-9)
        want_s = _pearson(_rankdata_avg(x), _rankdata_avg(lab))
        assert report[f"spearman_{m}"] == pytest.approx(want_s, rel=1e-9)
    # the constructed data makes every metric informative
    assert report["spearman_cosine"] > 0.3

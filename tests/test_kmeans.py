"""Distributed Lloyd k-means (operators/kmeans.py) vs a pure-Python
replay of the same deterministic protocol."""

from __future__ import annotations

import contextlib
import io

import pytest

from angle_spark.operators.kmeans import kmeans_assign, kmeans_fit

# two tight 2-D blobs + one outlier that flips sides as centroids move
VECS = [
    (0, [0.0, 0.0]),
    (1, [0.2, 0.0]),
    (2, [0.0, 0.2]),
    (3, [5.0, 5.0]),
    (4, [5.2, 5.0]),
    (5, [5.0, 5.2]),
    (6, [2.0, 2.0]),
]


def _py_kmeans(vecs, k, iters):
    ids = sorted(v for v, _ in vecs)
    cent = {i + 1: list(dict(vecs)[ids[i]]) for i in range(k)}

    def sq(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    def assign():
        out = {}
        for vid, v in vecs:
            best = min(
                ((sq(v, c), cid) for cid, c in cent.items()),
            )
            out[vid] = best[1]
        return out

    for _ in range(iters):
        a = assign()
        for cid in cent:
            members = [dict(vecs)[vid] for vid, c in a.items() if c == cid]
            if members:
                cent[cid] = [
                    sum(col) / len(members) for col in zip(*members)
                ]
    return cent, assign()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        VECS, "vec_id long, embedding array<double>"
    )


def test_fit_matches_python_replay(spark, emb):
    _, assign = kmeans_fit(emb, k=2, iters=3)
    got = {r["vec_id"]: r["cluster_id"] for r in assign.collect()}
    _, truth = _py_kmeans(VECS, 2, 3)
    assert got == truth
    # the blobs separate: 0-2 together, 3-5 together
    assert len({got[0], got[1], got[2]}) == 1
    assert len({got[3], got[4], got[5]}) == 1
    assert got[0] != got[3]


def test_assignment_tie_breaks_to_smallest_cluster(spark):
    emb = spark.createDataFrame(
        [(0, [0.0]), (1, [2.0]), (2, [1.0])],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(1, [0.0]), (2, [2.0])], "cluster_id long, centroid array<double>"
    )
    got = {r["vec_id"]: r["cluster_id"] for r in kmeans_assign(emb, cents).collect()}
    assert got == {0: 1, 1: 2, 2: 1}  # vec 2 is equidistant -> cluster 1


def test_empty_cluster_keeps_centroid(spark):
    # k=3 on data where cluster 3's seed (vec 2) is immediately captured
    # by cluster 1's centroid region after one update
    emb = spark.createDataFrame(
        [(0, [0.0]), (1, [0.1]), (2, [0.2]), (3, [9.0])],
        "vec_id long, embedding array<double>",
    )
    cents, assign = kmeans_fit(emb, k=3, iters=2)
    c = {r["cluster_id"]: r["centroid"] for r in cents.collect()}
    assert set(c) == {1, 2, 3}  # no cluster row vanished
    a = {r["vec_id"]: r["cluster_id"] for r in assign.collect()}
    assert a[3] != a[0]


def test_assign_broadcasts_centroids(spark, emb):
    cents, _ = kmeans_fit(emb, k=2, iters=1)
    plan = io.StringIO()
    with contextlib.redirect_stdout(plan):
        kmeans_assign(emb, cents).explain("formatted")
    text = plan.getvalue()
    assert "BroadcastNestedLoopJoin" in text or "BroadcastHashJoin" in text
    assert "SortMergeJoin" not in text


def test_assign_never_shuffles_the_corpus(spark, emb):
    """The round-4 scale-killer: the old Window.partitionBy(vec_id)
    argmin re-shuffled the full embedding column once per Lloyd
    iteration. The rowwise array_min rendition must produce a plan
    with NO Exchange keyed on vec_id and NO Window at all — only the
    1-row centroid-array broadcast reaches the corpus scan."""
    cents, _ = kmeans_fit(emb, k=2, iters=1)
    df = kmeans_assign(emb, cents)
    plan = io.StringIO()
    with contextlib.redirect_stdout(plan):
        df.explain("formatted")
    df.collect()  # materialize so the executed plan below is final
    text = plan.getvalue()
    executed = df._jdf.queryExecution().executedPlan().toString()
    for t in (text, executed):
        assert "Exchange hashpartitioning(vec_id" not in t
        assert "Window" not in t

"""Distributed Lloyd k-means over an embedding column — the topic-
clustering / corpus-partitioning step of an LLM training-data pipeline
(and the principled trainer for an IVF coarse quantizer, cf.
operators/ann.py ivf_topk whose demo quantizer is anchor-seeded).

The reference's embeddings are exactly this operator's input: AnglE
encodes text to vectors whose cosine/L2 geometry carries semantics
(reference README.md:119-128); clustering them groups near-duplicate
topics, balances training mixtures, and seeds ANN partitions.

Everything is deterministic so a SQL oracle can replay it exactly:
init = the embeddings of the k smallest vec_ids, assignment ties break
toward the smallest cluster id, updates are the plain member mean, and
an emptied cluster keeps its previous centroid.

Scale shape (100 TB corpus, k in the thousands):
- each iteration is ONE corpus scan with ZERO corpus shuffle: the k
  centroids ride in as ONE broadcast data row holding
  array<struct<sqdist-slot, cluster_id>> (the operators/ann.py
  hyperplane pattern), the nearest-centroid argmin is a rowwise
  ``array_min`` fold over that array inside the scan's projection —
  no join on vec_id, no Window, no Exchange of the embedding column.
  The member mean leaves the scan as (cluster, dim, partial-avg)
  cells — the only shuffle is k · dim cells per partition (map-side
  partial agg).
- iterations run driver-side as a short loop over small plans;
  centroids live in a k-row DataFrame materialized between iterations
  (k · dim values — bounded, not corpus).

Determinism note (floating point): the argmin itself is exactly
deterministic (sequential zip_with/aggregate fold per centroid, ties
broken toward the smallest cluster_id by the struct comparison), but
the member MEAN uses ``F.avg`` over doubles, whose partition fold
order Spark does not fix — centroids can differ from a serial replay
at ULP level, and a vector sitting within ~1 ULP of two centroids
could flip assignment between runs. Consumers that compare against a
serial oracle must therefore compare on rounded distances (the
kmeans_clusters entry ranks on round(sqdist, 6)); we deliberately do
NOT sort-fold the mean — a sorted collect per (cluster, dim) cell
materializes every member value in one list, which is exactly the
corpus-sized state this operator exists to avoid at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sqdist(a, b):
    """squared L2 between two array<double> columns — sequential fold,
    same order as the DuckDB oracle's list reduction."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _nearest(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, v, cluster_id, sqdist): nearest centroid per vector,
    carrying the vector through so consumers never re-join the corpus.

    ZERO corpus shuffle: the k centroids collapse into ONE data row
    (array<struct<cluster_id, c>>, sorted by cluster_id) that is
    broadcast into the corpus scan; the argmin is a rowwise
    ``array_min`` over per-centroid (sqdist, cluster_id) structs —
    struct ordering compares sqdist first, then cluster_id, so ties
    break toward the smallest cluster_id exactly like the previous
    Window rendition (asserted against the serial replay in
    tests/test_kmeans.py). No join key, no Window, no Exchange of the
    embedding column — the plan is BroadcastNestedLoopJoin of a 1-row
    side, constant-size regardless of k x dim."""
    e = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    cents = centroids.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("cluster_id").cast("long").alias("cluster_id"),
                    F.transform(
                        "centroid", lambda x: x.cast("double")
                    ).alias("c"),
                )
            )
        ).alias("cents")
    )
    best = F.array_min(
        F.transform(
            "cents",
            lambda s: F.struct(
                _sqdist(F.col("v"), s.getField("c")).alias("sqdist"),
                s.getField("cluster_id").alias("cluster_id"),
            ),
        )
    )
    return (
        e.join(F.broadcast(cents))
        .withColumn("_best", best)
        .select(
            "vec_id",
            "v",
            F.col("_best.cluster_id").alias("cluster_id"),
            F.col("_best.sqdist").alias("sqdist"),
        )
    )


def kmeans_assign(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, cluster_id, sqdist): nearest centroid per vector."""
    return _nearest(emb, centroids).select("vec_id", "cluster_id", "sqdist")


def _update_centroids(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """one fused assign+update pass: argmin against the broadcast
    centroids, then member-mean per cluster; an emptied cluster keeps
    its previous centroid. The mean runs as posexplode ->
    groupBy(cluster, dim) avg (map-side partial agg; the shuffle is
    k x dim cells, never corpus-sized) -> re-assembled in dim order."""
    dims = _nearest(emb, centroids).select(
        "cluster_id", F.posexplode("v").alias("dim", "val")
    )
    means = (
        dims.groupBy("cluster_id", "dim")
        .agg(F.avg("val").alias("m"))
        .groupBy("cluster_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("dim"), F.col("m")))
                ),
                lambda s: s.getField("m"),
            ).alias("centroid")
        )
    )
    # left join against the incoming centroids: empty clusters survive
    return centroids.select("cluster_id", F.col("centroid").alias("prev")).join(
        means, "cluster_id", "left"
    ).select(
        "cluster_id", F.coalesce("centroid", "prev").alias("centroid")
    )


def kmeans_fit(
    emb: DataFrame, k: int, iters: int
) -> tuple[DataFrame, DataFrame]:
    """Run ``iters`` Lloyd iterations -> (centroids, assignment).

    Deterministic: init = embeddings of the k smallest vec_ids. Each
    iteration materializes the k-row centroid frame (localCheckpoint —
    the plan would otherwise double per iteration and the blocks are
    ContextCleaner-freed, nothing persists in the catalog cache). The
    returned assignment is the nearest-centroid map under the FINAL
    centroids — one extra scan, the convention k-means consumers
    (IVF, partition routing) expect."""
    # init centroids live driver-side by design — k rows of k·dim
    # doubles that get broadcast every iteration anyway; collecting them
    # here (TakeOrderedAndProject, no unpartitioned window) keeps every
    # plan in this module free of single-partition WindowExec stages
    seed_rows = (
        emb.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
        .orderBy(F.asc("vec_id"))
        .limit(k)
        .collect()
    )
    centroids = emb.sparkSession.createDataFrame(
        [(i + 1, list(r["v"])) for i, r in enumerate(seed_rows)],
        "cluster_id long, centroid array<double>",
    ).localCheckpoint()
    for _ in range(iters):
        centroids = _update_centroids(emb, centroids).localCheckpoint()
    return centroids, kmeans_assign(emb, centroids)

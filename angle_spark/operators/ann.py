"""Approximate nearest neighbor search over embedding columns.

The reference's retrieval is exact dense cosine over all docs
(reference README.md:119-128, docs/notes/tutorial.rst:239-271). At 100 TB
the all-pairs product is impossible, so:

  brute_force_topk   exact baseline: broadcast query vectors, JVM-side
                     zip_with/aggregate dot products, window top-k
  rhp_signatures     random-hyperplane LSH signature (sign bits of dot
                     with H fixed hyperplanes) — deterministic seeded
                     hyperplanes, pure column arithmetic
  lsh_topk           bucket-join candidates on signature bands, exact
                     cosine rescore within candidates, per-query top-k.
                     Recall < 1 by construction; shadow-tested against
                     brute force for recall >= threshold in tests.
  ivf_topk           IVF-flat: corpus partitioned into cells by nearest
                     coarse-quantizer centroid; queries probe the nprobe
                     nearest cells, exact cosine rescore inside. The
                     second of the two classic ANN scale paths (inverted
                     file vs hashing) — both are provided.

All vector math stays in Spark SQL higher-order functions (zip_with /
aggregate / transform) — no Python in the per-row path.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 16
BAND_BITS = 4  # 4 bands x 4 bits


def _hyperplanes(dim: int, n_planes: int = N_PLANES, seed: int = 1234) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def brute_force_topk(
    emb: DataFrame, queries: DataFrame, k: int = 10
) -> DataFrame:
    """queries(query_id, qvec array<float>) x emb(vec_id, embedding) ->
    (query_id, rank, vec_id, cosine). Exact; query side broadcast."""
    q = queries.select(
        "query_id",
        F.transform("qvec", lambda x: x.cast("double")).alias("qv"),
    ).withColumn("qn", _norm(F.col("qv")))
    e = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).withColumn("vn", _norm(F.col("v")))
    scored = e.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        (_dot(F.col("v"), F.col("qv")) / (F.col("vn") * F.col("qn"))).alias("cos_raw"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.col("cos_raw").alias("cosine"))
    )


def with_rhp_signature(
    df: DataFrame,
    vec_col: str,
    planes: np.ndarray,
    band_bits: int = BAND_BITS,
    out: str = "sig",
) -> DataFrame:
    """Attach the banded sign-bit signature as column ``out``.

    The hyperplanes ride in as ONE broadcast data row (array<array<
    double>>) folded with higher-order functions — a constant-size
    expression tree regardless of n_planes x dim. The literal-array
    rendition below (rhp_signature_col) inlines n_planes * dim literals
    into the plan; at 24x64 that is ~1.5k constants whose analysis +
    codegen cost dominated the whole ANN bench leg at small scale and
    is pure waste at any scale. Arithmetic is IDENTICAL (same
    sequential zip_with/aggregate fold over the same doubles), so
    signatures — and therefore buckets, candidates and the oracle-
    checked results — are bit-identical between the two renditions
    (asserted in tests/test_ann.py).

    _bits is materialized in its own projection so the 12 band folds
    reference one computed array; CollapseProject keeps multiply-
    referenced non-cheap expressions out of line, so the 24 dot
    products run once per row, not once per band."""
    spark = df.sparkSession
    n_planes = planes.shape[0]
    n_bands = n_planes // band_bits
    pdf = spark.createDataFrame(
        [([[float(x) for x in row] for row in planes],)],
        "planes array<array<double>>",
    )
    with_bits = df.crossJoin(F.broadcast(pdf)).withColumn(
        "_bits",
        F.transform(
            "planes", lambda p: (_dot(F.col(vec_col), p) > F.lit(0.0)).cast("int")
        ),
    )
    bands = F.array(
        *[
            F.aggregate(
                F.slice("_bits", band * band_bits + 1, band_bits),
                F.lit(0),
                lambda acc, x: acc * 2 + x,
            )
            for band in range(n_bands)
        ]
    )
    return with_bits.withColumn(out, bands).drop("_bits", "planes")


def rhp_signature_col(vec: Column, planes: np.ndarray, band_bits: int = BAND_BITS) -> Column:
    """sign-bit signature of a vector column against fixed hyperplanes,
    as one integer per band (band_bits bits each). Literal-array
    rendition — kept as the reference implementation the broadcast-
    planes rendition (with_rhp_signature) is equivalence-tested
    against; production paths use with_rhp_signature."""
    bands = []
    n_bands = planes.shape[0] // band_bits
    for band in range(n_bands):
        acc = F.lit(0)
        for j in range(band_bits):
            p = planes[band * band_bits + j]
            plane_lit = F.array(*[F.lit(float(x)) for x in p])
            bit = (_dot(vec, plane_lit) > 0).cast("int")
            acc = acc * 2 + bit
        bands.append(acc.alias(f"band_{band}"))
    return F.array(*bands)


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    seed: int = 1234,
    n_planes: int = N_PLANES,
    band_bits: int = BAND_BITS,
) -> DataFrame:
    """Banded random-hyperplane LSH: candidates = vectors sharing at least
    one band value with the query; exact cosine rescore of candidates.

    Scale shape: signatures are computed in one pass over the corpus
    (write-once at ingest in a real pipeline), the candidate join is an
    equi-join on (band_idx, band_val) — no cross product, no shuffle of
    the full corpus per query.

    n_planes/band_bits tune the recall/candidate-count tradeoff: more
    bands (n_planes/band_bits) raise recall; more bits per band shrink
    buckets. The driver-contract entry uses 24 planes x 2-bit bands (12
    bands) — random gaussian sf embeddings (no planted near-dup
    structure) need that many bands to clear the recall >= 0.9 gate in
    tests/test_ann.py (a 16x4 config measured recall 0.26 there)."""
    planes = _hyperplanes(dim, n_planes=n_planes, seed=seed)
    e = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    e_sig = with_rhp_signature(e, "v", planes, band_bits).select(
        "vec_id", "v", F.posexplode("sig").alias("band_idx", "band_val")
    )
    q = queries.select(
        "query_id",
        F.transform("qvec", lambda x: x.cast("double")).alias("qv"),
    )
    q_sig = with_rhp_signature(q, "qv", planes, band_bits).select(
        "query_id", "qv", F.posexplode("sig").alias("band_idx", "band_val")
    )
    cand = (
        e_sig.join(F.broadcast(q_sig), ["band_idx", "band_val"])
        .select("query_id", "qv", "vec_id", "v")
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cand.select(
        "query_id",
        "vec_id",
        (_dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv")))).alias(
            "cos_raw"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.col("cos_raw").alias("cosine"))
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    n_cells: int = 16,
    nprobe: int = 4,
    k: int = 10,
) -> DataFrame:
    """IVF-flat ANN: inverted-file cells + exact rescore of probed cells.

    Coarse quantizer: the n_cells corpus vectors with the SMALLEST vec_ids
    (deterministic, data-dependent, and — unlike trained Lloyd centroids —
    exactly replicable by the SQL oracle, so the driver hash verifies the
    IVF algorithm itself). A production build would run a few Lloyd
    iterations to improve the quantizer; only the centroid table changes,
    every downstream shape below stays identical. Cells are keyed by the
    centroid's vec_id (no dense re-numbering -> no unpartitioned window).

    Scale shape: assignment is a broadcast of the tiny centroid table
    against the corpus (one pass, write-once at ingest in a real
    pipeline — the classic IVF build); the probe side broadcasts
    |queries| * nprobe rows into the cell equi-join, so per-query work is
    the probed cells' vectors only, never the corpus. Nearest-centroid
    uses squared-L2 reduced to (c.c - 2 v.c) — the v.v term is constant
    per vector and cannot change the argmin; ties break on ascending
    cell id.

    Recall < 1 by construction (tested vs brute force); raising nprobe
    trades candidate volume for recall."""
    e = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    cents = (
        e.orderBy("vec_id")
        .limit(n_cells)  # TakeOrderedAndProject, not a sort
        .select(F.col("vec_id").alias("cell"), F.col("v").alias("cv"))
        .withColumn("cc", _dot(F.col("cv"), F.col("cv")))
    )
    # nearest-cell assignment with ZERO corpus shuffle (the
    # operators/kmeans.py round-5 pattern): the cell table collapses to
    # ONE broadcast row of array<struct>, the argmin is a rowwise
    # array_min over (dist2p, cell) structs — struct comparison gives
    # exactly the (distance ASC, cell ASC) tie order the old
    # Window.partitionBy(vec_id) rendition produced, without its
    # per-build corpus-sized Exchange
    cents1 = cents.agg(
        F.array_sort(
            F.collect_list(F.struct("cell", "cv", "cc"))
        ).alias("cents")
    )
    best = F.array_min(
        F.transform(
            "cents",
            lambda s: F.struct(
                (
                    s.getField("cc") - 2.0 * _dot(F.col("v"), s.getField("cv"))
                ).alias("dist2p"),
                s.getField("cell").alias("cell"),
            ),
        )
    )
    assign = (
        e.join(F.broadcast(cents1))
        .withColumn("_best", best)
        .select("vec_id", "v", F.col("_best.cell").alias("cell"))
    )
    q = queries.select(
        "query_id",
        F.transform("qvec", lambda x: x.cast("double")).alias("qv"),
    )
    qdist = F.col("cc") - 2.0 * _dot(F.col("qv"), F.col("cv"))
    wq = Window.partitionBy("query_id").orderBy("dist2p", "cell")
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select("query_id", "qv", "cell", qdist.alias("dist2p"))
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "qv", "cell")
    )
    cand = assign.join(F.broadcast(probes), "cell")
    scored = cand.select(
        "query_id",
        "vec_id",
        (_dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv")))).alias(
            "cos_raw"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.col("cos_raw").alias("cosine"))
    )


def recall_at_k(approx: DataFrame, exact: DataFrame, k: int = 10) -> float:
    """fraction of exact top-k ids recovered by the approximate result."""
    a = approx.filter(F.col("rank") <= k).select("query_id", "vec_id")
    b = exact.filter(F.col("rank") <= k).select("query_id", "vec_id")
    hit = a.join(b, ["query_id", "vec_id"]).count()
    total = b.count()
    return hit / total if total else 1.0

"""Deduplication operators for training-data pipelines.

The reference dedups per-batch by hashing tokenized texts
(reference angle_emb/angle.py:216-227); at 100 TB dedup must be global and
come in several strengths. All are pure DataFrame compositions (JVM-side)
so Catalyst handles pushdown/pruning; nothing here needs a UDF.

Portability contract: every hash used by an oracle-checked operator is the
first 8 hex chars of md5 (exists in both Spark and DuckDB, identical
results) — xxhash64/murmur are engine-specific and would fork the oracle.

Operators:
  exact_dedup          hash-groupBy on full text
  shingles             w-gram word shingles via posexplode + window
  minhash_signatures   k portable hash fns, min per (doc, hash)
  lsh_candidate_pairs  banded LSH -> candidate pairs + estimated Jaccard
  ngram_jaccard_pairs  exact Jaccard over shingle sets (self-join)
  simhash              tf-weighted bitwise fingerprint (32-bit)
  simhash_near_pairs   pairs within a Hamming radius (pigeonhole bit-chunk
                       buckets + exact rescore; cross-join shadow kept
                       test-only as simhash_near_pairs_exhaustive)
  embedding_topk_pairs brute-force cosine top-k pairs (near-dup by vector;
                       disclosed O(N^2) exact baseline)
  embedding_near_pairs_lsh  banded RHP-LSH self-join + exact rescore —
                       the scale path for vector near-dup pairs
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# fixed MinHash family: h_k(x) = (A[k]*x + B[k]) % P  (all < 2**20 so the
# int64 product never overflows in either engine)
P = 2_147_483_647
N_HASHES = 16
BAND_ROWS = 2  # 8 bands x 2 rows
A = [634_211 + 9_176 * k for k in range(N_HASHES)]
B_COEF = [401_933 + 7_919 * k for k in range(N_HASHES)]
SIMHASH_BITS = 32
SHINGLE_W = 3


def portable_hash32(col: Column) -> Column:
    """First 8 md5 hex chars as int64 — identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def duckdb_hash32(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT"


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per identical text; global exact dedup."""
    w = Window.partitionBy(text_col).orderBy(id_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def shingles(docs_tokens: DataFrame, w: int = SHINGLE_W) -> DataFrame:
    """(doc_id, tokens) -> (doc_id, shingle) distinct w-gram shingles.

    posexplode + lead windows (partitioned by doc — parallel, unskewed)."""
    toks = docs_tokens.select("doc_id", F.posexplode("tokens").alias("pos", "term"))
    win = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("term")] + [F.lead("term", i).over(win) for i in range(1, w)]
    return (
        toks.select("doc_id", F.concat_ws(" ", *parts).alias("shingle"),
                    F.lead("term", w - 1).over(win).alias("_last"))
        .filter(F.col("_last").isNotNull())
        .select("doc_id", "shingle")
        .distinct()
    )


def minhash_signatures(sh: DataFrame) -> DataFrame:
    """(doc_id, shingle) -> (doc_id, k, mh) — k in [0, N_HASHES)."""
    hashed = sh.select("doc_id", portable_hash32(F.col("shingle")).alias("h"))
    # single pass: explode a literal hash-family array (no N scans)
    fam = F.array(
        *[F.struct(F.lit(k).alias("k"), F.lit(A[k]).alias("a"), F.lit(B_COEF[k]).alias("b"))
          for k in range(N_HASHES)]
    )
    expanded = hashed.select(
        "doc_id", "h", F.explode(fam).alias("f")
    ).select(
        "doc_id",
        F.col("f.k").alias("k"),
        ((F.col("h") * F.col("f.a") + F.col("f.b")) % F.lit(P)).alias("hk"),
    )
    return expanded.groupBy("doc_id", "k").agg(F.min("hk").alias("mh"))


def lsh_candidate_pairs(sig: DataFrame) -> DataFrame:
    """signatures -> (doc1, doc2, est_jaccard) via banded LSH.

    Bucket join replaces the all-pairs cross product: only docs agreeing
    on a full band meet. Scale: the bucket groupBy is keyed on
    (band, b0, b1) — fine-grained; a pathological bucket (thousands of
    identical docs) would square, which is the expected cost of true
    mass-duplication and is bounded by upstream exact_dedup."""
    bands = sig.groupBy("doc_id", (F.col("k") / F.lit(BAND_ROWS)).cast("int").alias("band")).agg(
        F.min(F.when(F.col("k") % 2 == 0, F.col("mh"))).alias("b0"),
        F.min(F.when(F.col("k") % 2 == 1, F.col("mh"))).alias("b1"),
    )
    left = bands.select(
        F.col("doc_id").alias("doc1"), "band", "b0", "b1"
    )
    right = bands.select(F.col("doc_id").alias("doc2"), "band", "b0", "b1")
    cand = (
        left.join(right, ["band", "b0", "b1"])
        .filter(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2")
        .distinct()
    )
    s1 = sig.select(F.col("doc_id").alias("doc1"), "k", F.col("mh").alias("mh1"))
    s2 = sig.select(F.col("doc_id").alias("doc2"), "k", F.col("mh").alias("mh2"))
    return (
        cand.join(s1, "doc1")
        .join(s2, ["doc2", "k"])
        .groupBy("doc1", "doc2")
        .agg(
            (F.sum((F.col("mh1") == F.col("mh2")).cast("int")) / F.lit(float(N_HASHES))).alias(
                "est_jaccard"
            )
        )
    )


def ngram_jaccard_pairs(sh: DataFrame, threshold: float = 0.8) -> DataFrame:
    """exact Jaccard over shingle sets for pairs sharing >=1 shingle."""
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("doc1"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc2"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc1") < F.col("doc2"))
        .groupBy("doc1", "doc2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    n1 = sizes.select(F.col("doc_id").alias("doc1"), F.col("n").alias("n1"))
    n2 = sizes.select(F.col("doc_id").alias("doc2"), F.col("n").alias("n2"))
    return (
        inter.join(n1, "doc1")
        .join(n2, "doc2")
        .select(
            "doc1",
            "doc2",
            (
                F.col("inter")
                / (F.col("n1") + F.col("n2") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(docs_tokens: DataFrame) -> DataFrame:
    """(doc_id, tokens) -> (doc_id, simhash) — 32-bit tf-weighted."""
    tf = (
        docs_tokens.select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("h", portable_hash32(F.col("term")))
    )
    bits = F.array(*[F.lit(i) for i in range(SIMHASH_BITS)])
    exploded = tf.select(
        "doc_id", "tf", "h", F.explode(bits).alias("bit")
    ).select(
        "doc_id",
        "bit",
        F.when(
            F.expr("shiftright(h, bit) & 1") == 1,
            F.col("tf"),
        )
        .otherwise(-F.col("tf"))
        .alias("w"),
    )
    return (
        exploded.groupBy("doc_id", "bit")
        .agg(F.sum("w").alias("s"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(
                    F.col("s") > 0, F.expr("shiftleft(cast(1 as bigint), bit)")
                ).otherwise(F.lit(0).cast("long"))
            ).alias("simhash")
        )
    )


def simhash_near_pairs(sh: DataFrame, max_hamming: int = 3) -> DataFrame:
    """pairs of docs within Hamming radius — BUCKETED, no cross product.

    Pigeonhole: split the SIMHASH_BITS fingerprint into
    ``max_hamming + 1`` contiguous bit-chunks; two fingerprints within
    Hamming distance r <= max_hamming differ in at most r chunks, so they
    agree EXACTLY on at least one chunk. Candidates = equi-join on
    (chunk_idx, chunk_val) — same shuffle-once shape as the MinHash band
    join — then an exact bit_count rescore keeps true near-pairs. The
    candidate set is a provable superset, so results are identical to the
    exhaustive cross join (shadow-asserted in tests/test_text_stats.py).

    Scale: per-chunk buckets have 2^(bits/(r+1)) values (8 bits here at
    r=3); a degenerate bucket (mass duplication) squares, which is the
    expected cost of true duplicates — same disclosure as
    lsh_candidate_pairs."""
    n_chunks = max_hamming + 1
    width = -(-SIMHASH_BITS // n_chunks)  # ceil
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("ci"),
                F.shiftright("simhash", i * width)
                .bitwiseAND(F.lit((1 << min(width, SIMHASH_BITS - i * width)) - 1))
                .alias("cv"),
            )
            for i in range(n_chunks)
        ]
    )
    keyed = sh.select("doc_id", "simhash", F.explode(chunks).alias("c")).select(
        "doc_id", "simhash", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv")
    )
    a = keyed.select(
        F.col("doc_id").alias("doc1"), F.col("simhash").alias("h1"), "ci", "cv"
    )
    b = keyed.select(
        F.col("doc_id").alias("doc2"), F.col("simhash").alias("h2"), "ci", "cv"
    )
    return (
        a.join(b, ["ci", "cv"])
        .filter(F.col("doc1") < F.col("doc2"))
        .select(
            "doc1",
            "doc2",
            F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()  # a pair may agree on several chunks
    )


def simhash_near_pairs_exhaustive(sh: DataFrame, max_hamming: int = 3) -> DataFrame:
    """cross-join shadow of simhash_near_pairs — O(N^2), test-only: the
    bucketed path must equal this on any corpus."""
    a = sh.select(F.col("doc_id").alias("doc1"), F.col("simhash").alias("h1"))
    b = sh.select(F.col("doc_id").alias("doc2"), F.col("simhash").alias("h2"))
    return (
        a.crossJoin(b)
        .filter(F.col("doc1") < F.col("doc2"))
        .select(
            "doc1",
            "doc2",
            F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_near_pairs_lsh(
    emb: DataFrame,
    threshold: float = 0.4,
    n_planes: int = 24,
    band_bits: int = 2,
    seed: int = 1234,
    dim: int | None = None,
) -> DataFrame:
    """embedding near-duplicate PAIRS via banded RHP-LSH self-join — the
    scale path for vector dedup (the exact complement of
    ``embedding_topk_pairs``, which stays the disclosed O(N^2) baseline).

    Shape: one signature pass over the corpus, self-equi-join on
    (band_idx, band_val) — pairs meet only in shared sign-buckets, never
    an all-pairs product — then exact cosine rescore >= threshold.
    Approximate: a pair missing every shared band is not produced
    (recall rises with the number of bands; with real near-duplicate
    structure, high-cosine pairs share sign bits w.h.p.).

    -> (id1, id2, cosine)."""
    from angle_spark.operators.ann import (
        _dot,
        _hyperplanes,
        _norm,
        with_rhp_signature,
    )

    if dim is None:
        # derive from the data; MIXED lengths would silently truncate/null
        # band dot products (zip_with pads with nulls) — fail loudly
        # instead (round-3 ADVICE)
        lo, hi = (
            emb.agg(
                F.min(F.size("embedding")), F.max(F.size("embedding"))
            ).first()
            or (None, None)
        )
        if lo is None:
            dim = 0
        elif lo != hi:
            raise ValueError(
                f"embedding lengths vary ({lo}..{hi}); pass dim= explicitly "
                "after normalizing the column"
            )
        else:
            dim = int(lo)
    planes = _hyperplanes(dim, n_planes=n_planes, seed=seed)
    v = with_rhp_signature(
        emb.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        ),
        "v",
        planes,
        band_bits,
    )
    keyed = v.select(
        "vec_id", "v", F.posexplode("sig").alias("band_idx", "band_val")
    )
    a = keyed.select(
        F.col("vec_id").alias("id1"), F.col("v").alias("v1"), "band_idx", "band_val"
    )
    b = keyed.select(
        F.col("vec_id").alias("id2"), F.col("v").alias("v2"), "band_idx", "band_val"
    )
    cand = (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("id1") < F.col("id2"))
        .dropDuplicates(["id1", "id2"])
    )
    cos = _dot(F.col("v1"), F.col("v2")) / (_norm(F.col("v1")) * _norm(F.col("v2")))
    return (
        cand.select("id1", "id2", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def embedding_topk_pairs(emb: DataFrame, k: int = 20) -> DataFrame:
    """brute-force cosine top-k pairs over (vec_id, embedding array<float>).

    The all-pairs cross join is the correctness baseline; the scale path is
    angle_spark.operators.ann (LSH-bucketed). Dot products stay JVM-side
    via zip_with + aggregate in float64."""
    v = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).withColumn(
        "nrm",
        F.sqrt(F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x)),
    )
    a = v.select(F.col("vec_id").alias("id1"), F.col("v").alias("v1"), F.col("nrm").alias("n1"))
    b = v.select(F.col("vec_id").alias("id2"), F.col("v").alias("v2"), F.col("nrm").alias("n2"))
    dot = F.aggregate(F.zip_with("v1", "v2", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    pairs = (
        a.crossJoin(b)
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", (dot / (F.col("n1") * F.col("n2"))).alias("cos_raw"))
    )
    from angle_spark.operators.topk import global_topk

    # top-k via orderBy+limit (TakeOrderedAndProject), not an unpartitioned
    # window — the N^2 pair stream reduces to per-partition k-row heaps
    return global_topk(
        pairs, [F.desc("cos_raw"), F.asc("id1"), F.asc("id2")], k
    ).select("rank", "id1", "id2", F.round("cos_raw", 6).alias("cosine"))


def ngram_contamination(
    corpus_sh: DataFrame,
    probe_sh: DataFrame,
    min_shared: int = 1,
) -> DataFrame:
    """-> (probe_id, doc_id, shared_ngrams, probe_ngrams, overlap):
    benchmark DECONTAMINATION — which training documents share >=
    ``min_shared`` w-gram shingles with any probe (eval/benchmark)
    document. The standard n-gram-overlap contamination check every
    serious LLM training pipeline runs before training (the reference's
    eval sets would silently leak into its training corpora without it
    — its golden gate assumes clean splits, reference
    tests/test_eval.py:4-20).

    Inputs are SHINGLE frames (build with ``shingles()``, same w on
    both sides — the shared analyzer contract): ``corpus_sh`` =
    (doc_id, shingle) over the training corpus, ``probe_sh`` =
    (probe_id renamed doc_id, shingle) over the benchmark. ``overlap``
    = shared / probe's own shingle count — 1.0 means the probe is
    fully contained.

    Scale shape (100 TB corpus x small benchmark): one equi-join on the
    shingle key — the probe side is benchmark-sized, so Spark
    broadcasts it into the corpus shingle scan (AQE picks the strategy;
    at equal scales it degrades to a shuffle join on the same key);
    group by the candidate pair (bounded by true overlaps, never the
    cross product). No UDFs, no driver collects."""
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    probe = probe_sh.select(
        F.col("doc_id").alias("probe_id"), "shingle"
    )
    probe_sizes = probe.groupBy("probe_id").agg(
        F.count(F.lit(1)).alias("probe_ngrams")
    )
    shared = (
        corpus_sh.join(probe, "shingle")
        .groupBy("probe_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
        .filter(F.col("shared_ngrams") >= min_shared)
    )
    return shared.join(F.broadcast(probe_sizes), "probe_id").select(
        "probe_id",
        "doc_id",
        "shared_ngrams",
        "probe_ngrams",
        (F.col("shared_ngrams") / F.col("probe_ngrams")).alias("overlap"),
    )

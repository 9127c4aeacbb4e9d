"""Dedup-operator shape + equivalence tests.

The bucketed simhash_near_pairs (pigeonhole chunk equi-join, round-3
VERDICT task 3) must (a) plan WITHOUT a cartesian product and (b) return
exactly the exhaustive cross join's pairs on a real corpus.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from angle_spark.index.stats import with_tokens
from angle_spark.operators.dedup import (
    simhash,
    simhash_near_pairs,
    simhash_near_pairs_exhaustive,
)

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _docs_tokens(spark):
    return (
        with_tokens(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
        .select("doc_id", "tokens")
    )


def test_bucketed_equals_exhaustive(spark):
    sh = simhash(_docs_tokens(spark)).persist()
    try:
        for r in (0, 3, 6):
            got = sorted(map(tuple, simhash_near_pairs(sh, max_hamming=r).collect()))
            want = sorted(
                map(tuple, simhash_near_pairs_exhaustive(sh, max_hamming=r).collect())
            )
            assert got == want, f"max_hamming={r}: bucketed != exhaustive"
        assert len(got) > 0  # r=6 must actually find pairs on this corpus
    finally:
        sh.unpersist()


def test_bucketed_plan_has_no_cartesian(spark):
    sh = simhash(_docs_tokens(spark))
    plan = _plan(simhash_near_pairs(sh, max_hamming=3))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the shadow IS the cartesian baseline
    shadow = _plan(simhash_near_pairs_exhaustive(sh, max_hamming=3))
    assert "CartesianProduct" in shadow or "BroadcastNestedLoopJoin" in shadow


def test_embedding_near_pairs_lsh_subset_and_recall(spark):
    """LSH pairs = subset of the exact >=threshold pairs (rescore is
    exact, so no false positives); 12 two-bit bands keep recall high
    even at cosine 0.4 (per-band match ~0.4 -> miss prob 0.6^12)."""
    from pyspark.sql import functions as F

    from angle_spark.operators.dedup import embedding_near_pairs_lsh

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    t = 0.4
    got = {
        (r["id1"], r["id2"])
        for r in embedding_near_pairs_lsh(
            emb, threshold=t, n_planes=24, band_bits=2
        ).collect()
    }
    v = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    a = v.select(F.col("vec_id").alias("id1"), F.col("v").alias("v1"))
    b = v.select(F.col("vec_id").alias("id2"), F.col("v").alias("v2"))
    dot = F.aggregate(
        F.zip_with("v1", "v2", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    n1 = F.sqrt(F.aggregate(F.transform("v1", lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    n2 = F.sqrt(F.aggregate(F.transform("v2", lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    exact = {
        (r["id1"], r["id2"])
        for r in a.crossJoin(b)
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", (dot / (n1 * n2)).alias("c"))
        .filter(F.col("c") >= t)
        .collect()
    }
    assert got <= exact  # exact rescore -> no false positives
    assert exact and len(got) / len(exact) >= 0.9


def test_near_pairs_sane(spark):
    """near-pairs at a tight radius are a tiny fraction of all pairs on a
    mostly-distinct corpus (the whole point of bucketing), and hamming is
    within the radius with doc1 < doc2."""
    docs = _docs_tokens(spark)
    n = docs.count()
    sh = simhash(docs)
    rows = simhash_near_pairs(sh, max_hamming=3).collect()
    assert 0 < len(rows) < (n * (n - 1) // 2) * 0.25
    assert all(r["doc1"] < r["doc2"] and r["hamming"] <= 3 for r in rows)


def test_embedding_lsh_derives_dim_and_rejects_mixed(spark):
    """round-3 ADVICE: hyperplane dim comes from the data, not a
    hardcoded 64 — non-64-dim corpora hash real dot products, and mixed
    lengths raise instead of silently nulling band signatures."""
    import numpy as np
    import pytest as _pytest

    from angle_spark.operators.dedup import embedding_near_pairs_lsh

    rng = np.random.default_rng(7)
    base = rng.normal(size=(6, 16))
    rows = [(i, [float(x) for x in base[i]]) for i in range(6)]
    # a planted near-duplicate of row 0 in 16-dim space
    rows.append((6, [float(x) for x in base[0] * 1.01 + 0.001]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = embedding_near_pairs_lsh(emb, threshold=0.95).toPandas()
    assert (0, 6) in set(zip(got["id1"], got["id2"]))

    mixed = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(ValueError, match="lengths vary"):
        embedding_near_pairs_lsh(mixed)


def test_ngram_contamination(spark):
    """Decontamination contracts: a probe fully contains itself
    (overlap 1.0); a training doc embedding a probe verbatim is caught;
    unrelated docs are not; min_shared filters grazing overlaps."""
    import pytest

    from angle_spark.operators.dedup import ngram_contamination, shingles

    probe_text = "alpha beta gamma delta epsilon zeta"
    corpus = spark.createDataFrame(
        [
            (0, probe_text),                                  # the probe itself
            (1, f"intro words then {probe_text} and a tail"), # verbatim leak
            (2, "alpha beta gamma nothing else here at all"), # 1 shared shingle
            (3, "totally unrelated content about other things"),
        ],
        "doc_id long, text string",
    )
    toks = with_tokens(corpus).select("doc_id", "tokens")
    sh = shingles(toks)
    probes = sh.filter(F.col("doc_id") == 0)
    out = ngram_contamination(sh, probes, min_shared=2).toPandas()
    hits = {int(r.doc_id): r for r in out.itertuples()}
    assert set(hits) == {0, 1}  # doc 2 has only 1 shared shingle; 3 none
    assert hits[0].overlap == 1.0 and hits[0].shared_ngrams == hits[0].probe_ngrams
    assert hits[1].overlap == 1.0  # probe fully contained in doc 1
    # min_shared=1 admits the grazing doc 2
    out1 = ngram_contamination(sh, probes, min_shared=1).toPandas()
    assert 2 in set(out1.doc_id)
    with pytest.raises(ValueError, match="min_shared"):
        ngram_contamination(sh, probes, min_shared=0)

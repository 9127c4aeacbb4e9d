"""Cardinality aggregation (wand.cardinality_matches) — round 5.

Contracts under test:
- exact cardinality equals the brute-force distinct count over the
  matched value set, for OR and boolean modes;
- docs missing a value are skipped (ES missing rule); an all-missing
  query emits no row;
- the shard-local dedup (collector="distinct_values") is lossless: the
  deduped feed and the raw values feed agree on the distinct count,
  and the deduped feed ships no (query, value) duplicates per shard;
- exact=False (HLL++) lands within the documented rsd envelope;
- doc_filter composes; Searcher.cardinality delegates with tombstones;
- the DocValues path returns the identical frame;
- validation: bad rsd raises.
"""
from __future__ import annotations

import pytest

from angle_spark.index.build import build_index, load_index
from angle_spark.index.docvalues import write_docvalues
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.query.wand import cardinality_matches, wand_topk
from angle_spark.synth import transcripts_df

N_CONVS = 24
SEED = 6


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    docs = with_tokens(
        assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4))
    ).select("doc_id", "tokens", "dl")
    out = str(tmp_path_factory.mktemp("card") / "idx")
    build_index(spark, docs, out, segment_docs=128, block_size=16)
    return out


@pytest.fixture(scope="module")
def loaded(spark, index_dir):
    return load_index(spark, index_dir)


def _value_of(d):
    # low-cardinality deterministic metric (17 possible values),
    # missing for every doc_id % 5 == 4 — dedup has real work to do
    return None if d % 5 == 4 else float((d * 3) % 17)


@pytest.fixture(scope="module")
def values(spark, loaded):
    _, _, meta = loaded
    rows = [
        (d, _value_of(d)) for d in range(meta.n_docs)
        if _value_of(d) is not None
    ]
    return spark.createDataFrame(rows, "doc_id long, value double")


@pytest.fixture(scope="module")
def doc_tokens(spark, loaded):
    docs = with_tokens(
        assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4))
    ).select("doc_id", "tokens")
    return {int(r["doc_id"]): set(r["tokens"]) for r in docs.collect()}


def _terms(doc_tokens, n=3):
    from collections import Counter

    cnt = Counter(t for tk in doc_tokens.values() for t in tk)
    return [t for t, _ in cnt.most_common(n)]


def _qdf(spark, queries):
    return spark.createDataFrame(
        queries, schema="query_id string, text string, k int"
    )


def _truth(doc_tokens, pred):
    vs = {
        _value_of(d)
        for d, toks in doc_tokens.items()
        if pred(toks) and _value_of(d) is not None
    }
    return len(vs)


def _got(spark, loaded, queries, values, **kw):
    merged, tstats, meta = loaded
    out = cardinality_matches(
        spark, merged, tstats, meta, _qdf(spark, queries), values, **kw
    ).toPandas()
    return dict(zip(out["query_id"], out["cardinality"]))


def test_exact_cardinality(spark, loaded, values, doc_tokens):
    a, b, _ = _terms(doc_tokens)
    got = _got(spark, loaded, [("q1", f"{a} {b}", 1), ("q2", a, 1)], values)
    assert got["q1"] == _truth(doc_tokens, lambda tk: a in tk or b in tk)
    assert got["q2"] == _truth(doc_tokens, lambda tk: a in tk)


def test_boolean_mode_and_missing_rule(spark, loaded, values, doc_tokens):
    a, _, c = _terms(doc_tokens)
    got = _got(
        spark, loaded, [("qb", f"{a} AND NOT {c}", 1)], values, mode="boolean"
    )
    assert got["qb"] == _truth(doc_tokens, lambda tk: a in tk and c not in tk)


def test_all_missing_query_emits_nothing(spark, loaded, doc_tokens):
    a = _terms(doc_tokens, 1)[0]
    empty_vals = spark.createDataFrame([], "doc_id long, value double")
    assert _got(spark, loaded, [("q", a, 1)], empty_vals) == {}


def test_shard_dedup_is_lossless_and_real(spark, loaded, values, doc_tokens):
    """The distinct_values feed agrees with the raw values feed on the
    count AND actually dedupes: with a 17-value metric over hundreds of
    matches, the deduped feed must ship far fewer rows."""
    from pyspark.sql import functions as F

    merged, tstats, meta = loaded
    a = _terms(doc_tokens, 1)[0]
    q = _qdf(spark, [("q", a, 1)])
    sm = values.select("doc_id", F.col("value").alias("sort_key"))
    raw = wand_topk(
        spark, merged, tstats, meta, q, collector="values", sort_meta=sm
    ).toPandas()
    ded = wand_topk(
        spark, merged, tstats, meta, q,
        collector="distinct_values", sort_meta=sm,
    ).toPandas()
    assert set(ded["val"]) == set(raw["val"])
    assert len(ded) < len(raw)
    # global distinct bounded by shards x distinct values
    assert len(ded) <= 17 * 32


def test_approx_within_rsd(spark, loaded, values, doc_tokens):
    a = _terms(doc_tokens, 1)[0]
    exact = _got(spark, loaded, [("q", a, 1)], values)["q"]
    approx = _got(spark, loaded, [("q", a, 1)], values, exact=False, rsd=0.05)[
        "q"
    ]
    # 17 distinct: HLL++ at 5% rsd is exact-ish at this size; allow 3 sigma
    assert abs(approx - exact) <= max(1, int(0.15 * exact) + 1)


def test_doc_filter_composes(spark, loaded, values, doc_tokens):
    a, _, _ = _terms(doc_tokens)
    allow = [d for d in doc_tokens if d % 2 == 0]
    adf = spark.createDataFrame([(d,) for d in allow], "doc_id long")
    got = _got(spark, loaded, [("q", a, 1)], values, doc_filter=adf)
    truth = len(
        {
            _value_of(d)
            for d, tk in doc_tokens.items()
            if a in tk and d % 2 == 0 and _value_of(d) is not None
        }
    )
    assert got["q"] == truth


def test_docvalues_path_identical(spark, index_dir, loaded, values, doc_tokens):
    a, b, _ = _terms(doc_tokens)
    dv = write_docvalues(spark, index_dir, "cardmetric", values)
    queries = [("q1", f"{a} {b}", 1)]
    assert _got(spark, loaded, queries, values) == _got(
        spark, loaded, queries, dv
    )


def test_searcher_delegates(spark, index_dir, loaded, values, doc_tokens):
    from angle_spark.query.searcher import Searcher

    a, b, _ = _terms(doc_tokens)
    queries = [("q1", f"{a} {b}", 1)]
    s = Searcher(spark, index_dir)
    try:
        out = s.cardinality(_qdf(spark, queries), values).toPandas()
        via = dict(zip(out["query_id"], out["cardinality"]))
    finally:
        s.close()
    assert via == _got(spark, loaded, queries, values)


def test_validation(spark, loaded, values):
    merged, tstats, meta = loaded
    q = _qdf(spark, [("q", "x", 1)])
    for bad in (0.0, 1.0, -0.1):
        with pytest.raises(ValueError, match="rsd"):
            cardinality_matches(
                spark, merged, tstats, meta, q, values, exact=False, rsd=bad
            )
    with pytest.raises(ValueError, match="sort_meta"):
        wand_topk(
            spark, merged, tstats, meta, q, collector="distinct_values"
        )

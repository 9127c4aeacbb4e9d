"""Matched-ids export + matrix_stats aggregation (wand collector="ids",
matrix_stats_matches).

Contracts: matched_ids equals brute-force membership per mode and
composes with tombstones/doc_filter; matrix_stats equals numpy's
sample covariance / Pearson correlation over the matched value rows;
diagonal = variance & corr 1; pairwise NULL deletion; single-row and
zero-variance folds NULL out; Searcher delegation; validation.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from angle_spark.index.build import build_index, load_index
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.query.wand import matched_ids, matrix_stats_matches
from angle_spark.synth import transcripts_df

N_CONVS = 24
SEED = 15


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    docs = with_tokens(
        assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4))
    ).select("doc_id", "tokens", "dl")
    out = str(tmp_path_factory.mktemp("mstats") / "idx")
    build_index(spark, docs, out, segment_docs=128, block_size=16)
    return out


@pytest.fixture(scope="module")
def loaded(spark, index_dir):
    return load_index(spark, index_dir)


@pytest.fixture(scope="module")
def doc_tokens(spark, loaded):
    docs = with_tokens(
        assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4))
    ).select("doc_id", "tokens")
    return {int(r["doc_id"]): set(r["tokens"]) for r in docs.collect()}


def _terms(doc_tokens, n=2):
    from collections import Counter

    cnt = Counter(t for tk in doc_tokens.values() for t in tk)
    return [t for t, _ in cnt.most_common(n)]


def _qdf(spark, rows):
    return spark.createDataFrame(rows, "query_id string, text string, k int")


def _vx(d):
    return float((d * 7) % 53)


def _vy(d):
    # correlated-with-noise second field; missing for d % 6 == 5
    return None if d % 6 == 5 else 2.0 * _vx(d) + float(d % 11)


@pytest.fixture(scope="module")
def values(spark, loaded):
    _, _, meta = loaded
    rows = [(d, _vx(d), _vy(d)) for d in range(meta.n_docs)]
    return spark.createDataFrame(rows, "doc_id long, x double, y double")


def test_matched_ids_brute_force(spark, loaded, doc_tokens):
    merged, tstats, meta = loaded
    a, b = _terms(doc_tokens)
    out = matched_ids(
        spark, merged, tstats, meta,
        _qdf(spark, [("q1", f"{a} OR {b}", 1), ("q2", f"{a} AND NOT {b}", 1)]),
        mode="boolean",
    ).toPandas()
    got1 = set(out[out.query_id == "q1"]["doc_id"])
    got2 = set(out[out.query_id == "q2"]["doc_id"])
    assert got1 == {d for d, tk in doc_tokens.items() if a in tk or b in tk}
    assert got2 == {d for d, tk in doc_tokens.items() if a in tk and b not in tk}
    assert not out.duplicated().any()


def test_matched_ids_doc_filter(spark, loaded, doc_tokens):
    merged, tstats, meta = loaded
    a = _terms(doc_tokens, 1)[0]
    allow = spark.createDataFrame(
        [(d,) for d in doc_tokens if d % 3 == 0], "doc_id long"
    )
    out = matched_ids(
        spark, merged, tstats, meta, _qdf(spark, [("q", a, 1)]),
        doc_filter=allow,
    ).toPandas()
    assert set(out["doc_id"]) == {
        d for d, tk in doc_tokens.items() if a in tk and d % 3 == 0
    }


def test_matrix_stats_matches_numpy(spark, loaded, values, doc_tokens):
    merged, tstats, meta = loaded
    a = _terms(doc_tokens, 1)[0]
    out = matrix_stats_matches(
        spark, merged, tstats, meta, _qdf(spark, [("q", a, 1)]), values
    ).toPandas()
    match = sorted(d for d, tk in doc_tokens.items() if a in tk)
    xs = np.array([_vx(d) for d in match])
    ys = np.array(
        [_vy(d) for d in match if _vy(d) is not None]
    )
    xy = np.array(
        [(_vx(d), _vy(d)) for d in match if _vy(d) is not None]
    )
    rows = {(r.field_i, r.field_j): r for r in out.itertuples()}
    # diagonal x: variance + corr 1
    rx = rows[("x", "x")]
    assert rx.n == len(xs)
    assert rx.covariance == pytest.approx(np.var(xs, ddof=1), rel=1e-9)
    assert rx.correlation == pytest.approx(1.0)
    # off-diagonal: pairwise deletion, sample cov, Pearson corr
    rxy = rows[("x", "y")]
    assert rxy.n == len(xy)
    assert rxy.covariance == pytest.approx(
        np.cov(xy[:, 0], xy[:, 1], ddof=1)[0, 1], rel=1e-9
    )
    assert rxy.correlation == pytest.approx(
        np.corrcoef(xy[:, 0], xy[:, 1])[0, 1], rel=1e-9
    )
    assert rxy.correlation > 0.9  # y is built correlated with x
    # diagonal y uses only non-missing rows
    ry = rows[("y", "y")]
    assert ry.n == len(ys)


def test_single_row_and_constant_fold(spark, loaded):
    """covar_samp/corr need >= 2 rows; a constant field NULLs corr."""
    merged, tstats, meta = loaded
    docs = with_tokens(
        assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4))
    ).select("doc_id", "tokens")
    one_doc = docs.limit(1).collect()[0]
    term = sorted(one_doc["tokens"])[0]
    vals = spark.createDataFrame(
        [(int(d), 5.0) for d in range(meta.n_docs)], "doc_id long, c double"
    )
    out = matrix_stats_matches(
        spark, merged, tstats, meta, _qdf(spark, [("q", term, 1)]), vals
    ).toPandas()
    r = out.iloc[0]
    assert r["mean_i"] == 5.0
    assert pd.isna(r["correlation"])  # zero variance -> NULL, never 1/0


def test_searcher_delegates(spark, index_dir, loaded, values, doc_tokens):
    from angle_spark.query.searcher import Searcher

    merged, tstats, meta = loaded
    a = _terms(doc_tokens, 1)[0]
    q = _qdf(spark, [("q", a, 1)])
    s = Searcher(spark, index_dir)
    try:
        ids_via = s.matched_ids(q).toPandas()
        ms_via = s.matrix_stats(q, values).toPandas()
    finally:
        s.close()
    ids_direct = matched_ids(spark, merged, tstats, meta, q).toPandas()
    ms_direct = matrix_stats_matches(
        spark, merged, tstats, meta, q, values
    ).toPandas()
    key = ["query_id", "doc_id"]
    pd.testing.assert_frame_equal(
        ids_via.sort_values(key).reset_index(drop=True),
        ids_direct.sort_values(key).reset_index(drop=True),
    )
    key2 = ["query_id", "field_i", "field_j"]
    pd.testing.assert_frame_equal(
        ms_via.sort_values(key2).reset_index(drop=True),
        ms_direct.sort_values(key2).reset_index(drop=True),
    )


def test_validation(spark, loaded):
    from angle_spark.query.wand import wand_topk

    merged, tstats, meta = loaded
    q = _qdf(spark, [("q", "x", 1)])
    with pytest.raises(ValueError, match="field"):
        matrix_stats_matches(
            spark, merged, tstats, meta, q,
            spark.createDataFrame([(1,)], "doc_id long"),
        )
    sm = spark.createDataFrame([(1, 1.0)], "doc_id long, sort_key double")
    with pytest.raises(ValueError, match="sort_meta"):
        wand_topk(
            spark, merged, tstats, meta, q, collector="ids", sort_meta=sm
        )
    with pytest.raises(ValueError, match="offset"):
        wand_topk(spark, merged, tstats, meta, q, collector="ids", offset=3)


def test_t_test_matches(spark, loaded, doc_tokens):
    """t_test == numpy brute force for all three ES test types; missing
    rules (unpaired per-field, paired both-required); zero-variance and
    short-data folds yield NULL t/dof, never errors; bad type guard."""
    import math

    from angle_spark.query.wand import t_test_matches

    merged, tstats, meta = loaded
    a_t, b_t = _terms(doc_tokens)
    n = max(doc_tokens) + 1
    av = {d: float((d * 7) % 53) if d % 4 != 3 else None for d in range(n)}
    bv = {d: float((d * 11) % 67) if d % 6 != 5 else None for d in range(n)}
    vdf = spark.createDataFrame(
        [(d, av[d], bv[d]) for d in range(n)], "doc_id long, a double, b double"
    )
    q = spark.createDataFrame(
        [("t", f"{a_t} {b_t}", 1)], "query_id string, text string, k int"
    )
    docs = [d for d, tk in doc_tokens.items() if a_t in tk or b_t in tk]
    va = [av[d] for d in docs if av[d] is not None]
    vb = [bv[d] for d in docs if bv[d] is not None]

    def svar(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / (len(xs) - 1)

    # welch
    row = t_test_matches(
        spark, merged, tstats, meta, q, vdf, test_type="welch"
    ).toPandas().iloc[0]
    sea, seb = svar(va) / len(va), svar(vb) / len(vb)
    t_want = (sum(va) / len(va) - sum(vb) / len(vb)) / math.sqrt(sea + seb)
    dof_want = (sea + seb) ** 2 / (
        sea**2 / (len(va) - 1) + seb**2 / (len(vb) - 1)
    )
    assert int(row["n_a"]) == len(va) and int(row["n_b"]) == len(vb)
    assert math.isclose(float(row["t_value"]), t_want, rel_tol=1e-9)
    assert math.isclose(float(row["dof"]), dof_want, rel_tol=1e-9)

    # homoscedastic
    row = t_test_matches(
        spark, merged, tstats, meta, q, vdf, test_type="homoscedastic"
    ).toPandas().iloc[0]
    na, nb = len(va), len(vb)
    sp2 = ((na - 1) * svar(va) + (nb - 1) * svar(vb)) / (na + nb - 2)
    t_want = (sum(va) / na - sum(vb) / nb) / math.sqrt(sp2 * (1 / na + 1 / nb))
    assert math.isclose(float(row["t_value"]), t_want, rel_tol=1e-9)
    assert float(row["dof"]) == na + nb - 2

    # paired: only docs with BOTH fields
    row = t_test_matches(
        spark, merged, tstats, meta, q, vdf, test_type="paired"
    ).toPandas().iloc[0]
    dpairs = [
        av[d] - bv[d]
        for d in docs
        if av[d] is not None and bv[d] is not None
    ]
    nd = len(dpairs)
    t_want = (sum(dpairs) / nd) / math.sqrt(svar(dpairs) / nd)
    assert int(row["n_a"]) == int(row["n_b"]) == nd < len(docs)
    assert math.isclose(float(row["t_value"]), t_want, rel_tol=1e-9)
    assert float(row["dof"]) == nd - 1

    # zero variance both sides -> NULL t/dof (not an error)
    const = spark.createDataFrame(
        [(d, 5.0, 5.0) for d in range(n)], "doc_id long, a double, b double"
    )
    row = t_test_matches(
        spark, merged, tstats, meta, q, const, test_type="welch"
    ).toPandas().iloc[0]
    assert pd.isna(row["t_value"]) and pd.isna(row["dof"])
    assert float(row["mean_a"]) == 5.0

    with pytest.raises(ValueError, match="test_type"):
        t_test_matches(spark, merged, tstats, meta, q, vdf, test_type="x")


def test_string_stats_matches(spark, loaded, doc_tokens):
    """string_stats == python brute force: length stats, log2 Shannon
    entropy over the pooled character distribution, ES missing rules
    (NULL skips everything; empty string counts with length 0 and no
    chars)."""
    import math
    from collections import Counter

    from angle_spark.query.wand import string_stats_matches

    merged, tstats, meta = loaded
    a_t, b_t = _terms(doc_tokens)
    n = max(doc_tokens) + 1
    texts = {
        d: (None if d % 5 == 0 else ("" if d % 7 == 3 else f"doc {d} " * (1 + d % 3)))
        for d in range(n)
    }
    tdf = spark.createDataFrame(
        [(d, texts[d]) for d in range(n)], "doc_id long, s string"
    )
    q = _qdf(spark, [("ss", f"{a_t} {b_t}", 1)])
    got = string_stats_matches(
        spark, merged, tstats, meta, q, tdf
    ).toPandas().iloc[0]
    docs = [d for d, tk in doc_tokens.items() if a_t in tk or b_t in tk]
    vals = [texts[d] for d in docs if texts[d] is not None]
    cnt = Counter("".join(vals))
    total = sum(cnt.values())
    ent = -sum((c / total) * math.log2(c / total) for c in cnt.values())
    assert int(got["n_values"]) == len(vals)
    assert int(got["min_length"]) == min(len(v) for v in vals) == 0
    assert int(got["max_length"]) == max(len(v) for v in vals)
    assert math.isclose(
        float(got["avg_length"]), sum(len(v) for v in vals) / len(vals),
        rel_tol=1e-12,
    )
    assert math.isclose(float(got["entropy"]), ent, rel_tol=1e-9)

"""Percentiles aggregation (wand.percentile_matches) — round 5.

Contracts under test:
- exact percentiles equal numpy's linear-interpolation truth over the
  brute-force matched value set, for OR and boolean modes;
- docs missing a value are skipped (ES missing rule); an all-missing
  query emits no rows;
- the DocValues task-local path returns the identical frame to the
  shipped-DataFrame path;
- exact=False (the t-digest-style sketch) returns in-range, monotone
  values;
- doc_filter composes (percentiles over the filtered matches only);
- Searcher.percentiles delegates with the session's tombstones;
- validation: empty / out-of-range / duplicate percentile lists raise.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from angle_spark.functions.tokenizer import tokenize_py
from angle_spark.index.build import build_index, load_index
from angle_spark.index.docvalues import write_docvalues
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.query.wand import percentile_matches, wand_topk
from angle_spark.synth import transcripts_df, transcripts_pdf

N_CONVS = 24
SEED = 5
PCTS = (0.25, 0.5, 0.75, 0.95)


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    docs = with_tokens(
        assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4))
    ).select("doc_id", "tokens", "dl")
    out = str(tmp_path_factory.mktemp("pct") / "idx")
    build_index(spark, docs, out, segment_docs=128, block_size=16)
    return out


@pytest.fixture(scope="module")
def loaded(spark, index_dir):
    return load_index(spark, index_dir)


def _value_of(d):
    # deterministic metric, missing for every doc_id % 5 == 4
    return None if d % 5 == 4 else float((d * 7) % 97)


@pytest.fixture(scope="module")
def values(spark, loaded):
    _, _, meta = loaded
    rows = [(d, _value_of(d)) for d in range(meta.n_docs) if _value_of(d) is not None]
    return spark.createDataFrame(rows, "doc_id long, value double")


@pytest.fixture(scope="module")
def doc_tokens(spark, loaded):
    """docID -> token set, via the engine's own docID assignment."""
    docs = with_tokens(
        assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4))
    ).select("doc_id", "tokens")
    return {int(r["doc_id"]): set(r["tokens"]) for r in docs.collect()}


def _terms(doc_tokens, n=3):
    from collections import Counter

    cnt = Counter(t for tk in doc_tokens.values() for t in tk)
    return [t for t, _ in cnt.most_common(n)]


def _qdf(spark, queries):
    return spark.createDataFrame(queries, schema="query_id string, text string, k int")


def _truth(doc_tokens, pred):
    vals = [
        _value_of(d)
        for d, toks in doc_tokens.items()
        if pred(toks) and _value_of(d) is not None
    ]
    if not vals:
        return {}
    return {p: float(np.percentile(vals, p * 100, method="linear")) for p in PCTS}


def _got(spark, loaded, queries, values, **kw):
    merged, tstats, meta = loaded
    out = percentile_matches(
        spark, merged, tstats, meta, _qdf(spark, queries), values,
        percentiles=PCTS, **kw,
    ).toPandas()
    return {
        qid: dict(zip(g["pct"], g["value"])) for qid, g in out.groupby("query_id")
    }


def test_exact_percentiles_match_numpy(spark, loaded, values, doc_tokens):
    a, b, _ = _terms(doc_tokens)
    got = _got(spark, loaded, [("q1", f"{a} {b}", 1), ("q2", a, 1)], values)
    exp1 = _truth(doc_tokens, lambda tk: a in tk or b in tk)
    exp2 = _truth(doc_tokens, lambda tk: a in tk)
    for p in PCTS:
        assert got["q1"][p] == pytest.approx(exp1[p], abs=1e-9)
        assert got["q2"][p] == pytest.approx(exp2[p], abs=1e-9)


def test_boolean_mode_and_missing_rule(spark, loaded, values, doc_tokens):
    a, _, c = _terms(doc_tokens)
    got = _got(
        spark, loaded, [("qb", f"{a} AND NOT {c}", 1)], values, mode="boolean"
    )
    exp = _truth(doc_tokens, lambda tk: a in tk and c not in tk)
    for p in PCTS:
        assert got["qb"][p] == pytest.approx(exp[p], abs=1e-9)


def test_all_missing_query_emits_nothing(spark, loaded, doc_tokens):
    a = _terms(doc_tokens, 1)[0]
    # value frame covering NO docs
    empty_vals = _qdf(spark, []).sparkSession.createDataFrame(
        [], "doc_id long, value double"
    )
    got = _got(spark, loaded, [("q", a, 1)], empty_vals)
    assert got == {}


def test_docvalues_path_identical(spark, index_dir, loaded, values, doc_tokens):
    a, b, _ = _terms(doc_tokens)
    dv = write_docvalues(spark, index_dir, "pctmetric", values)
    queries = [("q1", f"{a} {b}", 1)]
    assert _got(spark, loaded, queries, values) == _got(spark, loaded, queries, dv)


def test_approx_is_in_range_and_monotone(spark, loaded, values, doc_tokens):
    a, _, _ = _terms(doc_tokens)
    got = _got(spark, loaded, [("q", a, 1)], values, exact=False)["q"]
    vs = [got[p] for p in PCTS]
    assert all(0.0 <= v <= 96.0 for v in vs)
    assert all(x <= y for x, y in zip(vs, vs[1:]))


def test_doc_filter_composes(spark, loaded, values, doc_tokens):
    a, _, _ = _terms(doc_tokens)
    allow = [d for d in doc_tokens if d % 2 == 0]
    adf = spark.createDataFrame([(d,) for d in allow], "doc_id long")
    got = _got(spark, loaded, [("q", a, 1)], values, doc_filter=adf)
    exp = _truth(
        doc_tokens, lambda tk: a in tk
    )  # recompute restricted to even docs
    vals = [
        _value_of(d)
        for d, tk in doc_tokens.items()
        if a in tk and d % 2 == 0 and _value_of(d) is not None
    ]
    exp = {p: float(np.percentile(vals, p * 100, method="linear")) for p in PCTS}
    for p in PCTS:
        assert got["q"][p] == pytest.approx(exp[p], abs=1e-9)


def test_searcher_delegates(spark, index_dir, loaded, values, doc_tokens):
    from angle_spark.query.searcher import Searcher

    a, b, _ = _terms(doc_tokens)
    queries = [("q1", f"{a} {b}", 1)]
    s = Searcher(spark, index_dir)
    try:
        via_searcher = {
            qid: dict(zip(g["pct"], g["value"]))
            for qid, g in s.percentiles(
                _qdf(spark, queries), values, percentiles=PCTS
            ).toPandas().groupby("query_id")
        }
    finally:
        s.close()
    assert via_searcher == _got(spark, loaded, queries, values)


def test_validation(spark, loaded, values):
    merged, tstats, meta = loaded
    q = _qdf(spark, [("q", "x", 1)])
    for bad in ((), (1.5,), (0.5, 0.5)):
        with pytest.raises(ValueError):
            percentile_matches(
                spark, merged, tstats, meta, q, values, percentiles=bad
            )
    with pytest.raises(ValueError, match="values"):
        wand_topk(spark, merged, tstats, meta, q, collector="values")

def test_percentile_ranks(spark, loaded, values, doc_tokens):
    """percentile_ranks == 100·|{v <= x}|/n brute force per (query, x);
    missing-value docs skipped; all-missing query emits nothing;
    validation on empty/duplicate check values."""
    from angle_spark.query.wand import percentile_rank_matches

    merged, tstats, meta = loaded
    a, b, _ = _terms(doc_tokens)
    q = _qdf(spark, [("pr", f"{a} {b}", 1)])
    ats = (10.0, 48.0, 200.0)
    got = percentile_rank_matches(
        spark, merged, tstats, meta, q, values, ats
    ).toPandas()
    docs = [d for d, tk in doc_tokens.items() if a in tk or b in tk]
    vals = [_value_of(d) for d in docs if _value_of(d) is not None]
    assert len(got) == len(ats)
    for _, r in got.iterrows():
        x = r["at_value"]
        want = 100.0 * sum(1 for v in vals if v <= x) / len(vals)
        assert r["pct"] == pytest.approx(want, rel=1e-12), x
    # the largest check value covers everything
    assert float(got[got.at_value == 200.0]["pct"].iloc[0]) == 100.0

    with pytest.raises(ValueError, match="non-empty"):
        percentile_rank_matches(spark, merged, tstats, meta, q, values, ())
    with pytest.raises(ValueError, match="duplicate"):
        percentile_rank_matches(
            spark, merged, tstats, meta, q, values, (1.0, 1.0)
        )


def test_boxplot_matches(spark, loaded, values, doc_tokens):
    """boxplot == numpy brute force: exact quartiles, Tukey whiskers
    are ACTUAL values inside the fence (an outlier pushes min below
    lower), whisker_iqr=0 degenerates to values inside [q1, q3]."""
    import numpy as np

    from angle_spark.query.wand import boxplot_matches

    merged, tstats, meta = loaded
    a, b, _ = _terms(doc_tokens)
    q = _qdf(spark, [("bx", f"{a} {b}", 1)])
    # plant one extreme outlier on a matched, valued doc
    docs = [d for d, tk in doc_tokens.items() if a in tk or b in tk]
    valued = [d for d in docs if _value_of(d) is not None]
    out_doc = valued[0]
    rows = [
        (d, 1e6 if d == out_doc else _value_of(d))
        for d in range(max(doc_tokens) + 1)
        if _value_of(d) is not None
    ]
    vdf = spark.createDataFrame(rows, "doc_id long, value double")
    got = boxplot_matches(
        spark, merged, tstats, meta, q, vdf
    ).toPandas().iloc[0]
    vs = np.array([1e6 if d == out_doc else _value_of(d) for d in valued])
    q1, q2, q3 = np.percentile(vs, [25, 50, 75])  # linear interpolation
    iqr = q3 - q1
    inside = vs[(vs >= q1 - 1.5 * iqr) & (vs <= q3 + 1.5 * iqr)]
    assert int(got["n_values"]) == len(vs)
    assert float(got["min"]) == vs.min() and float(got["max"]) == 1e6
    for col, want in (("q1", q1), ("q2", q2), ("q3", q3)):
        assert abs(float(got[col]) - want) < 1e-9, col
    assert float(got["lower"]) == inside.min()
    assert float(got["upper"]) == inside.max() < 1e6  # outlier excluded

    # whisker_iqr=0: whiskers are actual values inside [q1, q3]
    got0 = boxplot_matches(
        spark, merged, tstats, meta, q, vdf, whisker_iqr=0.0
    ).toPandas().iloc[0]
    in0 = vs[(vs >= q1) & (vs <= q3)]
    assert float(got0["lower"]) == in0.min()
    assert float(got0["upper"]) == in0.max()

    import pytest as _pt

    with _pt.raises(ValueError, match="whisker_iqr"):
        boxplot_matches(
            spark, merged, tstats, meta, q, vdf, whisker_iqr=-1
        )


def test_mad_matches(spark, loaded, values, doc_tokens):
    """MAD == numpy brute force (median of |v - median|, linear
    interpolation both levels); robust to the planted outlier that
    inflates stddev."""
    import numpy as np

    from angle_spark.query.wand import mad_matches

    merged, tstats, meta = loaded
    a, b, _ = _terms(doc_tokens)
    q = _qdf(spark, [("md", f"{a} {b}", 1)])
    got = mad_matches(
        spark, merged, tstats, meta, q, values
    ).toPandas().iloc[0]
    docs = [d for d, tk in doc_tokens.items() if a in tk or b in tk]
    vs = np.array([_value_of(d) for d in docs if _value_of(d) is not None])
    med = np.percentile(vs, 50)
    mad = np.percentile(np.abs(vs - med), 50)
    assert int(got["n_values"]) == len(vs)
    assert abs(float(got["median"]) - med) < 1e-9
    assert abs(float(got["mad"]) - mad) < 1e-9

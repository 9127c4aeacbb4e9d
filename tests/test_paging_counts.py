"""Pagination (wand_topk(offset=...)) and exact total-hit counting
(count_matches / Searcher.count) — round 5.

Contracts under test:
- pages carry GLOBAL ranks and tile the unpaged ranking exactly
  (page1 + page2 + page3 == top-30, bitwise);
- an offset past a query's answer set yields an empty page, not an
  error;
- counts are the EXACT distinct matched-doc totals per query for every
  retrieval mode, equal to brute-force truth over (tokens, tree) and to
  the row count of a full (k > corpus) wand_topk call;
- counting composes with doc_filter, and Searcher.count applies the
  session's tombstones.
"""
from __future__ import annotations

import pandas as pd
import pytest

from angle_spark.functions.tokenizer import tokenize_py
from angle_spark.index.build import build_index, load_index
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.query.boolean import parse_query
from angle_spark.query.wand import count_matches, wand_topk
from angle_spark.synth import transcripts_df, transcripts_pdf

N_CONVS = 30
SEED = 7


@pytest.fixture(scope="module")
def corpus():
    tp = transcripts_pdf(N_CONVS, seed=SEED)
    ordered = tp.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(
        drop=True
    )
    toks = [tokenize_py(t if isinstance(t, str) else "") for t in ordered["text"]]
    return ordered, toks


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    docs = with_tokens(
        assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4))
    ).select("doc_id", "tokens", "dl")
    out = str(tmp_path_factory.mktemp("paging") / "idx")
    build_index(spark, docs, out, segment_docs=128, block_size=16, positional=True)
    return out


def _qdf(spark, queries):
    return spark.createDataFrame(queries, schema="query_id string, text string, k int")


def _common_terms(toks, n=4):
    from collections import Counter

    cnt = Counter(t for tk in toks for t in set(tk))
    return [t for t, _ in cnt.most_common(n)]


def test_offset_pages_tile_ranking(spark, index_dir, corpus):
    _, toks = corpus
    a, b, c, _ = _common_terms(toks)
    queries = [("p1", f"{a} {b}", 10), ("p2", f"{b} {c}", 10)]
    merged, tstats, meta = load_index(spark, index_dir)
    full = (
        wand_topk(spark, merged, tstats, meta,
                  _qdf(spark, [(q, t, 30) for q, t, _ in queries]))
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    pages = []
    for off in (0, 10, 20):
        pg = wand_topk(
            spark, merged, tstats, meta, _qdf(spark, queries), offset=off
        ).toPandas()
        if off:
            assert (pg["rank"] > off).all() and (pg["rank"] <= off + 10).all()
        pages.append(pg)
    tiled = (
        pd.concat(pages).sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(tiled, full)
    # boolean mode pages tile too
    bq = [("p3", f"{a} AND NOT {c}", 8)]
    bfull = (
        wand_topk(spark, merged, tstats, meta, _qdf(spark, [("p3", f"{a} AND NOT {c}", 16)]),
                  mode="boolean")
        .toPandas().sort_values("rank").reset_index(drop=True)
    )
    btiled = pd.concat([
        wand_topk(spark, merged, tstats, meta, _qdf(spark, bq),
                  mode="boolean", offset=off).toPandas()
        for off in (0, 8)
    ]).sort_values("rank").reset_index(drop=True)
    pd.testing.assert_frame_equal(btiled, bfull)


def test_offset_past_answer_set_is_empty(spark, index_dir, corpus):
    _, toks = corpus
    a = _common_terms(toks, 1)[0]
    merged, tstats, meta = load_index(spark, index_dir)
    n_matched = sum(1 for tk in toks if a in tk)
    pg = wand_topk(
        spark, merged, tstats, meta, _qdf(spark, [("q", a, 10)]),
        offset=n_matched,
    ).toPandas()
    assert len(pg) == 0


def test_offset_and_collector_validation(spark, index_dir):
    merged, tstats, meta = load_index(spark, index_dir)
    q = _qdf(spark, [("q", "x", 5)])
    with pytest.raises(ValueError, match="offset"):
        wand_topk(spark, merged, tstats, meta, q, offset=-1)
    with pytest.raises(ValueError, match="collector"):
        wand_topk(spark, merged, tstats, meta, q, collector="bogus")
    with pytest.raises(ValueError, match="offset"):
        wand_topk(spark, merged, tstats, meta, q, collector="count", offset=5)


def test_count_matches_all_modes(spark, index_dir, corpus):
    """counts == brute-force distinct matched docs, per mode; k ignored."""
    _, toks = corpus
    a, b, c, d = _common_terms(toks)
    merged, tstats, meta = load_index(spark, index_dir)

    def got(queries, **kw):
        out = count_matches(
            spark, merged, tstats, meta, _qdf(spark, queries), **kw
        ).toPandas()
        return dict(zip(out["query_id"], out["total_hits"]))

    # or-mode: union; k=1 proves k is ignored
    g = got([("o1", f"{a} {b}", 1), ("o2", "zzzznope", 1)])
    assert g == {"o1": sum(1 for tk in toks if a in tk or b in tk)}
    # and-mode: intersection
    g = got([("a1", f"{a} {c}", 1)], mode="and")
    assert g == {"a1": sum(1 for tk in toks if a in tk and c in tk)}
    # boolean trees (incl. NOT)
    text = f"({a} OR {b}) AND NOT {d}"
    ast = parse_query(text)

    def m(tk):
        return (a in tk or b in tk) and d not in tk

    g = got([("b1", text, 1)], mode="boolean")
    assert g == {"b1": sum(1 for tk in toks if m(tk))}
    # count == row count of the full (k > corpus) retrieval
    full = wand_topk(
        spark, merged, tstats, meta,
        _qdf(spark, [("b1", text, 10_000)]), mode="boolean",
    ).toPandas()
    assert g["b1"] == len(full)


def test_count_composes_with_doc_filter(spark, index_dir, corpus):
    _, toks = corpus
    a = _common_terms(toks, 1)[0]
    merged, tstats, meta = load_index(spark, index_dir)
    half = [d for d in range(len(toks)) if d % 2 == 0]
    allow = spark.createDataFrame([(int(d),) for d in half], "doc_id long")
    out = count_matches(
        spark, merged, tstats, meta, _qdf(spark, [("q", a, 1)]),
        doc_filter=allow,
    ).toPandas()
    want = sum(1 for d in half if a in toks[d])
    assert dict(zip(out["query_id"], out["total_hits"])) == {"q": want}


def _sort_golden(toks, member, keys, k, ascending=False):
    """brute-force sort-by-field: matched docs ordered by key (missing
    last), ties on doc_id ascending."""
    missing = float("inf") if ascending else float("-inf")
    rows = sorted(
        ((keys.get(d, missing), d) for d in range(len(toks)) if member(toks[d])),
        key=lambda kv: ((kv[0] if ascending else -kv[0]), kv[1]),
    )
    return [(rank, d, kv) for rank, (kv, d) in enumerate(rows[:k], start=1)]


def test_sort_by_field_matches_golden(spark, index_dir, corpus):
    """desc + asc sort keys, collision ties, missing-keys-sort-last,
    boolean-mode membership — all vs brute force."""
    _, toks = corpus
    a, b, c, _ = _common_terms(toks)
    merged, tstats, meta = load_index(spark, index_dir)
    # deterministic keys with collisions (mod) to exercise the doc_id tie
    keys = {d: float((d * 7) % 101) for d in range(len(toks))}
    smeta = spark.createDataFrame(
        [(int(d), float(v)) for d, v in keys.items()],
        "doc_id long, sort_key double",
    )
    q = _qdf(spark, [("s1", f"{a} {b}", 9)])
    for ascending in (False, True):
        got = (
            wand_topk(spark, merged, tstats, meta, q,
                      sort_meta=smeta, sort_ascending=ascending)
            .toPandas().sort_values("rank").reset_index(drop=True)
        )
        want = _sort_golden(
            toks, lambda tk: a in tk or b in tk, keys, 9, ascending
        )
        assert [
            (int(r["rank"]), int(r["doc_id"]), float(r["score"]))
            for _, r in got.iterrows()
        ] == want
    # boolean membership under field sort
    qb = _qdf(spark, [("s2", f"{a} AND NOT {c}", 9)])
    got = (
        wand_topk(spark, merged, tstats, meta, qb, mode="boolean",
                  sort_meta=smeta)
        .toPandas().sort_values("rank").reset_index(drop=True)
    )
    want = _sort_golden(toks, lambda tk: a in tk and c not in tk, keys, 9)
    assert [
        (int(r["rank"]), int(r["doc_id"]), float(r["score"]))
        for _, r in got.iterrows()
    ] == want
    # missing keys sort last: keys only for odd doc_ids, k big enough to
    # reach the missing tail
    halfkeys = {d: v for d, v in keys.items() if d % 2}
    smeta_half = spark.createDataFrame(
        [(int(d), float(v)) for d, v in halfkeys.items()],
        "doc_id long, sort_key double",
    )
    n_match = sum(1 for tk in toks if a in tk or b in tk)
    got = (
        wand_topk(spark, merged, tstats, meta,
                  _qdf(spark, [("s1", f"{a} {b}", n_match)]),
                  sort_meta=smeta_half)
        .toPandas().sort_values("rank").reset_index(drop=True)
    )
    want = _sort_golden(
        toks, lambda tk: a in tk or b in tk, halfkeys, n_match
    )
    assert [(int(r["rank"]), int(r["doc_id"])) for _, r in got.iterrows()] == [
        (rk, d) for rk, d, _ in want
    ]
    tail = got[got["doc_id"] % 2 == 0]
    assert (tail["rank"] > len(got) - len(tail)).all()  # keyless docs last


def test_sort_by_field_pages_tile(spark, index_dir, corpus):
    _, toks = corpus
    a, b, _, _ = _common_terms(toks)
    merged, tstats, meta = load_index(spark, index_dir)
    smeta = spark.createDataFrame(
        [(int(d), float((d * 13) % 97)) for d in range(len(toks))],
        "doc_id long, sort_key double",
    )
    q = _qdf(spark, [("p", f"{a} {b}", 8)])
    full = (
        wand_topk(spark, merged, tstats, meta,
                  _qdf(spark, [("p", f"{a} {b}", 16)]), sort_meta=smeta)
        .toPandas().sort_values("rank").reset_index(drop=True)
    )
    tiled = pd.concat([
        wand_topk(spark, merged, tstats, meta, q,
                  sort_meta=smeta, offset=o).toPandas()
        for o in (0, 8)
    ]).sort_values("rank").reset_index(drop=True)
    pd.testing.assert_frame_equal(tiled, full)


def test_aggregate_matches_stats(spark, index_dir, corpus):
    """stats agg == brute force: full values, half-missing values (ES
    missing rule: n_docs counts all matches, value stats skip missing),
    all-missing query NULLs its value stats; doc_filter composes."""
    import math

    from angle_spark.query.wand import aggregate_matches

    _, toks = corpus
    a, b, c, _ = _common_terms(toks)
    merged, tstats, meta = load_index(spark, index_dir)
    keys = {d: float((d * 11) % 47) for d in range(len(toks))}

    def vdf(mapping):
        return spark.createDataFrame(
            [(int(d), float(v)) for d, v in mapping.items()],
            "doc_id long, value double",
        )

    def brute(member, mapping):
        docs = [d for d in range(len(toks)) if member(toks[d])]
        vals = [mapping[d] for d in docs if d in mapping]
        return {
            "n_docs": len(docs),
            "n_values": len(vals),
            "sum": sum(vals) if vals else None,
            "min": min(vals) if vals else None,
            "max": max(vals) if vals else None,
            "avg": sum(vals) / len(vals) if vals else None,
        }

    q = _qdf(spark, [("s", f"{a} {b}", 1)])
    got = aggregate_matches(spark, merged, tstats, meta, q, vdf(keys)).toPandas()
    want = brute(lambda tk: a in tk or b in tk, keys)
    row = got.iloc[0]
    assert int(row["n_docs"]) == want["n_docs"]
    assert int(row["n_values"]) == want["n_values"]
    for col in ("sum", "min", "max"):
        assert float(row[col]) == want[col]
    assert math.isclose(float(row["avg"]), want["avg"], rel_tol=1e-12)

    # half the values missing
    half = {d: v for d, v in keys.items() if d % 3 == 0}
    got = aggregate_matches(spark, merged, tstats, meta, q, vdf(half)).toPandas()
    want = brute(lambda tk: a in tk or b in tk, half)
    row = got.iloc[0]
    assert int(row["n_docs"]) == want["n_docs"]
    assert int(row["n_values"]) == want["n_values"] < want["n_docs"]
    assert float(row["sum"]) == want["sum"]

    # boolean membership + all values missing -> NULL value stats
    qb = _qdf(spark, [("sb", f"{a} AND NOT {c}", 1)])
    matched = [d for d, tk in enumerate(toks) if a in tk and c not in tk]
    none_vals = {d: 1.0 for d in range(len(toks)) if d not in matched}
    got = aggregate_matches(
        spark, merged, tstats, meta, qb, vdf(none_vals), mode="boolean"
    ).toPandas()
    row = got.iloc[0]
    assert int(row["n_docs"]) == len(matched) and int(row["n_values"]) == 0
    assert row[["sum", "min", "max", "avg"]].isna().all()

    # doc_filter composes
    allow = [d for d in range(len(toks)) if d % 2 == 0]
    got = aggregate_matches(
        spark, merged, tstats, meta, q, vdf(keys),
        doc_filter=spark.createDataFrame([(int(d),) for d in allow], "doc_id long"),
    ).toPandas()
    want = brute(lambda tk: False, {})  # recompute below on allowed set
    docs = [d for d in allow if a in toks[d] or b in toks[d]]
    assert int(got.iloc[0]["n_docs"]) == len(docs)
    assert float(got.iloc[0]["sum"]) == sum(keys[d] for d in docs)


def test_aggregate_matches_extended_stats(spark, index_dir, corpus):
    """extended=True == ES ExtendedStats brute force: variance is the
    population (sumsq - sum²/n)/n expression, sampling uses n-1 and is
    NULL below two values, bounds are avg ± sigma·σ; the all-missing
    query NULLs every extended stat (the greatest(0, NULL) -> 0 trap)."""
    import math

    from angle_spark.query.wand import aggregate_matches

    _, toks = corpus
    a, b, c, _ = _common_terms(toks)
    merged, tstats, meta = load_index(spark, index_dir)
    keys = {d: float((d * 13) % 53) for d in range(len(toks)) if d % 4 != 3}

    def vdf(mapping):
        return spark.createDataFrame(
            [(int(d), float(v)) for d, v in mapping.items()],
            "doc_id long, value double",
        )

    q = _qdf(spark, [("e", f"{a} {b}", 1)])
    got = aggregate_matches(
        spark, merged, tstats, meta, q, vdf(keys), extended=True, sigma=1.5
    ).toPandas()
    docs = [d for d, tk in enumerate(toks) if a in tk or b in tk]
    vals = [keys[d] for d in docs if d in keys]
    n = len(vals)
    s, ss = sum(vals), sum(v * v for v in vals)
    var_pop = max(0.0, (ss - s * s / n) / n)
    var_samp = max(0.0, (ss - s * s / n) / (n - 1))
    row = got.iloc[0]
    assert int(row["n_docs"]) == len(docs) and int(row["n_values"]) == n
    assert float(row["sum_of_squares"]) == ss
    assert math.isclose(float(row["variance"]), var_pop, rel_tol=1e-12)
    assert math.isclose(float(row["variance_sampling"]), var_samp, rel_tol=1e-12)
    assert math.isclose(
        float(row["std_deviation"]), math.sqrt(var_pop), rel_tol=1e-12
    )
    assert math.isclose(
        float(row["std_upper"]),
        s / n + 1.5 * math.sqrt(var_pop),
        rel_tol=1e-12,
    )
    assert math.isclose(
        float(row["std_lower"]),
        s / n - 1.5 * math.sqrt(var_pop),
        rel_tol=1e-12,
    )

    # exactly ONE valued match -> population variance 0, sampling NULL
    one = {docs[0]: 7.0}
    got = aggregate_matches(
        spark, merged, tstats, meta, q, vdf(one), extended=True
    ).toPandas()
    row = got.iloc[0]
    assert int(row["n_values"]) == 1
    assert float(row["variance"]) == 0.0 and float(row["std_deviation"]) == 0.0
    assert pd.isna(row["variance_sampling"])
    assert pd.isna(row["std_deviation_sampling"])

    # all-missing -> every extended stat NULL (not 0)
    qb = _qdf(spark, [("eb", f"{a} AND NOT {c}", 1)])
    matched = [d for d, tk in enumerate(toks) if a in tk and c not in tk]
    none_vals = {d: 1.0 for d in range(len(toks)) if d not in matched}
    got = aggregate_matches(
        spark, merged, tstats, meta, qb, vdf(none_vals),
        mode="boolean", extended=True,
    ).toPandas()
    row = got.iloc[0]
    assert int(row["n_values"]) == 0
    assert row[
        ["sum", "min", "max", "avg", "sum_of_squares", "variance",
         "variance_sampling", "std_deviation", "std_deviation_sampling",
         "std_upper", "std_lower"]
    ].isna().all()

    # plain (extended=False) output shape is unchanged: no sumsq column
    got = aggregate_matches(spark, merged, tstats, meta, q, vdf(keys)).toPandas()
    assert "sum_of_squares" not in got.columns

    with pytest.raises(ValueError, match="sigma"):
        aggregate_matches(
            spark, merged, tstats, meta, q, vdf(keys), extended=True, sigma=-1
        )


def test_top_metrics_matches(spark, index_dir, corpus):
    """top_metrics == brute force: metric values at the top-size docs
    by sort key (desc/asc), docID tie-break, missing keys last; extra
    metric columns come back verbatim."""
    from angle_spark.query.wand import top_metrics_matches

    _, toks = corpus
    a, b, _, _ = _common_terms(toks)
    merged, tstats, meta = load_index(spark, index_dir)
    n = len(toks)
    sort = spark.createDataFrame(
        [(d, float((d * 17) % 41)) for d in range(n) if d % 6 != 5],
        "doc_id long, key double",
    )
    metrics = spark.createDataFrame(
        [(d, f"m{d % 3}", d * 2) for d in range(n)],
        "doc_id long, tag string, twice long",
    )
    q = _qdf(spark, [("tm", f"{a} {b}", 99)])
    docs = [d for d, tk in enumerate(toks) if a in tk or b in tk]
    keyof = {d: float((d * 17) % 41) for d in range(n) if d % 6 != 5}

    for asc in (False, True):
        got = top_metrics_matches(
            spark, merged, tstats, meta, q, sort, metrics,
            size=3, sort_ascending=asc,
        ).toPandas().sort_values("rank")
        keyed = [d for d in docs if d in keyof]
        want = sorted(
            keyed, key=lambda d: ((keyof[d] if asc else -keyof[d]), d)
        )[:3]
        assert list(got["doc_id"]) == want, asc
        assert list(got["sort_value"]) == [keyof[d] for d in want]
        assert list(got["tag"]) == [f"m{d % 3}" for d in want]
        assert list(got["twice"]) == [d * 2 for d in want]

    with pytest.raises(ValueError, match="size"):
        top_metrics_matches(
            spark, merged, tstats, meta, q, sort, metrics, size=0
        )


def test_weighted_avg_matches(spark, index_dir, corpus):
    """weighted_avg == Σ(v·w)/Σ(w) brute force with ES missing rules:
    a doc missing value OR weight is skipped unless the matching
    missing_* substitution is configured; zero weight sum -> NULL."""
    import math

    from angle_spark.query.wand import weighted_avg_matches

    _, toks = corpus
    a, b, _, _ = _common_terms(toks)
    merged, tstats, meta = load_index(spark, index_dir)
    n = len(toks)
    rows = [
        (
            d,
            float((d * 7) % 31) if d % 3 != 2 else None,   # value gaps
            float(1 + d % 4) if d % 5 != 0 else None,      # weight gaps
        )
        for d in range(n)
    ]
    vdf = spark.createDataFrame(rows, "doc_id long, value double, weight double")
    q = _qdf(spark, [("w", f"{a} {b}", 1)])
    docs = [d for d, tk in enumerate(toks) if a in tk or b in tk]

    def brute(mv=None, mw=None):
        tot = wsum = cnt = 0.0
        for d in docs:
            v = rows[d][1] if rows[d][1] is not None else mv
            w = rows[d][2] if rows[d][2] is not None else mw
            if v is None or w is None:
                continue
            tot += v * w
            wsum += w
            cnt += 1
        return cnt, (tot / wsum if wsum else None)

    got = weighted_avg_matches(spark, merged, tstats, meta, q, vdf).toPandas()
    cnt, wa = brute()
    row = got.iloc[0]
    assert int(row["n_values"]) == cnt
    assert math.isclose(float(row["weighted_avg"]), wa, rel_tol=1e-12)

    # missing substitutions flip skipped docs into contributors
    got = weighted_avg_matches(
        spark, merged, tstats, meta, q, vdf,
        missing_value=10.0, missing_weight=1.0,
    ).toPandas()
    cnt2, wa2 = brute(mv=10.0, mw=1.0)
    row = got.iloc[0]
    assert int(row["n_values"]) == cnt2 == len(docs) > cnt
    assert math.isclose(float(row["weighted_avg"]), wa2, rel_tol=1e-12)

    # all weights zero -> NULL (no ANSI divide error), n_values intact
    zw = spark.createDataFrame(
        [(d, 1.0, 0.0) for d in range(n)], "doc_id long, value double, weight double"
    )
    row = weighted_avg_matches(
        spark, merged, tstats, meta, q, zw
    ).toPandas().iloc[0]
    assert int(row["n_values"]) == len(docs)
    assert pd.isna(row["weighted_avg"])


def test_searcher_aggregate_parity(spark, index_dir, corpus):
    from angle_spark.query.searcher import Searcher
    from angle_spark.query.wand import aggregate_matches

    _, toks = corpus
    a = _common_terms(toks, 1)[0]
    merged, tstats, meta = load_index(spark, index_dir)
    vals = spark.createDataFrame(
        [(int(d), float(len(tk))) for d, tk in enumerate(toks)],
        "doc_id long, value double",
    )
    q = _qdf(spark, [("q", a, 1)])
    direct = aggregate_matches(spark, merged, tstats, meta, q, vals).toPandas()
    s = Searcher(spark, index_dir)
    via = s.aggregate(q, vals).toPandas()
    s.close()
    pd.testing.assert_frame_equal(
        direct.sort_values("query_id").reset_index(drop=True),
        via.sort_values("query_id").reset_index(drop=True),
    )


def test_group_matches_buckets(spark, index_dir, corpus):
    """terms-agg == brute force: per-bucket doc counts and value stats;
    docs without a group label are skipped (ES missing-bucket default);
    within a bucket the value missing rule holds; an all-missing bucket
    NULLs its value stats; counts-only shape when no metric is given;
    deletes compose through the Searcher."""
    import collections

    from angle_spark.query.wand import group_matches

    _, toks = corpus
    a, b = _common_terms(toks, 2)
    merged, tstats, meta = load_index(spark, index_dir)
    grp = {d: f"g{d % 5}" for d in range(len(toks)) if d % 7 != 6}
    val = {d: float((d * 17) % 31) for d in range(len(toks)) if d % 3 != 2}
    gdf = spark.createDataFrame(
        [(int(d), g) for d, g in grp.items()], "doc_id long, lang string"
    )
    vdf = spark.createDataFrame(
        [(int(d), v) for d, v in val.items()], "doc_id long, value double"
    )
    q = _qdf(spark, [("q1", f"{a} {b}", 1)])

    def brute(universe):
        matched = [d for d in universe if a in toks[d] or b in toks[d]]
        nd: collections.Counter = collections.Counter()
        vals = collections.defaultdict(list)
        for d in matched:
            if d in grp:
                nd[grp[d]] += 1
                if d in val:
                    vals[grp[d]].append(val[d])
        return nd, vals

    nd, vals = brute(range(len(toks)))
    got = group_matches(spark, merged, tstats, meta, q, gdf, vdf).toPandas()
    assert set(got["group"]) == set(nd)
    for _, r in got.iterrows():
        g = r["group"]
        vs = vals.get(g, [])
        assert int(r["n_docs"]) == nd[g] and int(r["n_values"]) == len(vs)
        if vs:
            assert abs(float(r["sum"]) - sum(vs)) < 1e-9
            assert float(r["min"]) == min(vs) and float(r["max"]) == max(vs)
            assert abs(float(r["avg"]) - sum(vs) / len(vs)) < 1e-9
        else:
            assert r[["sum", "min", "max", "avg"]].isna().all()

    # bucket whose matched docs all lack the metric -> NULL value stats
    g0_docs = [d for d, g in grp.items() if g == "g0"]
    vdf_no_g0 = spark.createDataFrame(
        [(int(d), v) for d, v in val.items() if d not in set(g0_docs)],
        "doc_id long, value double",
    )
    got = group_matches(spark, merged, tstats, meta, q, gdf, vdf_no_g0).toPandas()
    row = got[got["group"] == "g0"].iloc[0]
    assert int(row["n_docs"]) == nd["g0"] and int(row["n_values"]) == 0
    assert row[["sum", "min", "max", "avg"]].isna().all()

    # counts-only shape (no metric frame)
    got = group_matches(spark, merged, tstats, meta, q, gdf).toPandas()
    assert list(got.columns) == ["query_id", "group", "n_docs"]
    assert dict(zip(got["group"], got["n_docs"])) == dict(nd)

    # max_buckets guard raises loudly instead of truncating
    wide = spark.createDataFrame(
        [(int(d), str(d)) for d in range(len(toks))], "doc_id long, g string"
    )
    with pytest.raises(ValueError, match="max_buckets"):
        group_matches(spark, merged, tstats, meta, q, wide, max_buckets=10)


def test_searcher_group_applies_tombstones(
    spark, index_dir, corpus, tmp_path_factory
):
    import collections
    import shutil

    from angle_spark.index.deletes import delete_docs
    from angle_spark.query.searcher import Searcher

    _, toks = corpus
    a = _common_terms(toks, 1)[0]
    idx = str(tmp_path_factory.mktemp("grpdel") / "idx")
    shutil.copytree(index_dir, idx)
    matched = [d for d in range(len(toks)) if a in toks[d]]
    dead = set(matched[::2])
    delete_docs(
        spark, idx,
        spark.createDataFrame([(int(d),) for d in dead], "doc_id long"),
    )
    grp = {d: f"g{d % 3}" for d in range(len(toks))}
    gdf = spark.createDataFrame(
        [(int(d), g) for d, g in grp.items()], "doc_id long, lang string"
    )
    s = Searcher(spark, idx)
    got = s.group(_qdf(spark, [("q", a, 1)]), gdf).toPandas()
    s.close()
    nd = collections.Counter(grp[d] for d in matched if d not in dead)
    assert dict(zip(got["group"], got["n_docs"])) == dict(nd)


def test_searcher_count_applies_tombstones(
    spark, index_dir, corpus, tmp_path_factory
):
    import shutil

    from angle_spark.index.deletes import delete_docs
    from angle_spark.query.searcher import Searcher

    _, toks = corpus
    a = _common_terms(toks, 1)[0]
    idx = str(tmp_path_factory.mktemp("countdel") / "idx")
    shutil.copytree(index_dir, idx)
    victims = [d for d in range(len(toks)) if a in toks[d]][:3]
    assert len(victims) == 3
    delete_docs(
        spark, idx, spark.createDataFrame([(int(v),) for v in victims], "doc_id long")
    )
    s = Searcher(spark, idx)
    out = s.count(_qdf(spark, [("q", a, 1)])).toPandas()
    want = sum(1 for d, tk in enumerate(toks) if a in tk) - 3
    assert dict(zip(out["query_id"], out["total_hits"])) == {"q": want}
    s.close()

"""Boosting + constant-score queries (query/boosting.py): ES boosting
query demotes — never excludes — docs matching a negative query
(score * negative_boost, applied in the shard kernel before selection);
constant_score gives every match a fixed score in docID order.
Contract: brute-force parity against an independent python recompute,
membership invariance, per-query factors, OOV negatives as no-ops,
deletes composition, and the (0, 1] factor guard."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from angle_spark.index.build import build_index, load_index
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.query.boosting import boosting_topk, constant_score_topk
from angle_spark.query.wand import matched_ids, wand_topk
from angle_spark.synth import transcripts_df

N_CONVS = 30
SEED = 11


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    docs = (
        with_tokens(
            assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4))
        )
        .select("doc_id", "tokens", "dl")
    )
    out = str(tmp_path_factory.mktemp("boosting") / "idx")
    build_index(
        spark, docs, out, segment_docs=128, block_size=16, positional=True
    )
    return out


def _brute(plain: pd.DataFrame, neg: pd.DataFrame, nb) -> pd.DataFrame:
    """Independent demote-then-rerank recompute over the plain scores."""
    negset = {(r.query_id, r.doc_id) for r in neg.itertuples(index=False)}
    ref = plain.copy()
    ref["score"] = [
        s * (nb[q] if isinstance(nb, dict) else nb)
        if (q, d) in negset
        else s
        for q, d, s in zip(ref["query_id"], ref["doc_id"], ref["score"])
    ]
    ref = ref.sort_values(
        ["query_id", "score", "doc_id"], ascending=[True, False, True]
    )
    ref["rank"] = (ref.groupby("query_id").cumcount() + 1).astype(ref["rank"].dtype)
    return ref


def test_boosting_brute_force_parity(spark, index_dir):
    merged, tstats, meta = load_index(spark, index_dir)
    q = pd.DataFrame(
        [
            ("b1", "w0003 OR w0042", "w0042", 2000),
            ("b2", "w0005 AND w0007", '"w0001 w0002"', 2000),
            ("b3", "w0009", "zzzz", 2000),  # OOV negative: no demotion
            ("b4", "w0011", "w0011 AND w0004", 2000),  # negative subset
        ],
        columns=["query_id", "text", "negative", "k"],
    )
    nb = 0.01  # small enough to reorder across idf gaps
    got = boosting_topk(
        spark, merged, tstats, meta, q, negative_boost=nb
    ).toPandas()
    plain = wand_topk(
        spark, merged, tstats, meta, q[["query_id", "text", "k"]],
        mode="boolean", prune=False,
    ).toPandas()
    neg = matched_ids(
        spark, merged, tstats, meta,
        q[["query_id", "negative", "k"]].rename(columns={"negative": "text"}),
        mode="boolean",
    ).toPandas()
    ref = _brute(plain, neg, nb)
    key = ["query_id", "rank", "doc_id"]
    a = got.sort_values(key).reset_index(drop=True)
    b = ref.sort_values(key).reset_index(drop=True)[a.columns]
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))
    # membership is the positive query's alone
    assert set(zip(a["query_id"], a["doc_id"])) == set(
        zip(plain["query_id"], plain["doc_id"])
    )
    # demotion is load-bearing: b1's ranks moved vs plain
    m = a[a.query_id == "b1"].merge(
        plain[plain.query_id == "b1"], on="doc_id", suffixes=("", "_p")
    )
    assert (m["rank"] != m["rank_p"]).any()
    # b3 (OOV negative) is untouched
    m3 = a[a.query_id == "b3"].merge(
        plain[plain.query_id == "b3"], on="doc_id", suffixes=("", "_p")
    )
    assert (m3["rank"] == m3["rank_p"]).all()
    assert np.allclose(m3["score"], m3["score_p"])


def test_boosting_per_query_factors(spark, index_dir):
    merged, tstats, meta = load_index(spark, index_dir)
    q = pd.DataFrame(
        [
            ("p1", "w0003 OR w0042", "w0042", 2000),
            ("p2", "w0003 OR w0042", "w0042", 2000),
        ],
        columns=["query_id", "text", "negative", "k"],
    )
    nb = {"p1": 0.01, "p2": 1.0}  # p2: factor 1 = no-op demotion
    got = boosting_topk(
        spark, merged, tstats, meta, q, negative_boost=nb
    ).toPandas()
    plain = wand_topk(
        spark, merged, tstats, meta, q[["query_id", "text", "k"]],
        mode="boolean", prune=False,
    ).toPandas()
    neg = matched_ids(
        spark, merged, tstats, meta,
        q[["query_id", "negative", "k"]].rename(columns={"negative": "text"}),
        mode="boolean",
    ).toPandas()
    ref = _brute(plain, neg, nb)
    key = ["query_id", "rank", "doc_id"]
    a = got.sort_values(key).reset_index(drop=True)
    b = ref.sort_values(key).reset_index(drop=True)[a.columns]
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))
    # p2 equals plain exactly (factor 1.0 is the identity multiply)
    p2 = a[a.query_id == "p2"].reset_index(drop=True)
    pl2 = plain[plain.query_id == "p2"].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(p2, pl2[p2.columns].astype(p2.dtypes.to_dict()))


def test_boosting_composes_with_deletes(spark, index_dir):
    merged, tstats, meta = load_index(spark, index_dir)
    q = pd.DataFrame(
        [("d1", "w0003 OR w0042", "w0042", 2000)],
        columns=["query_id", "text", "negative", "k"],
    )
    full = boosting_topk(
        spark, merged, tstats, meta, q, negative_boost=0.01
    ).toPandas()
    victims = sorted(full["doc_id"])[:5]
    deletes = spark.createDataFrame(
        [(int(d),) for d in victims], "doc_id long"
    )
    got = boosting_topk(
        spark, merged, tstats, meta, q, negative_boost=0.01, deletes=deletes
    ).toPandas()
    assert not (set(got["doc_id"]) & set(victims))
    assert set(got["doc_id"]) == set(full["doc_id"]) - set(victims)


def test_boosting_guards(spark, index_dir):
    merged, tstats, meta = load_index(spark, index_dir)
    q = pd.DataFrame(
        [("g1", "w0003", "w0042", 10)],
        columns=["query_id", "text", "negative", "k"],
    )
    for bad in (0.0, -0.5, 1.5):
        with pytest.raises(ValueError, match="negative_boost"):
            boosting_topk(spark, merged, tstats, meta, q, negative_boost=bad)
    with pytest.raises(ValueError, match="negative_boost"):
        boosting_topk(
            spark, merged, tstats, meta, q, negative_boost={"g1": 2.0}
        )
    # wand-level guards: demote_sets needs topk collector, no sort_meta
    ids = spark.createDataFrame([(0,)], "doc_id long").selectExpr(
        "'g1' AS query_id", "doc_id"
    )
    with pytest.raises(ValueError, match="collector"):
        wand_topk(
            spark, merged, tstats, meta,
            q[["query_id", "text", "k"]],
            mode="boolean", collector="count", demote_sets=ids,
        )


def test_must_not_complement(spark, index_dir):
    """must_not == the exact live-docs complement of matched_ids: ES
    bool-with-only-must_not (match_all minus the query). OOV negation
    returns the FULL universe; deletes shrink both sides; the ranked
    rendition cuts the k smallest complement docIDs at constant score."""
    from angle_spark.query.boosting import must_not_ids, must_not_topk

    merged, tstats, meta = load_index(spark, index_dir)
    q = pd.DataFrame(
        [
            ("m1", "w0003 OR w0042", 5),
            ("m2", "zzzz", 5),                 # OOV -> complement = all
            ("m3", "w0042 AND NOT w0003", 5),
        ],
        columns=["query_id", "text", "k"],
    )
    universe = set(range(meta.n_docs))
    matched = matched_ids(spark, merged, tstats, meta, q, mode="boolean").toPandas()
    got = must_not_ids(spark, merged, tstats, meta, q).toPandas()
    for qid in ("m1", "m2", "m3"):
        pos = {d for _, d in matched[matched.query_id == qid][["query_id", "doc_id"]].itertuples(index=False)}
        comp = set(got[got.query_id == qid]["doc_id"])
        assert comp == universe - pos, qid
    assert set(got[got.query_id == "m2"]["doc_id"]) == universe

    # ranked rendition: k smallest complement docIDs, constant score
    top = must_not_topk(
        spark, merged, tstats, meta, q, boost=0.5
    ).toPandas()
    assert (top["score"] == 0.5).all()
    for qid, g in top.groupby("query_id"):
        comp = sorted(set(got[got.query_id == qid]["doc_id"]))[:5]
        assert list(g.sort_values("rank")["doc_id"]) == comp, qid

    # deletes shrink the axis AND the membership pass
    dels = spark.createDataFrame(
        [(int(d),) for d in range(0, meta.n_docs, 7)], "doc_id long"
    )
    gdel = must_not_ids(
        spark, merged, tstats, meta, q, deletes=dels
    ).toPandas()
    live = universe - set(range(0, meta.n_docs, 7))
    for qid in ("m1", "m3"):
        pos = {d for d in matched[matched.query_id == qid]["doc_id"] if d in live}
        assert set(gdel[gdel.query_id == qid]["doc_id"]) == live - pos, qid

    # guards: purged index needs an explicit universe; duplicate qids
    class _Purged:
        pass

    import copy

    pm = copy.copy(meta)
    pm.purged_docs = 3
    with pytest.raises(ValueError, match="purged"):
        must_not_ids(spark, merged, tstats, pm, q)
    # explicit doc_ids unblocks the purged case
    uni = spark.createDataFrame([(int(d),) for d in sorted(live)], "doc_id long")
    gp = must_not_ids(
        spark, merged, tstats, pm, q.iloc[[0]], doc_ids=uni
    ).toPandas()
    pos = {d for d in matched[matched.query_id == "m1"]["doc_id"]}
    assert set(gp["doc_id"]) == live - pos
    with pytest.raises(ValueError, match="duplicate"):
        must_not_ids(
            spark, merged, tstats, meta,
            pd.DataFrame([("x", "a", 1), ("x", "b", 1)],
                         columns=["query_id", "text", "k"]),
        )

    # Searcher parity (stateless == serving path, no session tombstones)
    from angle_spark.query.searcher import Searcher

    s = Searcher(spark, index_dir)
    try:
        sv = s.must_not(q, boost=0.5).toPandas()
        a = sv.sort_values(["query_id", "rank"]).reset_index(drop=True)
        b = top.sort_values(["query_id", "rank"]).reset_index(drop=True)
        assert a[["query_id", "rank", "doc_id", "score"]].equals(
            b[["query_id", "rank", "doc_id", "score"]]
        )
    finally:
        s.close()


def test_constant_score(spark, index_dir):
    merged, tstats, meta = load_index(spark, index_dir)
    q = pd.DataFrame(
        [
            ("c1", "w0003 OR w0042", 7),
            ("c2", "zzzz", 7),           # dead query: no rows
            ("c3", "w0042 AND NOT w0003", 7),
        ],
        columns=["query_id", "text", "k"],
    )
    got = constant_score_topk(
        spark, merged, tstats, meta, q, boost=3.25
    ).toPandas()
    assert (got["score"] == 3.25).all()
    assert "c2" not in set(got["query_id"])
    # docID order, k-cut: the k smallest matching docIDs, ranks 1..k
    ids = matched_ids(
        spark, merged, tstats, meta, q, mode="boolean"
    ).toPandas()
    for qid, g in got.groupby("query_id"):
        want = sorted(ids[ids.query_id == qid]["doc_id"])[:7]
        have = list(g.sort_values("rank")["doc_id"])
        assert have == want, qid
        assert list(g.sort_values("rank")["rank"]) == list(
            range(1, len(want) + 1)
        )

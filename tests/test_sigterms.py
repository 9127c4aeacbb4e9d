"""Significant-terms aggregation (query/sigterms.py) — round 5.

Contracts under test:
- JLH scores and the per-query top-N cut match an independent pandas
  fold on literal inputs (ties break on term ASC, scores rounded to 6);
- min_doc_count noise-filters foreground terms below the threshold;
- duplicate (query_id, doc_id) hits are deduplicated before counting;
- invalid top_terms / min_doc_count raise;
- plan shape: the hits and foreground sides broadcast — the tf scan is
  never hash-exchanged on doc_id.
"""
from __future__ import annotations

import pandas as pd
import pytest

from angle_spark.query.sigterms import significant_terms


@pytest.fixture(scope="module")
def frames(spark):
    # 6 docs; "cat" concentrated in docs 0-2, "dog" spread everywhere,
    # "rare" only in doc 0 (below min_doc_count for fg={0,1,2}).
    rows = []
    for d in range(6):
        rows.append((d, "dog", 1))
        if d < 3:
            rows.append((d, "cat", 2))
        if d in (3, 4):
            rows.append((d, "bird", 1))
    rows.append((0, "rare", 5))
    tf = spark.createDataFrame(rows, "doc_id long, term string, tf long")
    tstats = spark.createDataFrame(
        [("dog", 6), ("cat", 3), ("bird", 2), ("rare", 1)],
        "term string, df long",
    )
    hits = spark.createDataFrame(
        [("q1", 0), ("q1", 1), ("q1", 2), ("q1", 2), ("q2", 3), ("q2", 4)],
        "query_id string, doc_id long",
    )
    return tf, tstats, hits


def _expected(top_terms=10, min_doc_count=3):
    n_docs = 6
    fg_sets = {"q1": {0, 1, 2}, "q2": {3, 4}}
    doc_terms = {
        0: {"dog", "cat", "rare"},
        1: {"dog", "cat"},
        2: {"dog", "cat"},
        3: {"dog", "bird"},
        4: {"dog", "bird"},
        5: {"dog"},
    }
    df = {"dog": 6, "cat": 3, "bird": 2, "rare": 1}
    out = []
    for qid, docs in fg_sets.items():
        counts: dict[str, int] = {}
        for d in docs:
            for t in doc_terms[d]:
                counts[t] = counts.get(t, 0) + 1
        scored = []
        for t, fg in counts.items():
            if fg < min_doc_count:
                continue
            fgp = fg / len(docs)
            bgp = df[t] / n_docs
            scored.append((t, fg, df[t], round((fgp - bgp) * (fgp / bgp), 6)))
        scored.sort(key=lambda r: (-r[3], r[0]))
        for rank, (t, fg, bg, s) in enumerate(scored[:top_terms], 1):
            out.append((qid, rank, t, fg, bg, s))
    return pd.DataFrame(
        out, columns=["query_id", "rank", "term", "fg_count", "bg_count", "score"]
    )


def _run(frames, **kw):
    tf, tstats, hits = frames
    got = (
        significant_terms(tf, tstats, hits, n_docs=6, **kw)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    got["rank"] = got["rank"].astype(int)
    got["fg_count"] = got["fg_count"].astype(int)
    got["bg_count"] = got["bg_count"].astype(int)
    return got


def test_jlh_scores_and_cut_match_pandas(frames):
    exp = _expected(min_doc_count=1).sort_values(["query_id", "rank"])
    pd.testing.assert_frame_equal(
        _run(frames, min_doc_count=1), exp.reset_index(drop=True)
    )
    # q1 is "about" cat (enriched 3/3 vs 3/6) more than dog (3/3 vs 6/6,
    # zero lift); rare is exclusive but in only 1 fg doc.
    got = _run(frames, min_doc_count=1)
    q1 = got[got.query_id == "q1"].set_index("term")
    assert q1.loc["cat", "rank"] < q1.loc["dog", "rank"]
    assert float(q1.loc["dog", "score"]) == 0.0


def test_min_doc_count_filters(frames):
    got = _run(frames)  # default min_doc_count=3
    assert set(got[got.query_id == "q1"].term) == {"cat", "dog"}
    assert got[got.query_id == "q2"].empty  # |fg|=2 < 3 for every term
    pd.testing.assert_frame_equal(
        got, _expected().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )


def test_top_terms_cut(frames):
    got = _run(frames, min_doc_count=1, top_terms=1)
    assert list(got.groupby("query_id")["rank"].max()) == [1, 1]
    assert got.set_index("query_id").loc["q1", "term"] == "cat"


def test_duplicate_hits_deduped(frames):
    # q1 contains (q1, 2) twice in the fixture; fg_count must still be 3.
    got = _run(frames, min_doc_count=1)
    assert int(got.query("query_id == 'q1' and term == 'cat'").fg_count.iloc[0]) == 3


def test_validation(frames):
    tf, tstats, hits = frames
    with pytest.raises(ValueError):
        significant_terms(tf, tstats, hits, 6, top_terms=0)
    with pytest.raises(ValueError):
        significant_terms(tf, tstats, hits, 6, min_doc_count=0)


def test_tf_scan_never_exchanged_on_doc_id(frames):
    tf, tstats, hits = frames
    plan = (
        significant_terms(tf, tstats, hits, 6)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange hashpartitioning(doc_id" not in plan
    assert "BroadcastHashJoin" in plan

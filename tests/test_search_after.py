"""search_after cursor pagination (wand_topk(search_after=...)) — round 5.

Contracts under test:
- walking pages with each page's last (score, doc_id) as the next
  cursor reproduces the unpaged ranking exactly (doc/score sequence),
  with ranks restarting at 1 per page;
- a cursor page equals the same page fetched by offset (rank-shifted);
- prune=True and prune=False agree under a cursor (single- and
  multi-term — the pruned walk's theta is cursor-aware);
- cursors compose with sort-by-field in both directions (cursor in
  sort-key space);
- boolean mode pages tile;
- queries absent from the cursor dict get page 1; a cursor past the
  answer set yields an empty page;
- validation: offset+search_after, non-topk collectors, malformed
  cursors all raise.
"""
from __future__ import annotations

import pandas as pd
import pytest

from angle_spark.functions.tokenizer import tokenize_py
from angle_spark.index.build import build_index, load_index
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.index.stats import with_tokens
from angle_spark.query.wand import wand_topk
from angle_spark.synth import transcripts_df, transcripts_pdf

N_CONVS = 30
SEED = 7


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    docs = with_tokens(
        assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4))
    ).select("doc_id", "tokens", "dl")
    out = str(tmp_path_factory.mktemp("sa") / "idx")
    build_index(spark, docs, out, segment_docs=128, block_size=16, positional=True)
    return out


@pytest.fixture(scope="module")
def loaded(spark, index_dir):
    return load_index(spark, index_dir)


@pytest.fixture(scope="module")
def terms():
    tp = transcripts_pdf(N_CONVS, seed=SEED)
    from collections import Counter

    cnt = Counter(
        t
        for txt in tp["text"]
        for t in set(tokenize_py(txt if isinstance(txt, str) else ""))
    )
    return [t for t, _ in cnt.most_common(4)]


def _qdf(spark, queries):
    return spark.createDataFrame(queries, schema="query_id string, text string, k int")


def _fetch(spark, loaded, queries, **kw):
    merged, tstats, meta = loaded
    return (
        wand_topk(spark, merged, tstats, meta, _qdf(spark, queries), **kw)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def _cursors(page):
    return {
        qid: (float(g["score"].iloc[-1]), int(g["doc_id"].iloc[-1]))
        for qid, g in page.groupby("query_id")
        if len(g)
    }


def test_cursor_walk_tiles_unpaged_ranking(spark, loaded, terms):
    a, b, c, _ = terms
    queries = [("w1", f"{a} {b}", 7), ("w2", f"{b} {c}", 7)]
    full = _fetch(spark, loaded, [(q, t, 28) for q, t, _ in queries])
    pages, cur = [], None
    for _ in range(4):
        pg = _fetch(spark, loaded, queries, search_after=cur)
        for _, g in pg.groupby("query_id"):
            assert list(g["rank"]) == list(range(1, len(g) + 1))
        pages.append(pg)
        cur = _cursors(pg)
        if not cur:
            break
    walked = pd.concat(pages).reset_index(drop=True)
    for qid in ("w1", "w2"):
        w = walked[walked.query_id == qid].reset_index(drop=True)
        f = full[full.query_id == qid].reset_index(drop=True)
        n = min(len(w), len(f))
        assert n == len(f) or len(w) >= len(f)
        pd.testing.assert_frame_equal(
            w[["doc_id", "score"]].head(len(f)), f[["doc_id", "score"]]
        )


def test_cursor_page_equals_offset_page(spark, loaded, terms):
    a, b, _, _ = terms
    queries = [("q", f"{a} {b}", 10)]
    page1 = _fetch(spark, loaded, queries)
    by_cursor = _fetch(spark, loaded, queries, search_after=_cursors(page1))
    by_offset = _fetch(spark, loaded, queries, offset=10)
    assert list(by_cursor["doc_id"]) == list(by_offset["doc_id"])
    assert list(by_cursor["score"]) == list(by_offset["score"])
    assert list(by_cursor["rank"]) == [r - 10 for r in by_offset["rank"]]


def test_prune_agrees_under_cursor(spark, loaded, terms):
    a, b, _, _ = terms
    for qs in ([("s", a, 6)], [("m", f"{a} {b}", 6)]):
        p1 = _fetch(spark, loaded, qs, prune=True)
        cur = _cursors(p1)
        exact = _fetch(spark, loaded, qs, prune=False, search_after=cur)
        pruned = _fetch(spark, loaded, qs, prune=True, search_after=cur)
        pd.testing.assert_frame_equal(pruned, exact)


def test_cursor_with_sort_meta_both_directions(spark, loaded, terms):
    a, _, _, _ = terms
    merged, tstats, meta = loaded
    keys = spark.createDataFrame(
        [(d, float((d * 13) % 101)) for d in range(meta.n_docs) if d % 6 != 5],
        "doc_id long, sort_key double",
    )
    for asc in (False, True):
        qs = [("q", a, 8)]
        full = _fetch(
            spark, loaded, [("q", a, 16)], sort_meta=keys, sort_ascending=asc
        )
        p1 = _fetch(spark, loaded, qs, sort_meta=keys, sort_ascending=asc)
        p2 = _fetch(
            spark, loaded, qs, sort_meta=keys, sort_ascending=asc,
            search_after=_cursors(p1),
        )
        tiled = pd.concat([p1, p2]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            tiled[["doc_id", "score"]].head(len(full)),
            full[["doc_id", "score"]].head(len(tiled)),
        )


def test_boolean_mode_cursor_tiles(spark, loaded, terms):
    a, _, c, _ = terms
    full = _fetch(
        spark, loaded, [("b", f"{a} AND NOT {c}", 16)], mode="boolean"
    )
    p1 = _fetch(spark, loaded, [("b", f"{a} AND NOT {c}", 8)], mode="boolean")
    p2 = _fetch(
        spark, loaded, [("b", f"{a} AND NOT {c}", 8)], mode="boolean",
        search_after=_cursors(p1),
    )
    tiled = pd.concat([p1, p2]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        tiled[["doc_id", "score"]].head(len(full)),
        full[["doc_id", "score"]].head(len(tiled)),
    )


def test_absent_query_gets_page_one_and_past_end_empty(spark, loaded, terms):
    a, b, _, _ = terms
    queries = [("q1", a, 5), ("q2", b, 5)]
    p1 = _fetch(spark, loaded, queries)
    only_q1 = {k: v for k, v in _cursors(p1).items() if k == "q1"}
    mixed = _fetch(spark, loaded, queries, search_after=only_q1)
    pd.testing.assert_frame_equal(
        mixed[mixed.query_id == "q2"].reset_index(drop=True),
        p1[p1.query_id == "q2"].reset_index(drop=True),
    )
    assert not set(mixed[mixed.query_id == "q1"].doc_id) & set(
        p1[p1.query_id == "q1"].doc_id
    )
    # a cursor below every score yields an empty page
    past = _fetch(spark, loaded, [("q1", a, 5)], search_after={"q1": (-1e18, 0)})
    assert past.empty


def test_validation(spark, loaded):
    merged, tstats, meta = loaded
    q = _qdf(spark, [("q", "x", 5)])
    with pytest.raises(ValueError, match="mutually exclusive"):
        wand_topk(
            spark, merged, tstats, meta, q, offset=5, search_after={"q": (1.0, 2)}
        )
    with pytest.raises(ValueError, match="collector"):
        wand_topk(
            spark, merged, tstats, meta, q, collector="count",
            search_after={"q": (1.0, 2)},
        )
    with pytest.raises(ValueError, match="last_score"):
        wand_topk(spark, merged, tstats, meta, q, search_after={"q": (1.0,)})

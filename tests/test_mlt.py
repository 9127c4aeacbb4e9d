"""More-Like-This (query/mlt.py): distinctive-term selection + BM25
retrieval with the source doc excluded before ranking."""

from __future__ import annotations

import math

import pytest

from angle_spark.index.stats import (
    corpus_stats,
    term_frequencies,
    term_stats,
    with_tokens,
)
from angle_spark.query.mlt import more_like_this, select_mlt_terms

TEXTS = [
    "join hash join merge bloom",      # 0: bloom is rare -> distinctive
    "hash table scan scan",            # 1
    "merge sort merge the",            # 2
    "join the small table bloom",      # 3: shares bloom+join with 0
    "the the filter window",           # 4
    "vector data stream window",       # 5
]


@pytest.fixture(scope="module")
def corpus(spark):
    docs = with_tokens(
        spark.createDataFrame(
            [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
        )
    ).select("doc_id", "tokens", "dl")
    tf = term_frequencies(docs).localCheckpoint()
    n, avgdl = corpus_stats(docs)
    return tf, term_stats(tf, n), n, avgdl


def test_term_selection_rank_and_cap(spark, corpus):
    tf, tstats, n, _ = corpus
    sel = select_mlt_terms(tf, tstats, [0], n, max_terms=2).collect()
    terms = [r["term"] for r in sel]
    # doc 0: tf join=2, hash=1, merge=1, bloom=1; dfs: join 2, hash 2,
    # merge 2, bloom 2 -> w(join)=2ln(3) biggest; 1-tf terms tie on
    # w=ln(3) -> term ASC picks 'bloom'
    golden = sorted(
        [("join", 2 * math.log(n / 2)), ("bloom", math.log(n / 2))],
        key=lambda x: -x[1],
    )
    assert terms == [t for t, _ in golden]
    assert len(terms) == 2


def test_mlt_excludes_source_and_ranks_dense(spark, corpus):
    tf, tstats, n, avgdl = corpus
    out = more_like_this(tf, tstats, [0, 4], n, avgdl, k=10, max_terms=3)
    rows = out.collect()
    by_q: dict[str, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {"mlt_0", "mlt_4"}
    for qid, rs in by_q.items():
        src = int(qid.split("_")[1])
        ids = [r["doc_id"] for r in rs]
        assert src not in ids, f"{qid} returned its own source doc"
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1)), "ranks not dense"
    # doc 3 shares bloom+join with doc 0 -> must be mlt_0's top hit
    top0 = min(by_q["mlt_0"], key=lambda r: r["rank"])
    assert top0["doc_id"] == 3


def test_mlt_unknown_source_is_empty(spark, corpus):
    tf, tstats, n, avgdl = corpus
    out = more_like_this(tf, tstats, [999], n, avgdl, k=5)
    assert out.count() == 0

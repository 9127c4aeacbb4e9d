"""Property-based exactness of MaxScore pruning.

The skip rule (range-max(acc) + block bound + remaining bounds < theta)
carries a correctness proof in query/wand.py; this fuzzes it: random tiny
corpora (Zipfian-ish skew, ties everywhere), random multi-term queries,
tiny blocks (so skipping actually triggers) — pruned output must equal
the exhaustive fold BITWISE, and both must match a brute-force dict
accumulator."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import angle_spark.query.wand as wand_mod
from angle_spark.codec import B, K1
from angle_spark.index.spimi import _segment_blocks
from angle_spark.index.stats import idf_value


def _build_blocks(docs_tokens: list[list[str]], segment_docs: int, block_size: int):
    """pure-pandas mini SPIMI: same encoder the engine uses."""
    rows = []
    for doc_id, toks in enumerate(docs_tokens):
        rows.append((doc_id, toks, len(toks), doc_id // segment_docs))
    pdf = pd.DataFrame(rows, columns=["doc_id", "tokens", "dl", "segment_id"])
    avgdl = pdf["dl"].mean() if len(pdf) else 0.0
    parts = [
        _segment_blocks(g, avgdl, block_size)
        for _, g in pdf.groupby("segment_id")
    ]
    return pd.concat(parts, ignore_index=True), float(avgdl), len(pdf)


def _brute(docs_tokens, qterms, n_docs, avgdl, k):
    df = {}
    for toks in docs_tokens:
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    acc = {}
    for t in sorted(set(qterms)):
        if t not in df:
            continue
        idf = idf_value(n_docs, df[t])
        for doc_id, toks in enumerate(docs_tokens):
            tf = toks.count(t)
            if tf:
                denom = tf + K1 * (1.0 - B + B * len(toks) / avgdl)
                acc[doc_id] = acc.get(doc_id, 0.0) + idf * tf * (K1 + 1.0) / denom
    ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return ranked


VOCAB = ["a", "b", "c", "dd", "ee", "rare1", "rare2", "zz"]


@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    data=st.data(),
    n_docs=st.integers(min_value=1, max_value=120),
    k=st.integers(min_value=1, max_value=12),
)
def test_maxscore_bitwise_equals_exhaustive_and_brute(data, n_docs, k):
    docs = [
        data.draw(
            st.lists(st.sampled_from(VOCAB), min_size=0, max_size=12),
            label=f"doc{i}",
        )
        for i in range(n_docs)
    ]
    qterms = data.draw(
        st.lists(st.sampled_from(VOCAB), min_size=2, max_size=5), label="query"
    )
    if not any(docs):
        return
    blocks, avgdl, n = _build_blocks(docs, segment_docs=16, block_size=4)
    if not len(blocks):
        return
    df_map = blocks.groupby("term")["n_postings"].sum().to_dict()
    terms = sorted(t for t in set(qterms) if t in df_map)
    if len(terms) < 2:
        return
    qt = pd.DataFrame(
        [("q", k, terms, [idf_value(n, int(df_map[t])) for t in terms])],
        columns=["query_id", "k", "terms", "idfs"],
    )
    full = wand_mod._score_shard_multi(blocks, qt, avgdl, prune=False)
    pruned = wand_mod._score_shard_multi(blocks, qt, avgdl, prune=True)
    f = full.sort_values("doc_id").reset_index(drop=True)
    p = pruned.sort_values("doc_id").reset_index(drop=True)
    if not f.equals(p):  # dump the raw case for standalone debugging
        import json
        import os

        os.makedirs("/tmp/vrf", exist_ok=True)
        json.dump(
            {"docs": docs, "terms": terms, "k": k},
            open("/tmp/vrf/hypo_fail.json", "w"),
        )
    pd.testing.assert_frame_equal(f, p)  # bitwise: atol defaults to exact

    want = _brute(docs, terms, n, avgdl, k)
    got = sorted(zip(pruned["doc_id"], pruned["score"]), key=lambda kv: (-kv[1], kv[0]))
    assert [(d, s) for d, s in got] == want


def test_maxscore_boundary_tie_regression():
    """pinned corpus where ranking on the descending discovery fold
    flipped a k-boundary tie (docs whose ascending-fold scores differ by
    sub-ULP fold noise). Selection must come from the ascending re-fold."""
    import json
    import os

    case = json.load(
        open(os.path.join(os.path.dirname(__file__), "data_maxscore_regression.json"))
    )
    docs, terms, k = case["docs"], case["terms"], case["k"]
    blocks, avgdl, n = _build_blocks(docs, segment_docs=16, block_size=4)
    df_map = blocks.groupby("term")["n_postings"].sum().to_dict()
    terms = sorted(t for t in set(terms) if t in df_map)
    qt = pd.DataFrame(
        [("q", k, terms, [idf_value(n, int(df_map[t])) for t in terms])],
        columns=["query_id", "k", "terms", "idfs"],
    )
    full = wand_mod._score_shard_multi(blocks, qt, avgdl, prune=False)
    pruned = wand_mod._score_shard_multi(blocks, qt, avgdl, prune=True)
    pd.testing.assert_frame_equal(
        full.sort_values("doc_id").reset_index(drop=True),
        pruned.sort_values("doc_id").reset_index(drop=True),
    )
    want = _brute(docs, terms, n, avgdl, k)
    got = sorted(zip(pruned["doc_id"], pruned["score"]), key=lambda kv: (-kv[1], kv[0]))
    assert got == want

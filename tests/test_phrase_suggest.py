"""Phrase suggester (query/phrase_suggest.py): candidate generation +
stupid-backoff bigram LM, verified against a full pure-Python
replication of the model over the synth corpus."""

from __future__ import annotations

import math
from collections import Counter
from itertools import product

import pytest

from angle_spark.functions.tokenizer import tokenize_py
from angle_spark.index.build import build_index, load_index
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.query.phrase_suggest import (
    BACKOFF,
    bigram_counts,
    phrase_suggest,
)
from angle_spark.synth import transcripts_df, transcripts_pdf

N_CONVS, SEED = 15, 9


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    docs = with_tokens(
        assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4))
    ).select("doc_id", "tokens", "dl").localCheckpoint()
    out = str(tmp_path_factory.mktemp("psg") / "idx")
    build_index(spark, docs, out, segment_docs=256, block_size=32)
    _, tstats, meta = load_index(spark, out)
    bg = bigram_counts(docs).localCheckpoint()
    return tstats, bg, meta


@pytest.fixture(scope="module")
def model():
    """Pure-Python corpus model: cf, df, bigram counts, T."""
    pdf = transcripts_pdf(N_CONVS, seed=SEED)
    cf: Counter = Counter()
    df: Counter = Counter()
    bg: Counter = Counter()
    T = 0
    for text in pdf["text"]:
        toks = tokenize_py(text)
        T += len(toks)
        cf.update(toks)
        df.update(set(toks))
        bg.update(zip(toks, toks[1:]))
    return cf, df, bg, T


def _py_candidates(word, cf, df, max_dist, per_term):
    def lev(a, b):
        m, n = len(a), len(b)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (a[i - 1] != b[j - 1]),
                )
            prev = cur
        return prev[n]

    scored = []
    for t in cf:
        if abs(len(t) - len(word)) > max_dist:
            continue
        d = lev(word, t)
        if d <= max_dist:
            scored.append((d, -df[t], t))
    scored.sort()
    return [t for _, _, t in scored[:per_term]]


def _py_suggest(text, cf, df, bg, T, max_dist=1, per_term=3, top_n=3):
    toks = tokenize_py(text)
    cands = [_py_candidates(w, cf, df, max_dist, per_term) for w in toks]
    if any(not c for c in cands):
        return []
    outs = []
    for seq in product(*cands):
        s = math.log(cf[seq[0]]) - math.log(T)
        for a, b in zip(seq, seq[1:]):
            if (a, b) in bg:
                s += math.log(bg[(a, b)]) - math.log(cf[a])
            else:
                s += math.log(BACKOFF) + math.log(cf[b]) - math.log(T)
        outs.append((" ".join(seq), s))
    outs.sort(key=lambda x: (-x[1], x[0]))
    return outs[:top_n]


@pytest.mark.parametrize(
    "text",
    ["w0003 w0042", "w0001 w0002 w0015", "w003 w0042", "w0005"],
)
def test_matches_python_model(spark, setup, model, text):
    tstats, bg, _ = setup
    cf, df, bgm, T = model
    got = [
        (r["suggestion"], r["score"])
        for r in phrase_suggest(
            spark, tstats, bg, [("q", text)], top_n=3
        ).orderBy("rank").collect()
    ]
    want = _py_suggest(text, cf, df, bgm, T)
    assert [g[0] for g in got] == [w[0] for w in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9)


def test_identity_competes_and_context_binds(spark, setup, model):
    tstats, bg, _ = setup
    cf, df, bgm, T = model
    out = phrase_suggest(spark, tstats, bg, [("q", "w0003 w0042")], top_n=9)
    rows = out.collect()
    sugg = [r["suggestion"] for r in rows]
    assert "w0003 w0042" in sugg  # dist-0 candidates keep the original
    # every suggestion is per-position candidates joined in order
    for s in sugg:
        a, b = s.split(" ")
        assert a in _py_candidates("w0003", cf, df, 1, 3)
        assert b in _py_candidates("w0042", cf, df, 1, 3)


def test_unknown_token_kills_query(spark, setup):
    tstats, bg, _ = setup
    out = phrase_suggest(
        spark, tstats, bg, [("q", "zzzzzzzzzz w0042"), ("q2", "w0003 w0042")]
    )
    pdf = out.toPandas()
    assert set(pdf["query_id"]) == {"q2"}  # no candidates at pos 0 -> drop


def test_validation(spark, setup):
    tstats, bg, _ = setup
    with pytest.raises(ValueError):
        phrase_suggest(spark, tstats, bg, [("q", "w0003")], per_term=0)

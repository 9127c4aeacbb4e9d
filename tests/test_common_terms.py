"""Common-terms retrieval (query/common_terms.py — Lucene
CommonTermsQuery / ES match cutoff_frequency): low-df terms drive
membership, high-df terms only refine scores; all-high queries fall
back to plain OR; scores equal the disjunctive fold over the same
docs."""

from __future__ import annotations

import pandas as pd
import pytest

from angle_spark.index.build import build_index, load_index
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.query.common_terms import common_terms_topk, split_terms
from angle_spark.query.wand import wand_topk
from angle_spark.synth import transcripts_df

BIG_K = 1_000_000

HIGH, LOW = "w0000", "w0137"  # zipf head vs tail — dfs differ widely


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    docs = with_tokens(
        assign_doc_ids(transcripts_df(spark, 25, seed=3, partitions=4))
    ).select("doc_id", "tokens", "dl")
    out = str(tmp_path_factory.mktemp("ct") / "idx")
    build_index(spark, docs, out, segment_docs=128, block_size=16)
    return load_index(spark, out)


@pytest.fixture(scope="module")
def dfs(spark, idx):
    _, tstats, _ = idx
    rows = tstats.filter(tstats.term.isin([HIGH, LOW])).collect()
    out = {r["term"]: int(r["df"]) for r in rows}
    assert out[HIGH] > out[LOW] > 0, out
    return out


def _q(text):
    return pd.DataFrame([("q", text, BIG_K)], columns=["query_id", "text", "k"])


def _scores(df):
    return df.toPandas().set_index("doc_id")["score"].to_dict()


def _cut_between(dfs, meta):
    # a relative cutoff strictly between the two dfs: LOW low, HIGH high
    return (dfs[LOW] + dfs[HIGH]) / 2.0 / meta.live_docs


def test_low_term_drives_membership(spark, idx, dfs):
    merged, tstats, meta = idx
    cut = _cut_between(dfs, meta)
    ct = _scores(
        common_terms_topk(
            spark, merged, tstats, meta, _q(f"{HIGH} {LOW}"), cutoff=cut
        )
    )
    or_all = _scores(wand_topk(spark, merged, tstats, meta, _q(f"{HIGH} {LOW}")))
    low_docs = set(
        _scores(wand_topk(spark, merged, tstats, meta, _q(LOW)))
    )
    # membership = docs containing the LOW term; strictly fewer than OR
    assert set(ct) == low_docs
    assert len(ct) < len(or_all)
    # every hit keeps its FULL disjunctive score (high term still folds)
    for d, s in ct.items():
        assert s == or_all[d]


def test_all_high_falls_back_to_or(spark, idx, dfs, meta_cut=None):
    merged, tstats, meta = idx
    # cutoff below both dfs: both terms classify high -> plain OR
    cut = (dfs[LOW] / 2.0) / meta.live_docs
    ct = _scores(
        common_terms_topk(
            spark, merged, tstats, meta, _q(f"{HIGH} {LOW}"), cutoff=cut
        )
    )
    or_all = _scores(wand_topk(spark, merged, tstats, meta, _q(f"{HIGH} {LOW}")))
    assert ct == or_all


def test_absolute_cutoff_equivalent(spark, idx, dfs):
    merged, tstats, meta = idx
    rel = _cut_between(dfs, meta)
    absolute = float((dfs[LOW] + dfs[HIGH]) // 2)
    assert absolute >= 1.0
    a = _scores(
        common_terms_topk(
            spark, merged, tstats, meta, _q(f"{HIGH} {LOW}"), cutoff=rel
        )
    )
    b = _scores(
        common_terms_topk(
            spark, merged, tstats, meta, _q(f"{HIGH} {LOW}"), cutoff=absolute
        )
    )
    assert a == b


def test_oov_terms_vanish(spark, idx, dfs):
    merged, tstats, meta = idx
    cut = _cut_between(dfs, meta)
    got = _scores(
        common_terms_topk(
            spark, merged, tstats, meta, _q(f"zzzzqq {LOW}"), cutoff=cut
        )
    )
    want = _scores(wand_topk(spark, merged, tstats, meta, _q(LOW)))
    assert got == want


def test_all_oov_empty_stable_schema(spark, idx):
    merged, tstats, meta = idx
    out = common_terms_topk(
        spark, merged, tstats, meta, _q("zzzzqq yyyyxx"), cutoff=0.5
    )
    pdf = out.toPandas()
    assert len(pdf) == 0
    assert list(pdf.columns) == ["query_id", "rank", "doc_id", "score"]


def test_split_terms_rules():
    df_map = {"a": 10, "b": 90}
    low, high = split_terms(["a", "b", "oov"], df_map, 100, 0.5)
    assert (low, high) == (["a"], ["b"])
    # absolute cutoff >= 1
    low, high = split_terms(["a", "b"], df_map, 100, 50.0)
    assert (low, high) == (["a"], ["b"])
    # cutoff=0 -> everything high
    assert split_terms(["a"], df_map, 100, 0.0) == ([], ["a"])


def test_negative_cutoff_rejected(spark, idx):
    merged, tstats, meta = idx
    with pytest.raises(ValueError):
        common_terms_topk(
            spark, merged, tstats, meta, _q("w0001"), cutoff=-0.1
        )

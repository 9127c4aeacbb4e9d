"""SPIMI segment build + merge + lineage/resume + WAND shadow tests."""

from __future__ import annotations

import glob
import os

import pandas as pd
import pytest

from angle_spark.index.build import build_index, committed_segments, load_index
from angle_spark.index.stats import corpus_stats, term_frequencies, term_stats, with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.oracle import Bm25Oracle
from angle_spark.query.bm25 import bm25_topk
from angle_spark.query.wand import wand_topk
from angle_spark.synth import queries_df, queries_pdf, transcripts_df, transcripts_pdf

N_CONVS = 40
SEGMENT_DOCS = 128
BLOCK = 16


@pytest.fixture(scope="module")
def docs(spark):
    return with_tokens(
        assign_doc_ids(transcripts_df(spark, N_CONVS, seed=42, partitions=4))
    ).select("doc_id", "tokens", "dl").persist()


@pytest.fixture(scope="module")
def index_dir(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx") / "main")
    build_index(
        spark, docs, out, segment_docs=SEGMENT_DOCS, block_size=BLOCK, batch_segments=3
    )
    return out


@pytest.fixture(scope="module")
def oracle():
    return Bm25Oracle(transcripts_pdf(N_CONVS, seed=42))


def _merged_content(spark, out_dir) -> pd.DataFrame:
    df = spark.read.parquet(os.path.join(out_dir, "merged")).toPandas()
    df["docs_bin"] = df["docs_bin"].map(bytes)
    df["tfs_bin"] = df["tfs_bin"].map(bytes)
    df["dls_bin"] = df["dls_bin"].map(bytes)
    return df.sort_values(
        ["term", "segment_id", "block_in_seg"], kind="mergesort"
    ).reset_index(drop=True)


def test_block_invariants(spark, index_dir, oracle):
    m = _merged_content(spark, index_dir)
    assert (m["n_postings"] <= BLOCK).all()
    assert (m["first_doc"] <= m["last_doc"]).all()
    # total postings == oracle's distinct (term, doc) pairs
    assert m["n_postings"].sum() == sum(len(p) for p in oracle.tf.values())


def test_term_stats_match_oracle(spark, index_dir, oracle):
    _, tstats, meta = load_index(spark, index_dir)
    rows = tstats.collect()
    got = {r["term"]: r["df"] for r in rows}
    assert got == oracle.df
    # collection frequency: total occurrences per term
    got_cf = {r["term"]: r["cf"] for r in rows}
    assert got_cf == {t: sum(p.values()) for t, p in oracle.tf.items()}
    assert meta.n_docs == oracle.n_docs
    assert meta.avgdl == oracle.avgdl


def test_postings_decode_match_tf(spark, index_dir, docs):
    """Decoded merged blocks reproduce the exact (term, doc, tf, dl) set."""
    from angle_spark.index.spimi import decode_block

    m = _merged_content(spark, index_dir)
    rows = []
    for _, r in m.iterrows():
        d, t, dl = decode_block(r)
        for i in range(len(d)):
            rows.append((r["term"], int(d[i]), int(t[i]), int(dl[i])))
    got = pd.DataFrame(rows, columns=["term", "doc_id", "tf", "dl"]).sort_values(
        ["term", "doc_id"]
    ).reset_index(drop=True)
    want = (
        term_frequencies(docs)
        .select("term", "doc_id", "tf", "dl")
        .toPandas()
        .sort_values(["term", "doc_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)


def test_lineage_complete(spark, index_dir):
    lin = spark.read.parquet(os.path.join(index_dir, "lineage")).toPandas()
    n_segments = len(
        glob.glob(os.path.join(index_dir, "segments", "segment_id=*"))
    )
    assert set(lin["partition_id"]) == set(range(n_segments))
    assert (lin["doc_count"] > 0).all()
    assert (lin["term_count"] > 0).all()
    assert (lin["bytes"] > 0).all()


def test_wand_matches_oracle(spark, index_dir, oracle):
    merged, tstats, meta = load_index(spark, index_dir)
    got = (
        wand_topk(spark, merged, tstats, meta, queries_df(spark), prune=True)
        .toPandas()
        .sort_values(["query_id", "rank"])
    )
    golden = oracle.golden(queries_pdf())
    assert list(zip(got["query_id"], got["rank"], got["doc_id"])) == list(
        zip(golden["query_id"], golden["rank"], golden["doc_id"])
    )
    for g, w in zip(got["score"], golden["score"]):
        assert g == w  # exact float64


def test_query_term_stats_collects_only_query_terms(spark, index_dir, oracle):
    """the driver must receive |query terms ∩ vocab| rows, NEVER the
    vocabulary (round-1 verdict: full tstats.toPandas() OOMs at scale)."""
    from angle_spark.functions.tokenizer import tokenize_py
    from angle_spark.query.wand import query_term_stats

    merged, tstats, meta = load_index(spark, index_dir)
    qterms = sorted(
        {t for text in queries_pdf()["text"] for t in set(tokenize_py(text))}
    )
    got = query_term_stats(tstats, qterms)
    expected = {t for t in qterms if t in oracle.df}
    assert set(got["term"]) == expected
    assert len(got) == len(expected) < tstats.count()

    # the pandas opt-in path filters to the same rows, and both paths give
    # identical query results
    got_pdf = query_term_stats(tstats.toPandas(), qterms)
    assert sorted(got_pdf["term"]) == sorted(got["term"])
    a = (
        wand_topk(spark, merged, tstats, meta, queries_df(spark))
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    b = (
        wand_topk(spark, merged, tstats.toPandas(), meta, queries_df(spark))
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_wand_prune_equals_exhaustive(spark, index_dir):
    merged, tstats, meta = load_index(spark, index_dir)
    a = (
        wand_topk(spark, merged, tstats, meta, queries_df(spark), prune=True)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    b = (
        wand_topk(spark, merged, tstats, meta, queries_df(spark), prune=False)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_multiterm_prune_skips_decodes_and_matches(spark, index_dir, oracle):
    """MaxScore must (a) return bit-identical frames to the exhaustive
    fold and (b) actually skip block decodes for a rare+stopword query."""
    import angle_spark.query.wand as wand_mod

    merged = spark.read.parquet(os.path.join(index_dir, "merged")).toPandas()
    for col in ("docs_bin", "tfs_bin", "dls_bin"):
        merged[col] = merged[col].map(bytes)
    k = 3
    rare = sorted((df, t) for t, df in oracle.df.items() if df >= k)[0][1]
    common = max(oracle.df.items(), key=lambda kv: kv[1])[0]
    terms = sorted([rare, common])
    qt = pd.DataFrame(
        [("q1", k, terms, [oracle.idf(t) for t in terms])],
        columns=["query_id", "k", "terms", "idfs"],
    )

    # Count decoded BLOCKS through both decode primitives: the exhaustive
    # fold batch-decodes a whole term via decode_doc_deltas_concat (one
    # call, len(bufs) blocks) while MaxScore decodes per block through
    # decode_doc_deltas so it can skip.
    calls = {"n": 0}
    real_one = wand_mod.decode_doc_deltas
    real_concat = wand_mod.decode_doc_deltas_concat
    wand_mod.decode_doc_deltas = (
        lambda b: (calls.__setitem__("n", calls["n"] + 1), real_one(b))[1]
    )
    wand_mod.decode_doc_deltas_concat = (
        lambda bufs: (calls.__setitem__("n", calls["n"] + len(bufs)), real_concat(bufs))[1]
    )
    try:
        full = wand_mod._score_shard_multi(merged, qt, oracle.avgdl, prune=False)
        n_full = calls["n"]
        calls["n"] = 0
        pruned = wand_mod._score_shard_multi(merged, qt, oracle.avgdl, prune=True)
        n_pruned = calls["n"]
    finally:
        wand_mod.decode_doc_deltas = real_one
        wand_mod.decode_doc_deltas_concat = real_concat
    pd.testing.assert_frame_equal(
        full.sort_values("doc_id").reset_index(drop=True),
        pruned.sort_values("doc_id").reset_index(drop=True),
    )
    assert n_pruned < n_full, f"no decode skipped: {n_pruned} vs {n_full}"
    # sanity: the top hit scores exactly as the oracle says
    golden = dict(oracle.score_query(" ".join(terms), k))
    for _, r in pruned.iterrows():
        assert golden[r["doc_id"]] == r["score"]


def test_wand_matches_declarative(spark, index_dir, docs):
    merged, tstats_idx, meta = load_index(spark, index_dir)
    tf = term_frequencies(docs)
    n_docs, avgdl = corpus_stats(docs)
    ts = term_stats(tf, n_docs)
    a = (
        wand_topk(spark, merged, tstats_idx, meta, queries_df(spark))
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    b = (
        bm25_topk(tf, ts, queries_df(spark), n_docs, avgdl)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_kill_resume_identical(spark, docs, index_dir, tmp_path):
    """Kill after the first committed batch; resume; final index content
    must equal the one-shot build's."""
    out = str(tmp_path / "resumed")
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(
            spark,
            docs,
            out,
            segment_docs=SEGMENT_DOCS,
            block_size=BLOCK,
            batch_segments=3,
            fail_after_batches=1,
        )
    partial = committed_segments(spark, out)
    assert 0 < len(partial)
    # resume
    build_index(
        spark, docs, out, segment_docs=SEGMENT_DOCS, block_size=BLOCK, batch_segments=3
    )
    a = _merged_content(spark, out)
    b = _merged_content(spark, index_dir)
    pd.testing.assert_frame_equal(a, b)
    # resumed build did not rebuild committed segments
    done_after = committed_segments(spark, out)
    assert partial <= done_after

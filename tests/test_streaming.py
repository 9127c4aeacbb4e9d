"""Streaming index maintenance: batch-build a prefix of the corpus, stream
the remainder via Structured Streaming.

Round-3 contract (VERDICT r2 task 2): streamed delta segments are
queryable with NO merge_index call — load_index lazily unions merged/
with committed-but-unmerged blocks past the merged_docs watermark — and
merge_index(incremental=True) folds them in as an O(delta) append that
never rewrites existing merged/ files. Both paths must answer the
reference query set identically to the one-shot batch build (and the
Python oracle)."""

from __future__ import annotations

import os

from angle_spark.index.build import (
    build_index,
    load_index,
    merge_index,
    refresh_corpus_stats,
)
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.oracle import Bm25Oracle
from angle_spark.query.wand import wand_topk
from angle_spark.streaming.maintain import maintain_stream
from angle_spark.synth import (
    TRANSCRIPTS_SCHEMA,
    queries_df,
    queries_pdf,
    transcripts_df,
    transcripts_pdf,
)

N_ALL = 40
N_BATCH = 30  # convs indexed in batch; the rest arrive as a stream


def _snapshot(d: str) -> dict[str, tuple[int, int]]:
    """data files under d -> (size, mtime_ns); _SUCCESS markers excluded
    (an append job rewrites the marker, not the data)."""
    out = {}
    for root, _, files in os.walk(d):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                st = os.stat(p)
                out[os.path.relpath(p, d)] = (st.st_size, st.st_mtime_ns)
    return out


def _build_then_stream(spark, tmp_path) -> tuple[str, int]:
    """batch-index the first N_BATCH convs, stream the rest; -> (out, hw)."""
    out = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    stream_in = str(tmp_path / "incoming")
    os.makedirs(stream_in, exist_ok=True)

    # conv ids are zero-padded so conv_00000030.. sort AFTER the batch ones;
    # streamed docIDs therefore extend the stable global order
    batch = transcripts_df(spark, N_BATCH, seed=42)
    docs = with_tokens(assign_doc_ids(batch)).select("doc_id", "tokens", "dl")
    meta = build_index(spark, docs, out, segment_docs=256, block_size=32)
    hw = meta.n_docs

    tail = transcripts_df(spark, N_ALL, seed=42).filter(
        f"conv_id >= 'conv_{N_BATCH:08d}'"
    )
    tail.write.mode("overwrite").parquet(stream_in)

    stream = spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(stream_in)
    q = maintain_stream(stream, out, hw, ckpt, trigger_seconds=1)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return out, hw


def _assert_matches_oracle(spark, out: str) -> None:
    merged, tstats, meta = load_index(spark, out)
    got = (
        wand_topk(spark, merged, tstats, meta, queries_df(spark))
        .toPandas()
        .sort_values(["query_id", "rank"])
    )
    oracle = Bm25Oracle(transcripts_pdf(N_ALL, seed=42))
    golden = oracle.golden(queries_pdf())
    assert meta.n_docs == oracle.n_docs
    assert meta.avgdl == oracle.avgdl
    assert list(zip(got["query_id"], got["rank"], got["doc_id"])) == list(
        zip(golden["query_id"], golden["rank"], golden["doc_id"])
    )
    for g, w in zip(got["score"], golden["score"]):
        assert g == w


def test_streamed_deltas_queryable_without_merge(spark, tmp_path):
    out, hw = _build_then_stream(spark, tmp_path)
    merged_before = _snapshot(os.path.join(out, "merged"))
    tstats_before = _snapshot(os.path.join(out, "term_stats"))

    meta2 = refresh_corpus_stats(spark, out)
    assert meta2.n_docs > hw
    assert meta2.merged_docs == hw  # watermark = last (batch-build) merge

    # NO merge_index call: load_index unions the committed delta blocks in
    _assert_matches_oracle(spark, out)

    # refresh cost is O(delta): every merged/ + term_stats byte untouched
    assert _snapshot(os.path.join(out, "merged")) == merged_before
    assert _snapshot(os.path.join(out, "term_stats")) == tstats_before


def test_incremental_merge_is_o_delta(spark, tmp_path):
    out, hw = _build_then_stream(spark, tmp_path)
    before = _snapshot(os.path.join(out, "merged"))
    tstats_before = _snapshot(os.path.join(out, "term_stats"))

    meta2 = refresh_corpus_stats(spark, out)
    merge_index(spark, out, meta2, incremental=True)

    # merged/ AND term_stats/ byte-identical: the delta landed as a run
    # dir and stats for it are aggregated at load (no swap, no crash
    # window — round-3 ADVICE)
    assert _snapshot(os.path.join(out, "merged")) == before
    assert _snapshot(os.path.join(out, "term_stats")) == tstats_before

    merged, tstats, meta3 = load_index(spark, out)
    assert meta3.merged_docs == meta3.n_docs  # watermark advanced: no delta
    assert len(meta3.delta_runs) == 1
    assert _snapshot(os.path.join(out, "delta_runs", meta3.delta_runs[0]))
    _assert_matches_oracle(spark, out)

    # incremental term_stats == what a full compaction merge produces
    inc = sorted(map(tuple, tstats.collect()))
    merge_index(spark, out, meta3, incremental=False)
    _, full_tstats, meta4 = load_index(spark, out)
    assert sorted(map(tuple, full_tstats.collect())) == inc
    assert meta4.delta_runs == []  # compaction folded the runs away
    assert not os.path.exists(os.path.join(out, "delta_runs"))
    _assert_matches_oracle(spark, out)  # post-compaction answers unchanged


def test_tiered_merge_bounds_runs(spark, tmp_path):
    """repeated append+incremental-merge cycles: when the run count
    exceeds max_delta_runs the middle tier folds them into ONE combined
    run — merged/ still untouched, answers unchanged, no stray dirs."""
    from angle_spark.streaming.maintain import append_micro_batch

    out = str(tmp_path / "idx")
    splits = [20, 25, 30, 34, 37, N_ALL]
    batch = transcripts_df(spark, splits[0], seed=42)
    docs = with_tokens(assign_doc_ids(batch)).select("doc_id", "tokens", "dl")
    hw = build_index(spark, docs, out, segment_docs=256, block_size=32).n_docs
    merged_before = _snapshot(os.path.join(out, "merged"))

    full = transcripts_df(spark, N_ALL, seed=42)
    for i, (lo, hi) in enumerate(zip(splits, splits[1:])):
        part = full.filter(
            (full.conv_id >= f"conv_{lo:08d}") & (full.conv_id < f"conv_{hi:08d}")
        )
        hw = append_micro_batch(part, i, out, hw)
        meta = refresh_corpus_stats(spark, out)
        merge_index(spark, out, meta, incremental=True, max_delta_runs=2)

    _, _, meta = load_index(spark, out)
    assert meta.merged_docs == meta.n_docs
    assert 1 <= len(meta.delta_runs) <= 2, meta.delta_runs
    # on-disk run dirs == the referenced ones plus any runs still in
    # their one-generation retirement grace (sweep works, grace held)
    assert sorted(os.listdir(os.path.join(out, "delta_runs"))) == sorted(
        set(meta.delta_runs) | set(meta.retired_runs)
    )
    assert _snapshot(os.path.join(out, "merged")) == merged_before
    _assert_matches_oracle(spark, out)


def test_incremental_merge_crash_idempotent(spark, tmp_path, monkeypatch):
    """kill the incremental merge BETWEEN the run write and the meta
    commit: readers still see the old consistent state (no double
    count), and a rerun converges to the committed state."""
    from angle_spark import fsio as fsio_mod

    out, hw = _build_then_stream(spark, tmp_path)
    meta2 = refresh_corpus_stats(spark, out)
    n_docs, avgdl = meta2.n_docs, meta2.avgdl

    real = fsio_mod.write_text

    def boom(spark_, path, content):
        if path.endswith("corpus_stats.json"):
            raise RuntimeError("injected kill")
        return real(spark_, path, content)

    import angle_spark.index.build as build_mod

    import pytest as _pytest

    meta_fresh = refresh_corpus_stats(spark, out)
    monkeypatch.setattr(build_mod.fsio, "write_text", boom)
    with _pytest.raises(RuntimeError, match="injected kill"):
        merge_index(spark, out, meta_fresh, incremental=True)
    monkeypatch.setattr(build_mod.fsio, "write_text", real)

    # the orphan run dir exists but is UNREFERENCED -> readers unaffected
    _, _, m = load_index(spark, out)
    assert m.delta_runs == [] and m.merged_docs == hw
    assert os.listdir(os.path.join(out, "delta_runs"))
    _assert_matches_oracle(spark, out)

    # rerun: same delta recomputed, committed once, answers identical
    merge_index(spark, out, refresh_corpus_stats(spark, out), incremental=True)
    _, _, m2 = load_index(spark, out)
    assert len(m2.delta_runs) == 1 and m2.merged_docs == m2.n_docs
    assert (m2.n_docs, m2.avgdl) == (n_docs, avgdl)
    assert sorted(os.listdir(os.path.join(out, "delta_runs"))) == sorted(m2.delta_runs)
    _assert_matches_oracle(spark, out)


def test_multi_append_visibility_without_merge(spark, tmp_path):
    """three direct micro-batch appends (no streaming machinery, no
    merge at any point): the delta union must expose every committed
    batch, and scores must use refreshed corpus stats."""
    from angle_spark.streaming.maintain import append_micro_batch

    out = str(tmp_path / "idx")
    splits = [20, 28, 34, N_ALL]
    batch = transcripts_df(spark, splits[0], seed=42)
    docs = with_tokens(assign_doc_ids(batch)).select("doc_id", "tokens", "dl")
    hw = build_index(spark, docs, out, segment_docs=256, block_size=32).n_docs

    full = transcripts_df(spark, N_ALL, seed=42)
    for i, (lo, hi) in enumerate(zip(splits, splits[1:])):
        part = full.filter(
            (full.conv_id >= f"conv_{lo:08d}") & (full.conv_id < f"conv_{hi:08d}")
        )
        hw = append_micro_batch(part, i, out, hw)

    refresh_corpus_stats(spark, out)
    _assert_matches_oracle(spark, out)


def test_refresh_is_lineage_only_with_legacy_fallback(spark, tmp_path):
    """refresh_corpus_stats sums (doc_count, token_count) from lineage —
    O(commits), no block scan. A legacy lineage (token_count missing)
    must fall back to the block scan, never silently undercount."""
    out = str(tmp_path / "idx")
    docs = with_tokens(assign_doc_ids(transcripts_df(spark, 12, seed=3))).select(
        "doc_id", "tokens", "dl"
    )
    meta = build_index(spark, docs, out, segment_docs=64, block_size=16)
    m1 = refresh_corpus_stats(spark, out)
    assert (m1.n_docs, m1.avgdl) == (meta.n_docs, meta.avgdl)

    # rewrite lineage WITHOUT token_count (what a round-2 index has)
    lin_dir = os.path.join(out, "lineage")
    legacy = spark.read.parquet(lin_dir).drop("token_count").collect()
    legacy_df = spark.createDataFrame(
        legacy,
        schema="partition_id long, doc_count long, term_count long, "
        "bytes long, wall_ms long, commit_ts timestamp",
    )
    import shutil

    shutil.rmtree(lin_dir)
    legacy_df.write.parquet(lin_dir)
    m2 = refresh_corpus_stats(spark, out)
    assert (m2.n_docs, m2.avgdl) == (meta.n_docs, meta.avgdl)


def test_incremental_merge_noop_when_no_delta(spark, tmp_path):
    out = str(tmp_path / "idx")
    docs = with_tokens(assign_doc_ids(transcripts_df(spark, 10, seed=7))).select(
        "doc_id", "tokens", "dl"
    )
    build_index(spark, docs, out, segment_docs=64, block_size=16)
    before = _snapshot(os.path.join(out, "merged"))
    meta = refresh_corpus_stats(spark, out)
    merge_index(spark, out, meta, incremental=True)
    assert _snapshot(os.path.join(out, "merged")) == before


def test_compaction_grace_keeps_prior_readers_alive(spark, tmp_path):
    """round-4 ADVICE: compaction used to delete superseded run dirs at
    commit, breaking a concurrent reader (cached Searcher) holding the
    previous meta's lazy union plan. Now retired runs survive ONE
    maintenance generation: a frame loaded BEFORE the compaction still
    collects afterwards; the runs vanish only after the NEXT commit."""
    from angle_spark.index.build import compact_delta_runs, merge_index
    from angle_spark.streaming.maintain import append_micro_batch

    out = str(tmp_path / "idx")
    splits = [20, 25, 30, N_ALL]
    batch = transcripts_df(spark, splits[0], seed=42)
    docs = with_tokens(assign_doc_ids(batch)).select("doc_id", "tokens", "dl")
    hw = build_index(spark, docs, out, segment_docs=256, block_size=32).n_docs

    full = transcripts_df(spark, N_ALL, seed=42)
    # two appended runs (convs 20-25, 25-30), NOT yet compacted
    for i, (lo, hi) in enumerate(zip(splits[:-2], splits[1:-1])):
        part = full.filter(
            (full.conv_id >= f"conv_{lo:08d}") & (full.conv_id < f"conv_{hi:08d}")
        )
        hw = append_micro_batch(part, i, out, hw)
        merge_index(
            spark, out, refresh_corpus_stats(spark, out),
            incremental=True, max_delta_runs=99,
        )
    merged_old, _, meta_old = load_index(spark, out)
    old_runs = list(meta_old.delta_runs)
    assert len(old_runs) >= 2
    reader = merged_old  # lazy plan over merged/ + the old runs

    compact_delta_runs(spark, out, refresh_corpus_stats(spark, out))
    _, _, meta_new = load_index(spark, out)
    assert len(meta_new.delta_runs) == 1
    assert sorted(meta_new.retired_runs) == sorted(
        r for r in old_runs if r not in meta_new.delta_runs
    )
    # the retired dirs are still on disk -> the pre-compaction reader works
    for r in meta_new.retired_runs:
        assert os.path.exists(os.path.join(out, "delta_runs", r))
    assert reader.count() > 0  # would throw FileNotFound without grace

    # the NEXT maintenance commit ends the grace: retired dirs swept
    part = full.filter(full.conv_id >= f"conv_{splits[-2]:08d}")
    hw = append_micro_batch(part, 99, out, hw)
    merge_index(
        spark, out, refresh_corpus_stats(spark, out),
        incremental=True, max_delta_runs=99,
    )
    _, _, meta_final = load_index(spark, out)
    assert meta_final.retired_runs == []
    for r in meta_new.retired_runs:
        assert not os.path.exists(os.path.join(out, "delta_runs", r))
    _assert_matches_oracle(spark, out)


def test_append_micro_batch_unpersists_docid_frame(spark, tmp_path):
    """round-4 ADVICE: each micro-batch persisted the two-pass docID
    frame DISK_ONLY and never released it — a long stream stacked one
    cached frame per batch. The sink must leave the cache no larger
    than it found it."""
    from angle_spark.streaming.maintain import append_micro_batch

    out = str(tmp_path / "idx")
    batch = transcripts_df(spark, 20, seed=42)
    docs = with_tokens(assign_doc_ids(batch)).select("doc_id", "tokens", "dl")
    hw = build_index(spark, docs, out, segment_docs=256, block_size=32).n_docs

    cm = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()
    assert cm.isEmpty()
    full = transcripts_df(spark, N_ALL, seed=42)
    for i, (lo, hi) in enumerate([(20, 30), (30, N_ALL)]):
        part = full.filter(
            (full.conv_id >= f"conv_{lo:08d}") & (full.conv_id < f"conv_{hi:08d}")
        )
        hw = append_micro_batch(part, i, out, hw)
        assert cm.isEmpty()  # no persisted frame survives the batch

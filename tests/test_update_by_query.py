"""update_by_query (index/update.py): delete+append rewrite of every
live doc a query matches, journaled and kill-anywhere idempotent.
Contract: exact count semantics vs an independent recompute, term-count
invariants, idempotent re-run, source-coverage guard, and a kill matrix
— inject a crash at each protocol stage, re-run, and the final state
must equal the clean run's bitwise (counts + live membership)."""

from __future__ import annotations

import pandas as pd
import pytest

from angle_spark.index.build import build_index, load_index
from angle_spark.index.deletes import load_deletes
from angle_spark.index.stats import with_tokens
from angle_spark.index.update import recover_update, update_by_query
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.query.wand import count_matches, matched_ids
from angle_spark.synth import transcripts_df

N_CONVS = 25
SEED = 13
TRANSFORM = "regexp_replace(text, '\\\\bw0042\\\\b', 'freshtok')"


@pytest.fixture()
def setup(spark, tmp_path):
    src = (
        assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4))
        .select("doc_id", "text")
        .localCheckpoint()
    )
    docs = with_tokens(src).select("doc_id", "tokens", "dl")
    out = str(tmp_path / "idx")
    build_index(spark, docs, out, segment_docs=128, block_size=16)
    return out, src


def _counts(spark, out, terms):
    merged, tstats, meta = load_index(spark, out)
    q = spark.createDataFrame(
        [(t, t, 1) for t in terms], "query_id string, text string, k int"
    )
    got = count_matches(
        spark, merged, tstats, meta, q, mode="boolean",
        deletes=load_deletes(spark, out),
    ).toPandas()
    return dict(zip(got["query_id"], got["total_hits"]))


def _live_ids(spark, out):
    merged, tstats, meta = load_index(spark, out)
    q = spark.createDataFrame(
        [("all", "w0000 OR w0001 OR w0002 OR freshtok", 1)],
        "query_id string, text string, k int",
    )
    got = matched_ids(
        spark, merged, tstats, meta, q, mode="boolean",
        deletes=load_deletes(spark, out),
    ).toPandas()
    return set(got["doc_id"])


def test_update_semantics_and_idempotence(spark, setup):
    out, src = setup
    before = _counts(spark, out, ["w0042", "w0003"])
    n = update_by_query(spark, out, "w0042", src, TRANSFORM)
    assert n == before["w0042"] > 0
    after = _counts(spark, out, ["w0042", "w0003", "freshtok"])
    assert "w0042" not in after  # zero-match queries emit no row
    assert after["freshtok"] == n
    # docs keep every OTHER term through their replacements
    assert after["w0003"] == before["w0003"]
    # re-run: the query no longer matches anything
    assert update_by_query(spark, out, "w0042", src, TRANSFORM) == 0
    assert recover_update(spark, out) == 0


def test_update_source_coverage_guard(spark, setup):
    out, src = setup
    partial = src.limit(3)
    with pytest.raises(ValueError, match="source_docs covers"):
        update_by_query(spark, out, "w0042", partial, TRANSFORM)


def test_update_kill_matrix(spark, setup, monkeypatch):
    """Inject a crash at each stage, re-run, final state == clean run."""
    import angle_spark.index.update as upd

    out, src = setup
    clean_expect = None

    # stage 1: die right after the journal commit (before any append)
    real_finish = upd._finish_update

    def die_finish(*a, **kw):
        raise RuntimeError("kill:pre-append")

    monkeypatch.setattr(upd, "_finish_update", die_finish)
    with pytest.raises(RuntimeError, match="kill:pre-append"):
        update_by_query(spark, out, "w0042", src, TRANSFORM)
    monkeypatch.setattr(upd, "_finish_update", real_finish)
    n = recover_update(spark, out)
    assert n > 0
    state1 = (_counts(spark, out, ["freshtok", "w0003"]), _live_ids(spark, out))

    # fresh index for stage 2: die AFTER blocks land, BEFORE the stats
    # refresh commits (the sweep must clear the half-append on re-run)
    out2 = out + "_2"
    src2 = src
    docs = with_tokens(src2).select("doc_id", "tokens", "dl")
    build_index(spark, docs, out2, segment_docs=128, block_size=16)

    real_refresh = upd.refresh_corpus_stats

    def die_refresh(*a, **kw):
        raise RuntimeError("kill:pre-commit")

    monkeypatch.setattr(upd, "refresh_corpus_stats", die_refresh)
    with pytest.raises(RuntimeError, match="kill:pre-commit"):
        update_by_query(spark, out2, "w0042", src2, TRANSFORM)
    monkeypatch.setattr(upd, "refresh_corpus_stats", real_refresh)
    # blocks were appended but n_docs never advanced: recovery must
    # sweep them and redo the append exactly once
    assert recover_update(spark, out2) == n
    state2 = (_counts(spark, out2, ["freshtok", "w0003"]), _live_ids(spark, out2))
    assert state2[0] == state1[0]

    # stage 3: die between the append commit and the tombstones
    out3 = out2 + "_3"
    docs = with_tokens(src2).select("doc_id", "tokens", "dl")
    build_index(spark, docs, out3, segment_docs=128, block_size=16)

    real_delete = upd.delete_docs

    def die_delete(*a, **kw):
        raise RuntimeError("kill:pre-tombstone")

    monkeypatch.setattr(upd, "delete_docs", die_delete)
    with pytest.raises(RuntimeError, match="kill:pre-tombstone"):
        update_by_query(spark, out3, "w0042", src2, TRANSFORM)
    monkeypatch.setattr(upd, "delete_docs", real_delete)
    # replacements are visible, originals still live (the disclosed
    # transient-coexistence window) — freshtok must already count
    mid = _counts(spark, out3, ["freshtok", "w0042"])
    assert mid["freshtok"] == n and mid["w0042"] == n
    # a RE-CALL of update_by_query (not just recover) must converge: it
    # finishes the journal first, then the fresh match finds nothing
    assert update_by_query(spark, out3, "w0042", src2, TRANSFORM) == 0
    state3 = (_counts(spark, out3, ["freshtok", "w0003"]), _live_ids(spark, out3))
    assert state3[0] == state1[0]

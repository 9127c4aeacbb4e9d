"""Term vectors read API (query/termvectors.py).

Contracts: tf/dl/positions equal a direct re-tokenization of the source
docs; df/idf equal the corpus term statistics; unknown ids return no
rows and duplicates collapse; the block scan partition-prunes to the
requested docs' segments; point-lookup guards bite.
"""
from __future__ import annotations

import contextlib
import io

import numpy as np
import pytest
from pyspark.sql import functions as F

from angle_spark.functions.tokenizer import tokenize_py
from angle_spark.index.build import build_index, load_index
from angle_spark.index.stats import idf_value, with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.query.searcher import Searcher
from angle_spark.query.termvectors import MAX_TERMVECTOR_DOCS, term_vectors
from angle_spark.synth import transcripts_df

N_CONVS = 15
SEED = 41


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    d = (
        with_tokens(
            assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4))
        )
        .select("doc_id", "text", "tokens", "dl")
        .persist()
    )
    n = d.count()
    idx = str(tmp_path_factory.mktemp("tv") / "idx")
    build_index(
        spark, d.select("doc_id", "tokens", "dl"), idx,
        segment_docs=64, block_size=16, positional=True,
    )
    merged, tstats, meta = load_index(spark, idx)
    yield d, idx, merged, tstats, meta, n
    d.unpersist()


def test_matches_retokenized_source(spark, setup):
    d, _idx, merged, tstats, meta, n = setup
    ids = [0, 3, n // 2, n - 1]
    got = term_vectors(
        spark, merged, tstats, meta, ids, positions=True
    ).toPandas().sort_values(["doc_id", "term"]).reset_index(drop=True)
    src = {
        r["doc_id"]: tokenize_py(r["text"])
        for r in d.filter(F.col("doc_id").isin(ids)).collect()
    }
    dfs = {
        r["term"]: r["df"]
        for r in tstats.filter(
            F.col("term").isin(sorted(set(got["term"])))
        ).collect()
    }
    assert set(got["doc_id"]) == set(ids)
    for doc, grp in got.groupby("doc_id"):
        toks = src[doc]
        assert sorted(grp["term"]) == sorted(set(toks))
        for t in grp.itertuples(index=False):
            want_pos = [i for i, w in enumerate(toks) if w == t.term]
            assert t.tf == len(want_pos)
            assert t.dl == len(toks)
            assert list(t.positions) == want_pos
            assert t.df == dfs[t.term]
            assert t.idf == idf_value(meta.live_docs, dfs[t.term])


def test_unknown_and_duplicate_ids(spark, setup):
    _d, _idx, merged, tstats, meta, n = setup
    got = term_vectors(
        spark, merged, tstats, meta, [5, 5, n + 999]
    ).toPandas()
    assert set(got["doc_id"]) == {5}
    # duplicates collapse: each (doc, term) appears once
    assert not got.duplicated(["doc_id", "term"]).any()


def test_block_span_filter_is_pushed(spark, setup):
    """the block-span containment predicate must reach the parquet scan
    (PushedFilters on first_doc/last_doc/segment_id), so only owning
    blocks decode."""
    from angle_spark.query.termvectors import candidate_blocks

    _d, _idx, merged, tstats, meta, _n = setup
    out = term_vectors(spark, merged, tstats, meta, [1])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        candidate_blocks(merged, meta, [1]).explain("formatted")
    plan = buf.getvalue()
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and any(
        "first_doc" in ln and "last_doc" in ln and "segment_id" in ln
        for ln in pushed
    ), pushed
    assert out.count() > 0


def test_searcher_parity_and_guards(spark, setup):
    _d, idx, merged, tstats, meta, _n = setup
    with Searcher(spark, idx) as s:
        via_s = s.term_vectors([2, 7]).toPandas().sort_values(
            ["doc_id", "term"]
        ).reset_index(drop=True)
    direct = term_vectors(
        spark, merged, tstats, meta, [2, 7]
    ).toPandas().sort_values(["doc_id", "term"]).reset_index(drop=True)
    assert via_s.equals(direct)
    with pytest.raises(ValueError, match="empty"):
        term_vectors(spark, merged, tstats, meta, [])
    with pytest.raises(ValueError, match="point-lookup"):
        term_vectors(
            spark, merged, tstats, meta,
            list(range(MAX_TERMVECTOR_DOCS + 1)),
        )


def test_positions_guard_on_nonpositional(spark, setup, tmp_path):
    d, _idx, _m, _t, _meta, _n = setup
    idx2 = str(tmp_path / "flat")
    build_index(
        spark, d.select("doc_id", "tokens", "dl"), idx2,
        segment_docs=64, block_size=16,
    )
    merged2, tstats2, meta2 = load_index(spark, idx2)
    with pytest.raises(ValueError, match="positional"):
        term_vectors(spark, merged2, tstats2, meta2, [1], positions=True)
    # flat read still works
    assert term_vectors(spark, merged2, tstats2, meta2, [1]).count() > 0

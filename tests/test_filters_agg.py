"""filters aggregation (query/filters_agg.py — ES filters agg):
bucket counts == composed boolean counts; other_bucket complement;
empty buckets report 0."""

from __future__ import annotations

import pandas as pd
import pytest

from angle_spark.index.build import build_index, load_index
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.query.filters_agg import filters_agg
from angle_spark.query.wand import count_matches
from angle_spark.synth import transcripts_df


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    docs = with_tokens(
        assign_doc_ids(transcripts_df(spark, 25, seed=3, partitions=4))
    ).select("doc_id", "tokens", "dl")
    out = str(tmp_path_factory.mktemp("fagg") / "idx")
    build_index(spark, docs, out, segment_docs=128, block_size=16,
                positional=True)
    return load_index(spark, out)


def _count(spark, idx, text):
    merged, tstats, meta = idx
    q = pd.DataFrame([("q", text, 1)], columns=["query_id", "text", "k"])
    rows = count_matches(
        spark, merged, tstats, meta, q, mode="boolean"
    ).collect()
    return rows[0]["total_hits"] if rows else 0


FILTERS = {"a": "w0003", "b": "w0042 AND w0015", "dead": "zzzzqq"}


def _agg(spark, idx, main, **kw):
    merged, tstats, meta = idx
    q = pd.DataFrame([("q", main, 1)], columns=["query_id", "text", "k"])
    out = filters_agg(spark, merged, tstats, meta, q, FILTERS, **kw)
    return {r["bucket"]: r["n_docs"] for r in out.collect()}


def test_buckets_equal_composed_counts(spark, idx):
    got = _agg(spark, idx, "w0000 OR w0001")
    for name, ftext in FILTERS.items():
        want = _count(spark, idx, f"(w0000 OR w0001) AND ({ftext})")
        assert got[name] == want, name
    assert got["dead"] == 0  # OOV filter bucket reports 0, not absence
    assert got["a"] > 0


def test_other_bucket_complement(spark, idx):
    got = _agg(spark, idx, "w0000", other_bucket=True)
    union = " OR ".join(f"({t})" for t in FILTERS.values())
    want_other = _count(spark, idx, f"(w0000) AND NOT ({union})")
    assert got["_other_"] == want_other
    # in-bucket + other need not sum to main (buckets overlap), but
    # other == main - |union within main| must hold exactly
    main = _count(spark, idx, "w0000")
    in_union = _count(spark, idx, f"(w0000) AND ({union})")
    assert got["_other_"] == main - in_union


def test_phrase_filters_compose(spark, idx):
    merged, tstats, meta = idx
    q = pd.DataFrame([("q", "w0000", 1)], columns=["query_id", "text", "k"])
    out = filters_agg(
        spark, merged, tstats, meta, q, {"ph": '"w0003 w0042"'}
    )
    want = _count(spark, idx, '(w0000) AND ("w0003 w0042")')
    assert {r["bucket"]: r["n_docs"] for r in out.collect()} == {"ph": want}


def test_validation(spark, idx):
    merged, tstats, meta = idx
    q = pd.DataFrame([("q", "w0000", 1)], columns=["query_id", "text", "k"])
    with pytest.raises(ValueError, match="non-empty"):
        filters_agg(spark, merged, tstats, meta, q, {})
    with pytest.raises(ValueError, match="reserved"):
        filters_agg(
            spark, merged, tstats, meta, q, {"_other_": "w0001"},
            other_bucket=True,
        )
    bad = pd.DataFrame(
        [("q\x1fx", "w0000", 1)], columns=["query_id", "text", "k"]
    )
    with pytest.raises(ValueError, match="U\\+001F"):
        filters_agg(spark, merged, tstats, meta, bad, {"a": "w0001"})

"""terms_set (query/terms_set.py — ES terms_set / Lucene
CoveringQuery): per-doc minimum matching-term counts."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from angle_spark.index.build import build_index, load_index
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.query.terms_set import terms_set_topk
from angle_spark.query.wand import wand_topk
from angle_spark.synth import transcripts_df

BIG_K = 1_000_000
TEXT = "w0003 w0042 w0137"


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    docs = with_tokens(
        assign_doc_ids(transcripts_df(spark, 25, seed=3, partitions=4))
    ).select("doc_id", "tokens", "dl")
    out = str(tmp_path_factory.mktemp("tset") / "idx")
    build_index(spark, docs, out, segment_docs=128, block_size=16)
    return load_index(spark, out)


def _q(text):
    return pd.DataFrame([("q", text, BIG_K)], columns=["query_id", "text", "k"])


def _mm(spark, idx, text, j):
    merged, tstats, meta = idx
    return (
        wand_topk(spark, merged, tstats, meta, _q(text), mode="mm", min_match=j)
        .toPandas()
        .set_index("doc_id")["score"]
        .to_dict()
    )


def _m_const(spark, n, val):
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(val).alias("required")
    )


def _m_parity(spark, n, even, odd):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, even).otherwise(odd).alias("required"),
    )


def _ts(spark, idx, text, m_field):
    merged, tstats, meta = idx
    return (
        terms_set_topk(spark, merged, tstats, meta, _q(text), m_field)
        .toPandas()
        .set_index("doc_id")["score"]
        .to_dict()
    )


def test_uniform_threshold_equals_mm(spark, idx):
    _, _, meta = idx
    got = _ts(spark, idx, TEXT, _m_const(spark, meta.n_docs, 2))
    assert got == _mm(spark, idx, TEXT, 2)


def test_per_doc_threshold_mixes_sets(spark, idx):
    _, _, meta = idx
    got = _ts(spark, idx, TEXT, _m_parity(spark, meta.n_docs, 1, 3))
    mm1, mm3 = _mm(spark, idx, TEXT, 1), _mm(spark, idx, TEXT, 3)
    want = {d: s for d, s in mm1.items() if d % 2 == 0}
    want.update({d: s for d, s in mm3.items() if d % 2 == 1})
    assert got == want
    # both halves genuinely present (the corpus has odd mm3 and even mm1
    # docs) and the mix differs from either constant threshold
    assert any(d % 2 for d in got) and any(not d % 2 for d in got)
    assert set(got) != set(mm1) and set(got) != set(mm3)


def test_threshold_above_terms_never_matches(spark, idx):
    _, _, meta = idx
    got = _ts(spark, idx, TEXT, _m_const(spark, meta.n_docs, 4))
    assert got == {}


def test_missing_docs_never_match(spark, idx):
    _, _, meta = idx
    # only even docs carry the field
    m = _m_const(spark, meta.n_docs, 1).filter(F.col("doc_id") % 2 == 0)
    got = _ts(spark, idx, TEXT, m)
    assert got and all(d % 2 == 0 for d in got)


def test_required_below_one_clamps(spark, idx):
    _, _, meta = idx
    got = _ts(spark, idx, TEXT, _m_const(spark, meta.n_docs, 0))
    assert got == _mm(spark, idx, TEXT, 1)


def test_oov_caps_feasible_thresholds(spark, idx):
    _, _, meta = idx
    # 2 in-vocab + 1 OOV: required=3 is unsatisfiable, required=2 = AND
    text = "w0003 w0042 zzzzqq"
    assert _ts(spark, idx, text, _m_const(spark, meta.n_docs, 3)) == {}
    got = _ts(spark, idx, text, _m_const(spark, meta.n_docs, 2))
    assert got == _mm(spark, idx, "w0003 w0042", 2)


def test_reserved_separator_rejected(spark, idx):
    merged, tstats, meta = idx
    bad = pd.DataFrame(
        [("q\x1f1", TEXT, 10)], columns=["query_id", "text", "k"]
    )
    with pytest.raises(ValueError, match="U\\+001F"):
        terms_set_topk(
            spark, merged, tstats, meta, bad, _m_const(spark, 10, 1)
        )

"""Percolator (query/percolate.py) — reverse search contracts:

- percolate == forward boolean retrieval (wand mode="boolean", k >=
  corpus, max_expansions >= vocab) answer sets, query by query — the
  strongest cross-check available: two independent implementations
  (per-doc tree evaluation vs posting-list mask algebra) of the same
  grammar, equal when the forward expansion cap doesn't bind;
- the covering prefilter is correct by construction (AND picks one
  conjunct, OR unions, fuzzy/regex fall back to verify-always);
- empty/null text, matchless queries, empty catalog;
- catalog validation (duplicate ids, field leaves, pure negation);
- partition invariance;
- streaming percolation through foreachBatch.
"""
from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from angle_spark.index.build import build_index, load_index
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.query.percolate import (
    Catalog,
    _covering,
    compile_catalog,
    percolate,
)
from angle_spark.query.wand import wand_topk
from angle_spark.synth import transcripts_df

N_CONVS = 24
SEED = 11

# catalog over the synthetic w#### vocabulary (Zipfian: w0000 hottest)
CATALOG = [
    ("pc_and", "w0000 AND w0007"),
    ("pc_not", "w0001 AND NOT w0000"),
    ("pc_or", "w0019 OR (w0003 AND w0011)"),
    ("pc_phrase", '"w0000 w0001"'),
    ("pc_near", '"w0004 w0002"~6'),
    ("pc_prefix", "w000* AND w0012"),
    ("pc_fuzzy", "w0999~1"),
    ("pc_regex", "/w00[01][0-9]/"),
    ("pc_dead", "zzzz AND w0000"),
]


@pytest.fixture(scope="module")
def docs(spark):
    d = assign_doc_ids(
        transcripts_df(spark, N_CONVS, seed=SEED, partitions=4)
    ).persist()
    d.count()
    yield d
    d.unpersist()


@pytest.fixture(scope="module")
def perc_pdf(docs):
    cat = compile_catalog(CATALOG)
    return (
        percolate(docs, cat)
        .toPandas()
        .sort_values(["query_id", "doc_id"])
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def forward_pdf(spark, docs, tmp_path_factory):
    """Forward-retrieval answer sets for the same queries: with k >=
    corpus and max_expansions >= vocab, boolean retrieval and
    percolation define the same membership."""
    toks = with_tokens(docs).select("doc_id", "tokens", "dl")
    out = str(tmp_path_factory.mktemp("perc") / "idx")
    build_index(spark, toks, out, segment_docs=256, block_size=32,
                positional=True)
    merged, tstats, meta = load_index(spark, out)
    qs = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": [q for q, _ in CATALOG],
                "text": [t for _, t in CATALOG],
                "k": [10**9] * len(CATALOG),
            }
        )
    )
    hits = wand_topk(
        spark, merged, tstats, meta, qs, mode="boolean",
        max_expansions=20_000,
    )
    return (
        hits.select("query_id", "doc_id")
        .toPandas()
        .sort_values(["query_id", "doc_id"])
        .reset_index(drop=True)
    )


def test_matches_forward_retrieval(perc_pdf, forward_pdf):
    pd.testing.assert_frame_equal(
        perc_pdf[["query_id", "doc_id"]], forward_pdf
    )


def test_every_query_shape(perc_pdf):
    by_q = perc_pdf.groupby("query_id").size()
    # dead AND-with-OOV matches nothing; the rest hit on Zipfian data
    assert "pc_dead" not in by_q.index
    for q in ("pc_and", "pc_not", "pc_or", "pc_phrase", "pc_near",
              "pc_prefix", "pc_fuzzy", "pc_regex"):
        assert by_q.get(q, 0) > 0, q
    # NOT really excludes: pc_not docs never contain w0000
    assert by_q["pc_not"] < by_q["pc_regex"]


def test_no_duplicate_pairs(perc_pdf):
    assert not perc_pdf.duplicated(["query_id", "doc_id"]).any()


def test_partition_invariance(spark, docs, perc_pdf):
    cat = compile_catalog(CATALOG)
    one = (
        percolate(docs.coalesce(1), cat)
        .toPandas()
        .sort_values(["query_id", "doc_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(one, perc_pdf)


def test_covering_prefilter_shapes():
    cat = compile_catalog(CATALOG)
    # fuzzy/regex are verify-always
    full_ids = {cat.query_ids[i] for i in cat.full}
    assert full_ids == {"pc_fuzzy", "pc_regex"}
    # AND picks ONE conjunct; prefix-AND-term prefers the exact term
    t_of = {t: set(qs) for t, qs in cat.term_map.items()}
    idx = {q: i for i, q in enumerate(cat.query_ids)}
    covered_by = {
        q: {t for t, qs in t_of.items() if idx[q] in qs}
        for q in cat.query_ids
    }
    assert len(covered_by["pc_and"]) == 1  # one conjunct suffices
    assert covered_by["pc_prefix"] == {"w0012"}  # term beats stem
    assert not any(idx["pc_prefix"] in qs for _, qs in cat.stems)
    # OR unions its arms: the phrase arm covers with its longest token
    assert covered_by["pc_or"] >= {"w0019"}
    # NOT never contributes to the cover
    assert covered_by["pc_not"] == {"w0001"}


def test_stem_only_cover():
    cat = compile_catalog([("p", "w099*")])
    assert cat.stems == (("w099", (0,)),)
    assert not cat.term_map and not cat.full


def test_empty_and_null_text(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": ["", None, "w0000"]})
    )
    cat = compile_catalog([("p", "w0000"), ("f", "w0000~1")])
    out = percolate(docs, cat).toPandas()
    got = set(map(tuple, out[["doc_id", "query_id"]].itertuples(index=False)))
    # empty/null docs match nothing, even for verify-always queries
    assert got == {(3, "p"), (3, "f")}


def test_empty_catalog(spark, docs):
    out = percolate(docs, compile_catalog([]))
    assert out.count() == 0
    assert out.columns == ["doc_id", "query_id"]


def test_catalog_validation():
    with pytest.raises(ValueError, match="duplicate query_id"):
        compile_catalog([("a", "w0000"), ("a", "w0001")])
    with pytest.raises(ValueError, match="not.*percolatable|percolatable"):
        compile_catalog([("a", "w0000 AND lang:en")])
    from angle_spark.query.boolean import BooleanQueryError

    with pytest.raises(BooleanQueryError):
        compile_catalog([("a", "NOT w0000")])


def test_fuzzy_is_per_doc_not_capped(spark):
    """Percolation fuzzy semantics: ANY doc token within d edits — no
    global-vocabulary cap. A token that a tight forward cap would drop
    still matches here."""
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["w0999x", "w0999xy"]})
    )
    out = percolate(docs, compile_catalog([("f", "w0999~1")])).toPandas()
    assert set(out["doc_id"]) == {1}  # 1 edit matches, 2 edits doesn't


def test_streaming_percolate(spark, docs, tmp_path):
    """The same call inside foreachBatch classifies a stream batch by
    batch; the union over batches equals the batch answer."""
    src = str(tmp_path / "stream_src")
    docs.select("doc_id", "text").write.parquet(src)
    cat = compile_catalog(CATALOG[:4])
    expected = (
        percolate(docs, cat)
        .filter(F.col("query_id").isin([q for q, _ in CATALOG[:4]]))
        .toPandas()
    )
    got: list[pd.DataFrame] = []

    def _sink(batch_df, batch_id):
        got.append(percolate(batch_df, cat).toPandas())

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(src)
        .writeStream.foreachBatch(_sink)
        .trigger(availableNow=True)
        .start()
    )
    stream.awaitTermination(120)
    all_got = (
        pd.concat(got, ignore_index=True)
        .sort_values(["query_id", "doc_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        all_got,
        expected.sort_values(["query_id", "doc_id"]).reset_index(drop=True),
    )


def test_catalog_save_load_roundtrip(spark, docs, tmp_path, perc_pdf):
    from angle_spark.query.percolate import load_catalog, save_catalog

    path = str(tmp_path / "catalog.json")
    save_catalog(spark, path, CATALOG)
    cat2 = load_catalog(spark, path)
    got = (
        percolate(docs, cat2)
        .toPandas()
        .sort_values(["query_id", "doc_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, perc_pdf)
    # a bad catalog never reaches disk
    import os

    bad = str(tmp_path / "bad.json")
    with pytest.raises(Exception):
        save_catalog(spark, bad, [("x", "NOT w0000")])
    assert not os.path.exists(bad)
    # unknown version rejected
    (tmp_path / "v9.json").write_text('{"version": 9, "queries": []}')
    with pytest.raises(ValueError, match="version"):
        load_catalog(spark, str(tmp_path / "v9.json"))

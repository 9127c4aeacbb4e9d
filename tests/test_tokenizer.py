"""The three tokenizer renditions (Python / Spark Column / DuckDB SQL)
must agree exactly — this is the per-row invariant surface."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from angle_spark.functions.tokenizer import duckdb_tokens_sql, tokenize_py

CASES = [
    "Hello, World!",
    "  leading and trailing  ",
    "unicode café naïve",  # non-ASCII letters are delimiters in v1
    "MiXeD CaSe 123abc 456",
    "",
    "!!!",
    "a",
    "tabs\tand\nnewlines",
    "w0001 w0002 w0001",
]


def test_python_tokenizer_basics():
    assert tokenize_py("Hello, World!") == ["hello", "world"]
    assert tokenize_py("") == []
    assert tokenize_py(None) == []
    assert tokenize_py("a1b2-c3") == ["a1b2", "c3"]


def test_python_vs_duckdb():
    con = duckdb.connect()
    for text in CASES:
        got = con.execute(
            f"select {duckdb_tokens_sql('?::varchar')} as toks", [text]
        ).fetchone()[0]
        assert got == tokenize_py(text), text


def test_python_vs_spark(spark):
    from angle_spark.functions.tokenizer import tokens_col

    pdf = pd.DataFrame({"text": CASES})
    out = (
        spark.createDataFrame(pdf)
        .select(tokens_col("text").alias("toks"))
        .collect()
    )
    for row, text in zip(out, CASES):
        assert row["toks"] == tokenize_py(text), text


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="abcXYZ019 .,!-_", max_size=80))
def test_python_vs_duckdb_property(text):
    con = duckdb.connect()
    got = con.execute(
        f"select {duckdb_tokens_sql('?::varchar')} as toks", [text]
    ).fetchone()[0]
    assert got == tokenize_py(text)


# --- analyzer v2: stopwords + S-stemmer (round 5) ------------------------


def test_v2_renditions_agree(spark):
    """python / Spark Column / DuckDB renditions of the v2 analyzer are
    byte-identical over adversarial inputs (suffix-rule edges, stopwords,
    case, punctuation, null)."""
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from angle_spark.functions.tokenizer import (
        duckdb_tokens_v2_sql,
        tokenize_v2_py,
        tokens_v2_col,
    )

    texts = [
        "The tables and queries of this batch",
        "buses classes pass its news does trees shoes aliases",
        "s es ies ss us aes ees oes eies aies",
        "Tables;; QUERIES---of IS was will",
        "w0042s w0042ss w0042es w0042ies",
        "", None, "a the to", "xies exies axies",
    ]
    pdf = pd.DataFrame({"i": range(len(texts)), "text": texts})
    got_col = {
        r["i"]: list(r["t"])
        for r in spark.createDataFrame(pdf)
        .select(
            "i",
            F.coalesce(
                tokens_v2_col("text"), F.array().cast("array<string>")
            ).alias("t"),
        )
        .collect()
    }
    con = duckdb.connect()
    con.register("t", pdf)
    got_sql = {
        r[0]: list(r[1]) if r[1] is not None else []
        for r in con.sql(f"SELECT i, {duckdb_tokens_v2_sql('text')} FROM t").fetchall()
    }
    for i, tx in enumerate(texts):
        py = tokenize_v2_py(tx)
        assert got_col[i] == py, (tx, got_col[i], py)
        assert got_sql[i] == py, (tx, got_sql[i], py)


def test_v2_stem_rules():
    from angle_spark.functions.tokenizer import s_stem_py, tokenize_v2_py

    assert s_stem_py("tables") == "table"
    assert s_stem_py("queries") == "query"
    assert s_stem_py("merges") == "merge"
    assert s_stem_py("does") == "does"      # oes exception
    assert s_stem_py("trees") == "trees"    # ees exception
    assert s_stem_py("pass") == "pass"      # ss exception
    assert s_stem_py("bus") == "bus"        # len < 4
    assert s_stem_py("its") == "its"        # len < 4 guard
    # stopwords drop BEFORE stemming; a stem may equal a stopword and survive
    assert tokenize_v2_py("the tables are thes") == ["table", "the"]


def test_v2_index_records_analyzer_and_v1_default(spark, tmp_path):
    """cross-rendition compat: a v1 index (legacy meta, no analyzer key)
    loads with the v1 default; a v2 index records its version and
    answers plural queries through the stem."""
    import json

    import pandas as pd

    from angle_spark.index.build import build_index, load_index
    from angle_spark.index.stats import with_tokens
    from angle_spark.query.wand import wand_topk

    docs_pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "the table of values",
                "a query and a scan",
                "merge table fast",
            ],
        }
    )
    raw = spark.createDataFrame(docs_pdf)

    v1 = str(tmp_path / "v1")
    build_index(spark, with_tokens(raw).select("doc_id", "tokens", "dl"), v1,
                segment_docs=4, block_size=4)
    # simulate a legacy meta: strip the analyzer key (and the Hadoop
    # .crc sidecar, or the checksummed re-read throws)
    import os

    mp = f"{v1}/corpus_stats.json"
    m = json.load(open(mp)); m.pop("analyzer"); json.dump(m, open(mp, "w"))
    crc = f"{v1}/.corpus_stats.json.crc"
    if os.path.exists(crc):
        os.remove(crc)
    _, _, meta1 = load_index(spark, v1)
    assert meta1.analyzer == "v1-ascii-alnum"

    v2 = str(tmp_path / "v2")
    build_index(
        spark,
        with_tokens(raw, analyzer="v2-sstem-stop").select("doc_id", "tokens", "dl"),
        v2, segment_docs=4, block_size=4, analyzer="v2-sstem-stop",
    )
    merged, tstats, meta2 = load_index(spark, v2)
    assert meta2.analyzer == "v2-sstem-stop"
    q = pd.DataFrame([("q1", "tables", 10), ("q2", "the", 10)],
                     columns=["query_id", "text", "k"])
    got = wand_topk(spark, merged, tstats, meta2, q).toPandas()
    # plural query reaches docs 0 and 2 through the stem; a pure-stopword
    # query tokenizes to nothing
    assert set(got[got.query_id == "q1"]["doc_id"]) == {0, 2}
    assert not (got.query_id == "q2").any()
    # same queries on the v1 index: "tables" is OOV
    m1, t1, meta1b = load_index(spark, v1)
    got1 = wand_topk(spark, m1, t1, meta1b, q).toPandas()
    assert not (got1.query_id == "q1").any()
    assert (got1.query_id == "q2").any()  # "the" is a real v1 term


def test_v2_index_rejects_structured_modes(spark, tmp_path):
    import pandas as pd
    import pytest as _pytest

    from angle_spark.index.build import build_index, load_index
    from angle_spark.index.stats import with_tokens
    from angle_spark.query.wand import wand_topk

    raw = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["merge tables fast"]})
    )
    v2 = str(tmp_path / "v2s")
    build_index(
        spark,
        with_tokens(raw, analyzer="v2-sstem-stop").select("doc_id", "tokens", "dl"),
        v2, segment_docs=4, block_size=4, analyzer="v2-sstem-stop",
    )
    merged, tstats, meta = load_index(spark, v2)
    q = pd.DataFrame([("q", "merge AND fast", 5)], columns=["query_id", "text", "k"])
    for mode in ("boolean", "prefix"):
        with _pytest.raises(ValueError, match="analyzer"):
            wand_topk(spark, merged, tstats, meta, q, mode=mode)


def test_v2_prefix_fuzzy_expansion_against_stemmed_vocab(spark, tmp_path):
    """expansion machinery operates on the INDEX vocabulary, which is
    stemmed under v2 — expand_stems/expand_fuzzy return stemmed terms."""
    import pandas as pd

    from angle_spark.index.build import build_index, load_index
    from angle_spark.index.stats import with_tokens
    from angle_spark.query.fuzzy import expand_fuzzy
    from angle_spark.query.prefix import expand_stems

    raw = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [0, 1], "text": ["tables tablet queries", "tabulate scans"]}
        )
    )
    v2 = str(tmp_path / "v2e")
    build_index(
        spark,
        with_tokens(raw, analyzer="v2-sstem-stop").select("doc_id", "tokens", "dl"),
        v2, segment_docs=4, block_size=4, analyzer="v2-sstem-stop",
    )
    _, tstats, _ = load_index(spark, v2)
    exp = expand_stems(spark, tstats, ["tab"], max_expansions=10)["tab"]
    assert set(exp) == {"table", "tablet", "tabulate"}  # stemmed vocab
    fz = expand_fuzzy(spark, tstats, [("tible", 1)], max_expansions=10)[("tible", 1)]
    assert fz == ["table"]

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

"""Versioned, deterministic tokenizer — the per-row invariant surface.

The reference tokenizes with a subword HF tokenizer
(reference angle_emb/angle.py:208-214, 1239-1244); the invariant it relies
on is *one* tokenizer shared by train/infer/eval. We keep that invariant:
one tokenizer definition, rendered identically three ways so engine, SQL
oracle, and pure-Python golden oracle can never drift:

  1. ``tokenize_py``     — pure Python (oracle + pandas-UDF paths)
  2. ``tokens_col``      — Spark Column expression (JVM-side, codegen'd —
                           faster than any UDF; the engine's hot path)
  3. ``duckdb_tokens_sql`` — DuckDB SQL fragment for the driver oracle

Definition v1: lowercase (ASCII), extract maximal runs of [a-z0-9].
Identical to ``re.findall('[a-z0-9]+', text.lower())`` and to
split-on-[^a-z0-9]+-drop-empties. No stemming, no stopword removal —
stopwords stay in so the Zipfian skew path is exercised.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKENIZER_VERSION = "v1-ascii-alnum"

_TOKEN_RE = re.compile(r"[a-z0-9]+")

# One regex literal shared by the Spark and DuckDB renditions.
_SPLIT_PATTERN = "[^a-z0-9]+"


def tokenize_py(text: str | None) -> list[str]:
    """Pure-Python rendition. Used by the single-process oracle and inside
    Arrow-batched UDFs (applied per pandas Series, never per Spark row)."""
    if text is None:
        return []
    return _TOKEN_RE.findall(text.lower())


def tokens_col(col: Column | str) -> Column:
    """Spark Column rendition: lower -> split -> drop empties.

    Stays inside WholeStageCodegen (no Python boundary). ``lower`` on
    non-ASCII differs from Python ``str.lower`` for exotic codepoints
    (e.g. dotted-I); v1 scopes the token alphabet to ASCII alnum so the
    difference can never reach the output.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.lower(c), _SPLIT_PATTERN),
        lambda x: x != F.lit(""),
    )


def duckdb_tokens_sql(expr: str) -> str:
    """DuckDB SQL fragment producing the same list<varchar>."""
    return (
        f"list_filter(regexp_split_to_array(lower({expr}), '{_SPLIT_PATTERN}'), "
        "x -> x <> '')"
    )

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


# ---------------------------------------------------------------------------
# Definition v2 (round 5): v1 tokens -> drop stopwords -> s-stem.
#
# The stemmer is Harman's "S stemmer" (Donna Harman, "How Effective Is
# Suffixing?", JASIS 1991) — three ordered suffix rules, strong enough to
# conflate plural/singular (tables -> table, queries -> query) while
# staying EXACTLY expressible in all three renditions (a Porter stemmer
# cannot be written as a Spark Column expression; a UDF would put the
# hot tokenize path behind a Python boundary):
#
#   ies -> y   unless the word ends in eies / aies
#   es  -> e   unless the word ends in aes / ees / oes   (drop the s)
#   s   -> ''  unless the word ends in us / ss
#
# Rules apply only to words of length >= 4 (shorter words can stem to
# near-empty strings and are almost never plurals worth conflating).
# Stopwords are the classic Lucene StandardAnalyzer 33-word English set,
# removed BEFORE stemming (Lucene's EnglishAnalyzer order) — note a stem
# may therefore EQUAL a stopword ("its" -> stopword-kept? no: "its" is
# not in the 33-word set; but e.g. "thats" -> "that" survives as a
# token). All three renditions share the order, so they can never drift.
TOKENIZER_V2_VERSION = "v2-sstem-stop"

# Lucene StandardAnalyzer ENGLISH_STOP_WORDS_SET (public, 33 words)
STOPWORDS: tuple[str, ...] = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with",
)
_STOPSET = frozenset(STOPWORDS)


def s_stem_py(w: str) -> str:
    """Pure-Python S-stemmer rendition (one already-lowercased token).

    Only the FIRST rule whose suffix matches fires — a word protected by
    a rule's exception ("does" under the oes-exception) is left
    unchanged, it does NOT fall through to the bare-s rule."""
    if len(w) < 4:
        return w
    if w.endswith("ies"):
        return w if w.endswith(("eies", "aies")) else w[:-3] + "y"
    if w.endswith("es"):
        return w if w.endswith(("aes", "ees", "oes")) else w[:-1]
    if w.endswith("s"):
        return w if w.endswith(("us", "ss")) else w[:-1]
    return w


def tokenize_v2_py(text: str | None) -> list[str]:
    """v2 pipeline, pure-Python rendition."""
    return [s_stem_py(t) for t in tokenize_py(text) if t not in _STOPSET]


def _s_stem_col(x: Column) -> Column:
    # first-matching-suffix-rule-fires: the identity arms keep an
    # exception-protected word ("does") from falling through to the
    # bare-s rule — same structure in all three renditions
    n = F.length(x)
    return (
        F.when(
            (n >= 4)
            & x.endswith("ies")
            & ~x.endswith("eies")
            & ~x.endswith("aies"),
            F.concat(x.substr(F.lit(1), n - 3), F.lit("y")),
        )
        .when((n >= 4) & x.endswith("ies"), x)
        .when(
            (n >= 4)
            & x.endswith("es")
            & ~x.endswith("aes")
            & ~x.endswith("ees")
            & ~x.endswith("oes"),
            x.substr(F.lit(1), n - 1),
        )
        .when((n >= 4) & x.endswith("es"), x)
        .when(
            (n >= 4) & x.endswith("s") & ~x.endswith("us") & ~x.endswith("ss"),
            x.substr(F.lit(1), n - 1),
        )
        .otherwise(x)
    )


def v2_from_v1_tokens_col(tokens: Column) -> Column:
    """v1 token ARRAY -> v2 token array (stopword drop + s-stem), pure
    expressions. v2 is by construction a token-level transform of v1 —
    this is the composable half tokens_v2_col wraps, and what lets
    index/reconstruct.py reindex a v1 index to v2 without the corpus."""
    return F.transform(
        F.filter(tokens, lambda x: ~x.isin(*STOPWORDS)),
        _s_stem_col,
    )


def tokens_v2_col(col: Column | str) -> Column:
    """v2 pipeline, Spark Column rendition — still pure expressions
    (filter + transform over the v1 split), no Python boundary."""
    return v2_from_v1_tokens_col(tokens_col(col))


def _s_stem_sql(x: str) -> str:
    return (
        f"CASE WHEN len({x}) >= 4 AND {x} LIKE '%ies' "
        f"AND {x} NOT LIKE '%eies' AND {x} NOT LIKE '%aies' "
        f"THEN substr({x}, 1, len({x}) - 3) || 'y' "
        f"WHEN len({x}) >= 4 AND {x} LIKE '%ies' THEN {x} "
        f"WHEN len({x}) >= 4 AND {x} LIKE '%es' "
        f"AND {x} NOT LIKE '%aes' AND {x} NOT LIKE '%ees' AND {x} NOT LIKE '%oes' "
        f"THEN substr({x}, 1, len({x}) - 1) "
        f"WHEN len({x}) >= 4 AND {x} LIKE '%es' THEN {x} "
        f"WHEN len({x}) >= 4 AND {x} LIKE '%s' "
        f"AND {x} NOT LIKE '%us' AND {x} NOT LIKE '%ss' "
        f"THEN substr({x}, 1, len({x}) - 1) "
        f"ELSE {x} END"
    )


def duckdb_tokens_v2_sql(expr: str) -> str:
    """DuckDB SQL fragment producing the same v2 list<varchar>."""
    stop = ", ".join(f"'{w}'" for w in STOPWORDS)
    return (
        f"list_transform(list_filter({duckdb_tokens_sql(expr)}, "
        f"x -> NOT list_contains([{stop}], x)), x -> {_s_stem_sql('x')})"
    )


# analyzer registry: version string -> (python, Column, DuckDB) rendition
# NAMES, resolved against this module at call time (monkeypatching a
# rendition — tests poison tokenize_py to prove the Spark path never
# tokenizes on the driver — must keep working through the registry).
# IndexMeta.analyzer records the build-time version; the query side
# dispatches through this table so an index is always queried with the
# analyzer it was built with (Lucene's Analyzer-per-index contract).
ANALYZERS: dict[str, tuple[str, str, str]] = {
    TOKENIZER_VERSION: ("tokenize_py", "tokens_col", "duckdb_tokens_sql"),
    TOKENIZER_V2_VERSION: (
        "tokenize_v2_py",
        "tokens_v2_col",
        "duckdb_tokens_v2_sql",
    ),
}


def analyzer_fns(version: str) -> tuple:
    """-> (python, Column, DuckDB-SQL) rendition callables for a version."""
    import sys

    try:
        names = ANALYZERS[version]
    except KeyError:
        raise ValueError(
            f"unknown analyzer {version!r}; known: {sorted(ANALYZERS)}"
        ) from None
    mod = sys.modules[__name__]
    return tuple(getattr(mod, n) for n in names)

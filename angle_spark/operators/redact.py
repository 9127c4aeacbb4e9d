"""PII redaction — the training-data scrubbing pass every large-scale
text pipeline runs before material leaves the trust boundary (emails,
phone numbers, IPs, SSNs, card numbers), the reference's corpora being
exactly such web-derived text (/root/reference/README.md data section).

Pure built-in column ops (regexp_count + regexp_replace chains) — JVM
whole-stage codegen end to end, no Python in the hot path, trivially
scale-safe (a map over the corpus, no shuffle).

Pattern dialect: the subset common to Java regex (Spark) and RE2/
DuckDB — no lookarounds, no possessive quantifiers, no backrefs — so
the SAME pattern strings drive the engine and the SQL oracle.
Redaction applies in the fixed PII_KINDS order, and each kind's match
COUNT is taken on the text state just before its own replacement, so
overlapping families (card digits vs phone shapes) resolve
deterministically and identically in both renditions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# order is load-bearing: earlier kinds are replaced before later kinds
# are counted, so e.g. card digit runs can never double-count as phones
PII_KINDS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("card", r"\b\d{4}[ -]?\d{4}[ -]?\d{4}[ -]?\d{4}\b"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("phone", r"\+?\d{1,3}[-. ]?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}\b"),
]
_KINDS = {k for k, _ in PII_KINDS}


def redact_pii(
    df: DataFrame,
    col: str = "text",
    kinds: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Replace each PII match with ``[KIND]`` and add one ``n_<kind>``
    count column per requested kind (matches found at that kind's turn
    in the fixed order). ``out_col`` defaults to replacing ``col``
    in place; NULL text stays NULL with zero counts."""
    todo = [k for k, _ in PII_KINDS] if kinds is None else list(kinds)
    unknown = set(todo) - _KINDS
    if unknown:
        raise ValueError(
            f"unknown PII kinds {sorted(unknown)} — available: "
            f"{[k for k, _ in PII_KINDS]}"
        )
    out_col = out_col or col
    cur = F.col(col)
    counts = []
    for kind, pat in PII_KINDS:
        if kind not in todo:
            continue
        counts.append(
            F.coalesce(F.regexp_count(cur, F.lit(pat)), F.lit(0))
            .cast("long")
            .alias(f"n_{kind}")
        )
        cur = F.regexp_replace(cur, pat, f"[{kind.upper()}]")
    return df.select(
        *[c for c in df.columns if c != col or out_col != col],
        cur.alias(out_col),
        *counts,
    )

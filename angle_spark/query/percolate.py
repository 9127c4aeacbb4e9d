"""Percolator: reverse search — stream documents against a STORED query
catalog (Lucene/Elasticsearch ``percolate``; Lucene's
``MemoryIndex`` + terms-index prefilter design, re-expressed as one
Spark corpus scan).

Forward search asks "which docs match this query?"; percolation asks
"which of my saved queries match this doc?" — the routing/alerting
primitive of a training-data pipeline: a catalog of topic filters,
quality gates, or contamination probes is registered once, and every
incoming document is classified against ALL of them in a single pass.
The reference's evaluation gate runs a fixed set of retrieval prompts
over every candidate model output (reference tests/test_eval.py:4-20,
README.md:119-128) — the same stored-queries-over-streaming-docs shape.

Semantics: the full boolean grammar of query/boolean.py (term, phrase,
NEAR, prefix, fuzzy, regex, AND/OR/NOT, boosts transparent), evaluated
against EACH DOCUMENT IN ISOLATION — Lucene's MemoryIndex semantics.
This differs from forward retrieval in exactly one published way:
multi-term rewrites (prefix/fuzzy/regex) match against the DOCUMENT'S
OWN tokens, uncapped, not against a capped global-vocabulary expansion
(Lucene percolator queries are never rewritten against the corpus
vocabulary — there is no corpus at percolation time). Field-scoped and
range leaves are rejected: percolation is over document CONTENT; a
metadata gate composes as an ordinary filter on the output pairs.

Scale shape (100 TB corpus / streaming firehose, catalog in the
thousands):
- the compiled catalog is driver-side state measured in query-tree
  bytes; it ships ONCE inside the mapInPandas closure (broadcast by
  cloudpickle) — never a join side;
- candidate pruning is Lucene's terms-index prefilter: each query
  contributes one COVERING clause (a term set / prefix-stem set such
  that every matching doc must contain a hit); per document, candidate
  queries = inverted-map lookups on the doc's own token set, and only
  candidates pay tree evaluation. Fuzzy/regex leaves fall back to
  verify-always for that query (disclosed, same as Lucene's
  non-extractable-query clause);
- the whole operator is ONE corpus scan with ZERO shuffle: no join, no
  Window, no Exchange — output is the matched (doc_id, query_id) pairs,
  already partitioned like the corpus. Streaming percolation is the
  same call inside ``foreachBatch`` (tests drive it).

Oracle: entries._percolate_oracle_sql — per-query membership SQL (the
same INTERSECT/UNION/EXCEPT primitives as the boolean-retrieval oracle,
with prefix/fuzzy/regex re-expressed as per-doc LIKE / levenshtein /
regexp_full_match predicates, NOT capped vocabulary rewrites).
"""

from __future__ import annotations

import re as _re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from angle_spark.query.boolean import parse_query
from angle_spark.query.fuzzy import levenshtein_py
from angle_spark.query.regex import validate_pattern

PERCOLATE_SCHEMA = "doc_id long, query_id string"


class Catalog:
    """Compiled stored-query catalog: parsed trees + the terms-index
    prefilter (term -> query indices, prefix stems, verify-always
    list). Immutable; safe to capture in executor closures."""

    __slots__ = ("query_ids", "trees", "term_map", "stems", "full")

    def __init__(self, query_ids, trees, term_map, stems, full):
        self.query_ids = query_ids
        self.trees = trees
        self.term_map = term_map  # term -> tuple of query indices
        self.stems = stems  # tuple of (stem, tuple of query indices)
        self.full = full  # tuple of query indices verified on every doc

    def __len__(self) -> int:
        return len(self.query_ids)


def _covering(node):
    """-> (terms, stems, full): a covering prefilter clause — every doc
    matching ``node`` contains a term in ``terms`` or a token starting
    with a stem in ``stems``; ``full=True`` means no finite cover exists
    (fuzzy/regex leaves) and the query must be verified on every doc.

    AND picks its cheapest positive conjunct (intersection only
    shrinks); OR must union all arms (either can widen); negatives
    never contribute (they only shrink)."""
    kind = node[0]
    if kind == "boost":
        return _covering(node[1])
    if kind == "term":
        return {node[1]}, set(), False
    if kind == "phrase":
        # any one token of the phrase covers; pick the longest
        # (heuristically rarest — no dfs exist at percolation time)
        return {max(node[1], key=lambda t: (len(t), t))}, set(), False
    if kind == "prefix":
        return set(), {node[1]}, False
    if kind in ("fuzzy", "regex"):
        return set(), set(), True
    if kind == "or":
        terms: set = set()
        stems: set = set()
        for c in node[1]:
            t, s, f = _covering(c)
            if f:
                return set(), set(), True
            terms |= t
            stems |= s
        return terms, stems, False
    # and: cheapest positive conjunct — fewest clauses, terms preferred
    # over stems (exact-map lookup beats startswith scans), finite over
    # full
    best = None
    for c in node[1]:
        t, s, f = _covering(c)
        cost = (1, 0, 0) if f else (0, len(s), len(t))
        if best is None or cost < best[0]:
            best = (cost, t, s, f)
    return best[1], best[2], best[3]


def _min_window_span(lists) -> int:
    """Smallest max-min span over one position from each sorted list —
    the NEAR window check (same definition as the retrieval oracle's
    greatest(p_i) - least(p_i) minimum)."""
    idx = [0] * len(lists)
    best = None
    while True:
        heads = [lists[i][idx[i]] for i in range(len(lists))]
        lo, hi = min(heads), max(heads)
        span = hi - lo
        if best is None or span < best:
            best = span
            if best == 0:
                return 0
        j = heads.index(lo)
        idx[j] += 1
        if idx[j] == len(lists[j]):
            return best


def _compile(node):
    """tree -> closure(tokset, posmap) -> bool. ``posmap`` maps token ->
    ascending position list; it is only built for docs that reach a
    positional query (needs_positions)."""
    kind = node[0]
    if kind == "boost":
        return _compile(node[1])
    if kind == "term":
        t = node[1]
        return lambda tokset, posmap: t in tokset
    if kind == "prefix":
        stem = node[1]
        return lambda tokset, posmap: any(
            tok.startswith(stem) for tok in tokset
        )
    if kind == "fuzzy":
        w, d = node[1], node[2]
        if d == 0:
            return lambda tokset, posmap: w in tokset
        lw = len(w)

        def _fz(tokset, posmap):
            return any(
                abs(len(tok) - lw) <= d and levenshtein_py(w, tok) <= d
                for tok in tokset
            )

        return _fz
    if kind == "regex":
        pat = _re.compile(validate_pattern(node[1]))
        return lambda tokset, posmap: any(
            pat.fullmatch(tok) for tok in tokset
        )
    if kind == "phrase":
        toks, slop = list(node[1]), int(node[2])
        if slop == 0:

            def _ph(tokset, posmap):
                if any(t not in posmap for t in toks):
                    return False
                rest = [(i, set(posmap[t])) for i, t in enumerate(toks[1:], 1)]
                return any(
                    all(p + i in ps for i, ps in rest)
                    for p in posmap[toks[0]]
                )

            return _ph
        distinct = sorted(set(toks))

        def _nr(tokset, posmap):
            lists = []
            for t in distinct:
                ps = posmap.get(t)
                if not ps:
                    return False
                lists.append(ps)
            if len(lists) == 1:
                return True
            return _min_window_span(lists) <= slop

        return _nr
    if kind == "and":
        pos = [_compile(c) for c in node[1]]
        neg = [_compile(c) for c in node[2]]
        return lambda tokset, posmap: all(
            f(tokset, posmap) for f in pos
        ) and not any(f(tokset, posmap) for f in neg)
    if kind == "or":
        arms = [_compile(c) for c in node[1]]
        return lambda tokset, posmap: any(f(tokset, posmap) for f in arms)
    raise ValueError(
        f"percolation is over document content; {kind!r} leaves are not "
        "percolatable (apply metadata gates as filters on the output)"
    )


def compile_catalog(stored: list[tuple[str, str]]) -> Catalog:
    """[(query_id, query_text)] -> compiled Catalog.

    Queries use the full boolean grammar (v1 analyzer — structured
    queries are v1-only, matching wand_topk). Duplicate query_ids and
    field/range leaves raise up front."""
    ids: list[str] = []
    trees = []
    term_map: dict[str, list[int]] = {}
    stem_map: dict[str, list[int]] = {}
    full: list[int] = []
    seen: set[str] = set()
    for qid, text in stored:
        if qid in seen:
            raise ValueError(f"duplicate query_id in catalog: {qid!r}")
        seen.add(qid)
        tree = parse_query(text)
        i = len(ids)
        ids.append(qid)
        # _compile also validates leaf kinds (rejects field/range)
        trees.append((tree, _compile(tree)))
        terms, stems, is_full = _covering(tree)
        if is_full:
            full.append(i)
            continue
        for t in terms:
            term_map.setdefault(t, []).append(i)
        for s in stems:
            stem_map.setdefault(s, []).append(i)
    return Catalog(
        tuple(ids),
        tuple(trees),
        {t: tuple(v) for t, v in term_map.items()},
        tuple((s, tuple(v)) for s, v in sorted(stem_map.items())),
        tuple(full),
    )


def save_catalog(spark, path: str, stored: list[tuple[str, str]]) -> None:
    """Persist a stored-query catalog as one crash-safe JSON file
    (fsio.write_text: temp + atomic rename — the same single-writer
    commit discipline as index metadata; ES persists percolator queries
    durably in an index the same way). The catalog is validated by a
    full compile BEFORE anything is written, so a bad query can never
    poison the stored file."""
    import json

    from angle_spark import fsio

    compile_catalog(stored)  # validate every query + duplicate ids
    payload = json.dumps(
        {"version": 1, "queries": [[q, t] for q, t in stored]},
        indent=1,
        sort_keys=True,
    )
    fsio.write_text(spark, path, payload)


def load_catalog(spark, path: str) -> Catalog:
    """Load + compile a catalog saved by save_catalog."""
    import json

    from angle_spark import fsio

    data = json.loads(fsio.read_text(spark, path))
    if data.get("version") != 1:
        raise ValueError(
            f"unknown catalog version {data.get('version')!r} at {path}"
        )
    return compile_catalog([(q, t) for q, t in data["queries"]])


def percolate(
    docs: DataFrame,
    catalog: Catalog,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """-> (doc_id, query_id): every (document, stored query) match.

    One corpus scan, zero shuffle: the compiled catalog rides the
    mapInPandas closure; per document, the terms-index prefilter picks
    candidate queries off the doc's own token set and only candidates
    pay tree evaluation. Output rows keep the corpus partitioning."""
    from angle_spark.functions.tokenizer import tokenize_py
    from angle_spark.query.boolean import needs_positions

    if len(catalog) == 0:
        return (
            docs.sparkSession.createDataFrame([], PERCOLATE_SCHEMA)
        )
    needs_pos = tuple(needs_positions(t) for t, _ in catalog.trees)
    any_pos = any(needs_pos)
    src = docs.select(id_col, text_col)

    def _fn(batches):
        term_map = catalog.term_map
        tm_keys = term_map.keys()
        stems = catalog.stems
        full = catalog.full
        trees = catalog.trees
        qids = catalog.query_ids
        for pdf in batches:
            out_d: list[int] = []
            out_q: list[str] = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = tokenize_py(text)
                if not toks:
                    if not full:
                        continue
                    tokset: set = set()
                else:
                    tokset = set(toks)
                cands: set[int] = set(full)
                for t in tokset & tm_keys:
                    cands.update(term_map[t])
                for stem, qs in stems:
                    if not cands.issuperset(qs) and any(
                        tok.startswith(stem) for tok in tokset
                    ):
                        cands.update(qs)
                if not cands:
                    continue
                posmap: dict[str, list[int]] | None = None
                if any_pos and any(needs_pos[i] for i in cands):
                    posmap = {}
                    for p, t in enumerate(toks):
                        posmap.setdefault(t, []).append(p)
                for i in sorted(cands):
                    if trees[i][1](tokset, posmap):
                        out_d.append(doc_id)
                        out_q.append(qids[i])
            yield pd.DataFrame(
                {
                    "doc_id": np.asarray(out_d, dtype=np.int64),
                    "query_id": np.asarray(out_q, dtype=object),
                }
            )

    return src.mapInPandas(_fn, schema=PERCOLATE_SCHEMA)

"""Boolean query trees: AND / OR / NOT with term, phrase and NEAR leaves.

The round-3 surface answered one flavor per call (or | and | phrase |
near | filtered); real retrieval mixes them immediately — ``("hash
join" AND spark) OR dup`` is the first thing a search user types that a
single-flavor engine cannot answer (the reference's golden gate runs
real user queries end-to-end, reference tests/test_eval.py:4-20). This
module gives that surface its query language:

Grammar (a deliberate Lucene-classic subset; operators are UPPERCASE so
lowercase ``and``/``or``/``not`` stay ordinary corpus terms):

    expr   := and ( OR  and )*
    and    := unary ( AND unary )*
    unary  := [NOT] atom
    atom   := '(' expr ')' | '"' words '"' [ '~' slop ] | word

- ``"a b"``    exact ordered phrase (positional index required)
- ``"a b"~3``  unordered proximity: all distinct tokens within a
               3-token window (the existing NEAR semantics)
- a bare word is run through the SAME tokenizer as the corpus; if it
  splits into several tokens (e.g. ``hash-join``) it becomes an AND of
  them.
- NOT is restricted the way Lucene restricts MUST_NOT: it must appear
  under an AND with at least one positive sibling (``a AND NOT b``).
  A pure negation (``NOT b``, ``NOT a OR b``'s left arm) is rejected:
  its answer set is "every document except…", which cannot be produced
  from the query terms' posting lists — and is never what a user means.

- ``stem*``    prefix leaf (round 4): expands driver-side to the
               top-``max_expansions`` vocabulary terms (df DESC, term
               ASC — the same capped top-terms rewrite as
               query/prefix.py) and becomes an OR of them; a matchless
               stem matches nothing, folding through AND/OR/NOT exactly
               like an out-of-vocabulary term.

- ``word~d``   fuzzy leaf (round 4): expands driver-side to the top
               vocabulary terms within ``d`` edits of ``word`` (edit
               distance ASC, df DESC, term ASC — query/fuzzy.py,
               Lucene's FuzzyQuery rewrite) and becomes an OR of them.
               ``~`` with no digit means d=2 (Lucene's default
               fuzziness); d is capped at 2; ``word~0`` is just the
               exact term. A matchless word folds like an OOV term.

- ``te?t`` / ``h*llo`` / ``*ion`` — wildcard leaf (round 5, Lucene's
               WildcardQuery): ``?`` matches exactly one character,
               ``*`` any (possibly empty) run. Desugars at parse time
               to a regex leaf (query/regex.wildcard_to_regex), so the
               capped top-terms rewrite, boosts, NOT, the SQL oracle
               and the percolator apply unchanged. A word whose ONLY
               wildcard is a single trailing ``*`` stays a prefix leaf
               (the cheaper contiguous-range rewrite). All-wildcard
               patterns (``*``, ``?``) are rejected; literal segments
               must stay inside the tokenizer alphabet [a-z0-9].

- ``/re/``     regexp leaf (round 4, Lucene's RegexpQuery shape): the
               pattern must match an ENTIRE vocabulary term; the leaf
               expands driver-side to the top-``max_expansions``
               matching terms (df DESC, term ASC — the same capped
               top-terms rewrite as prefix leaves) and becomes an OR of
               them. The supported syntax is the RE2-safe common subset
               (literals, classes, ``.``, ``*``, ``+``, ``?``,
               alternation, grouping, bounded repeats); backreferences
               and lookaround are rejected up front so Spark's Java
               regex and the DuckDB oracle's RE2 agree by construction.
               A matchless pattern folds like an OOV term. ``/`` inside
               the pattern is not supported (the body runs to the next
               ``/``).

- ``field:value`` / ``field:"multi word value"`` — field-scoped leaf
               (round 5, Lucene's most common idiom after bare terms):
               matches documents whose metadata ``field`` EQUALS
               ``value`` exactly (string equality on the stringified
               value — no tokenization, Lucene keyword-field
               semantics). Field leaves are FILTERS: they gate
               membership but contribute no score (filter context), so
               they must not be able to widen the answer set beyond the
               query's scoring terms — every OR arm and the query root
               need at least one scoring (term/phrase/prefix/fuzzy/
               regex) positive leaf, the same way pure negation is
               rejected. ``a AND role:assistant``, ``a AND NOT
               source:web`` and ``a AND (lang:en OR lang:de)`` are
               fine; ``role:assistant`` alone or ``a OR role:user``
               are rejected. The engine resolves each (field, value)
               pair against a caller-supplied metadata frame
               (wand_topk(field_meta=...)) and ships the docID set
               through the same shard-cogrouped channel as tombstones
               — never broadcast. Boost on a field leaf is rejected
               (it could never score).

- ``field:[lo TO hi]`` / ``field:{lo TO hi}`` — field range leaf
               (round 5, Lucene's TermRangeQuery): matches documents
               whose metadata ``field`` falls in the bound interval
               under LEXICOGRAPHIC (byte-order) string comparison on
               the stringified value — exactly Lucene's keyword-field
               range semantics, including its classic gotcha that
               ``src10`` sorts between ``src1`` and ``src2`` (numeric
               ranges want zero-padded values, the standard Lucene
               TermRange practice). ``[``/``]`` are inclusive bounds,
               ``{``/``}`` exclusive, mixed forms allowed; ``*`` is an
               open bound (``field:[* TO *]`` = field-exists query).
               Bounds with spaces go in quotes (``ts:["2024-01-01 00:00"
               TO *]``). Range leaves are FILTERS exactly like equality
               field leaves: same coverage rule (every OR arm and the
               root need a scoring positive leaf), same resolution
               (one metadata scan, docID sets on the cogrouped tombstone
               channel), boost rejected. An inverted interval
               (lo > hi) or an unseen value range simply matches
               nothing.

- ``leaf^w``   query-time boost (round 4, Lucene's ``^``): multiplies
               the leaf's BM25 score contribution by ``w`` (> 0; ``<1``
               demotes). Valid on word, ``"phrase"``, ``"prox"~n``,
               ``stem*`` and ``word~d`` leaves; a prefix/fuzzy leaf's
               expansion terms inherit its boost. Boost NEVER changes
               membership — only the scoring weight of the leaf's
               positive terms. A term reached through several positive
               leaves scores with the MAX of their boosts (a boost
               declares importance; importance doesn't cancel), which
               keeps weights well-defined under the distinct-term
               disjunctive fold the oracle asserts.

AST nodes are plain picklable tuples (they ride the query broadcast):

    ("term",   token)
    ("field",  name, value)           # driver-side; wand maps it to ("fieldset", id)
    ("range",  name, lo, hi, incl_lo, incl_hi)  # driver-side; None bound = open
    ("fieldset", id)                  # shipped form: shard-local docID-set lookup
    ("prefix", stem)                  # driver-side only; expanded before shipping
    ("fuzzy",  token, max_dist)       # driver-side only; expanded before shipping
    ("regex",  pattern)               # driver-side only; expanded before shipping
    ("phrase", [tokens], slop)        # slop 0 = exact ordered phrase
    ("boost",  child, weight)         # scoring-only wrapper on a leaf
    ("and",    [positives], [negatives])
    ("or",     [children])

Evaluation happens shard-locally in query/wand.py over boolean masks on
the shard's docID span — exact for the same reason conjunctive mode is:
every posting of a doc lives in its own segment, so all evidence about
one doc meets in one task. Because every matched doc satisfies at least
one positive leaf, the candidate set is covered by the positive terms'
posting lists; scoring is the standard disjunctive BM25 fold over the
query's distinct positive terms, restricted to the matched docs — the
exact semantics the SQL oracle (entries._bm25_boolean_oracle_sql)
asserts via INTERSECT/UNION/EXCEPT membership CTEs.
"""

from __future__ import annotations

import re

from angle_spark.functions.tokenizer import tokenize_py

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\() |
        (?P<rparen>\)) |
        (?P<frange>(?P<gname>[A-Za-z_][A-Za-z0-9_]*):
            (?P<lb>[\[\{])\s*
            (?P<lo>"[^"]*"|[^\s\]\}]+)\s+TO\s+
            (?P<hi>"[^"]*"|[^\s\]\}]+)\s*
            (?P<rb>[\]\}])) |
        (?P<fielded>(?P<fname>[A-Za-z_][A-Za-z0-9_]*):"(?P<fbody>[^"]*)") |
        (?P<quoted>"(?P<qbody>[^"]*)"(?:~(?P<slop>\d+))?(?:\^(?P<qboost>\d+(?:\.\d+)?))?) |
        (?P<regex>/(?P<rbody>[^/]*)/(?:\^(?P<rboost>\d+(?:\.\d+)?))?) |
        (?P<word>[^\s()"]+)
    )""",
    re.VERBOSE,
)

_OPS = {"AND", "OR", "NOT"}


class BooleanQueryError(ValueError):
    pass


def _boosted(node, weight, text: str):
    """Wrap a parsed leaf in ("boost", node, w). ``^1`` (and no boost)
    is the identity and adds no wrapper; ``^0`` is rejected — a
    zero-weight positive leaf would still gate membership while
    contributing nothing, which is never what a user means (Lucene
    rejects it too)."""
    if weight is None or weight == 1.0:
        return node
    if weight <= 0.0:
        raise BooleanQueryError(
            f"boost must be > 0, got {weight} in: {text!r}"
        )
    return ("boost", node, weight)


def _lex(text: str) -> list[tuple[str, object]]:
    out: list[tuple[str, object]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None or m.end() == pos:
            if text[pos:].strip():
                raise BooleanQueryError(f"cannot lex at: {text[pos:]!r}")
            break
        pos = m.end()
        if m.group("lparen"):
            out.append(("(", None))
        elif m.group("rparen"):
            out.append((")", None))
        elif m.group("frange") is not None:
            out.append(
                (
                    "rangetok",
                    (
                        m.group("gname"),
                        m.group("lb"),
                        m.group("lo"),
                        m.group("hi"),
                        m.group("rb"),
                    ),
                )
            )
        elif m.group("fielded") is not None:
            out.append(("field", (m.group("fname"), m.group("fbody"))))
        elif m.group("quoted") is not None:
            out.append(
                (
                    "phrase",
                    (
                        m.group("qbody"),
                        int(m.group("slop") or 0),
                        float(m.group("qboost")) if m.group("qboost") else None,
                    ),
                )
            )
        elif m.group("regex") is not None:
            out.append(
                (
                    "regex",
                    (
                        m.group("rbody"),
                        float(m.group("rboost")) if m.group("rboost") else None,
                    ),
                )
            )
        else:
            w = m.group("word")
            out.append(("op", w) if w in _OPS else ("word", w))
    return out


class _Parser:
    def __init__(self, toks: list[tuple[str, object]], text: str):
        self.toks = toks
        self.i = 0
        self.text = text

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def take(self):
        t = self.peek()
        self.i += 1
        return t

    def expr(self):
        arms = [self.and_expr()]
        while self.peek() == ("op", "OR"):
            self.take()
            arms.append(self.and_expr())
        if len(arms) == 1:
            return arms[0]
        for neg, _node in arms:
            if neg:
                raise BooleanQueryError(
                    f"NOT must sit under an AND with a positive sibling: {self.text!r}"
                )
        return (False, ("or", [n for _, n in arms]))

    def and_expr(self):
        arms = [self.unary()]
        while self.peek() == ("op", "AND"):
            self.take()
            arms.append(self.unary())
        if len(arms) == 1:
            return arms[0]
        pos = [n for neg, n in arms if not neg]
        neg = [n for negf, n in arms if negf]
        if not pos:
            raise BooleanQueryError(
                f"AND group with no positive arm (pure negation): {self.text!r}"
            )
        return (False, ("and", pos, neg))

    def unary(self):
        if self.peek() == ("op", "NOT"):
            self.take()
            negf, node = self.unary()
            return (not negf, node)
        return (False, self.atom())

    def atom(self):
        kind, val = self.take()
        if kind == "(":
            negf, node = self.expr()
            if negf:
                raise BooleanQueryError(
                    f"parenthesized pure negation: {self.text!r}"
                )
            if self.take() != (")", None):
                raise BooleanQueryError(f"missing ')': {self.text!r}")
            return node
        if kind == "phrase":
            body, slop, boost = val
            toks = tokenize_py(body)
            if not toks:
                raise BooleanQueryError(f"empty phrase in: {self.text!r}")
            node = ("term", toks[0]) if len(toks) == 1 else ("phrase", toks, slop)
            return _boosted(node, boost, self.text)
        if kind == "regex":
            pat, boost = val
            from angle_spark.query.regex import validate_pattern

            try:
                validate_pattern(pat)
            except ValueError as exc:
                raise BooleanQueryError(
                    f"regex leaf /{pat}/ in {self.text!r}: {exc}"
                ) from exc
            return _boosted(("regex", pat), boost, self.text)
        if kind == "field":
            name, value = val
            if not value:
                raise BooleanQueryError(
                    f"field leaf {name}:\"\" has an empty value: {self.text!r}"
                )
            return ("field", name.lower(), value)
        if kind == "rangetok":
            name, lb, lo, hi, rb = val

            def bound(raw):
                if raw == "*":
                    return None
                if raw.startswith('"') and raw.endswith('"'):
                    return raw[1:-1]
                return raw

            return (
                "range",
                name.lower(),
                bound(lo),
                bound(hi),
                lb == "[",
                rb == "]",
            )
        if kind == "word":
            if val in _OPS:  # defensive; lexer routed ops already
                raise BooleanQueryError(f"operator {val} used as term")
            word = str(val)
            boost = None
            bm = re.fullmatch(r"(?P<body>.+)\^(?P<w>\d+(?:\.\d+)?)", word)
            if bm is not None:
                word = bm.group("body")
                boost = float(bm.group("w"))
            fld = re.fullmatch(
                r"(?P<name>[A-Za-z_][A-Za-z0-9_]*):(?P<val>.+)", word
            )
            if fld is not None:
                if boost is not None:
                    raise BooleanQueryError(
                        f"boost on a field leaf {word!r} is meaningless — "
                        "field leaves filter, they never score"
                    )
                return ("field", fld.group("name").lower(), fld.group("val"))
            fz = re.fullmatch(r"(?P<body>[^~]+)~(?P<d>\d*)", word)
            if fz is not None:
                body = tokenize_py(fz.group("body"))
                if len(body) != 1:
                    raise BooleanQueryError(
                        f"fuzzy {word!r}: word must tokenize to exactly one "
                        "token"
                    )
                dist = int(fz.group("d")) if fz.group("d") else 2
                if dist > 2:
                    raise BooleanQueryError(
                        f"fuzzy {word!r}: max edit distance is 2 (Lucene's "
                        "FuzzyQuery cap — larger distances stop meaning "
                        "'the same word mistyped')"
                    )
                if dist == 0:
                    return _boosted(("term", body[0]), boost, self.text)
                return _boosted(("fuzzy", body[0], dist), boost, self.text)
            if re.fullmatch(r"[^*?]+\*", word):
                # pure trailing-* is a PREFIX leaf (contiguous range in
                # the term-sorted stats scan — cheaper than the general
                # wildcard's full-vocabulary rlike pass)
                stem = tokenize_py(word[:-1])
                if len(stem) != 1:
                    raise BooleanQueryError(
                        f"prefix {word!r}: stem must tokenize to exactly one "
                        "token"
                    )
                return _boosted(("prefix", stem[0]), boost, self.text)
            if "*" in word or "?" in word:
                # Lucene WildcardQuery (te?t, h*llo, *ion): desugars to a
                # regex leaf — one expansion engine for the whole
                # vocabulary-rewrite family (query/regex.py)
                from angle_spark.query.regex import wildcard_to_regex

                try:
                    pat = wildcard_to_regex(word)
                except ValueError as exc:
                    raise BooleanQueryError(
                        f"wildcard leaf {word!r} in {self.text!r}: {exc}"
                    ) from exc
                return _boosted(("regex", pat), boost, self.text)
            toks = tokenize_py(word)
            if not toks:
                raise BooleanQueryError(f"word tokenizes to nothing: {val!r}")
            if len(toks) == 1:
                return _boosted(("term", toks[0]), boost, self.text)
            # a multi-token bare word (hash-join) is an AND of its tokens;
            # a boost on it distributes onto each token (the group's
            # membership is unchanged either way — boost is scoring-only)
            return (
                "and",
                [_boosted(("term", t), boost, self.text) for t in toks],
                [],
            )
        raise BooleanQueryError(f"unexpected token {kind!r} in: {self.text!r}")


def _covered(node) -> bool:
    """True iff the node's answer set is provably covered by the union
    of its positive SCORING leaves' posting lists — the invariant the
    shard evaluation depends on (candidate blocks ship by term) and the
    reason every matched doc has >= 1 BM25 contribution. Field leaves
    are filters (cov=False); an AND is covered if ANY positive conjunct
    is (intersection can only shrink), an OR only if ALL arms are
    (either arm can widen)."""
    kind = node[0]
    if kind == "boost":
        return _covered(node[1])
    if kind in ("field", "range"):
        return False
    if kind == "and":
        return any(_covered(c) for c in node[1])
    if kind == "or":
        return all(_covered(c) for c in node[1])
    return True  # term / phrase / prefix / fuzzy / regex


def parse_query(text: str):
    """boolean query string -> AST tuple (see module docstring)."""
    toks = _lex(text)
    if not toks:
        raise BooleanQueryError("empty query")
    p = _Parser(toks, text)
    negf, node = p.expr()
    if p.i != len(toks):
        raise BooleanQueryError(
            f"trailing input after position {p.i}: {text!r} — adjacent atoms "
            "need an explicit AND/OR"
        )
    if negf:
        raise BooleanQueryError(f"pure negation query: {text!r}")
    if not _covered(node):
        raise BooleanQueryError(
            "field-scoped leaves are filters: every OR arm and the query "
            f"root need at least one scoring positive leaf: {text!r}"
        )
    return node


def _collect_leaves(node, leaf_kind: str, key) -> set:
    """All ``leaf_kind`` leaf keys in the tree (positive or negated) —
    the driver-side expansion work list. ``key`` maps a leaf node to its
    dict key (stem / (word, dist) / pattern)."""
    kind = node[0]
    if kind == "boost":
        return _collect_leaves(node[1], leaf_kind, key)
    if kind == leaf_kind:
        return {key(node)}
    if kind == "and":
        out: set = set()
        for c in node[1] + node[2]:
            out |= _collect_leaves(c, leaf_kind, key)
        return out
    if kind == "or":
        out = set()
        for c in node[1]:
            out |= _collect_leaves(c, leaf_kind, key)
        return out
    return set()


def _expand_leaves_ast(node, leaf_kind: str, key, expansions: dict):
    """Replace every ``leaf_kind`` leaf with the OR of its expansion
    terms. A matchless leaf (empty expansion) matches nothing, so it
    propagates exactly like simplify()'s OOV folding: dead positive AND
    arm kills the group, dead OR arm drops, dead NOT child is a no-op.
    Returns None when the whole tree cannot match. Other driver-side
    leaf kinds pass through untouched (each expander owns its own kind;
    they run in sequence in wand_topk). A boost wrapper survives
    expansion — the expansion OR inherits the leaf's weight — and
    propagates its child's death."""
    kind = node[0]
    if kind == "boost":
        e = _expand_leaves_ast(node[1], leaf_kind, key, expansions)
        return None if e is None else ("boost", e, node[2])
    if kind == leaf_kind:
        terms = expansions.get(key(node), [])
        if not terms:
            return None
        if len(terms) == 1:
            return ("term", terms[0])
        return ("or", [("term", t) for t in terms])
    if kind in (
        "term", "phrase", "prefix", "fuzzy", "regex",
        "field", "range", "fieldset",
    ):
        return node
    if kind == "and":
        pos = [_expand_leaves_ast(c, leaf_kind, key, expansions) for c in node[1]]
        if any(p is None for p in pos):
            return None
        neg = [
            s
            for c in node[2]
            if (s := _expand_leaves_ast(c, leaf_kind, key, expansions)) is not None
        ]
        if len(pos) == 1 and not neg:
            return pos[0]
        return ("and", pos, neg)
    if kind == "or":
        arms = [
            s
            for c in node[1]
            if (s := _expand_leaves_ast(c, leaf_kind, key, expansions)) is not None
        ]
        if not arms:
            return None
        if len(arms) == 1:
            return arms[0]
        return ("or", arms)
    raise BooleanQueryError(f"unknown node kind {kind!r}")


def prefix_stems(node) -> set[str]:
    """All prefix-leaf stems in the tree (positive or negated)."""
    return _collect_leaves(node, "prefix", lambda n: n[1])


def expand_prefixes_ast(node, expansions: dict[str, list[str]]):
    """Replace every ("prefix", stem) leaf with the OR of its expansion
    terms (from query/prefix.expand_stems); see _expand_leaves_ast for
    the dead-leaf folding contract."""
    return _expand_leaves_ast(node, "prefix", lambda n: n[1], expansions)


def fuzzy_pairs(node) -> set[tuple[str, int]]:
    """All fuzzy (word, max_dist) leaves in the tree (positive or
    negated) — the expansion work list for query/fuzzy.expand_fuzzy."""
    return _collect_leaves(node, "fuzzy", lambda n: (n[1], n[2]))


def expand_fuzzy_ast(node, expansions: dict[tuple[str, int], list[str]]):
    """Replace every ("fuzzy", word, d) leaf with the OR of its
    expansion terms (from query/fuzzy.expand_fuzzy); see
    _expand_leaves_ast for the dead-leaf folding contract."""
    return _expand_leaves_ast(node, "fuzzy", lambda n: (n[1], n[2]), expansions)


def regex_patterns(node) -> set[str]:
    """All regex-leaf patterns in the tree (positive or negated) — the
    expansion work list for query/regex.expand_regex."""
    return _collect_leaves(node, "regex", lambda n: n[1])


def expand_regex_ast(node, expansions: dict[str, list[str]]):
    """Replace every ("regex", pattern) leaf with the OR of its
    expansion terms (from query/regex.expand_regex); see
    _expand_leaves_ast for the dead-leaf folding contract."""
    return _expand_leaves_ast(node, "regex", lambda n: n[1], expansions)


def field_predicates(node) -> set[tuple]:
    """All field-filter predicates in the tree (positive or negated) —
    the driver-side resolution work list for wand_topk's field_meta
    frame. Equality leaves key as ``("eq", field, value)``; range
    leaves as ``("range", field, lo, hi, incl_lo, incl_hi)`` with None
    for an open bound. Distinct predicates may OVERLAP on the same
    field (two ranges, or an equality inside a range) — the resolver
    must assign a metadata row to EVERY predicate it satisfies, not
    just the first."""
    return _collect_leaves(
        node, "field", lambda n: ("eq", n[1], n[2])
    ) | _collect_leaves(
        node, "range", lambda n: ("range", n[1], n[2], n[3], n[4], n[5])
    )


def map_field_leaves(node, fid_of: dict[tuple, int]):
    """Replace every ("field", f, v) / ("range", f, lo, hi, il, ih)
    leaf with the shippable ("fieldset", id) form — the shard evaluator
    looks the id up in its cogrouped per-leaf docID sets. Runs AFTER
    simplify (field leaves are never dead driver-side, so the tree
    shape is unchanged)."""
    kind = node[0]
    if kind == "boost":
        return ("boost", map_field_leaves(node[1], fid_of), node[2])
    if kind == "field":
        return ("fieldset", fid_of[("eq", node[1], node[2])])
    if kind == "range":
        return ("fieldset", fid_of[("range", *node[1:])])
    if kind == "and":
        return (
            "and",
            [map_field_leaves(c, fid_of) for c in node[1]],
            [map_field_leaves(c, fid_of) for c in node[2]],
        )
    if kind == "or":
        return ("or", [map_field_leaves(c, fid_of) for c in node[1]])
    return node


def positive_leaves_boosted(
    node,
) -> tuple[
    list[tuple[str, float]],
    list[tuple[str, float]],
    list[tuple[str, int, float]],
    list[tuple[str, float]],
]:
    """-> (sorted positive (term, boost) pairs incl. phrase tokens,
    sorted positive (stem, boost) pairs, sorted positive
    (word, max_dist, boost) triples, sorted positive (pattern, boost)
    pairs) of an UNEXPANDED tree — what the SQL oracle needs to rebuild
    the scoring term set (and its per-term weights: max over leaves,
    unboosted leaves weigh 1.0) independently. Duplicate pairs collapse;
    duplicate KEYS with different boosts survive — the oracle's
    max(boost) GROUP BY applies the same max rule the engine does."""
    terms: set[tuple[str, float]] = set()
    stems: set[tuple[str, float]] = set()
    fuzz: set[tuple[str, int, float]] = set()
    rex: set[tuple[str, float]] = set()

    def walk(n, positive, w):
        kind = n[0]
        if kind == "boost":
            walk(n[1], positive, n[2])
        elif kind == "term":
            if positive:
                terms.add((n[1], w))
        elif kind == "prefix":
            if positive:
                stems.add((n[1], w))
        elif kind == "fuzzy":
            if positive:
                fuzz.add((n[1], n[2], w))
        elif kind == "regex":
            if positive:
                rex.add((n[1], w))
        elif kind == "phrase":
            if positive:
                terms.update((t, w) for t in n[1])
        elif kind == "and":
            for c in n[1]:
                walk(c, positive, w)
            for c in n[2]:
                walk(c, False, w)
        elif kind == "or":
            for c in n[1]:
                walk(c, positive, w)

    walk(node, True, 1.0)
    return sorted(terms), sorted(stems), sorted(fuzz), sorted(rex)


def positive_leaves(
    node,
) -> tuple[list[str], list[str], list[tuple[str, int]], list[str]]:
    """-> (sorted positive literal terms incl. phrase tokens, sorted
    positive prefix stems, sorted positive fuzzy (word, max_dist)
    pairs, sorted positive regex patterns) of an UNEXPANDED tree,
    boosts stripped."""
    terms, stems, fuzz, rex = positive_leaves_boosted(node)
    return (
        sorted({t for t, _ in terms}),
        sorted({s for s, _ in stems}),
        sorted({(w, d) for w, d, _ in fuzz}),
        sorted({p for p, _ in rex}),
    )


def positive_boosts(node) -> dict[str, float]:
    """term -> scoring weight over an EXPANDED tree (prefix/fuzzy
    leaves already rewritten): the max boost over the positive leaves
    that carry the term, 1.0 for a term only reached unboosted. The
    engine folds this into idf driver-side (idf * boost is ONE Python
    float multiply, so the oracle's ln(..) * boost reproduces it
    bit-for-bit)."""
    out: dict[str, float] = {}

    def note(t, w):
        out[t] = max(out[t], w) if t in out else w

    def walk(n, positive, w):
        kind = n[0]
        if kind == "boost":
            walk(n[1], positive, n[2])
        elif kind in ("prefix", "fuzzy", "regex"):
            raise BooleanQueryError(
                f"{kind} leaf must be expanded before positive_boosts"
            )
        elif kind == "term":
            if positive:
                note(n[1], w)
        elif kind == "phrase":
            if positive:
                for t in n[1]:
                    note(t, w)
        elif kind == "and":
            for c in n[1]:
                walk(c, positive, w)
            for c in n[2]:
                walk(c, False, w)
        elif kind == "or":
            for c in n[1]:
                walk(c, positive, w)

    walk(node, True, 1.0)
    return out


def simplify(node, vocab) -> object | None:
    """Fold out-of-vocabulary leaves driver-side (round-3 verdict item 6
    generalized): an OOV term/phrase can match nothing, so an AND
    containing one positively is dead, an OR arm drops, and an OOV NOT
    child is a no-op. Returns None when the whole node cannot match —
    the caller drops the query and ships NO candidate blocks for it."""
    kind = node[0]
    if kind == "boost":
        s = simplify(node[1], vocab)
        return None if s is None else ("boost", s, node[2])
    if kind in ("prefix", "fuzzy", "regex"):
        raise BooleanQueryError(
            f"{kind} leaf must be expanded before simplify "
            "(expand_prefixes_ast/expand_fuzzy_ast; wand_topk "
            "mode='boolean' does this)"
        )
    if kind in ("field", "range", "fieldset"):
        # field membership is resolved at scoring time against the
        # metadata frame — driver-side it is never provably dead (an
        # unseen value or inverted range simply yields an empty docID
        # set)
        return node
    if kind == "term":
        return node if node[1] in vocab else None
    if kind == "phrase":
        return node if all(t in vocab for t in node[1]) else None
    if kind == "and":
        pos = [simplify(c, vocab) for c in node[1]]
        if any(p is None for p in pos):
            return None
        neg = [s for c in node[2] if (s := simplify(c, vocab)) is not None]
        if len(pos) == 1 and not neg:
            return pos[0]
        return ("and", pos, neg)
    if kind == "or":
        arms = [s for c in node[1] if (s := simplify(c, vocab)) is not None]
        if not arms:
            return None
        if len(arms) == 1:
            return arms[0]
        return ("or", arms)
    raise BooleanQueryError(f"unknown node kind {kind!r}")


def _walk(node, positive: bool, pos_out: set, all_out: set) -> None:
    kind = node[0]
    if kind == "boost":
        _walk(node[1], positive, pos_out, all_out)
        return
    if kind in ("prefix", "fuzzy", "regex"):
        raise BooleanQueryError(
            f"{kind} leaf must be expanded before query_terms"
        )
    if kind == "term":
        all_out.add(node[1])
        if positive:
            pos_out.add(node[1])
    elif kind == "phrase":
        all_out.update(node[1])
        if positive:
            pos_out.update(node[1])
    elif kind == "and":
        for c in node[1]:
            _walk(c, positive, pos_out, all_out)
        for c in node[2]:
            _walk(c, False, pos_out, all_out)
    elif kind == "or":
        for c in node[1]:
            _walk(c, positive, pos_out, all_out)


def query_terms(node) -> tuple[list[str], list[str]]:
    """-> (sorted distinct POSITIVE terms — the scoring set, sorted
    distinct ALL terms — the posting lists the shard must see, negated
    leaves included: exclusion needs their postings too)."""
    pos: set[str] = set()
    allt: set[str] = set()
    _walk(node, True, pos, allt)
    return sorted(pos), sorted(allt)


def needs_positions(node) -> bool:
    kind = node[0]
    if kind == "boost":
        return needs_positions(node[1])
    if kind == "phrase":
        return True
    if kind == "and":
        return any(needs_positions(c) for c in node[1] + node[2])
    if kind == "or":
        return any(needs_positions(c) for c in node[1])
    return False

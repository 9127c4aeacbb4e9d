"""Boolean query trees (AND/OR/NOT, phrase + proximity leaves) vs a
naive Python golden over the synth corpus.

Contracts (query/boolean.py + query/wand.py mode="boolean"):
membership == the tree evaluated over per-doc truth; scores == the
disjunctive BM25 fold over the query's distinct POSITIVE terms
(bit-identical to the oracle fold); OOV leaves simplify out driver-side
(a dead AND arm ships no candidate blocks); pure negation rejected;
composes with tombstones and doc_filter.
"""

from __future__ import annotations

import pandas as pd
import pytest

from angle_spark.functions.tokenizer import tokenize_py
from angle_spark.index.build import build_index, load_index
from angle_spark.index.stats import with_tokens
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.oracle import Bm25Oracle
from angle_spark.query.boolean import BooleanQueryError, parse_query
from angle_spark.query.wand import wand_topk
from angle_spark.synth import transcripts_df, transcripts_pdf

N_CONVS = 40
SEED = 42


@pytest.fixture(scope="module")
def corpus():
    tp = transcripts_pdf(N_CONVS, seed=SEED)
    ordered = tp.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(
        drop=True
    )
    toks = [tokenize_py(t if isinstance(t, str) else "") for t in ordered["text"]]
    return ordered, toks, Bm25Oracle(ordered)


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    docs = (
        with_tokens(assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4)))
        .select("doc_id", "tokens", "dl")
    )
    out = str(tmp_path_factory.mktemp("boolean") / "idx")
    build_index(spark, docs, out, segment_docs=128, block_size=16, positional=True)
    return out


def _matches(node, tk: list[str]) -> bool:
    """per-doc truth: evaluate the AST against one doc's token list."""
    kind = node[0]
    if kind == "boost":
        return _matches(node[1], tk)
    if kind == "term":
        return node[1] in tk
    if kind == "phrase":
        toks, slop = list(node[1]), int(node[2])
        if slop == 0:
            m = len(toks)
            return any(tk[i : i + m] == toks for i in range(len(tk) - m + 1))
        distinct = sorted(set(toks))
        pos = {t: [i for i, x in enumerate(tk) if x == t] for t in distinct}
        if any(not p for p in pos.values()):
            return False
        import itertools

        for combo in itertools.product(*(pos[t] for t in distinct)):
            if max(combo) - min(combo) <= slop:
                return True
        return False
    if kind == "and":
        return all(_matches(c, tk) for c in node[1]) and not any(
            _matches(c, tk) for c in node[2]
        )
    return any(_matches(c, tk) for c in node[1])  # or


def _golden(corpus, queries, drop=frozenset()) -> pd.DataFrame:
    """score with the SAME disjunctive fold over positive terms the
    oracle uses, restricted to tree-matching docs."""
    from angle_spark.query.boolean import query_terms

    _, toks, oracle = corpus
    rows = []
    for qid, text, k in queries:
        ast = parse_query(text)
        pos_terms, _ = query_terms(ast)
        matched = {
            d
            for d, tk in enumerate(toks)
            if d not in drop and _matches(ast, tk)
        }
        ranked = [
            (d, s)
            for d, s in oracle.score_query(" ".join(pos_terms), oracle.n_docs)
            if d in matched
        ]
        for rank, (doc_id, score) in enumerate(ranked[:k], start=1):
            rows.append((qid, rank, doc_id, score))
    return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])


def _frame(df) -> pd.DataFrame:
    return (
        df.toPandas()
        .astype({"doc_id": "int64", "rank": "int64"})
        .sort_values(["query_id", "rank"], kind="mergesort")
        .reset_index(drop=True)
    )


def _qdf(spark, queries):
    return spark.createDataFrame(queries, schema="query_id string, text string, k int")


def _mixed_queries(corpus):
    """trees whose answer sets provably differ from any single-mode call.
    The synth vocabulary is Zipf-skewed, so operands are picked by
    DOCUMENT FREQUENCY: a NOT over a near-stopword empties every set,
    and an OR with one matches everything — mid-frequency tokens keep
    each tree discriminative."""
    _, toks, oracle = corpus
    n = oracle.n_docs
    a, b = toks[0][3], toks[0][4]     # an adjacent bigram (phrase leaf)

    def pick(lo, hi, taken):
        return next(
            t
            for t, df in sorted(oracle.df.items())
            if lo * n <= df <= hi * n and t not in taken
        )

    c = pick(0.15, 0.45, {a, b})
    d = pick(0.05, 0.30, {a, b, c})
    return [
        ("m1", f'("{a} {b}" AND {c}) OR {d}', 1000),
        ("m2", f"{a} AND NOT {b}", 1000),
        ("m3", f"({a} OR {b}) AND {c} AND NOT {d}", 1000),
        ("m4", f'"{b} {a}"~4 AND {c}', 1000),
        ("m5", f"zzznever OR {d}", 1000),
        ("m6", f"zzznever AND {a}", 10),
        ("m7", f"{a} AND ({b} OR NOT {c} AND {d})", 1000),
    ]


def test_boolean_matches_golden(spark, index_dir, corpus):
    queries = _mixed_queries(corpus)
    merged, tstats, meta = load_index(spark, index_dir)
    got = _frame(
        wand_topk(spark, merged, tstats, meta, _qdf(spark, queries), mode="boolean")
    )
    want = _golden(corpus, queries)
    assert len(want) > 0 and want["query_id"].nunique() >= 5  # non-degenerate
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=0, rtol=0)


def test_boolean_differs_from_single_modes(spark, index_dir, corpus):
    """the mixed tree's answer set differs from OR, AND and phrase over
    the same tokens — a mode mix-up cannot pass."""
    _, toks, _ = corpus
    a, b = toks[0][3], toks[0][4]
    q = [("x", f'"{a} {b}" OR {toks[7][0]}', 1000)]
    merged, tstats, meta = load_index(spark, index_dir)
    boolean = set(
        _frame(
            wand_topk(spark, merged, tstats, meta, _qdf(spark, q), mode="boolean")
        )["doc_id"]
    )
    plain = [(f"x", f"{a} {b} {toks[7][0]}", 1000)]
    disj = set(
        _frame(wand_topk(spark, merged, tstats, meta, _qdf(spark, plain)))["doc_id"]
    )
    conj = set(
        _frame(
            wand_topk(spark, merged, tstats, meta, _qdf(spark, plain), mode="and")
        )["doc_id"]
    )
    assert boolean != disj and boolean != conj
    assert boolean <= disj  # matched docs all carry >= 1 positive term


def test_boolean_oov_and_drops_candidates(spark, index_dir, corpus):
    """an AND arm with an OOV term kills the query driver-side: its
    live sibling terms must not reach the candidate In(term) pushdown."""
    import re

    _, toks, _ = corpus
    a = toks[0][3]
    partner = next(t for t in toks[9] if t != a)
    queries = [
        ("ok", f"{a}", 10),
        ("dead", f"zzznever AND {partner}", 10),
    ]
    merged, tstats, meta = load_index(spark, index_dir)
    out = wand_topk(spark, merged, tstats, meta, _qdf(spark, queries), mode="boolean")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    m = re.search(r"term#\d+ IN \(([^)]*)\)", plan)
    if m is None:  # single-term queries compile to EqualTo, not In
        assert f"term#" in plan and partner not in plan
    else:
        in_list = {t.strip() for t in m.group(1).split(",")}
        assert a in in_list and partner not in in_list
    got = _frame(out)
    assert set(got["query_id"]) <= {"ok"}


def test_boolean_composes_with_deletes(spark, index_dir, corpus, tmp_path_factory):
    import shutil

    from angle_spark.index.deletes import delete_docs, load_deletes

    d2 = str(tmp_path_factory.mktemp("bool_del") / "idx")
    shutil.copytree(index_dir, d2)
    _, toks, oracle = corpus
    drop = {d for d in range(oracle.n_docs) if d % 4 == 0}
    delete_docs(
        spark,
        d2,
        spark.createDataFrame([(i,) for i in sorted(drop)], "doc_id long"),
    )
    queries = _mixed_queries(corpus)[:4]
    merged, tstats, meta = load_index(spark, d2)
    got = _frame(
        wand_topk(
            spark,
            merged,
            tstats,
            meta,
            _qdf(spark, queries),
            mode="boolean",
            deletes=load_deletes(spark, d2),
        )
    )
    want = _golden(corpus, queries, drop=frozenset(drop))
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=0, rtol=0)


def test_boolean_rejects_pure_negation(spark, index_dir):
    merged, tstats, meta = load_index(spark, index_dir)
    q = _qdf(spark, [("n1", "NOT anything", 10)])
    with pytest.raises(BooleanQueryError):
        wand_topk(spark, merged, tstats, meta, q, mode="boolean")


def test_boolean_phrase_leaf_requires_positional(spark, corpus, tmp_path_factory):
    docs = (
        with_tokens(
            assign_doc_ids(transcripts_df(spark, 10, seed=SEED, partitions=2))
        ).select("doc_id", "tokens", "dl")
    )
    out = str(tmp_path_factory.mktemp("bool_nopos") / "idx")
    build_index(spark, docs, out, segment_docs=128, block_size=16)
    _, toks, _ = corpus
    a, b = toks[0][3], toks[0][4]
    merged, tstats, meta = load_index(spark, out)
    with pytest.raises(ValueError, match="positional"):
        wand_topk(
            spark,
            merged,
            tstats,
            meta,
            _qdf(spark, [("p", f'"{a} {b}" AND {a}', 10)]),
            mode="boolean",
        )
    # term-only trees run fine on a non-positional index
    got = _frame(
        wand_topk(
            spark,
            merged,
            tstats,
            meta,
            _qdf(spark, [("t", f"{a} AND NOT {b}", 10)]),
            mode="boolean",
        )
    )
    assert (got["query_id"] == "t").all()


def test_prefix_leaf_parse_and_fold():
    from angle_spark.query.boolean import expand_prefixes_ast, prefix_stems

    ast = parse_query("(jo* OR spark) AND NOT zz*")
    assert prefix_stems(ast) == {"jo", "zz"}
    with pytest.raises(BooleanQueryError):
        parse_query("a-b*")  # stem tokenizes to two tokens
    exp = {"jo": ["join", "jolt"], "zz": []}
    folded = expand_prefixes_ast(ast, exp)
    # dead NOT child is a no-op; jo* becomes an OR of its expansions,
    # then the single-positive AND collapses to that OR
    assert folded == ("or", [("or", [("term", "join"), ("term", "jolt")]),
                             ("term", "spark")])
    # dead positive arm kills an AND group
    assert expand_prefixes_ast(parse_query("zz* AND spark"), exp) is None
    # dead OR arm drops
    assert expand_prefixes_ast(parse_query("zz* OR spark"), exp) == ("term", "spark")


def test_boost_parse():
    from angle_spark.query.boolean import positive_boosts

    assert parse_query("dup^2") == ("boost", ("term", "dup"), 2.0)
    assert parse_query('"a b"~3^1.5') == (
        "boost",
        ("phrase", ["a", "b"], 3),
        1.5,
    )
    assert parse_query("fil*^2") == ("boost", ("prefix", "fil"), 2.0)
    assert parse_query("sow~1^2") == ("boost", ("fuzzy", "sow", 1), 2.0)
    # ^1 is the identity and adds no wrapper
    assert parse_query("dup^1") == ("term", "dup")
    assert parse_query("dup^1.0") == ("term", "dup")
    with pytest.raises(BooleanQueryError, match="boost"):
        parse_query("dup^0")
    # a multi-token bare word distributes its boost onto each token
    assert parse_query("hash-join^2") == (
        "and",
        [("boost", ("term", "hash"), 2.0), ("boost", ("term", "join"), 2.0)],
        [],
    )
    # max rule: a term reached through several positive leaves scores
    # with the MAX of their boosts
    assert positive_boosts(parse_query("dup^2 OR (dup^3 AND spark)")) == {
        "dup": 3.0,
        "spark": 1.0,
    }
    # boost under NOT never scores
    assert positive_boosts(parse_query("merge AND NOT filter^2")) == {
        "merge": 1.0
    }


def test_boost_folds_through_simplify_and_expansion():
    from angle_spark.query.boolean import (
        expand_prefixes_ast,
        positive_boosts,
        simplify,
    )

    # OOV boosted leaf dies; its boost wrapper dies with it
    assert simplify(parse_query("zzq^2 OR dup"), {"dup": 1}) == ("term", "dup")
    assert simplify(parse_query("zzq^2 AND dup"), {"dup": 1}) is None
    # boosted prefix: expansion OR inherits the wrapper; dead stem folds
    exp = {"jo": ["join", "jolt"], "zz": []}
    folded = expand_prefixes_ast(parse_query("jo*^2"), exp)
    assert folded == ("boost", ("or", [("term", "join"), ("term", "jolt")]), 2.0)
    assert positive_boosts(folded) == {"join": 2.0, "jolt": 2.0}
    assert expand_prefixes_ast(parse_query("zz*^2 AND spark"), exp) is None


def test_boost_matches_weighted_golden(spark, index_dir, corpus):
    """boosted trees: membership unchanged, scores == the weighted
    disjunctive fold (idf * boost, max over leaves) — bit-identical to
    the Python oracle's weighted fold."""
    from angle_spark.query.boolean import positive_boosts, query_terms

    _, toks, oracle = corpus
    a, b = toks[0][3], toks[0][4]
    c = toks[7][0]
    queries = [
        ("w1", f"{a}^2 OR {c}", 1000),
        ("w2", f'"{a} {b}"^3 OR {c}', 1000),
        ("w3", f"{c}^0.5 AND NOT {b}", 1000),
        ("w4", f"{a}^2 OR ({a}^3 AND {c})", 1000),
        ("w5", f"{a}-{b}^2 OR {c}", 1000),
    ]
    merged, tstats, meta = load_index(spark, index_dir)
    got = _frame(
        wand_topk(spark, merged, tstats, meta, _qdf(spark, queries), mode="boolean")
    )
    rows = []
    for qid, text, k in queries:
        ast = parse_query(text)
        matched = {d for d, tk in enumerate(toks) if _matches(ast, tk)}
        weights = positive_boosts(ast)
        pos_terms, _ = query_terms(ast)
        w = {t: weights.get(t, 1.0) for t in pos_terms}
        ranked = [
            (d, s)
            for d, s in oracle.score_weighted(w, oracle.n_docs)
            if d in matched
        ]
        for rank, (doc_id, score) in enumerate(ranked[:k], start=1):
            rows.append((qid, rank, doc_id, score))
    want = pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])
    assert len(want) > 0 and want["query_id"].nunique() == 5
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=0, rtol=0)
    # the boost must actually move scores vs the unboosted trees
    plain = [(qid, text.replace("^2", "").replace("^3", "").replace("^0.5", ""), k)
             for qid, text, k in queries]
    unboosted = _frame(
        wand_topk(spark, merged, tstats, meta, _qdf(spark, plain), mode="boolean")
    )
    merged_scores = got.merge(
        unboosted, on=["query_id", "doc_id"], suffixes=("_b", "_u")
    )
    assert (merged_scores["score_b"] != merged_scores["score_u"]).any()
    # membership itself never changes
    key = ["query_id", "doc_id"]
    pd.testing.assert_frame_equal(
        got[key].sort_values(key).reset_index(drop=True),
        unboosted[key].sort_values(key).reset_index(drop=True),
    )


def test_prefix_in_boolean_end_to_end(spark, index_dir):
    """mode='boolean' with a prefix leaf == the same tree with the
    expansion written out literally."""
    merged, tstats, meta = load_index(spark, index_dir)
    from angle_spark.query.prefix import expand_stems

    exp = expand_stems(spark, tstats, ["w00"], max_expansions=4)["w00"]
    assert 1 < len(exp) <= 4
    lit = " OR ".join(exp)
    q = pd.DataFrame(
        [("b1", "w00* AND NOT w0137", 1000), ("b2", "zzqq* OR w0137", 1000)],
        columns=["query_id", "text", "k"],
    )
    q_lit = pd.DataFrame(
        [("b1", f"({lit}) AND NOT w0137", 1000), ("b2", "w0137", 1000)],
        columns=["query_id", "text", "k"],
    )
    got = wand_topk(
        spark, merged, tstats, meta, q, mode="boolean", max_expansions=4
    ).toPandas()
    want = wand_topk(spark, merged, tstats, meta, q_lit, mode="boolean").toPandas()
    key = ["query_id", "rank", "doc_id"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        want.sort_values(key).reset_index(drop=True),
    )


def test_expansion_cap_binds_under_and_and_not(spark, index_dir, corpus):
    """regression for the round-4 oracle bug: _bool_match_sql dropped the
    non-default expansion cap when recursing into AND / NOT children, so
    nested prefix leaves expanded at the default 64 while the engine used
    the entry's cap. Here the cap (2) BINDS — the stem matches more vocab
    terms than the cap, and capped vs uncapped membership provably differ
    — and the oracle must agree with the engine in BOTH positions."""
    import duckdb

    from angle_spark.entries import _bool_match_sql
    from angle_spark.query.prefix import expand_stems

    _, toks, oracle = corpus
    merged, tstats, meta = load_index(spark, index_dir)
    cap = 2

    # a stem with more matches than the cap, whose capped doc set is a
    # strict subset of the uncapped one (so a cap leak is observable)
    exp_capped = expand_stems(spark, tstats, ["w0"], max_expansions=cap)["w0"]
    exp_full = expand_stems(spark, tstats, ["w0"], max_expansions=64)["w0"]
    assert len(exp_capped) == cap < len(exp_full)
    docs_capped = {d for d, tk in enumerate(toks) if set(tk) & set(exp_capped)}
    docs_full = {d for d, tk in enumerate(toks) if set(tk) & set(exp_full)}
    assert docs_capped < docs_full  # the cap binds

    # anchor: a token of a doc reachable ONLY through beyond-cap
    # expansion terms — so a cap leak flips that doc's membership in
    # BOTH tree positions, not just the NOT one
    leak_doc, anchor = next(
        (d, t)
        for d in sorted(docs_full - docs_capped)
        for t in toks[d]
        if not t.startswith("w0")
    )
    queries = [
        ("under_and", f"w0* AND {anchor}", 1000),
        ("under_not", f"{anchor} AND NOT w0*", 1000),
    ]

    got = wand_topk(
        spark, merged, tstats, meta, _qdf(spark, queries),
        mode="boolean", max_expansions=cap,
    ).toPandas()

    # oracle membership from the same corpus, via the entry's SQL builder
    tf_rows, pos_rows = [], []
    for d, tk in enumerate(toks):
        for p, t in enumerate(tk):
            pos_rows.append((d, t, p))
        for t in set(tk):
            tf_rows.append((d, t))
    con = duckdb.connect()
    con.register("tf_src", pd.DataFrame(tf_rows, columns=["doc_id", "term"]))
    con.register("pos_src", pd.DataFrame(pos_rows, columns=["doc_id", "term", "p"]))
    con.sql("CREATE TABLE tf AS SELECT * FROM tf_src")
    con.sql("CREATE TABLE pos AS SELECT * FROM pos_src")
    con.sql(
        "CREATE TABLE dft AS SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term"
    )
    for qid, text, _k in queries:
        ast = parse_query(text)
        want = {
            r[0]
            for r in con.sql(f"SELECT doc_id FROM ({_bool_match_sql(ast, cap)})").fetchall()
        }
        have = set(got.loc[got["query_id"] == qid, "doc_id"].astype(int))
        assert have == want, qid
        # and the default-cap oracle must DISAGREE here — i.e. this test
        # would have caught the round-4 recursion bug
        uncapped = {
            r[0]
            for r in con.sql(f"SELECT doc_id FROM ({_bool_match_sql(ast)})").fetchall()
        }
        assert uncapped != want, qid


# --- field:value leaves (round 5) ---------------------------------------


def _field_meta(spark, corpus):
    """(doc_id, field, value) frame: the transcripts' role column."""
    ordered, _, _ = corpus
    rows = [(int(d), "role", str(r)) for d, r in enumerate(ordered["role"])]
    return spark.createDataFrame(rows, "doc_id long, field string, value string")


def _field_matches(node, tk, role):
    kind = node[0]
    if kind == "boost":
        return _field_matches(node[1], tk, role)
    if kind == "term":
        return node[1] in tk
    if kind == "field":
        return node[1] == "role" and role == node[2]
    if kind == "range":
        _, f, lo, hi, il, ih = node
        if f != "role" or role is None:
            return False
        if lo is not None and not (role >= lo if il else role > lo):
            return False
        if hi is not None and not (role <= hi if ih else role < hi):
            return False
        return True
    if kind == "phrase":
        return _matches(node, tk)
    if kind == "and":
        return all(_field_matches(c, tk, role) for c in node[1]) and not any(
            _field_matches(c, tk, role) for c in node[2]
        )
    return any(_field_matches(c, tk, role) for c in node[1])  # or


def test_field_leaves_match_golden(spark, index_dir, corpus):
    """field:value under AND, under NOT, OR-of-fields under a covered
    AND, quoted value, unseen value — membership == per-doc truth over
    (tokens, role); scores == the positive-TERM disjunctive fold (field
    leaves filter, never score)."""
    ordered, toks, oracle = corpus
    roles = sorted(set(ordered["role"]))
    a, b = toks[0][3], toks[0][4]
    r0, r1 = roles[0], roles[1]
    queries = [
        ("ff1", f"{a} AND role:{r0}", 1000),
        ("ff2", f"{a} AND NOT role:{r0}", 1000),
        ("ff3", f"({a} OR {b}) AND (role:{r0} OR role:{r1})", 1000),
        ("ff4", f'{a} AND role:"{r0}"', 1000),
        ("ff5", f"{a} AND role:doesnotexist", 10),
    ]
    merged, tstats, meta = load_index(spark, index_dir)
    got = _frame(
        wand_topk(
            spark, merged, tstats, meta, _qdf(spark, queries),
            mode="boolean", field_meta=_field_meta(spark, corpus),
        )
    )
    from angle_spark.query.boolean import query_terms

    rows = []
    role_of = list(ordered["role"])
    for qid, text, k in queries:
        ast = parse_query(text)
        matched = {
            d
            for d, (tk, r) in enumerate(zip(toks, role_of))
            if _field_matches(ast, tk, r)
        }
        pos_terms, _ = query_terms(ast)
        ranked = [
            (d, s)
            for d, s in oracle.score_query(" ".join(pos_terms), oracle.n_docs)
            if d in matched
        ]
        for rank, (doc_id, score) in enumerate(ranked[:k], start=1):
            rows.append((qid, rank, doc_id, score))
    want = pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])
    assert (want["query_id"] == "ff1").any() and (want["query_id"] == "ff2").any()
    assert not (want["query_id"] == "ff5").any()  # unseen value: empty
    # ff1 and ff2 partition a's docs: the field filter provably binds
    n_a = len(want[want["query_id"].isin(["ff1", "ff2"])])
    assert n_a == len({d for d, tk in enumerate(toks) if a in tk})
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=0, rtol=0)


def test_field_leaves_rejected_without_scoring_sibling(spark):
    for bad in ("role:user", "a OR role:user", "role:user AND role:tool",
                "role:user^2 AND a"):
        with pytest.raises(BooleanQueryError):
            parse_query(bad)
    # covered shapes parse fine
    parse_query("a AND role:user")
    parse_query("a AND (role:user OR role:tool)")
    parse_query("a AND NOT (role:user OR role:tool)")


def test_field_leaves_require_field_meta(spark, index_dir):
    merged, tstats, meta = load_index(spark, index_dir)
    q = pd.DataFrame(
        [("x", "w0108 AND role:user", 5)], columns=["query_id", "text", "k"]
    )
    with pytest.raises(ValueError, match="field_meta"):
        wand_topk(spark, merged, tstats, meta, q, mode="boolean")


def test_field_leaves_compose_with_deletes(spark, index_dir, corpus, tmp_path_factory):
    """tombstones and field filters ride the same cogrouped channel —
    they must compose: deleted docs vanish from field-filtered results."""
    import shutil

    from angle_spark.index.deletes import delete_docs, load_deletes

    ordered, toks, _ = corpus
    a = toks[0][3]
    roles = sorted(set(ordered["role"]))
    r0 = roles[0]
    idx = str(tmp_path_factory.mktemp("fielddel") / "idx")
    shutil.copytree(index_dir, idx)
    queries = [("q", f"{a} AND role:{r0}", 1000)]
    merged, tstats, meta = load_index(spark, idx)
    fm = _field_meta(spark, corpus)
    before = set(
        _frame(
            wand_topk(spark, merged, tstats, meta, _qdf(spark, queries),
                      mode="boolean", field_meta=fm)
        )["doc_id"]
    )
    assert before
    victims = sorted(before)[:2]
    delete_docs(spark, idx, spark.createDataFrame([(int(v),) for v in victims], "doc_id long"))
    after = set(
        _frame(
            wand_topk(spark, merged, tstats, meta, _qdf(spark, queries),
                      mode="boolean", field_meta=fm,
                      deletes=load_deletes(spark, idx))
        )["doc_id"]
    )
    assert after == before - set(victims)


# --- field:[lo TO hi] range leaves (round 5) -----------------------------


def test_range_parse_shapes():
    """grammar: inclusive/exclusive/mixed/open/quoted bounds; the same
    filter-coverage rejections as equality field leaves."""
    assert parse_query("a AND role:[x TO y]")[1][1] == (
        "range", "role", "x", "y", True, True)
    assert parse_query("a AND role:{x TO y}")[1][1] == (
        "range", "role", "x", "y", False, False)
    assert parse_query("a AND role:[x TO y}")[1][1] == (
        "range", "role", "x", "y", True, False)
    assert parse_query("a AND role:[* TO y]")[1][1] == (
        "range", "role", None, "y", True, True)
    assert parse_query("a AND role:[* TO *]")[1][1] == (
        "range", "role", None, None, True, True)
    assert parse_query('a AND ts:["2024-01-01 00:00" TO *]')[1][1] == (
        "range", "ts", "2024-01-01 00:00", None, True, True)
    for bad in (
        "role:[a TO b]",                 # bare filter
        "x OR role:[a TO b]",            # uncovered OR arm
        "x AND role:[a TO b]^2",         # boost on a filter leaf
    ):
        with pytest.raises(BooleanQueryError):
            parse_query(bad)


def test_range_leaves_match_golden(spark, index_dir, corpus):
    """inclusive/exclusive/open bounds, negated range, field-exists
    [* TO *], inverted interval — membership == per-doc lexicographic
    truth over (tokens, role); scores == the positive-TERM fold."""
    ordered, toks, oracle = corpus
    roles = sorted(set(ordered["role"]))
    a, b = toks[0][3], toks[0][4]
    r_lo, r_hi = roles[0], roles[-1]
    queries = [
        ("rg1", f"{a} AND role:[{r_lo} TO {r_hi}]", 1000),   # all roles
        ("rg2", f"{a} AND role:[{r_lo} TO {r_hi}}}", 1000),  # excl. hi
        ("rg3", f"{a} AND role:{{{r_lo} TO *]", 1000),       # excl. lo, open hi
        ("rg4", f"{a} AND NOT role:[* TO {r_lo}]", 1000),    # negated
        ("rg5", f"({a} OR {b}) AND role:[* TO *]", 1000),    # exists
        ("rg6", f"{a} AND role:[{r_hi} TO {r_lo}]", 10),     # inverted: empty
    ]
    merged, tstats, meta = load_index(spark, index_dir)
    got = _frame(
        wand_topk(
            spark, merged, tstats, meta, _qdf(spark, queries),
            mode="boolean", field_meta=_field_meta(spark, corpus),
        )
    )
    from angle_spark.query.boolean import query_terms

    rows = []
    role_of = list(ordered["role"])
    for qid, text, k in queries:
        ast = parse_query(text)
        matched = {
            d
            for d, (tk, r) in enumerate(zip(toks, role_of))
            if _field_matches(ast, tk, r)
        }
        pos_terms, _ = query_terms(ast)
        ranked = [
            (d, s)
            for d, s in oracle.score_query(" ".join(pos_terms), oracle.n_docs)
            if d in matched
        ]
        for rank, (doc_id, score) in enumerate(ranked[:k], start=1):
            rows.append((qid, rank, doc_id, score))
    want = pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])
    # the bound shapes provably bind: rg2 ⊊ rg1, rg3 ⊊ rg1, rg6 empty
    n = {q: (want["query_id"] == q).sum() for q, _, _ in queries}
    assert 0 < n["rg2"] < n["rg1"] and 0 < n["rg3"] < n["rg1"]
    assert n["rg6"] == 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=0, rtol=0)


def test_overlapping_field_predicates_resolve_independently(
    spark, index_dir, corpus
):
    """two predicates on the SAME field where one CONTAINS the other —
    an equality inside a range, in separate OR arms — must each get the
    full docID set they match. A first-match when-chain resolver would
    assign each metadata row to only one predicate and silently drop
    the second arm's matches (the round-5 array+explode rewrite's
    regression case)."""
    ordered, toks, oracle = corpus
    roles = sorted(set(ordered["role"]))
    a, b = toks[0][3], toks[0][4]
    r0, r_hi = roles[0], roles[-1]
    queries = [
        # arm 1: a within the full range; arm 2: b with role == r0.
        # every role-r0 row satisfies BOTH predicates.
        ("ov1", f"({a} AND role:[{r0} TO {r_hi}]) OR ({b} AND role:{r0})", 1000),
        # same two predicates ANDed: doc needs role r0 (the intersection)
        ("ov2", f"{a} AND role:[{r0} TO {r_hi}] AND role:{r0}", 1000),
    ]
    merged, tstats, meta = load_index(spark, index_dir)
    got = _frame(
        wand_topk(
            spark, merged, tstats, meta, _qdf(spark, queries),
            mode="boolean", field_meta=_field_meta(spark, corpus),
        )
    )
    from angle_spark.query.boolean import query_terms

    rows = []
    role_of = list(ordered["role"])
    for qid, text, k in queries:
        ast = parse_query(text)
        matched = {
            d
            for d, (tk, r) in enumerate(zip(toks, role_of))
            if _field_matches(ast, tk, r)
        }
        pos_terms, _ = query_terms(ast)
        ranked = [
            (d, s)
            for d, s in oracle.score_query(" ".join(pos_terms), oracle.n_docs)
            if d in matched
        ]
        for rank, (doc_id, score) in enumerate(ranked[:k], start=1):
            rows.append((qid, rank, doc_id, score))
    want = pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])
    # the overlap case is only probative if arm 2 contributes docs that
    # arm 1 cannot (b-only docs with role r0)
    b_only_r0 = {
        d
        for d, (tk, r) in enumerate(zip(toks, role_of))
        if b in tk and a not in tk and r == r0
    }
    assert b_only_r0, "corpus lost the b-only/role-r0 docs the test needs"
    got_ov1 = set(got[got["query_id"] == "ov1"]["doc_id"])
    assert b_only_r0 <= got_ov1
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=0, rtol=0)


def test_mixed_expansion_is_one_driver_action(spark, index_dir, monkeypatch):
    """round-5 query-latency fix: a boolean batch mixing prefix, fuzzy
    AND regex leaves resolves all three vocabulary rewrites in ONE
    Spark action (a union of the three expansion frames), not three
    sequential collect() round-trips. Count every DataFrame.collect the
    driver issues while PLANNING the batch: one for the query rows, one
    for the combined expansion — exactly two."""
    # Spark 4: pyspark.sql.DataFrame is abstract; the classic session
    # instantiates the subclass, so patch where collect actually lives
    from pyspark.sql.classic.dataframe import DataFrame as SparkDF

    merged, tstats, meta = load_index(spark, index_dir)
    queries = [
        ("x1", "w00* AND w0137", 10),
        ("x2", "w012~1 OR w0042", 10),
        ("x3", "/w00[0-9]+/ AND w0042", 10),
    ]
    calls = []
    orig = SparkDF.collect

    def counting(self):
        calls.append(1)
        return orig(self)

    monkeypatch.setattr(SparkDF, "collect", counting)
    out = wand_topk(
        spark, merged, tstats, meta, _qdf(spark, queries), mode="boolean"
    )
    planning_collects = len(calls)
    monkeypatch.setattr(SparkDF, "collect", orig)
    assert planning_collects == 2, planning_collects
    # and the rewrites were actually applied: results match the same
    # trees expanded via the stand-alone per-family expanders
    from angle_spark.query.fuzzy import expand_fuzzy
    from angle_spark.query.prefix import expand_stems
    from angle_spark.query.regex import expand_regex

    st = expand_stems(spark, tstats, ["w00"], 64)["w00"]
    fz = expand_fuzzy(spark, tstats, [("w012", 1)], 64)[("w012", 1)]
    rx = expand_regex(spark, tstats, ["w00[0-9]+"], 64)["w00[0-9]+"]
    assert st and fz and rx
    lit = [
        ("x1", f"({' OR '.join(st)}) AND w0137", 10),
        ("x2", f"({' OR '.join(fz)}) OR w0042", 10),
        ("x3", f"({' OR '.join(rx)}) AND w0042", 10),
    ]
    want = _frame(
        wand_topk(spark, merged, tstats, meta, _qdf(spark, lit), mode="boolean")
    )
    pd.testing.assert_frame_equal(_frame(out), want, check_dtype=False)

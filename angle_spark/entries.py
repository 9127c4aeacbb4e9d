"""Driver-contract query implementations (__spark_entry__ delegates here).

Each ``q_*`` function takes (spark, sf_dir) and returns a DataFrame; each
has a matching ANSI-SQL oracle in ORACLE_SQL runnable by DuckDB over the
same parquet. Column names/aliases match exactly (the driver hash-compares
values after sorting columns by name). Floating aggregates are rounded to
absorb summation-order ULP noise; money sums are cast to DECIMAL so they
compare exactly.

Operator coverage index (SURVEY.md §2): see the comment above each query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from angle_spark.functions.tokenizer import (
    duckdb_tokens_sql,
    duckdb_tokens_v2_sql,
    tokens_col,
)
from angle_spark.index.stats import corpus_stats, term_frequencies, term_stats, with_tokens
from angle_spark.query.bm25 import bm25_topk

# ---------------------------------------------------------------------------
# Fixed reference query set over the `documents` table (vocab is the
# testdata's ~40-word query-engine vocabulary; includes a rare term 'dup',
# multi-term, repeated-term, and no-hit queries).
# ---------------------------------------------------------------------------
DOC_QUERY_SET: list[tuple[str, str, int]] = [
    ("q01", "join hash", 10),
    ("q02", "dup", 10),
    ("q03", "scan filter merge sort", 10),
    ("q04", "customer order line", 10),
    ("q05", "the fast query", 10),
    ("q06", "zzzz missingterm", 10),
    ("q07", "group group batch", 10),
    ("q08", "spark", 5),
]


# Phrase rendition (positional index): ph1 vs ph2 prove order
# sensitivity (24 vs 35 matching docs at sf0.001 — reversed phrases,
# different sets); ph4 is a repeated-token phrase; ph5 exercises ranked
# truncation; ph6 has an out-of-vocabulary token (matches nothing).
PHRASE_QUERY_SET: list[tuple[str, str, int]] = [
    ("ph1", "hash join", 1000),
    ("ph2", "join hash", 1000),
    ("ph3", "the fast key", 1000),
    ("ph4", "batch batch", 1000),
    ("ph5", "scan merge sort", 15),
    ("ph6", "zzzz scan", 10),
]


# Proximity (NEAR) rendition: all distinct tokens within NEAR_SLOP
# positions, unordered. At slop=4, "hash join" matches 158 docs at
# sf0.001 vs 55 at slop=1 vs 24 as an exact phrase vs 100s
# conjunctively — the window size is load-bearing, so neither a
# phrase nor an AND implementation can pass this oracle.
NEAR_SLOP = 4
NEAR_QUERY_SET: list[tuple[str, str, int]] = [
    ("nr1", "hash join", 1000),
    ("nr2", "dup spark", 1000),
    ("nr3", "scan filter merge", 1000),
    ("nr4", "zzzz scan", 10),
]


# Conjunctive (AND) rendition: k exceeds the corpus so the FULL
# intersection is returned — the per-query result sizes (21/22/15/229/
# 20/0/...) differ from the disjunctive top-k and from each other, so a
# mode mix-up cannot pass the oracle. c06 has an out-of-vocabulary token
# (matches nothing); c07 repeats a token (distinct-token semantics).
CONJ_QUERY_SET: list[tuple[str, str, int]] = [
    ("c01", "dup join", 1000),
    ("c02", "dup hash scan", 1000),
    ("c03", "scan filter merge sort", 15),
    ("c04", "customer order line the", 1000),
    ("c05", "spark dup", 1000),
    ("c06", "zzzz scan", 10),
    ("c07", "group group batch", 1000),
]


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _doc_queries_df(
    spark: SparkSession, query_set: list[tuple[str, str, int]] = DOC_QUERY_SET
) -> DataFrame:
    return spark.createDataFrame(
        query_set, schema="query_id string, text string, k int"
    )


def _doc_queries_values_sql(
    query_set: list[tuple[str, str, int]] = DOC_QUERY_SET,
) -> str:
    rows = ", ".join(f"('{q}', '{t}', {k})" for q, t, k in query_set)
    return f"(VALUES {rows}) AS q(query_id, text, k)"


# --- S1/S2 scan + P4 tokenize + A9 stats + F16 BM25 + J2 term join + W1 topk
def q_bm25_topk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_tokens(_read(spark, sf_dir, "documents")).select("doc_id", "tokens", "dl")
    # tf feeds three consumers (corpus stats trigger, term stats, scoring) —
    # eagerly localCheckpoint so tokenize+explode+groupBy runs exactly once
    # and the blocks are ContextCleaner-freed when the DataFrame is GC'd:
    # repeated entry invocations in one long session leak nothing (a bare
    # persist() accumulated catalog-cached tables; round-2 ADVICE item 4)
    tf = term_frequencies(docs).localCheckpoint()
    n_docs, avgdl = corpus_stats(docs)
    tstats = term_stats(tf, n_docs)
    out = bm25_topk(tf, tstats, _doc_queries_df(spark), n_docs, avgdl)
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def _bm25_oracle_sql(
    docs_where: str = "",
    candidate_where: str = "",
    conjunctive: bool = False,
    query_set: list[tuple[str, str, int]] = DOC_QUERY_SET,
    min_match: int | None = None,
    rank_on_rounded: bool = False,
    tokens_sql=duckdb_tokens_sql,
) -> str:
    """ANSI-SQL BM25 over the documents table; rank identity with this is
    the engine's core claim, for every index path (declarative,
    compressed+pruned, delete-masked, purged, conjunctive).

    docs_where: filters the corpus itself — stats AND candidates see only
    the surviving docs (the purged-index semantic: scores as if the
    deleted docs were never indexed).
    candidate_where: filters only the ranked candidates — stats stay
    full-corpus (the pre-purge tombstone-mask semantic: Lucene deletes
    before a merge).
    conjunctive: AND semantics — only docs matching every distinct query
    token are ranked (tokens absent from the corpus match nothing).
    min_match: minimum-should-match — docs matching >= m distinct query
    tokens rank (m=1 is plain OR, m=|tokens| is AND).
    rank_on_rounded: rank on round(raw, 6) for full-answer-set queries
    (see _bm25_matches_scored_sql).
    tokens_sql: the DuckDB tokenizer rendition — defaults to v1; the
    stemmed entry passes duckdb_tokens_v2_sql so corpus AND query text
    run the same versioned analyzer as the engine."""
    toks = tokens_sql("text")
    if conjunctive:
        conj_filter = (
            "JOIN (SELECT query_id, count(*) AS nt FROM qterms GROUP BY query_id) qn"
            " USING (query_id) WHERE matched = qn.nt"
        )
    elif min_match is not None:
        conj_filter = f"WHERE matched >= {min_match}"
    else:
        conj_filter = ""
    rank_key = "round(raw, 6)" if rank_on_rounded else "raw"
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS tokens FROM documents {docs_where}
), dl AS (
  SELECT doc_id, len(tokens)::BIGINT AS dl FROM docs
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), stats AS (
  SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM dl
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), qterms AS (
  SELECT DISTINCT query_id, k, unnest({tokens_sql('text')}) AS term
  FROM {_doc_queries_values_sql(query_set)}
), scored AS (
  SELECT qt.query_id, qt.k, tf.doc_id,
         sum( ln((s.n_docs - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) ) AS raw,
         count(DISTINCT qt.term) AS matched
  FROM qterms qt
  JOIN tf  ON tf.term = qt.term
  JOIN dft ON dft.term = qt.term
  JOIN dl  ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  {candidate_where}
  GROUP BY qt.query_id, qt.k, tf.doc_id
), ranked AS (
  SELECT query_id, k, doc_id, raw,
         row_number() OVER (PARTITION BY query_id ORDER BY {rank_key} DESC, doc_id ASC) AS rnk
  FROM scored {conj_filter}
)
SELECT query_id, rnk AS rank, doc_id, round(raw, 6) AS score
FROM ranked WHERE rnk <= k
"""


# --- MINIMUM-SHOULD-MATCH retrieval (query/wand.py mode="mm"): docs
#     matching >= MM_MIN_MATCH distinct query tokens rank — the Lucene
#     minimumShouldMatch continuum between OR and AND. k > corpus so
#     FULL answer sets discriminate: m1/m2/m5 sizes sit strictly between
#     their OR and AND counts; m3's OOV token still leaves 2 in-vocab
#     tokens (both required); m4 has only 1 in-vocab token < floor ->
#     dead query.
MM_QUERY_SET: list[tuple[str, str, int]] = [
    ("m1", "scan filter merge", 100000),
    ("m2", "dup spark batch", 100000),
    ("m3", "zzzz scan filter", 100000),
    ("m4", "zzzz scan", 10),
    ("m5", "customer order line the", 100000),
]
MM_MIN_MATCH = 2


def q_bm25_min_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import wand_topk

    merged, tstats, meta = load_index(spark, _cached_doc_index(spark, sf_dir))
    out = wand_topk(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, MM_QUERY_SET),
        mode="mm",
        min_match=MM_MIN_MATCH,
    )
    # FULL answer sets: re-rank on the rounded score (same contract and
    # reasoning as q_bm25_boolean)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    return out.select(
        "query_id",
        F.row_number().over(w).cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


# --- THE ENGINE CORE under the driver oracle: SPIMI segment build ->
#     delta+varint block codec -> merge -> MaxScore/WAND top-k
#     (index/spimi.py, codec.py, index/build.py, query/wand.py). Same
#     oracle as bm25_topk_documents — rank identity of the COMPRESSED
#     path vs declarative SQL BM25 is exactly the engine's core claim
#     (the reference's golden gate runs its REAL inference path,
#     reference tests/test_eval.py:4-20; so does this entry).
# pristine per-process index cache: seven entries exercise the compressed
# path; read-only ones share one build per (sf_dir, positional), mutating
# ones (delete/purge) copy it. tmp dirs must outlive the entry anyway
# (the returned DataFrame reads the index lazily), so caching changes
# nothing about lifetime — only how often the build runs. Small
# segment/block sizes force real multi-segment merge + multi-block
# pruning even at sf0.01 (500 docs -> 4 segments, stopword terms span
# many 16-doc blocks).
_INDEX_CACHE: dict[tuple[str, bool], str] = {}


def _cached_doc_index(
    spark: SparkSession,
    sf_dir: str,
    positional: bool = False,
    analyzer: str = "v1-ascii-alnum",
) -> str:
    import os
    import tempfile

    from angle_spark.index.build import build_index

    key = (sf_dir, positional, analyzer)
    d = _INDEX_CACHE.get(key)
    if d is not None and os.path.exists(os.path.join(d, "corpus_stats.json")):
        return d
    docs = with_tokens(_read(spark, sf_dir, "documents"), analyzer=analyzer).select(
        "doc_id", "tokens", "dl"
    )
    d = tempfile.mkdtemp(prefix=f"bm25_entry_idx{'_pos' if positional else ''}_")
    build_index(
        spark,
        docs,
        d,
        segment_docs=128,
        block_size=16,
        # one batch: the entry never resumes a half-built cache dir, and
        # the default 64-segment batching cost 7 serial write+lineage
        # jobs at sf0.1 (r6 guide §1 measurement)
        batch_segments=4096,
        positional=positional,
        analyzer=analyzer,
    )
    _INDEX_CACHE[key] = d
    return d


def q_bm25_wand_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import wand_topk

    merged, tstats, meta = load_index(spark, _cached_doc_index(spark, sf_dir))
    out = wand_topk(spark, merged, tstats, meta, _doc_queries_df(spark), prune=True)
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


# --- RESEGMENTED retrieval (round 5, the ES _shrink/_split APIs —
#     index/resegment.py): the cached index re-laid-out at 4x the
#     segment granularity from the INDEX alone (decode -> regroup by the
#     new doc-range boundary -> re-encode; O(index), no corpus scan, no
#     re-tokenization), then the standard ranked query batch. The oracle
#     is the plain BM25 truth: a layout change must be invisible to
#     results. Bitwise identity with a fresh build at the new
#     granularity is pytest-proven (tests/test_resegment.py).
_RESEG_CACHE: dict = {}


def q_bm25_resegmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from angle_spark.index.build import load_index
    from angle_spark.index.resegment import resegment_index
    from angle_spark.query.wand import wand_topk

    src = _cached_doc_index(spark, sf_dir)
    dst = _RESEG_CACHE.get(src)
    if dst is None:
        _, _, src_meta = load_index(spark, src)
        dst = tempfile.mkdtemp(prefix="bm25_reseg_entry_")
        resegment_index(spark, src, dst, src_meta.segment_docs * 4)
        _RESEG_CACHE[src] = dst
    merged, tstats, meta = load_index(spark, dst)
    out = wand_topk(spark, merged, tstats, meta, _doc_queries_df(spark))
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def _build_doc_index_with_deletes(spark: SparkSession, sf_dir: str, prefix: str):
    """Shared setup for the deletion entries: a COPY of the cached pristine
    index (these entries mutate — tombstones, purge) with every
    doc_id % 7 == 0 tombstoned (a fixed, oracle-replicable ~14%)."""
    import shutil
    import tempfile

    from angle_spark.index.deletes import delete_docs

    out_dir = tempfile.mkdtemp(prefix=prefix)
    shutil.rmtree(out_dir)
    shutil.copytree(_cached_doc_index(spark, sf_dir), out_dir)
    delete_docs(
        spark,
        out_dir,
        _read(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % 7 == 0),
    )
    return out_dir


# --- §2.9-adjacent index MAINTENANCE, pre-compaction: tombstoned docs are
#     excluded from results at decode time inside each shard task while
#     corpus stats stay full-corpus (Lucene delete semantics before a
#     merge — index/deletes.py). The oracle keeps the stats CTEs over ALL
#     docs and filters only the ranked candidates.
def q_bm25_delete_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.index.deletes import load_deletes
    from angle_spark.query.wand import wand_topk

    out_dir = _build_doc_index_with_deletes(spark, sf_dir, "bm25_delmask_entry_")
    merged, tstats, meta = load_index(spark, out_dir)
    out = wand_topk(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark),
        prune=True,
        deletes=load_deletes(spark, out_dir),
    )
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


# --- the compaction: purge_deletes physically rewrites affected posting
#     blocks (cogrouped per segment, atomic dir swap), full-merges, and
#     switches stats to live values — the index must now score EXACTLY as
#     if the deleted docs were never indexed, which is what the oracle
#     asserts by filtering the corpus CTE itself (stats recomputed live).
def q_bm25_purged_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.index.deletes import purge_deletes
    from angle_spark.query.wand import wand_topk

    out_dir = _build_doc_index_with_deletes(spark, sf_dir, "bm25_purge_entry_")
    purge_deletes(spark, out_dir)
    merged, tstats, meta = load_index(spark, out_dir)
    out = wand_topk(spark, merged, tstats, meta, _doc_queries_df(spark), prune=True)
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


# --- DELETE BY QUERY (round 5, the ES _delete_by_query / Lucene
#     deleteDocuments(Query) — index/deletes.delete_by_query): every doc
#     matching a boolean predicate is tombstoned in one membership pass,
#     then the standard query set serves masked (full-corpus stats —
#     Lucene pre-merge semantics). The oracle recomputes the predicate's
#     matched set from membership primitives (_bool_match_sql) and
#     excludes it from the ranked candidates ONLY — the stats CTEs stay
#     untouched, so a purge-style implementation cannot pass.
DBQ_TEXT = "dup AND (hash OR scan)"


def q_bm25_delete_by_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from angle_spark.index.build import load_index
    from angle_spark.index.deletes import delete_by_query, load_deletes
    from angle_spark.query.wand import wand_topk

    out_dir = tempfile.mkdtemp(prefix="bm25_dbq_entry_")
    shutil.rmtree(out_dir)
    shutil.copytree(_cached_doc_index(spark, sf_dir), out_dir)
    delete_by_query(spark, out_dir, DBQ_TEXT)
    merged, tstats, meta = load_index(spark, out_dir)
    out = wand_topk(
        spark, merged, tstats, meta, _doc_queries_df(spark), prune=True,
        deletes=load_deletes(spark, out_dir),
    )
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def _dbq_oracle_sql() -> str:
    from angle_spark.query.boolean import parse_query

    return _bm25_oracle_sql(
        candidate_where=(
            f"WHERE tf.doc_id NOT IN ({_bool_match_sql(parse_query(DBQ_TEXT))})"
        )
    )


def _bm25_matches_scored_sql(
    matches_sql: str,
    qterms_sql: str,
    rank_on_rounded: bool = False,
    boosted: bool = False,
    offset: int = 0,
    demote_sql: str | None = None,
    demote_factor: float = 1.0,
) -> str:
    """Shared scoring skeleton for every membership-then-score oracle
    (phrase / near / boolean): a `matches` CTE of (query_id, k, doc_id)
    membership truth, a `qterms` CTE of each query's distinct SCORING
    terms, then the standard BM25 CTEs over the matched docs.

    rank_on_rounded: rank by round(raw, 6) with the doc_id tiebreak —
    for FULL-answer-set queries (k > corpus) where two distinct docs can
    land within SQL-sum-order ULP noise of each other; the engine side
    then ranks on its rounded scores too, making the tie order
    deterministic on both sides.

    boosted: qterms carries a third DOUBLE column ``boost`` (the
    query-time ^w weight, max over leaves) and each term's contribution
    is ln(idf-arg) * boost * tf * 2.2 / denom — the same left-to-right
    association as the engine's (idf * boost) * tf * (k1+1) / denom, so
    per-element products stay bit-identical.

    offset: pagination (Lucene searchAfter's shallow cousin) — keep the
    global-rank page (offset, offset + k], matching
    wand_topk(offset=...)'s global-rank contract.

    demote_sql / demote_factor: the ES boosting-query seam — a
    (query_id, doc_id) negative-membership CTE body; matching docs'
    SUMMED scores multiply by the factor BEFORE ranking (one float
    multiply on the sum — the engine's exact association,
    query/wand.py demote step)."""
    rank_key = "round(raw, 6)" if rank_on_rounded else "raw"
    page = f"rnk > {offset} AND rnk <= {offset} + k" if offset else "rnk <= k"
    boost_factor = " * qt.boost" if boosted else ""
    demote_cte = (
        f"), negset AS (\n  SELECT DISTINCT query_id, doc_id FROM (\n  "
        f"{demote_sql}\n  )\n"
        if demote_sql
        else ""
    )
    demote_adjust = (
        f"), adjusted AS (\n"
        f"  SELECT s.query_id, s.k, s.doc_id,\n"
        f"         s.raw * (CASE WHEN n.doc_id IS NOT NULL "
        f"THEN {demote_factor!r}::DOUBLE ELSE 1.0 END) AS raw\n"
        f"  FROM scored s\n"
        f"  LEFT JOIN negset n "
        f"ON n.query_id = s.query_id AND n.doc_id = s.doc_id\n"
        if demote_sql
        else ""
    )
    ranked_src = "adjusted" if demote_sql else "scored"
    toks = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS tokens FROM documents
), dl AS (
  SELECT doc_id, len(tokens)::BIGINT AS dl FROM docs
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), stats AS (
  SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM dl
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), matches AS (
  {matches_sql}
), qterms AS (
  {qterms_sql}
), scored AS (
  SELECT m.query_id, m.k, m.doc_id,
         sum( ln((s.n_docs - dft.df + 0.5) / (dft.df + 0.5) + 1.0){boost_factor}
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) ) AS raw
  FROM matches m
  JOIN qterms qt ON qt.query_id = m.query_id
  JOIN tf  ON tf.doc_id = m.doc_id AND tf.term = qt.term
  JOIN dft ON dft.term = qt.term
  JOIN dl  ON dl.doc_id = m.doc_id
  CROSS JOIN stats s
  GROUP BY m.query_id, m.k, m.doc_id
{demote_cte}{demote_adjust}), ranked AS (
  SELECT query_id, k, doc_id, raw,
         row_number() OVER (PARTITION BY query_id ORDER BY {rank_key} DESC, doc_id ASC) AS rnk
  FROM {ranked_src}
)
SELECT query_id, rnk AS rank, doc_id, round(raw, 6) AS score
FROM ranked WHERE {page}
"""


def _bm25_positional_oracle_sql(query_set, match_select) -> str:
    """Shared template for the positional oracles (phrase / near): a
    per-query `matches` CTE built by ``match_select(qid, text, k)`` over
    the SQL-native positional truth (positions via generate_subscripts
    aligned with unnest), then BM25 scoring of the matched docs with the
    standard CTEs over each query's distinct terms."""
    matches = "\n  UNION ALL\n  ".join(
        match_select(qid, text, k) for qid, text, k in query_set
    )
    qterms = (
        f"SELECT DISTINCT query_id, unnest({duckdb_tokens_sql('text')}) AS term"
        f"\n  FROM {_doc_queries_values_sql(query_set)}"
    )
    return _bm25_matches_scored_sql(matches, qterms)


def _bm25_phrase_oracle_sql() -> str:
    """Exact token-sequence truth: a chain of self-joins on
    p_i = p_0 + i per query, from the same tokenizer the engine uses."""
    from angle_spark.functions.tokenizer import tokenize_py

    def phrase_select(qid, text, k):
        terms = tokenize_py(text)
        if any("'" in t for t in terms):  # defensive; tokenizer is [a-z0-9]
            raise ValueError(terms)
        joins = " ".join(
            f"JOIN pos p{i} ON p{i}.doc_id = p0.doc_id AND p{i}.p = p0.p + {i}"
            for i in range(1, len(terms))
        )
        conds = " AND ".join(f"p{i}.term = '{t}'" for i, t in enumerate(terms))
        return (
            f"SELECT '{qid}' AS query_id, {k} AS k, p0.doc_id"
            f" FROM pos p0 {joins} WHERE {conds} GROUP BY p0.doc_id"
        )

    return _bm25_positional_oracle_sql(PHRASE_QUERY_SET, phrase_select)


# --- phrase retrieval over the POSITIONAL compressed index: SPIMI blocks
#     carry per-posting token positions (delta+varint, index/spimi.py);
#     the scorer narrows to the conjunctive survivors, then verifies the
#     exact token sequence by positional-list intersection, all shard-
#     local (a doc's postings AND positions live in its own segment —
#     query/wand.py mode="phrase").
def q_bm25_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import wand_topk

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    out = wand_topk(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, PHRASE_QUERY_SET),
        mode="phrase",
    )
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def _bm25_near_oracle_sql() -> str:
    """Unordered within-window truth: an n-way positional self-join with
    a greatest-least window bound of NEAR_SLOP per query."""
    from angle_spark.functions.tokenizer import tokenize_py

    def near_select(qid, text, k):
        terms = sorted(set(tokenize_py(text)))
        n = len(terms)
        joins = " ".join(
            f"JOIN pos p{i} ON p{i}.doc_id = p0.doc_id" for i in range(1, n)
        )
        conds = " AND ".join(f"p{i}.term = '{t}'" for i, t in enumerate(terms))
        ps = ", ".join(f"p{i}.p" for i in range(n))
        window = (
            f" AND greatest({ps}) - least({ps}) <= {NEAR_SLOP}" if n > 1 else ""
        )
        return (
            f"SELECT '{qid}' AS query_id, {k} AS k, p0.doc_id"
            f" FROM pos p0 {joins} WHERE {conds}{window} GROUP BY p0.doc_id"
        )

    return _bm25_positional_oracle_sql(NEAR_QUERY_SET, near_select)


# Ordered-intervals rendition (round 5, Lucene IntervalsSource
# ordered() / the ES intervals query with ordered:true + max_gaps):
# tokens in QUERY ORDER with at most ORDERED_GAPS interleaved tokens in
# total. iv1/iv2 are reversals of each other — ordered retrieval MUST
# give different doc sets (order is load-bearing, unlike NEAR); iv3 is
# a 3-term chain; iv4 repeats a token (needs two distinct ascending
# positions).
ORDERED_GAPS = 3
ORDERED_QUERY_SET: list[tuple[str, str, int]] = [
    ("iv1", "hash join", 400),
    ("iv2", "join hash", 400),
    ("iv3", "scan filter merge", 400),
    ("iv4", "join batch join", 400),
]


def _bm25_ordered_oracle_sql() -> str:
    """Ordered-with-gaps truth: a chain of positional self-joins with
    strictly increasing positions in token order and a TOTAL gap bound
    p_last - p_first - (n-1) <= ORDERED_GAPS (the Lucene width rule —
    not pairwise)."""
    from angle_spark.functions.tokenizer import tokenize_py

    def ordered_select(qid, text, k):
        terms = tokenize_py(text)
        n = len(terms)
        joins = " ".join(
            f"JOIN pos p{i} ON p{i}.doc_id = p0.doc_id"
            f" AND p{i}.p > p{i - 1}.p"
            for i in range(1, n)
        )
        conds = " AND ".join(f"p{i}.term = '{t}'" for i, t in enumerate(terms))
        width = (
            f" AND p{n - 1}.p - p0.p - {n - 1} <= {ORDERED_GAPS}"
            if n > 1
            else ""
        )
        return (
            f"SELECT '{qid}' AS query_id, {k} AS k, p0.doc_id"
            f" FROM pos p0 {joins} WHERE {conds}{width} GROUP BY p0.doc_id"
        )

    return _bm25_positional_oracle_sql(ORDERED_QUERY_SET, ordered_select)


# --- ordered intervals over the positional index: conjunctive
#     survivors + greedy-next minimal-chain verification per candidate,
#     shard-local (query/wand.py mode="ordered", slop=ORDERED_GAPS).
def q_bm25_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import wand_topk

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    out = wand_topk(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, ORDERED_QUERY_SET),
        mode="ordered",
        slop=ORDERED_GAPS,
    )
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


# --- unordered proximity (NEAR) over the positional index: conjunctive
#     survivors + smallest-range-covering-k-lists verification per
#     candidate, shard-local (query/wand.py mode="near", slop=NEAR_SLOP).
def q_bm25_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import wand_topk

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    out = wand_topk(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, NEAR_QUERY_SET),
        mode="near",
        slop=NEAR_SLOP,
    )
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


# Boolean rendition: mixed trees no single-flavor call can answer —
# phrase-within-AND-within-OR (bl1), AND NOT (bl2), OR-group with a
# negated phrase (bl3), a proximity leaf inside AND (bl4), OOV in an OR
# arm (survives, bl5) vs inside an AND (dead, bl6), nested NOT-group
# (bl7). k exceeds the corpus so FULL answer sets discriminate.
BOOL_QUERY_SET: list[tuple[str, str, int]] = [
    ("bl1", '("hash join" AND spark) OR dup', 1000),
    ("bl2", "scan AND NOT filter", 1000),
    ("bl3", '(dup OR spark) AND merge AND NOT "the fast"', 1000),
    ("bl4", '"join hash"~3 AND scan', 1000),
    ("bl5", "zzzz OR dup", 1000),
    ("bl6", "zzzz AND scan", 10),
    ("bl7", "group AND (batch OR NOT window AND sort)", 1000),
    # prefix leaves inside trees (round 4): positive prefix under AND
    # (bl8), prefix arm in OR with a NOT (bl9), NEGATED prefix (bl10 —
    # expansion terms are excluded, never scored), dead prefix killing
    # an AND (bl11)
    ("bl8", "fil* AND merge", 1000),
    ("bl9", "(du* OR spark) AND NOT batch", 1000),
    ("bl10", "merge AND NOT fil*", 1000),
    ("bl11", "zz* AND scan", 10),
]

# prefix-in-boolean expansion cap: wand_topk's default max_expansions —
# the entry calls it with the default, the oracle replicates the same cap
BOOL_PREFIX_CAP = 64


def _regex_expansion_sql(pattern: str, cap: int = BOOL_PREFIX_CAP) -> str:
    """Top-``cap`` vocabulary terms the pattern FULLY matches, by
    (df DESC, term ASC) — the same capped top-terms rewrite the engine
    applies driver-side (query/regex.expand_regex), re-derived from the
    dft CTE. DuckDB's ``regexp_full_match`` (RE2) and Spark's anchored
    ``rlike`` (Java regex) agree on the validated subset — divergent
    constructs are rejected at parse time (query/regex.validate_pattern),
    so the rewrite is replicated term-for-term."""
    pat = pattern.replace("'", "''")
    return (
        "SELECT term FROM ("
        "SELECT dft.term, row_number() OVER "
        "(ORDER BY dft.df DESC, dft.term ASC) AS r "
        f"FROM dft WHERE regexp_full_match(dft.term, '{pat}')"
        f") WHERE r <= {cap}"
    )


def _bool_match_sql(node, cap: int = BOOL_PREFIX_CAP) -> str:
    """AST -> a DuckDB set expression of matching doc_ids, built from
    membership primitives the engine does NOT use: term membership from
    the tf CTE, phrase/proximity from positional self-joins, prefix and
    fuzzy leaves from their capped vocabulary rewrites, and the tree
    composed with INTERSECT / UNION / EXCEPT — algorithm-independent
    truth for the shard-local mask evaluation. Boost wrappers are
    scoring-only and transparent to membership."""
    kind = node[0]
    if kind == "boost":
        return _bool_match_sql(node[1], cap)
    if kind == "term":
        return f"SELECT doc_id FROM tf WHERE term = '{node[1]}'"
    if kind == "field":
        # field:value membership straight off the corpus metadata columns
        # — algorithm-independent truth for the engine's cogrouped docID
        # sets. Whitelisted to the documents table's metadata so a query
        # string can never name an arbitrary SQL identifier.
        f, v = node[1], node[2].replace("'", "''")
        if f not in ("lang", "source"):
            raise ValueError(f"oracle field whitelist: unknown field {f!r}")
        return f"SELECT doc_id FROM documents WHERE {f} = '{v}'"
    if kind == "range":
        # field:[lo TO hi] membership: lexicographic comparison on the
        # stringified metadata value — DuckDB's default VARCHAR collation
        # is binary, matching Spark's UTF8_BINARY string comparison, so
        # both renditions order 'src10' between 'src1' and 'src2' the
        # same way (Lucene TermRangeQuery semantics). Same identifier
        # whitelist as equality leaves; the synthetic zero-padded length
        # field maps back to its documents expression.
        f, lo, hi, il, ih = node[1], node[2], node[3], node[4], node[5]
        exprs = {
            "lang": "lang",
            "source": "source",
            "len": "lpad(CAST(n_chars AS VARCHAR), 6, '0')",
        }
        if f not in exprs:
            raise ValueError(f"oracle field whitelist: unknown field {f!r}")
        col = exprs[f]
        conds = [f"{col} IS NOT NULL"]
        if lo is not None:
            conds.append(f"{col} {'>=' if il else '>'} '{lo.replace(chr(39), chr(39) * 2)}'")
        if hi is not None:
            conds.append(f"{col} {'<=' if ih else '<'} '{hi.replace(chr(39), chr(39) * 2)}'")
        return f"SELECT doc_id FROM documents WHERE {' AND '.join(conds)}"
    if kind == "prefix":
        return (
            "SELECT DISTINCT doc_id FROM tf WHERE term IN ("
            f"{_prefix_expansion_sql(node[1], cap)})"
        )
    if kind == "fuzzy":
        return (
            "SELECT DISTINCT doc_id FROM tf WHERE term IN ("
            f"{_fuzzy_expansion_sql(node[1], node[2], cap)})"
        )
    if kind == "regex":
        return (
            "SELECT DISTINCT doc_id FROM tf WHERE term IN ("
            f"{_regex_expansion_sql(node[1], cap)})"
        )
    if kind == "phrase":
        toks, slop = list(node[1]), int(node[2])
        if any("'" in t for t in toks):  # defensive; tokenizer is [a-z0-9]
            raise ValueError(toks)
        if slop == 0:
            joins = " ".join(
                f"JOIN pos p{i} ON p{i}.doc_id = p0.doc_id AND p{i}.p = p0.p + {i}"
                for i in range(1, len(toks))
            )
            conds = " AND ".join(f"p{i}.term = '{t}'" for i, t in enumerate(toks))
            return (
                f"SELECT p0.doc_id FROM pos p0 {joins} WHERE {conds} "
                "GROUP BY p0.doc_id"
            )
        distinct = sorted(set(toks))
        n = len(distinct)
        joins = " ".join(
            f"JOIN pos p{i} ON p{i}.doc_id = p0.doc_id" for i in range(1, n)
        )
        conds = " AND ".join(f"p{i}.term = '{t}'" for i, t in enumerate(distinct))
        ps = ", ".join(f"p{i}.p" for i in range(n))
        window = f" AND greatest({ps}) - least({ps}) <= {slop}" if n > 1 else ""
        return (
            f"SELECT p0.doc_id FROM pos p0 {joins} WHERE {conds}{window} "
            "GROUP BY p0.doc_id"
        )
    if kind == "and":
        s = " INTERSECT ".join(f"({_bool_match_sql(c, cap)})" for c in node[1])
        for c in node[2]:
            s = f"({s}) EXCEPT ({_bool_match_sql(c, cap)})"
        return s
    return " UNION ".join(f"({_bool_match_sql(c, cap)})" for c in node[1])  # or


def _prefix_expansion_sql(stem: str, cap: int = BOOL_PREFIX_CAP) -> str:
    """Top-``cap`` vocabulary terms for a stem by (df DESC, term ASC) —
    the same capped top-terms rewrite the engine applies driver-side
    (query/prefix.expand_stems), re-derived from the dft CTE."""
    return (
        "SELECT term FROM ("
        "SELECT dft.term, row_number() OVER "
        "(ORDER BY dft.df DESC, dft.term ASC) AS r "
        f"FROM dft WHERE dft.term LIKE '{stem}%'"
        f") WHERE r <= {cap}"
    )


def _fuzzy_expansion_sql(word: str, max_dist: int, cap: int = BOOL_PREFIX_CAP) -> str:
    """Top-``cap`` vocabulary terms within ``max_dist`` edits of a word,
    by (edit distance ASC, df DESC, term ASC) — the same capped
    FuzzyQuery rewrite the engine applies driver-side
    (query/fuzzy.expand_fuzzy), re-derived from the dft CTE. DuckDB's
    ``levenshtein`` and Spark's agree exactly (both plain unit-cost DP;
    the spell_suggest oracle already leans on this), so the rewrite is
    replicated term-for-term. The engine's length-band prefilter is a
    necessary condition for the distance bound, so it never changes the
    match set and the oracle omits it."""
    return (
        "SELECT term FROM ("
        "SELECT dft.term, row_number() OVER "
        f"(ORDER BY levenshtein('{word}', dft.term) ASC, dft.df DESC, "
        "dft.term ASC) AS r "
        f"FROM dft WHERE levenshtein('{word}', dft.term) <= {max_dist}"
        f") WHERE r <= {cap}"
    )


def _bool_membership_and_qterms(
    query_set: list[tuple[str, str, int]],
    cap: int = BOOL_PREFIX_CAP,
) -> tuple[str, str, bool]:
    """-> (matches_sql, qterms_sql, boosted): the shared front half of
    every boolean-scored oracle — per-query membership CTE bodies and
    the distinct positive scoring terms (with max-boost dedup)."""
    from angle_spark.query.boolean import parse_query, positive_leaves_boosted

    matches_parts, qterm_rows, qterm_subqueries = [], [], []
    boosted = False
    for qid, text, k in query_set:
        ast = parse_query(text)
        matches_parts.append(
            f"SELECT '{qid}' AS query_id, {k} AS k, doc_id "
            f"FROM ({_bool_match_sql(ast, cap)})"
        )
        # distinct POSITIVE leaves score; each row/subquery carries its
        # leaf's ^w boost (1.0 unboosted — prefix/fuzzy expansion terms
        # inherit their leaf's weight)
        terms, stems, fuzz, rex = positive_leaves_boosted(ast)
        boosted = boosted or any(
            b != 1.0
            for b in [w for _, w in terms]
            + [w for _, w in stems]
            + [w for _, _, w in fuzz]
            + [w for _, w in rex]
        )
        for t, b in terms:
            qterm_rows.append(f"('{qid}', '{t}', {b!r}::DOUBLE)")
        for s, b in stems:
            qterm_subqueries.append(
                f"SELECT '{qid}' AS query_id, term, {b!r}::DOUBLE AS boost "
                f"FROM ({_prefix_expansion_sql(s, cap)})"
            )
        for w, d, b in fuzz:
            qterm_subqueries.append(
                f"SELECT '{qid}' AS query_id, term, {b!r}::DOUBLE AS boost "
                f"FROM ({_fuzzy_expansion_sql(w, d, cap)})"
            )
        for pat, b in rex:
            qterm_subqueries.append(
                f"SELECT '{qid}' AS query_id, term, {b!r}::DOUBLE AS boost "
                f"FROM ({_regex_expansion_sql(pat, cap)})"
            )
    matches = "\n  UNION ALL\n  ".join(matches_parts)
    parts = (
        [
            "SELECT query_id, term, boost FROM (VALUES "
            + ", ".join(qterm_rows)
            + ") AS qt(query_id, term, boost)"
        ]
        if qterm_rows
        else []
    ) + qterm_subqueries
    # positive literal terms and positive prefix expansions can overlap —
    # the GROUP BY keeps the scoring join from double-counting a term,
    # and max(boost) is the engine's rule when one term is reached
    # through several positive leaves (a boost declares importance;
    # importance doesn't cancel)
    qterms = (
        "SELECT query_id, term, max(boost) AS boost FROM ("
        + "\n  UNION ALL\n  ".join(parts)
        + ") GROUP BY query_id, term"
    )
    return matches, qterms, boosted


def _bm25_boolean_oracle_sql(
    query_set: list[tuple[str, str, int]] = BOOL_QUERY_SET,
    cap: int = BOOL_PREFIX_CAP,
    rank_on_rounded: bool = True,
    offset: int = 0,
) -> str:
    matches, qterms, boosted = _bool_membership_and_qterms(query_set, cap)
    return _bm25_matches_scored_sql(
        matches, qterms, rank_on_rounded=rank_on_rounded, boosted=boosted,
        offset=offset,
    )


def _bool_count_oracle_sql(
    query_set: list[tuple[str, str, int]],
    cap: int = BOOL_PREFIX_CAP,
) -> str:
    """Total-hits oracle: the same algorithm-independent membership CTEs
    as _bm25_boolean_oracle_sql, counted instead of scored — truth for
    count_matches() / Searcher.count(). Queries matching nothing emit no
    row (GROUP BY over an empty group), matching the engine contract."""
    from angle_spark.query.boolean import parse_query

    matches = "\n  UNION ALL\n  ".join(
        f"SELECT '{qid}' AS query_id, doc_id "
        f"FROM ({_bool_match_sql(parse_query(text), cap)})"
        for qid, text, _k in query_set
    )
    toks = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), matches AS (
  {matches}
)
SELECT query_id, count(DISTINCT doc_id)::BIGINT AS total_hits
FROM matches GROUP BY query_id
"""


# --- BOOLEAN query trees over the positional compressed index: AND/OR/
#     NOT with term, exact-phrase and proximity leaves (query/boolean.py
#     grammar), evaluated shard-locally as boolean masks (exact — a
#     doc's postings all live in its own segment), scored by the
#     disjunctive BM25 fold over each query's distinct positive terms
#     (query/wand.py mode="boolean"). The oracle rebuilds membership
#     with INTERSECT/UNION/EXCEPT over SQL-native primitives.
def q_bm25_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import wand_topk

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    out = wand_topk(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, BOOL_QUERY_SET),
        mode="boolean",
    )
    # FULL answer sets (k > corpus): re-rank on the ROUNDED score with
    # the doc_id tiebreak, mirroring the oracle — two distinct docs can
    # sit within SQL-sum-order ULP noise of each other, and the rounded
    # key makes that tie order deterministic on both sides. Safe exactly
    # because no query here truncates (the raw and rounded top-k SETS are
    # identical when everything is kept).
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    return out.select(
        "query_id",
        F.row_number().over(w).cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


# --- ANALYZE API (round 5, the ES ``_analyze`` endpoint): run a text
#     through a NAMED analyzer and return (token, position) rows — the
#     debugging surface for "why does this query (not) match", and the
#     API-level proof that both registered analyzer versions are
#     callable by name. Distributed trivially (one Column expression
#     per rendition); the oracle runs the DuckDB rendition of the SAME
#     registry entry, so the three-rendition invariant is what's
#     actually gated.
ANALYZE_SAMPLES: list[tuple[str, str]] = [
    ("an1", "v1-ascii-alnum"),
    ("an2", "v2-sstem-stop"),
]
ANALYZE_TEXT = (
    "The Queries of a batch, and THE tables: values-scan (merges) test"
)


def q_analyze_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.functions.tokenizer import analyzer_fns

    rows = spark.createDataFrame(
        [(qid, ver, ANALYZE_TEXT) for qid, ver in ANALYZE_SAMPLES],
        "sample_id string, analyzer string, text string",
    )
    out = None
    for qid, ver in ANALYZE_SAMPLES:
        _py, col_fn, _sql = analyzer_fns(ver)
        part = (
            rows.filter(F.col("sample_id") == qid)
            .select(
                "sample_id",
                "analyzer",
                F.posexplode(col_fn("text")).alias("position", "token"),
            )
            .select(
                "sample_id",
                "analyzer",
                F.col("position").cast("long").alias("position"),
                "token",
            )
        )
        out = part if out is None else out.unionByName(part)
    return out


def _analyze_oracle_sql(samples: list[tuple[str, str]], text: str) -> str:
    from angle_spark.functions.tokenizer import analyzer_fns

    esc = text.replace("'", "''")
    arms = []
    for qid, ver in samples:
        _py, _col, sql_fn = analyzer_fns(ver)
        toks = sql_fn(f"'{esc}'")
        arms.append(
            f"SELECT '{qid}' AS sample_id, '{ver}' AS analyzer,\n"
            f"  (generate_subscripts(t, 1) - 1)::BIGINT AS position,\n"
            f"  unnest(t) AS token\n"
            f"FROM (SELECT {toks} AS t)"
        )
    return "\n  UNION ALL\n  ".join(arms)


# --- FILTERS aggregation (round 5, the ES ``filters`` agg —
#     query/filters_agg.py): named arbitrary-QUERY buckets counted
#     within each main query's matched set, composed as boolean trees
#     ((Q) AND (F); other = (Q) AND NOT (union)) and counted in ONE
#     boolean count batch. The dead filter proves the ES empty-bucket
#     rule (0, not absence); other_bucket is the exact complement.
FILTERS_AGG_MAINS: list[tuple[str, str, int]] = [
    ("fa1", "batch", 1),
    ("fa2", "hash AND join", 1),
]
FILTERS_AGG_FILTERS: dict = {
    "dup": "dup",
    "scanm": "scan AND NOT merge",
    "dead": "zzzz",
}


def q_bm25_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.filters_agg import filters_agg

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    return filters_agg(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, FILTERS_AGG_MAINS),
        FILTERS_AGG_FILTERS,
        other_bucket=True,
    )


def _filters_agg_oracle_sql(
    mains: list[tuple[str, str, int]], filters: dict
) -> str:
    """Filters-agg truth: each (main, bucket) pair's COMPOSED boolean
    text parsed and counted through the same membership primitives;
    zero counts come from count(*) over an empty set — the ES
    empty-bucket rule."""
    from angle_spark.query.boolean import parse_query

    names = sorted(filters)
    union = " OR ".join(f"({filters[n]})" for n in names)
    arms = []
    for qid, text, _k in mains:
        pairs = [(n, f"({text}) AND ({filters[n]})") for n in names]
        pairs.append(("_other_", f"({text}) AND NOT ({union})"))
        for bucket, composed in pairs:
            mm = _bool_match_sql(parse_query(composed))
            arms.append(
                f"SELECT '{qid}' AS query_id, '{bucket}' AS bucket,\n"
                f"  (SELECT count(*) FROM (SELECT DISTINCT doc_id "
                f"FROM ({mm})))::BIGINT AS n_docs"
            )
    body = "\n  UNION ALL\n  ".join(arms)
    toks_sql = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks_sql} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
)
{body}
"""


# --- PHRASE SUGGESTER (round 5, the ES phrase suggester —
#     query/phrase_suggest.py): whole-query "did you mean" — per-token
#     DirectSpellChecker candidates (dist<=1, cap 3) rescored as full
#     phrases by a stupid-backoff bigram LM over the corpus. ps1/ps3
#     carry misspellings whose correction only context picks; ps2 is
#     fully in-vocabulary (the identity phrase must compete and win or
#     lose on the LM, not by fiat). Both sides rank on the ROUNDED
#     score (ln ULP noise across engines), suggestion ASC ties.
PHRASE_SUGGEST_QUERIES: list[tuple[str, str]] = [
    ("ps1", "hash joln"),
    ("ps2", "dup batch"),
    ("ps3", "scann merge"),
]
PS_TOP_N = 3


def q_phrase_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.phrase_suggest import bigram_counts, phrase_suggest

    _merged, tstats, _meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    docs = with_tokens(_read(spark, sf_dir, "documents")).select(
        "doc_id", "tokens"
    )
    out = phrase_suggest(
        spark,
        tstats,
        bigram_counts(docs),
        PHRASE_SUGGEST_QUERIES,
        top_n=PS_TOP_N,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 6)), F.asc("suggestion")
    )
    return out.select(
        "query_id",
        "suggestion",
        F.round("score", 6).alias("score"),
    ).withColumn("rank", F.row_number().over(w).cast("long")).select(
        "query_id", "rank", "suggestion", "score"
    )


def _phrase_suggest_oracle_sql(
    queries: list[tuple[str, str]], top_n: int
) -> str:
    """Phrase-suggester truth: candidate CTE (levenshtein + the
    dist/df/term cap), positional adjacent-pair bigram counts, the
    stupid-backoff fold written with the ENGINE's exact expression
    shape (ln(cf) - ln(T) etc.) so only ln ULP noise separates the
    sides — absorbed by the rounded rank key."""
    vals = ", ".join(
        f"('{qid}', {pos}, '{w}')"
        for qid, text in queries
        for pos, w in enumerate(text.split())
    )
    toks = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS tokens FROM documents
), dl AS (
  SELECT doc_id, len(tokens)::BIGINT AS dl FROM docs
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), cfs AS (
  SELECT term, sum(tf)::DOUBLE AS cf FROM tf GROUP BY term
), tot AS (
  SELECT sum(dl)::DOUBLE AS t FROM dl
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), big AS (
  SELECT a.term AS w1, b.term AS w2, count(*)::DOUBLE AS cnt
  FROM pos a JOIN pos b ON b.doc_id = a.doc_id AND b.p = a.p + 1
  GROUP BY a.term, b.term
), vals(query_id, pos, word) AS (
  SELECT * FROM (VALUES {vals})
), cand AS (
  SELECT v.query_id, v.pos, d.term, c.cf,
         row_number() OVER (
           PARTITION BY v.query_id, v.pos
           ORDER BY levenshtein(v.word, d.term) ASC, d.df DESC, d.term ASC
         ) AS r
  FROM vals v
  JOIN dft d ON abs(len(d.term) - len(v.word)) <= 1
            AND levenshtein(v.word, d.term) <= 1
  JOIN cfs c ON c.term = d.term
), c0 AS (
  SELECT * FROM cand WHERE pos = 0 AND r <= 3
), c1 AS (
  SELECT * FROM cand WHERE pos = 1 AND r <= 3
), pairs AS (
  SELECT c0.query_id,
         c0.term || ' ' || c1.term AS suggestion,
         ln(c0.cf) - ln(t.t)
         + CASE WHEN b.cnt IS NOT NULL THEN ln(b.cnt) - ln(c0.cf)
                ELSE ln(0.4) + ln(c1.cf) - ln(t.t) END AS score
  FROM c0
  JOIN c1 ON c1.query_id = c0.query_id
  CROSS JOIN tot t
  LEFT JOIN big b ON b.w1 = c0.term AND b.w2 = c1.term
)
SELECT query_id,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY round(score, 6) DESC, suggestion ASC)
         ::BIGINT AS rank,
       suggestion, round(score, 6) AS score
FROM pairs
QUALIFY rank <= {top_n}
"""


# --- RESCORE (round 5, the ES rescore API — query/rescore.py):
#     weighted second-pass combine over the first-stage ranking:
#     total = query_weight * BM25_or + rescore_weight * BM25_phrase,
#     phrase-matching docs boosted, everything else untouched. The
#     window covers the full answer set here (k > corpus) — the window
#     CUT semantics (outside docs keep untouched scores, can outrank
#     sunk rescored docs) are pytest-proven where raw scores are exact
#     (tests/test_rescore.py). rs1/rs2 are phrase reversals — different
#     docs get the boost; rs3's phrase matches nowhere (combine is a
#     no-op that must not perturb the ranking).
RESCORE_QUERY_SET: list[tuple[str, str, int]] = [
    ("rs1", "hash join", 2000),
    ("rs2", "join hash", 2000),
    ("rs3", "dup batch", 2000),
]
RESCORE_WEIGHT = 2.0


def q_bm25_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.rescore import rescore_topk
    from angle_spark.query.wand import wand_topk

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    queries = _doc_queries_df(spark, RESCORE_QUERY_SET)
    stage1 = wand_topk(spark, merged, tstats, meta, queries)
    stage2 = wand_topk(
        spark, merged, tstats, meta, queries, mode="phrase"
    ).select("query_id", "doc_id", "score")
    out = rescore_topk(
        stage1,
        stage2,
        k=2000,
        window_size=2000,
        query_weight=1.0,
        rescore_weight=RESCORE_WEIGHT,
        score_mode="total",
        rank_on_rounded=True,
    )
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def _rescore_oracle_sql(query_set: list[tuple[str, str, int]]) -> str:
    """Rescore truth: the disjunctive BM25 fold per (query, any-term
    doc), plus rescore_weight x the SAME fold when the doc passes the
    positional phrase chain (a phrase hit's BM25 equals the disjunctive
    fold over the same distinct terms — both sides compute it that
    way), ranked on the rounded combined score."""
    from angle_spark.functions.tokenizer import tokenize_py

    def phrase_select(qid, text):
        terms = tokenize_py(text)
        joins = " ".join(
            f"JOIN pos p{i} ON p{i}.doc_id = p0.doc_id AND p{i}.p = p0.p + {i}"
            for i in range(1, len(terms))
        )
        conds = " AND ".join(f"p{i}.term = '{t}'" for i, t in enumerate(terms))
        return (
            f"SELECT '{qid}' AS query_id, p0.doc_id"
            f" FROM pos p0 {joins} WHERE {conds} GROUP BY p0.doc_id"
        )

    phrase = "\n  UNION ALL\n  ".join(
        phrase_select(qid, text) for qid, text, _k in query_set
    )
    toks = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS tokens FROM documents
), dl AS (
  SELECT doc_id, len(tokens)::BIGINT AS dl FROM docs
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), stats AS (
  SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM dl
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), qterms AS (
  SELECT DISTINCT query_id, k, unnest({duckdb_tokens_sql('text')}) AS term
  FROM {_doc_queries_values_sql(query_set)}
), scored AS (
  SELECT qt.query_id, tf.doc_id,
         sum( ln((s.n_docs - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) ) AS raw
  FROM qterms qt
  JOIN tf  ON tf.term = qt.term
  JOIN dft ON dft.term = qt.term
  JOIN dl  ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
), phrase AS (
  {phrase}
), combined AS (
  SELECT s.query_id, s.doc_id,
         s.raw + CASE WHEN p.doc_id IS NOT NULL
                      THEN {RESCORE_WEIGHT} * s.raw ELSE 0.0 END AS total
  FROM scored s
  LEFT JOIN phrase p
    ON p.query_id = s.query_id AND p.doc_id = s.doc_id
)
SELECT query_id,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY round(total, 6) DESC, doc_id ASC)
         ::BIGINT AS rank,
       doc_id, round(total, 6) AS score
FROM combined
"""


# --- TERMS_SET retrieval (round 5, the ES terms_set query / Lucene
#     CoveringQuery — query/terms_set.py): match docs containing at
#     least m of the query's terms where m is PER-DOCUMENT
#     (minimum_should_match_field), here required = 1 + doc_id % 3.
#     ts1 exercises all three thresholds; ts2 has only 2 terms (the
#     required=3 docs can never match); ts3 adds an OOV term (caps the
#     feasible thresholds the Lucene docFreq==0 way). Full answer sets,
#     rounded-score re-rank.
TERMS_SET_QUERY_SET: list[tuple[str, str, int]] = [
    ("ts1", "hash join scan", 2000),
    ("ts2", "dup merge", 2000),
    ("ts3", "zzzz batch filter", 2000),
]


def q_bm25_terms_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.terms_set import terms_set_topk

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    docs = _read(spark, sf_dir, "documents")
    m_field = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        (F.lit(1) + F.col("doc_id") % 3).cast("long").alias("required"),
    )
    out = terms_set_topk(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, TERMS_SET_QUERY_SET),
        m_field,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    return out.select(
        "query_id",
        F.row_number().over(w).cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def _terms_set_oracle_sql(query_set: list[tuple[str, str, int]]) -> str:
    """terms_set truth: per-(query, doc) DISTINCT matched-term count vs
    the doc's own required value (1 + doc_id % 3), BM25 over the
    matched terms for survivors."""
    toks = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS tokens FROM documents
), dl AS (
  SELECT doc_id, len(tokens)::BIGINT AS dl FROM docs
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), stats AS (
  SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM dl
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), qterms AS (
  SELECT DISTINCT query_id, k, unnest({duckdb_tokens_sql('text')}) AS term
  FROM {_doc_queries_values_sql(query_set)}
), counts AS (
  SELECT q.query_id, tf.doc_id, count(DISTINCT tf.term)::BIGINT AS cnt
  FROM qterms q JOIN tf ON tf.term = q.term
  GROUP BY q.query_id, tf.doc_id
), eligible AS (
  SELECT query_id, doc_id FROM counts
  WHERE cnt >= greatest(1 + doc_id % 3, 1)
), scored AS (
  SELECT e.query_id, e.doc_id,
         sum( ln((s.n_docs - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) ) AS raw
  FROM eligible e
  JOIN qterms qt ON qt.query_id = e.query_id
  JOIN tf  ON tf.doc_id = e.doc_id AND tf.term = qt.term
  JOIN dft ON dft.term = qt.term
  JOIN dl  ON dl.doc_id = e.doc_id
  CROSS JOIN stats s
  GROUP BY e.query_id, e.doc_id
)
SELECT query_id,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY round(raw, 6) DESC, doc_id ASC)
         ::BIGINT AS rank,
       doc_id, round(raw, 6) AS score
FROM scored
"""


# --- COMMON-TERMS retrieval (round 5, Lucene CommonTermsQuery / the
#     ES match query's cutoff_frequency — query/common_terms.py):
#     query terms split by document frequency at CUTOFF; membership is
#     OR over the LOW-frequency group only (the selective short posting
#     lists), every matched term — low or high — still scores. In the
#     dense documents vocabulary exactly one term is rare ("dup",
#     df=25/500 at sf0.01) and everything else sits at df~380+, so
#     cutoff=0.5 cleanly bites: "dup join" matches only the dup docs
#     (not the ~500-doc plain-OR set) while "hash join" (all high)
#     falls back to plain disjunction. Full answer sets (k > corpus),
#     rounded-score re-rank — the bm25_boolean discipline.
COMMON_QUERY_SET: list[tuple[str, str, int]] = [
    ("ct1", "dup join", 2000),
    ("ct2", "dup batch scan", 2000),
    ("ct3", "hash join", 2000),
    ("ct4", "zzzz dup", 2000),
]
COMMON_CUTOFF = 0.5


def q_bm25_common_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.common_terms import common_terms_topk

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    out = common_terms_topk(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, COMMON_QUERY_SET),
        cutoff=COMMON_CUTOFF,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    return out.select(
        "query_id",
        F.row_number().over(w).cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def _common_terms_oracle_sql(
    query_set: list[tuple[str, str, int]], cutoff: float
) -> str:
    """Common-terms truth: per-query-term df classification at the
    cutoff (relative to n_docs), membership = >= 1 low term (or any
    term when a query has no low terms — the ES all-high fallback),
    score = BM25 over ALL matched in-vocab query terms. OOV terms
    vanish at the dft join on both sides."""
    toks = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS tokens FROM documents
), dl AS (
  SELECT doc_id, len(tokens)::BIGINT AS dl FROM docs
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), stats AS (
  SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM dl
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), qterms AS (
  SELECT DISTINCT query_id, k, unnest({duckdb_tokens_sql('text')}) AS term
  FROM {_doc_queries_values_sql(query_set)}
), qcls AS (
  SELECT q.query_id, q.k, q.term, dft.df,
         CASE WHEN dft.df < {cutoff} * s.n_docs THEN 1 ELSE 0 END AS is_low
  FROM qterms q JOIN dft ON dft.term = q.term CROSS JOIN stats s
), member AS (
  SELECT query_id, max(is_low) AS has_low FROM qcls GROUP BY query_id
), mterms AS (
  SELECT c.query_id, c.term
  FROM qcls c JOIN member m ON m.query_id = c.query_id
  WHERE c.is_low = 1 OR m.has_low = 0
), matched AS (
  SELECT DISTINCT mt.query_id, tf.doc_id
  FROM mterms mt JOIN tf ON tf.term = mt.term
), scored AS (
  SELECT ma.query_id, ma.doc_id, max(qc.k) AS k,
         sum( ln((s.n_docs - qc.df + 0.5) / (qc.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) ) AS raw
  FROM matched ma
  JOIN qcls qc ON qc.query_id = ma.query_id
  JOIN tf  ON tf.doc_id = ma.doc_id AND tf.term = qc.term
  JOIN dl  ON dl.doc_id = ma.doc_id
  CROSS JOIN stats s
  GROUP BY ma.query_id, ma.doc_id
)
SELECT query_id,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY round(raw, 6) DESC, doc_id ASC)
         ::BIGINT AS rank,
       doc_id, round(raw, 6) AS score
FROM scored
QUALIFY rank <= k
"""


# --- SCORE EXPLAIN (round 5, Lucene IndexSearcher.explain analog):
#     per-hit (term, tf, dl, idf, contribution) breakdown of the top-k —
#     query/explain.py decodes candidate blocks once (mapInPandas over
#     the codec), broadcasts the k·|queries| hits in, and the oracle
#     rebuilds every row from first principles (ranked CTE -> per-term
#     contribution join). The sum-to-score identity is pytest-asserted
#     exactly (tests/test_explain.py); the driver hash checks the rows.
def q_bm25_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.explain import explain_hits
    from angle_spark.query.wand import wand_topk

    merged, tstats, meta = load_index(spark, _cached_doc_index(spark, sf_dir))
    queries = _doc_queries_df(spark)
    results = wand_topk(spark, merged, tstats, meta, queries)
    exp = explain_hits(spark, merged, tstats, meta, queries, results)
    return exp.select(
        "query_id",
        "doc_id",
        "term",
        F.col("tf").cast("long").alias("tf"),
        F.col("dl").cast("long").alias("dl"),
        F.round("idf", 6).alias("idf"),
        F.round("contribution", 6).alias("contribution"),
    )


def _explain_oracle_sql() -> str:
    toks = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS tokens FROM documents
), dl AS (
  SELECT doc_id, len(tokens)::BIGINT AS dl FROM docs
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), stats AS (
  SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM dl
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), qterms AS (
  SELECT DISTINCT query_id, k, unnest({duckdb_tokens_sql('text')}) AS term
  FROM {_doc_queries_values_sql()}
), contrib AS (
  SELECT qt.query_id, qt.k, tf.doc_id, qt.term, tf.tf, dl.dl,
         ln((s.n_docs - dft.df + 0.5) / (dft.df + 0.5) + 1.0) AS idf,
         ln((s.n_docs - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
           * tf.tf * 2.2
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) AS c
  FROM qterms qt
  JOIN tf  ON tf.term = qt.term
  JOIN dft ON dft.term = qt.term
  JOIN dl  ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
), ranked AS (
  SELECT query_id, doc_id, k,
         row_number() OVER (
           PARTITION BY query_id ORDER BY sum(c) DESC, doc_id ASC
         ) AS rnk
  FROM contrib GROUP BY query_id, doc_id, k
)
SELECT c.query_id, c.doc_id, c.term, c.tf, c.dl,
       round(c.idf, 6) AS idf, round(c.c, 6) AS contribution
FROM contrib c JOIN ranked r
  ON r.query_id = c.query_id AND r.doc_id = c.doc_id
WHERE r.rnk <= r.k
"""


# Stemmed-analyzer rendition (round 5): the v2 analyzer (Lucene
# StandardAnalyzer's 33 English stopwords + Harman's S-stemmer,
# functions/tokenizer.py) is shared by engine and oracle in all three
# renditions. The query side proves the stemming binds: plural query
# words ("tables", "queries") are OOV under v1 and match only through
# the shared stem; stopwords drop from query AND corpus (changing df,
# avgdl and every score); "thes" stems to the stopword "the", which the
# corpus removed -> 0 hits (stop-then-stem order, both sides).
STEM_QUERY_SET: list[tuple[str, str, int]] = [
    ("st1", "tables joins", 15),
    ("st2", "the queries of a batch", 15),
    ("st3", "values windows scan", 15),
    ("st4", "merges", 40),
    ("st5", "thes", 10),
]


# --- STEMMED retrieval: index built with analyzer="v2-sstem-stop"
#     (IndexMeta records the version; wand_topk tokenizes queries with
#     the same rendition — Lucene's Analyzer-per-index contract). The
#     oracle passes duckdb_tokens_v2_sql for BOTH corpus and query text,
#     so engine and oracle share one versioned analyzer definition.
def q_bm25_stemmed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import wand_topk

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, analyzer="v2-sstem-stop")
    )
    out = wand_topk(
        spark, merged, tstats, meta, _doc_queries_df(spark, STEM_QUERY_SET)
    )
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


# --- REINDEXED retrieval (round 5, the ES _reindex API without
#     _source — index/reconstruct.py): the cached V1 POSITIONAL index
#     is reindexed to the v2 analyzer from the index alone (positions
#     make the token streams recoverable exactly; v2 is a token-level
#     transform of v1), then answers the SAME stemmed query set as
#     bm25_stemmed — whose oracle (v2 renditions on both sides) it
#     shares, because a reindexed index must be indistinguishable from
#     one born v2 (byte-identity is pytest-proven in
#     tests/test_reconstruct.py).
_REINDEX_CACHE: dict = {}


def q_bm25_reindexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from angle_spark.index.build import load_index
    from angle_spark.index.reconstruct import reindex
    from angle_spark.query.wand import wand_topk

    src = _cached_doc_index(spark, sf_dir, positional=True)
    dst = _REINDEX_CACHE.get(src)
    if dst is None:
        dst = tempfile.mkdtemp(prefix="bm25_reindex_entry_")
        reindex(spark, src, dst, analyzer="v2-sstem-stop")
        _REINDEX_CACHE[src] = dst
    merged, tstats, meta = load_index(spark, dst)
    out = wand_topk(
        spark, merged, tstats, meta, _doc_queries_df(spark, STEM_QUERY_SET)
    )
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


# Boosted rendition (Lucene's ``^``): leaf^w multiplies the leaf's BM25
# contribution by w — membership NEVER changes, only scoring weight, and
# a term reached through several positive leaves scores with the MAX of
# their boosts. Cases: boosted OR arm reranks (bs1), boosted phrase
# (bs2), prefix expansions inherit the leaf boost (bs3), max rule with
# the same term at two weights (bs4), fractional demote (bs5), boosted
# fuzzy (bs6), boost under NOT is membership-only and never scored (bs7
# scores exactly like the unboosted query), multi-token bare word
# distributes its boost (bs8), boosted proximity leaf (bs9), boosted
# dead OR arm drops while the query survives (bs10).
BOOST_QUERY_SET: list[tuple[str, str, int]] = [
    ("bs1", "dup^3 OR spark", 1000),
    ("bs2", '"hash join"^2 OR scan', 1000),
    ("bs3", "fil*^2 AND merge", 1000),
    ("bs4", "dup^2 OR (dup^3 AND spark)", 1000),
    ("bs5", "scan^0.5 OR merge", 1000),
    ("bs6", "sow~1^2 AND hash", 1000),
    ("bs7", "merge AND NOT filter^2", 1000),
    ("bs8", "hash-join^2 OR dup", 1000),
    ("bs9", '"join hash"~3^2 AND scan', 1000),
    ("bs10", "zzzz^2 OR dup", 1000),
]


# Field-scoped rendition (Lucene's ``field:value``, round 5): field
# leaves FILTER membership against the corpus metadata and never score
# (filter context; the grammar rejects trees where a field leaf could
# widen the answer set — every OR arm needs a scoring positive leaf).
# Cases: field under AND (ff1), negated field (ff2), fields inside both
# OR arms (ff3), OR of two fields under a covered AND (ff4), unseen
# value matches nothing (ff5), quoted value form (ff6).
FIELD_QUERY_SET: list[tuple[str, str, int]] = [
    ("ff1", "scan AND lang:en", 1000),
    ("ff2", "merge AND NOT source:src2", 1000),
    ("ff3", '("hash join" AND lang:de) OR (dup AND source:src4)', 1000),
    ("ff4", "batch AND (lang:en OR lang:de)", 1000),
    ("ff5", "scan AND lang:xx", 10),
    ("ff6", 'dup AND lang:"en"', 1000),
]


# --- FIELD-SCOPED retrieval over the positional compressed index:
#     field:value leaves resolve against a (doc_id, field, value)
#     metadata frame driver-side into per-leaf docID sets that ride the
#     tombstone cogroup channel (query/wand.py mode="boolean",
#     field_meta=...). Scoring is unchanged — the disjunctive BM25 fold
#     over positive TERMS; field leaves gate membership only. The oracle
#     rebuilds field membership straight off the documents metadata
#     columns (entries._bool_match_sql "field" branch). Reference
#     analog: the prompt catalog's query-vs-passage role distinction
#     (reference angle_emb/angle.py:64-87).
def q_bm25_field_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import wand_topk

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    docs = _read(spark, sf_dir, "documents")
    fmeta = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.lit("lang").alias("field"),
        F.col("lang").cast("string").alias("value"),
    ).unionByName(
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.lit("source").alias("field"),
            F.col("source").cast("string").alias("value"),
        )
    )
    out = wand_topk(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, FIELD_QUERY_SET),
        mode="boolean",
        field_meta=fmeta,
    )
    # FULL answer sets (k > corpus): rank on the rounded score with the
    # doc_id tiebreak, mirroring the oracle (same contract and reasoning
    # as q_bm25_boolean)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    return out.select(
        "query_id",
        F.row_number().over(w).cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


# Range rendition (Lucene's TermRangeQuery, round 5): field:[lo TO hi]
# filters membership by LEXICOGRAPHIC comparison on the stringified
# metadata value — deliberately including the classic gotcha that
# src10..src19 sort between src1 and src2 (rq1-rq3 pin it), with
# zero-padded values as the standard numeric-range practice (rq5 over
# len = lpad(n_chars)). Cases: inclusive range spanning the gotcha
# (rq1), exclusive bounds (rq2), open hi where src2 > src18 (rq3), open
# lo (rq4), zero-padded numeric (rq5), negated range (rq6), dead OR arm
# from an empty range (rq7), field-exists [* TO *] (rq8), inverted
# interval matches nothing (rq9), OVERLAPPING predicates — equality
# inside a range on the same field — each resolved independently
# (rq10).
RANGE_QUERY_SET: list[tuple[str, str, int]] = [
    ("rq1", "scan AND source:[src1 TO src2]", 1000),
    ("rq2", "merge AND source:{src1 TO src2}", 1000),
    ("rq3", "dup AND source:[src18 TO *]", 1000),
    ("rq4", "batch AND lang:[* TO de]", 1000),
    ("rq5", '"hash join" AND len:[000100 TO 000400]', 1000),
    ("rq6", "scan AND NOT source:[src1 TO src3]", 1000),
    ("rq7", "dup AND (lang:[en TO es] OR (batch AND source:[zz TO *]))", 1000),
    ("rq8", "merge AND lang:[* TO *]", 1000),
    ("rq9", "scan AND lang:[es TO de]", 1000),
    ("rq10", "dup AND source:src2 AND source:[src1 TO src3]", 1000),
]


# --- RANGE-FILTERED retrieval over the positional compressed index:
#     field:[lo TO hi] / {lo TO hi} leaves (Lucene TermRangeQuery)
#     resolve against the same (doc_id, field, value) metadata frame as
#     equality leaves — one overlap-safe scan (array+explode, a row
#     joins EVERY predicate set it satisfies), docID sets on the
#     cogrouped tombstone channel (query/wand.py mode="boolean").
#     Comparison is lexicographic on the stringified value in BOTH
#     renditions (Spark UTF8_BINARY == DuckDB binary VARCHAR collation),
#     so src10 < src2 agrees by construction. The len field is
#     lpad(n_chars, 6, '0') — the standard Lucene practice for numeric
#     term ranges. Reference analog: retrieval prompts scope queries by
#     role metadata (reference angle_emb/angle.py:64-87).
def q_bm25_range_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import wand_topk

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    docs = _read(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("long").alias("doc_id")
    fmeta = (
        docs.select(did, F.lit("lang").alias("field"),
                    F.col("lang").cast("string").alias("value"))
        .unionByName(
            docs.select(did, F.lit("source").alias("field"),
                        F.col("source").cast("string").alias("value"))
        )
        .unionByName(
            docs.select(
                did,
                F.lit("len").alias("field"),
                F.lpad(F.col("n_chars").cast("string"), 6, "0").alias("value"),
            )
        )
    )
    out = wand_topk(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, RANGE_QUERY_SET),
        mode="boolean",
        field_meta=fmeta,
    )
    # FULL answer sets (k > corpus): rank on the rounded score with the
    # doc_id tiebreak, mirroring the oracle (same contract and reasoning
    # as q_bm25_boolean)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    return out.select(
        "query_id",
        F.row_number().over(w).cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


# Pagination page: global ranks 11..25 (offset=10, k=15) — deep enough
# that the page boundary crosses real score mass, shallow enough that
# every query still fills its page. pg5's dead OR arm checks a page
# over a single-term answer set.
PAGED_QUERY_SET: list[tuple[str, str, int]] = [
    ("pg1", "dup OR spark", 15),
    ("pg2", "hash AND join", 15),
    ("pg3", "scan OR merge OR batch", 15),
    ("pg4", "filter AND NOT merge", 15),
    ("pg5", "zzzz OR dup", 15),
]
PAGE_OFFSET = 10


# --- PAGINATED retrieval (round 5): wand_topk(offset=10) returns the
#     global-rank page (10, 25] — shard-local selection keeps offset+k
#     candidates (the disclosed Solr/ES deep-paging cost), the final
#     window filters to the page, and ranks stay GLOBAL so consecutive
#     pages tile the unpaged ranking exactly. The oracle ranks on the
#     raw score (bit-identical fold both sides) and applies the same
#     page predicate.
def q_bm25_paged(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import wand_topk

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    out = wand_topk(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, PAGED_QUERY_SET),
        mode="boolean",
        offset=PAGE_OFFSET,
    )
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


# --- CURSOR paging (round 5, Lucene IndexSearcher.searchAfter / ES
#     search_after): page 1 (k = PAGE_OFFSET) is collected driver-side
#     and its LAST hit's (raw score, doc_id) becomes each query's
#     cursor — the ES handshake — then page 2 filters shard-locally at
#     the cursor BEFORE the top-k cut, so per-shard candidate cost
#     stays k instead of offset + k (the deep-paging scale shape;
#     query/wand.py docstring). Truth: cursor pages tile the unpaged
#     ranking exactly, so the oracle is the OFFSET page (global ranks
#     (10, 25]) with ranks renumbered 1..k — the two paging shapes must
#     agree bitwise.
def q_bm25_search_after(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import wand_topk

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    page1 = wand_topk(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(
            spark, [(q, t, PAGE_OFFSET) for q, t, _ in PAGED_QUERY_SET]
        ),
        mode="boolean",
    )
    cursors = {
        r["query_id"]: (float(r["score"]), int(r["doc_id"]))
        for r in page1.filter(F.col("rank") == PAGE_OFFSET).collect()
    }
    out = wand_topk(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, PAGED_QUERY_SET),
        mode="boolean",
        search_after=cursors,
    )
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


# --- TOTAL HITS (round 5, Lucene TotalHitCountCollector /
#     track_total_hits): count_matches() returns the EXACT matched-doc
#     count per query — same one-shuffle job shape, a sum-aggregate
#     instead of the rank window, pruning forced off (exact totals and
#     early termination are mutually exclusive, as in Lucene). Runs the
#     full boolean query set so counts cover AND/OR/NOT, phrase,
#     proximity and prefix trees; the oracle counts the same
#     membership CTEs the scored boolean oracle ranks.
def q_bm25_total_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import count_matches

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    out = count_matches(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, BOOL_QUERY_SET),
        mode="boolean",
    )
    return out.select(
        "query_id", F.col("total_hits").cast("long").alias("total_hits")
    )


# Sort-by-field: membership from the query terms, ranking by a corpus
# metadata key (longest-document-first here). sb3's rare term checks a
# sub-k answer set; sb4 is conjunctive membership under field sort.
SORT_QUERY_SET: list[tuple[str, str, int]] = [
    ("sb1", "dup spark", 12),
    ("sb2", "scan merge batch", 12),
    ("sb3", "zzzz dup", 12),
    ("sb4", "hash join", 12),
]


# --- SORT-BY-FIELD retrieval (round 5, Lucene Sort / SortField):
#     wand_topk(sort_meta=(doc_id, sort_key)) ranks the matched docs by
#     the key instead of relevance — longest-document-first here
#     (sort_key = n_chars; in transcript serving it is the turn ts for
#     most-recent-first). The key frame rides the shard-cogrouped
#     tombstone channel (one narrow shuffle per batch — the disclosed
#     doc_filter shape; index-time docvalues are the persisted variant
#     at serving scale); selection is per-shard top-k by key, ties on
#     doc_id, missing keys sort last, pruning forced off (score bounds
#     say nothing about sort keys). The returned score column IS the
#     key. Oracle: membership CTE joined to the metadata column,
#     ORDER BY key DESC, doc_id.
def q_bm25_sort_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import wand_topk

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    docs = _read(spark, sf_dir, "documents")
    smeta = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_chars").cast("double").alias("sort_key"),
    )
    out = wand_topk(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, SORT_QUERY_SET),
        sort_meta=smeta,
    )
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.col("score").alias("sort_key"),
    )


# --- SORT BY STORED DOCVALUES (round 5, Lucene NumericDocValues): the
#     same sort-by-field semantics with the key persisted at INDEX time
#     (index/docvalues.py — parquet partitioned by segment) instead of
#     shipped per batch: each shard task reads exactly its own segments'
#     column files task-locally (pyarrow, partition-pruned), so the
#     side-channel shuffle disappears from the plan
#     (tests/test_docvalues.py asserts the exchange-count drop). Results
#     are frame-identical to bm25_sort_by — same oracle.
def q_bm25_sort_docvalues(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.index.docvalues import load_docvalues, write_docvalues
    from angle_spark.query.wand import wand_topk

    idx = _cached_doc_index(spark, sf_dir, positional=True)
    merged, tstats, meta = load_index(spark, idx)
    try:
        dv = load_docvalues(spark, idx, "n_chars")
    except Exception:
        docs = _read(spark, sf_dir, "documents")
        dv = write_docvalues(
            spark, idx, "n_chars", docs.select("doc_id", "n_chars")
        )
    out = wand_topk(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, SORT_QUERY_SET),
        sort_meta=dv,
    )
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.col("score").alias("sort_key"),
    )


def _sort_by_oracle_sql(query_set: list[tuple[str, str, int]]) -> str:
    """Sort-by-field truth: disjunctive term membership (tf CTE), the
    n_chars metadata key, ORDER BY key DESC with the doc_id tiebreak —
    none of the engine's shard/cogroup machinery."""
    from angle_spark.functions.tokenizer import tokenize_py

    parts = []
    for qid, text, k in query_set:
        toks = sorted(set(tokenize_py(text)))
        inlist = ", ".join(f"'{t}'" for t in toks)
        parts.append(
            f"SELECT '{qid}' AS query_id, {k} AS k, doc_id "
            f"FROM (SELECT DISTINCT doc_id FROM tf WHERE term IN ({inlist}))"
        )
    matches = "\n  UNION ALL\n  ".join(parts)
    toks_sql = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks_sql} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), matches AS (
  {matches}
), ranked AS (
  SELECT m.query_id, m.k, m.doc_id, CAST(d.n_chars AS DOUBLE) AS sort_key,
         row_number() OVER (
           PARTITION BY m.query_id
           ORDER BY d.n_chars DESC, m.doc_id ASC) AS rnk
  FROM matches m JOIN documents d ON d.doc_id = m.doc_id
)
SELECT query_id, rnk AS rank, doc_id, sort_key
FROM ranked WHERE rnk <= k
"""


# Metric aggregation over matched docs (ES stats agg): st3's negation
# shrinks the doc set the values fold over; st4's dead OR arm leaves a
# single-term answer set.
STATS_QUERY_SET: list[tuple[str, str, int]] = [
    ("st1", "dup OR spark", 1),
    ("st2", "hash AND join", 1),
    ("st3", "scan AND NOT merge", 1),
    ("st4", "zzzz OR batch", 1),
]


# --- SEARCH-AS-ANALYTICS (round 5, the Elasticsearch ``stats``
#     aggregation): aggregate_matches() folds a numeric column over each
#     query's matched docs — n_docs / n_values / sum / min / max / avg of
#     n_chars here ("how long are the docs mentioning X") — WITHOUT
#     materializing the hit list: shards emit (count, sum, min, max)
#     partials over their matched docs and a sum/min/max merge replaces
#     the rank window. Values ride the cogrouped tombstone channel; sums
#     here are integer-valued doubles, so the fold is exact and the
#     oracle's sum()/count() reproduces it bit-for-bit.
def q_bm25_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import aggregate_matches

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    docs = _read(spark, sf_dir, "documents")
    vals = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_chars").cast("double").alias("value"),
    )
    out = aggregate_matches(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, STATS_QUERY_SET),
        vals,
        mode="boolean",
    )
    return out.select(
        "query_id",
        "n_docs",
        "n_values",
        F.col("sum").alias("sum"),
        F.col("min").alias("min"),
        F.col("max").alias("max"),
        F.round("avg", 6).alias("avg"),
    )


def _stats_oracle_sql(query_set: list[tuple[str, str, int]]) -> str:
    """Stats-agg truth: the boolean membership CTEs joined to the
    documents metadata column, folded with plain SQL aggregates."""
    from angle_spark.query.boolean import parse_query

    matches = "\n  UNION ALL\n  ".join(
        f"SELECT '{qid}' AS query_id, doc_id "
        f"FROM ({_bool_match_sql(parse_query(text))})"
        for qid, text, _k in query_set
    )
    toks_sql = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks_sql} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), matches AS (
  {matches}
)
SELECT m.query_id,
       count(*)::BIGINT AS n_docs,
       count(d.n_chars)::BIGINT AS n_values,
       CAST(sum(d.n_chars) AS DOUBLE) AS sum,
       CAST(min(d.n_chars) AS DOUBLE) AS min,
       CAST(max(d.n_chars) AS DOUBLE) AS max,
       round(CAST(sum(d.n_chars) AS DOUBLE) / count(d.n_chars), 6) AS avg
FROM (SELECT DISTINCT query_id, doc_id FROM matches) m
JOIN documents d ON d.doc_id = m.doc_id
GROUP BY m.query_id
"""


# --- EXTENDED stats over matched docs (round 5, the Elasticsearch
#     ``extended_stats`` aggregation): aggregate_matches(extended=True)
#     adds variance / std-deviation / ±2σ bounds to the stats fold. The
#     shard partials additionally carry the sum of squares — still a
#     CONSTANT-SIZE fold per (shard, query), never a per-match value
#     ship. Metric is n_chars, deterministically missing for doc_id % 5
#     == 4 docs so the ES missing rule (n_values < n_docs; variance over
#     valued docs only) is load-bearing. n_chars is integer-valued, so
#     sum and sum_of_squares are exactly representable — the oracle's
#     replay of ES's own expressions matches beyond the round(6).
def q_bm25_extended_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import aggregate_matches

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    docs = _read(spark, sf_dir, "documents")
    vals = docs.filter((F.col("doc_id") % 5) != 4).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_chars").cast("double").alias("value"),
    )
    out = aggregate_matches(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, STATS_QUERY_SET),
        vals,
        mode="boolean",
        extended=True,
    )
    return out.select(
        "query_id",
        "n_docs",
        "n_values",
        "sum",
        "min",
        "max",
        F.round("avg", 6).alias("avg"),
        "sum_of_squares",
        F.round("variance", 6).alias("variance"),
        F.round("variance_sampling", 6).alias("variance_sampling"),
        F.round("std_deviation", 6).alias("std_deviation"),
        F.round("std_deviation_sampling", 6).alias("std_deviation_sampling"),
        F.round("std_upper", 6).alias("std_upper"),
        F.round("std_lower", 6).alias("std_lower"),
    )


def _extended_stats_oracle_sql(query_set: list[tuple[str, str, int]]) -> str:
    """Extended-stats truth: the boolean membership CTEs joined to the
    part-missing metric, folded with ES's OWN variance expressions
    ((sumsq - sum²/n)/n population, n-1 sampling, avg ± 2σ bounds) —
    NOT DuckDB's var_pop/var_samp built-ins, so both sides evaluate the
    identical association on exactly-representable integer sums."""
    from angle_spark.query.boolean import parse_query

    matches = "\n  UNION ALL\n  ".join(
        f"SELECT '{qid}' AS query_id, doc_id "
        f"FROM ({_bool_match_sql(parse_query(text))})"
        for qid, text, _k in query_set
    )
    toks_sql = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks_sql} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), matches AS (
  {matches}
), folded AS (
  SELECT m.query_id,
         count(*)::BIGINT AS n_docs,
         count(v.v)::BIGINT AS n_values,
         CAST(sum(v.v) AS DOUBLE) AS sum,
         CAST(min(v.v) AS DOUBLE) AS min,
         CAST(max(v.v) AS DOUBLE) AS max,
         CAST(sum(v.v * v.v) AS DOUBLE) AS sum_of_squares
  FROM (SELECT DISTINCT query_id, doc_id FROM matches) m
  LEFT JOIN (
    SELECT doc_id, CAST(n_chars AS DOUBLE) AS v
    FROM documents WHERE doc_id % 5 <> 4
  ) v ON v.doc_id = m.doc_id
  GROUP BY m.query_id
), derived AS (
  SELECT *,
         CASE WHEN n_values > 0 THEN
           greatest(0.0, (sum_of_squares - sum * sum / n_values) / n_values)
         END AS var_pop,
         CASE WHEN n_values >= 2 THEN
           greatest(0.0,
                    (sum_of_squares - sum * sum / n_values) / (n_values - 1))
         END AS var_samp
  FROM folded
)
SELECT query_id, n_docs, n_values, sum, min, max,
       round(sum / n_values, 6) AS avg,
       sum_of_squares,
       round(var_pop, 6) AS variance,
       round(var_samp, 6) AS variance_sampling,
       round(sqrt(var_pop), 6) AS std_deviation,
       round(sqrt(var_samp), 6) AS std_deviation_sampling,
       round(sum / n_values + 2.0 * sqrt(var_pop), 6) AS std_upper,
       round(sum / n_values - 2.0 * sqrt(var_pop), 6) AS std_lower
FROM derived
"""


# --- WEIGHTED average over matched docs (round 5, the Elasticsearch
#     ``weighted_avg`` aggregation): Σ(value·weight)/Σ(weight) per
#     query — value is n_chars (deterministically missing for doc_id %
#     5 == 4, exercising the ES skip rule), weight is 1 + doc_id % 3.
#     Two metrics can't ride the one side channel, so the collector
#     takes the membership route: one matched_ids pass + an equi-join
#     against the (value, weight) frame + a constant-size
#     sum-of-products fold. Integer-valued doubles keep the fold exact.
def q_bm25_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import weighted_avg_matches

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    docs = _read(spark, sf_dir, "documents")
    vals = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.when(
            (F.col("doc_id") % 5) != 4, F.col("n_chars").cast("double")
        ).alias("value"),
        (F.lit(1) + F.col("doc_id") % 3).cast("double").alias("weight"),
    )
    out = weighted_avg_matches(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, STATS_QUERY_SET),
        vals,
        mode="boolean",
    )
    return out.select(
        "query_id",
        "n_values",
        F.round("weighted_avg", 6).alias("weighted_avg"),
    )


def _weighted_avg_oracle_sql(query_set: list[tuple[str, str, int]]) -> str:
    """weighted_avg truth: the boolean membership CTEs joined to the
    (value, weight) columns, Σ(v·w)/Σ(w) with the ES skip rule (a doc
    missing its value contributes to nothing, not even n_values)."""
    from angle_spark.query.boolean import parse_query

    matches = "\n  UNION ALL\n  ".join(
        f"SELECT '{qid}' AS query_id, doc_id "
        f"FROM ({_bool_match_sql(parse_query(text))})"
        for qid, text, _k in query_set
    )
    toks_sql = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks_sql} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), matches AS (
  {matches}
), vw AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 <> 4 THEN CAST(n_chars AS DOUBLE) END AS v,
         CAST(1 + doc_id % 3 AS DOUBLE) AS w
  FROM documents
)
SELECT m.query_id,
       count(CASE WHEN vw.v IS NOT NULL AND vw.w IS NOT NULL
             THEN 1 END)::BIGINT AS n_values,
       round(sum(CASE WHEN vw.v IS NOT NULL THEN vw.v * vw.w END)
             / sum(CASE WHEN vw.v IS NOT NULL THEN vw.w END), 6)
         AS weighted_avg
FROM (SELECT DISTINCT query_id, doc_id FROM matches) m
LEFT JOIN vw ON vw.doc_id = m.doc_id
GROUP BY m.query_id
"""


# --- BUCKETED search-as-analytics (round 5, the Elasticsearch ``terms``
#     aggregation with a ``stats`` sub-aggregation): group_matches()
#     buckets each query's matched docs by a label column (lang here)
#     and folds a metric (n_chars, deterministically missing for
#     doc_id % 3 == 2 docs to exercise the ES missing rule) per bucket —
#     shards emit per-(query, bucket-code) fold partials over the
#     cogrouped side channel and a bucket-bounded merge replaces the
#     rank window; the hit list never materializes.
def q_bm25_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import group_matches

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    docs = _read(spark, sf_dir, "documents")
    groups = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), F.col("lang").alias("g")
    )
    vals = docs.filter((F.col("doc_id") % 3) != 2).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_chars").cast("double").alias("value"),
    )
    out = group_matches(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, STATS_QUERY_SET),
        groups,
        vals,
        mode="boolean",
    )
    return out.select(
        "query_id",
        F.col("group").alias("lang"),
        "n_docs",
        "n_values",
        F.col("sum").alias("sum"),
        F.col("min").alias("min"),
        F.col("max").alias("max"),
        F.round("avg", 6).alias("avg"),
    )


def _group_stats_oracle_sql(query_set: list[tuple[str, str, int]]) -> str:
    """Terms-agg truth: boolean membership CTEs joined to documents,
    grouped by lang; the metric is NULLed for doc_id % 3 == 2 docs so
    SQL's null-skipping aggregates replay the ES missing rule."""
    from angle_spark.query.boolean import parse_query

    matches = "\n  UNION ALL\n  ".join(
        f"SELECT '{qid}' AS query_id, doc_id "
        f"FROM ({_bool_match_sql(parse_query(text))})"
        for qid, text, _k in query_set
    )
    toks_sql = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks_sql} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), matches AS (
  {matches}
), vals AS (
  SELECT m.query_id, d.lang,
         CASE WHEN d.doc_id % 3 <> 2 THEN d.n_chars END AS v
  FROM (SELECT DISTINCT query_id, doc_id FROM matches) m
  JOIN documents d ON d.doc_id = m.doc_id
  WHERE d.lang IS NOT NULL
)
SELECT query_id, lang,
       count(*)::BIGINT AS n_docs,
       count(v)::BIGINT AS n_values,
       CAST(sum(v) AS DOUBLE) AS sum,
       CAST(min(v) AS DOUBLE) AS min,
       CAST(max(v) AS DOUBLE) AS max,
       round(CAST(sum(v) AS DOUBLE) / nullif(count(v), 0), 6) AS avg
FROM vals
GROUP BY query_id, lang
"""


# --- HISTOGRAM aggregation (round 5, ES ``histogram`` /
#     ``date_histogram`` analog): the same bucketed collector with a
#     computed numeric bucket label — matched-doc counts per 150-char
#     length band, counts-only shape (no metric sub-aggregation).
def q_bm25_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import group_matches

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    docs = _read(spark, sf_dir, "documents")
    groups = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.floor(F.col("n_chars") / F.lit(150)).cast("string").alias("bucket"),
    )
    out = group_matches(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, STATS_QUERY_SET),
        groups,
        mode="boolean",
    )
    return out.select("query_id", F.col("group").alias("bucket"), "n_docs")


# --- PIPELINE aggregations (round 5, the ES pipeline-agg family /
#     Kibana trend math — query/pipeline_aggs.py): cumulative_sum,
#     derivative and a 3-bucket moving average over each query's
#     length-band histogram, ordered by the NUMERIC band index. All
#     second-order windows over the bucket frame (queries x bands) —
#     no corpus node anywhere past the histogram itself.
def q_bm25_histogram_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.pipeline_aggs import (
        cumulative_sum,
        derivative,
        moving_avg,
    )
    from angle_spark.query.wand import group_matches

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    docs = _read(spark, sf_dir, "documents")
    groups = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.floor(F.col("n_chars") / F.lit(150)).cast("string").alias("bucket"),
    )
    hist = group_matches(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, STATS_QUERY_SET),
        groups,
        mode="boolean",
    ).select(
        "query_id",
        F.col("group").cast("long").alias("band"),
        "n_docs",
    )
    out = moving_avg(
        derivative(
            cumulative_sum(hist, "n_docs", "band"), "n_docs", "band"
        ),
        "n_docs",
        "band",
        window=3,
    )
    return out.select(
        "query_id",
        "band",
        "n_docs",
        F.col("cumulative").cast("long").alias("cumulative"),
        F.col("derivative").cast("long").alias("derivative"),
        F.round("moving_avg", 6).alias("moving_avg"),
    )


def _histogram_pipeline_oracle_sql(
    query_set: list[tuple[str, str, int]],
) -> str:
    """Pipeline truth: the histogram CTE + SQL window math — running
    sum, lag difference (NULL on each query's first band), trailing
    3-band unweighted average."""
    from angle_spark.query.boolean import parse_query

    matches = "\n  UNION ALL\n  ".join(
        f"SELECT '{qid}' AS query_id, doc_id "
        f"FROM ({_bool_match_sql(parse_query(text))})"
        for qid, text, _k in query_set
    )
    toks_sql = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks_sql} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), matches AS (
  {matches}
), hist AS (
  SELECT m.query_id,
         (d.n_chars // 150)::BIGINT AS band,
         count(*)::BIGINT AS n_docs
  FROM (SELECT DISTINCT query_id, doc_id FROM matches) m
  JOIN documents d ON d.doc_id = m.doc_id
  WHERE d.n_chars IS NOT NULL
  GROUP BY m.query_id, (d.n_chars // 150)
)
SELECT query_id, band, n_docs,
       sum(n_docs) OVER (PARTITION BY query_id ORDER BY band
                         ROWS UNBOUNDED PRECEDING)::BIGINT AS cumulative,
       (n_docs - lag(n_docs) OVER (PARTITION BY query_id ORDER BY band))::BIGINT
         AS derivative,
       round(avg(n_docs) OVER (PARTITION BY query_id ORDER BY band
                               ROWS 2 PRECEDING), 6) AS moving_avg
FROM hist
"""


# --- BOXPLOT aggregation (round 5, the ES boxplot agg): five-number
#     summary + Tukey whiskers over each query's matched metric —
#     lower/upper are the smallest/largest ACTUAL values inside the
#     [q1−1.5·IQR, q3+1.5·IQR] fence (ES's definition), quartiles are
#     exact linear interpolation (Spark percentile == DuckDB
#     quantile_cont, the percentiles-entry precedent). Metric
#     part-missing (doc_id % 5 == 4).
def q_bm25_boxplot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import boxplot_matches

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    docs = _read(spark, sf_dir, "documents")
    vals = docs.filter((F.col("doc_id") % 5) != 4).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_chars").cast("double").alias("value"),
    )
    out = boxplot_matches(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, STATS_QUERY_SET),
        vals,
        mode="boolean",
    )
    return out.select(
        "query_id",
        "n_values",
        "min",
        "max",
        F.round("q1", 6).alias("q1"),
        F.round("q2", 6).alias("q2"),
        F.round("q3", 6).alias("q3"),
        "lower",
        "upper",
    )


def _boxplot_oracle_sql(query_set: list[tuple[str, str, int]]) -> str:
    """Boxplot truth: quantile_cont quartiles per query over the
    part-missing metric + conditional min/max inside the 1.5·IQR
    fence."""
    from angle_spark.query.boolean import parse_query

    matches = "\n  UNION ALL\n  ".join(
        f"SELECT '{qid}' AS query_id, doc_id "
        f"FROM ({_bool_match_sql(parse_query(text))})"
        for qid, text, _k in query_set
    )
    toks_sql = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks_sql} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), matches AS (
  {matches}
), vals AS (
  SELECT m.query_id, CAST(d.n_chars AS DOUBLE) AS v
  FROM (SELECT DISTINCT query_id, doc_id FROM matches) m
  JOIN documents d ON d.doc_id = m.doc_id
  WHERE d.doc_id % 5 <> 4 AND d.n_chars IS NOT NULL
), quarts AS (
  SELECT query_id,
         count(*)::BIGINT AS n_values,
         min(v) AS min, max(v) AS max,
         quantile_cont(v, 0.25) AS q1,
         quantile_cont(v, 0.50) AS q2,
         quantile_cont(v, 0.75) AS q3
  FROM vals GROUP BY query_id
)
SELECT q.query_id, q.n_values, q.min, q.max,
       round(q.q1, 6) AS q1, round(q.q2, 6) AS q2, round(q.q3, 6) AS q3,
       min(CASE WHEN v.v >= q.q1 - 1.5 * (q.q3 - q.q1) THEN v.v END) AS lower,
       max(CASE WHEN v.v <= q.q3 + 1.5 * (q.q3 - q.q1) THEN v.v END) AS upper
FROM quarts q JOIN vals v ON v.query_id = q.query_id
GROUP BY q.query_id, q.n_values, q.min, q.max, q.q1, q.q2, q.q3
"""


# --- MULTI_TERMS aggregation (round 5, the ES multi_terms agg):
#     buckets keyed by a COMPOSITE of two fields (lang × source here) —
#     in this engine a multi_terms key is just a composed label column
#     feeding the same group_matches collector (ES builds the compound
#     key the same way internally); the '|' separator is unambiguous on
#     these vocabularies. Docs missing EITHER field drop (ES's
#     multi_terms rule — stricter than terms' per-field missing).
def q_bm25_multi_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import group_matches

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    docs = _read(spark, sf_dir, "documents")
    groups = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.when(
            F.col("lang").isNotNull() & F.col("source").isNotNull(),
            F.concat_ws("|", F.col("lang"), F.col("source")),
        ).alias("bucket"),
    )
    out = group_matches(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, STATS_QUERY_SET),
        groups,
        mode="boolean",
    )
    return out.select("query_id", F.col("group").alias("bucket"), "n_docs")


def _multi_terms_oracle_sql(query_set: list[tuple[str, str, int]]) -> str:
    """multi_terms truth: membership CTEs counted per (lang, source)
    compound key, both fields required."""
    from angle_spark.query.boolean import parse_query

    matches = "\n  UNION ALL\n  ".join(
        f"SELECT '{qid}' AS query_id, doc_id "
        f"FROM ({_bool_match_sql(parse_query(text))})"
        for qid, text, _k in query_set
    )
    toks_sql = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks_sql} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), matches AS (
  {matches}
)
SELECT m.query_id,
       d.lang || '|' || d.source AS bucket,
       count(*)::BIGINT AS n_docs
FROM (SELECT DISTINCT query_id, doc_id FROM matches) m
JOIN documents d ON d.doc_id = m.doc_id
WHERE d.lang IS NOT NULL AND d.source IS NOT NULL
GROUP BY m.query_id, bucket
"""


# --- TOP_METRICS aggregation (round 5, the ES top_metrics agg): the
#     metric values AT the top-2 docs by n_chars DESC per query —
#     sort-by-field selection + the broadcast hydration join; metrics
#     here are a keyword (lang) and a numeric (n_chars % 64) column.
def q_bm25_top_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import top_metrics_matches

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    docs = _read(spark, sf_dir, "documents")
    sort = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_chars").cast("double").alias("key"),
    )
    metrics = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("lang").alias("lang"),
        (F.col("n_chars") % 64).cast("long").alias("m_num"),
    )
    out = top_metrics_matches(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, STATS_QUERY_SET),
        sort,
        metrics,
        size=2,
        mode="boolean",
    )
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.col("sort_value").alias("sort_value"),
        "lang",
        "m_num",
    )


def _top_metrics_oracle_sql(query_set: list[tuple[str, str, int]]) -> str:
    """top_metrics truth: membership CTEs ranked by (n_chars DESC,
    doc_id ASC), cut at 2, joined back to the metric columns."""
    from angle_spark.query.boolean import parse_query

    matches = "\n  UNION ALL\n  ".join(
        f"SELECT '{qid}' AS query_id, doc_id "
        f"FROM ({_bool_match_sql(parse_query(text))})"
        for qid, text, _k in query_set
    )
    toks_sql = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks_sql} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), matches AS (
  {matches}
), ranked AS (
  SELECT m.query_id, m.doc_id,
         CAST(d.n_chars AS DOUBLE) AS sort_value,
         d.lang, (d.n_chars % 64)::BIGINT AS m_num,
         row_number() OVER (
           PARTITION BY m.query_id
           ORDER BY d.n_chars DESC, m.doc_id ASC) AS rnk
  FROM (SELECT DISTINCT query_id, doc_id FROM matches) m
  JOIN documents d ON d.doc_id = m.doc_id
)
SELECT query_id, rnk::BIGINT AS rank, doc_id, sort_value, lang, m_num
FROM ranked WHERE rnk <= 2
"""


# --- STRING_STATS aggregation (round 5, the ES string_stats agg):
#     length stats + Shannon entropy (log2) of the character
#     distribution of a string field over matched docs — the
#     repetitiveness/data-quality scan. Field = documents.text, made
#     part-missing (doc_id % 7 == 6 -> NULL) to exercise the ES
#     missing rules. The per-char explode aggregates map-side, so the
#     shuffle is (queries x alphabet) rows.
def q_bm25_string_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import string_stats_matches

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    docs = _read(spark, sf_dir, "documents")
    texts = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.when((F.col("doc_id") % 7) != 6, F.col("text")).alias("s"),
    )
    out = string_stats_matches(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, STATS_QUERY_SET),
        texts,
        mode="boolean",
    )
    return out.select(
        "query_id",
        "n_values",
        "min_length",
        "max_length",
        F.round("avg_length", 6).alias("avg_length"),
        F.round("entropy", 6).alias("entropy"),
    )


def _string_stats_oracle_sql(query_set: list[tuple[str, str, int]]) -> str:
    """string_stats truth: membership CTEs joined to the part-missing
    text field; length stats per query + -Σ p·log2(p) over the
    per-(query, char) counts."""
    from angle_spark.query.boolean import parse_query

    matches = "\n  UNION ALL\n  ".join(
        f"SELECT '{qid}' AS query_id, doc_id "
        f"FROM ({_bool_match_sql(parse_query(text))})"
        for qid, text, _k in query_set
    )
    toks_sql = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks_sql} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), matches AS (
  {matches}
), txt AS (
  SELECT m.query_id,
         CASE WHEN d.doc_id % 7 <> 6 THEN d.text END AS s
  FROM (SELECT DISTINCT query_id, doc_id FROM matches) m
  JOIN documents d ON d.doc_id = m.doc_id
), lens AS (
  SELECT query_id,
         count(s)::BIGINT AS n_values,
         min(length(s))::BIGINT AS min_length,
         max(length(s))::BIGINT AS max_length,
         avg(length(s)) AS avg_length
  FROM txt GROUP BY query_id
), chars AS (
  SELECT query_id, ch, count(*)::DOUBLE AS c
  FROM (SELECT query_id, unnest(string_split(s, '')) AS ch
        FROM txt WHERE s IS NOT NULL)
  WHERE ch <> ''
  GROUP BY query_id, ch
), ent AS (
  SELECT query_id,
         sum(-(c / tot) * log2(c / tot)) AS entropy
  FROM (SELECT query_id, c,
               sum(c) OVER (PARTITION BY query_id) AS tot
        FROM chars)
  GROUP BY query_id
)
SELECT l.query_id, l.n_values, l.min_length, l.max_length,
       round(l.avg_length, 6) AS avg_length,
       round(e.entropy, 6) AS entropy
FROM lens l LEFT JOIN ent e ON e.query_id = l.query_id
"""


# --- MAD aggregation (round 5, ES median_absolute_deviation): the
#     robust dispersion companion — mad = median(|v − median(v)|),
#     both medians exact (the boxplot precedent); part-missing metric.
def q_bm25_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import mad_matches

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    docs = _read(spark, sf_dir, "documents")
    vals = docs.filter((F.col("doc_id") % 5) != 4).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_chars").cast("double").alias("value"),
    )
    out = mad_matches(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, STATS_QUERY_SET),
        vals,
        mode="boolean",
    )
    return out.select(
        "query_id",
        "n_values",
        F.round("median", 6).alias("median"),
        F.round("mad", 6).alias("mad"),
    )


def _mad_oracle_sql(query_set: list[tuple[str, str, int]]) -> str:
    """MAD truth: quantile_cont median per query, then quantile_cont of
    the absolute deviations from it."""
    from angle_spark.query.boolean import parse_query

    matches = "\n  UNION ALL\n  ".join(
        f"SELECT '{qid}' AS query_id, doc_id "
        f"FROM ({_bool_match_sql(parse_query(text))})"
        for qid, text, _k in query_set
    )
    toks_sql = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks_sql} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), matches AS (
  {matches}
), vals AS (
  SELECT m.query_id, CAST(d.n_chars AS DOUBLE) AS v
  FROM (SELECT DISTINCT query_id, doc_id FROM matches) m
  JOIN documents d ON d.doc_id = m.doc_id
  WHERE d.doc_id % 5 <> 4 AND d.n_chars IS NOT NULL
), meds AS (
  SELECT query_id, count(*)::BIGINT AS n_values,
         quantile_cont(v, 0.5) AS median
  FROM vals GROUP BY query_id
)
SELECT m.query_id, m.n_values,
       round(m.median, 6) AS median,
       round(quantile_cont(abs(v.v - m.median), 0.5), 6) AS mad
FROM meds m JOIN vals v ON v.query_id = m.query_id
GROUP BY m.query_id, m.n_values, m.median
"""


# --- T-TEST aggregation (round 5, the Elasticsearch ``t_test``
#     agg): Student's t between two numeric doc fields over each
#     query's matched docs — welch (ES default) and paired, unioned
#     with a test_type tag. Metric a = n_chars (missing for doc_id % 5
#     == 4 — the unpaired variants use each field's own rows, paired
#     demands both), metric b = (doc_id·13) % 211 + 100 (always
#     present, SQL-replicable). Variances use the explicit
#     (Σx² − (Σx)²/n)/(n−1) association on exactly-representable
#     integer sums, so the oracle matches beyond round(6). The p-value
#     is deliberately not emitted (no t-CDF in the oracle engine — the
#     matrix_stats skew/kurtosis precedent); (t, dof) is sufficient.
def q_bm25_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import t_test_matches

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    docs = _read(spark, sf_dir, "documents")
    vals = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.when(
            (F.col("doc_id") % 5) != 4, F.col("n_chars").cast("double")
        ).alias("a"),
        ((F.col("doc_id") * 13) % 211 + 100).cast("double").alias("b"),
    )
    frames = []
    for tt in ("welch", "paired"):
        frames.append(
            t_test_matches(
                spark,
                merged,
                tstats,
                meta,
                _doc_queries_df(spark, STATS_QUERY_SET),
                vals,
                test_type=tt,
                mode="boolean",
            ).withColumn("test_type", F.lit(tt))
        )
    out = frames[0].unionByName(frames[1])
    return out.select(
        "test_type",
        "query_id",
        "n_a",
        "n_b",
        F.round("mean_a", 6).alias("mean_a"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round("t_value", 6).alias("t_value"),
        F.round("dof", 6).alias("dof"),
    )


def _t_test_oracle_sql(query_set: list[tuple[str, str, int]]) -> str:
    """t_test truth: membership CTEs joined to the two metrics; welch
    and paired statistics from the engine's exact expressions."""
    from angle_spark.query.boolean import parse_query

    matches = "\n  UNION ALL\n  ".join(
        f"SELECT '{qid}' AS query_id, doc_id "
        f"FROM ({_bool_match_sql(parse_query(text))})"
        for qid, text, _k in query_set
    )
    toks_sql = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks_sql} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), matches AS (
  {matches}
), vw AS (
  SELECT m.query_id,
         CASE WHEN d.doc_id % 5 <> 4 THEN CAST(d.n_chars AS DOUBLE) END AS a,
         CAST((d.doc_id * 13) % 211 + 100 AS DOUBLE) AS b
  FROM (SELECT DISTINCT query_id, doc_id FROM matches) m
  JOIN documents d ON d.doc_id = m.doc_id
), welch0 AS (
  SELECT query_id,
         count(a)::BIGINT AS n_a, sum(a) AS s_a, sum(a*a) AS ss_a,
         count(b)::BIGINT AS n_b, sum(b) AS s_b, sum(b*b) AS ss_b
  FROM vw GROUP BY query_id
), welch1 AS (
  SELECT query_id, n_a, n_b,
         s_a / n_a AS mean_a, s_b / n_b AS mean_b,
         greatest(0.0, (ss_a - s_a*s_a/n_a) / (n_a - 1)) / n_a AS sea,
         greatest(0.0, (ss_b - s_b*s_b/n_b) / (n_b - 1)) / n_b AS seb
  FROM welch0 WHERE n_a >= 2 AND n_b >= 2
), welch AS (
  SELECT 'welch' AS test_type, query_id, n_a, n_b,
         round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
         round(CASE WHEN sea + seb > 0 THEN
           (mean_a - mean_b) / sqrt(sea + seb) END, 6) AS t_value,
         round(CASE WHEN sea + seb > 0 AND (sea > 0 OR seb > 0) THEN
           (sea + seb) * (sea + seb)
           / (sea*sea/(n_a - 1) + seb*seb/(n_b - 1)) END, 6) AS dof
  FROM welch1
), paired0 AS (
  SELECT query_id,
         count(*)::BIGINT AS n,
         sum(a - b) AS s_d, sum((a - b) * (a - b)) AS ss_d,
         sum(a) AS s_a, sum(b) AS s_b
  FROM vw WHERE a IS NOT NULL AND b IS NOT NULL
  GROUP BY query_id
), paired AS (
  SELECT 'paired' AS test_type, query_id, n AS n_a, n AS n_b,
         round(s_a / n, 6) AS mean_a, round(s_b / n, 6) AS mean_b,
         round(CASE WHEN n >= 2
                     AND greatest(0.0, (ss_d - s_d*s_d/n)/(n - 1)) > 0
           THEN (s_d / n)
                / sqrt(greatest(0.0, (ss_d - s_d*s_d/n)/(n - 1)) / n)
           END, 6) AS t_value,
         round(CASE WHEN n >= 2
                     AND greatest(0.0, (ss_d - s_d*s_d/n)/(n - 1)) > 0
           THEN CAST(n - 1 AS DOUBLE) END, 6) AS dof
  FROM paired0
)
SELECT * FROM welch UNION ALL SELECT * FROM paired
"""


# --- PERCENTILE RANKS (round 5, the ES percentile_ranks aggregation —
#     inverse percentiles): % of each query's matched metric values <=
#     each check value, exact (100·|{v<=x}|/n — ES estimates the same
#     quantity with a t-digest; exact is the oracle-assertable default,
#     the cardinality precedent). Metric part-missing (doc_id % 5 == 4)
#     so the skip rule is load-bearing.
PCTRANK_AT = (200.0, 500.0, 900.0)


def q_bm25_percentile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import percentile_rank_matches

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    docs = _read(spark, sf_dir, "documents")
    vals = docs.filter((F.col("doc_id") % 5) != 4).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_chars").cast("double").alias("value"),
    )
    out = percentile_rank_matches(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, STATS_QUERY_SET),
        vals,
        PCTRANK_AT,
        mode="boolean",
    )
    return out.select(
        "query_id", "at_value", F.round("pct", 6).alias("pct")
    )


def _percentile_ranks_oracle_sql(
    query_set: list[tuple[str, str, int]], at_values: tuple[float, ...]
) -> str:
    """percentile_ranks truth: membership CTEs joined to the
    part-missing metric, 100·count(v<=x)/count(v) per (query, x)."""
    from angle_spark.query.boolean import parse_query

    matches = "\n  UNION ALL\n  ".join(
        f"SELECT '{qid}' AS query_id, doc_id "
        f"FROM ({_bool_match_sql(parse_query(text))})"
        for qid, text, _k in query_set
    )
    ats = ", ".join(f"({x!r}::DOUBLE)" for x in at_values)
    toks_sql = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks_sql} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), matches AS (
  {matches}
), vals AS (
  SELECT m.query_id, CAST(d.n_chars AS DOUBLE) AS v
  FROM (SELECT DISTINCT query_id, doc_id FROM matches) m
  JOIN documents d ON d.doc_id = m.doc_id
  WHERE d.doc_id % 5 <> 4 AND d.n_chars IS NOT NULL
), ats AS (
  SELECT * FROM (VALUES {ats}) a(at_value)
)
SELECT v.query_id, a.at_value,
       round(100.0 * count(CASE WHEN v.v <= a.at_value THEN 1 END)
             / count(*), 6) AS pct
FROM vals v CROSS JOIN ats a
GROUP BY v.query_id, a.at_value
"""


# --- MOVING FUNCTION pipeline agg (round 5, ES moving_fn — the
#     generalization that replaced moving_avg in ES 7): trailing max
#     and sample-stddev windows over the length-band histogram; stddev
#     is NULL on each query's first band (single-row window — the NaN
#     ES emits, SQL-comparable).
def q_bm25_moving_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.pipeline_aggs import moving_fn
    from angle_spark.query.wand import group_matches

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    docs = _read(spark, sf_dir, "documents")
    groups = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.floor(F.col("n_chars") / F.lit(150)).cast("string").alias("bucket"),
    )
    hist = group_matches(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, STATS_QUERY_SET),
        groups,
        mode="boolean",
    ).select("query_id", F.col("group").cast("long").alias("band"), "n_docs")
    out = moving_fn(
        moving_fn(hist, "n_docs", "band", window=3, fn="max", out_col="mov_max"),
        "n_docs", "band", window=3, fn="stddev", out_col="mov_std",
    )
    return out.select(
        "query_id",
        "band",
        "n_docs",
        F.col("mov_max").cast("long").alias("mov_max"),
        F.round("mov_std", 6).alias("mov_std"),
    )


def _moving_fn_oracle_sql(query_set: list[tuple[str, str, int]]) -> str:
    """moving_fn truth: trailing 3-band max and stddev_samp windows
    over the histogram CTE."""
    from angle_spark.query.boolean import parse_query

    matches = "\n  UNION ALL\n  ".join(
        f"SELECT '{qid}' AS query_id, doc_id "
        f"FROM ({_bool_match_sql(parse_query(text))})"
        for qid, text, _k in query_set
    )
    toks_sql = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks_sql} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), matches AS (
  {matches}
), hist AS (
  SELECT m.query_id,
         (d.n_chars // 150)::BIGINT AS band,
         count(*)::BIGINT AS n_docs
  FROM (SELECT DISTINCT query_id, doc_id FROM matches) m
  JOIN documents d ON d.doc_id = m.doc_id
  WHERE d.n_chars IS NOT NULL
  GROUP BY m.query_id, (d.n_chars // 150)
)
SELECT query_id, band, n_docs,
       max(n_docs) OVER (PARTITION BY query_id ORDER BY band
                         ROWS 2 PRECEDING)::BIGINT AS mov_max,
       round(stddev_samp(n_docs) OVER (
         PARTITION BY query_id ORDER BY band ROWS 2 PRECEDING), 6)
         AS mov_std
FROM hist
"""


# --- SIBLING pipeline aggregation (round 5, ES stats_bucket — the
#     avg_bucket / sum_bucket / min_bucket / max_bucket family as one
#     frame): per-query stats over the histogram's bucket metric; the
#     input frame is (queries x bands), so the fold is metadata-sized.
def q_bm25_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.pipeline_aggs import stats_bucket
    from angle_spark.query.wand import group_matches

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    docs = _read(spark, sf_dir, "documents")
    groups = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.floor(F.col("n_chars") / F.lit(150)).cast("string").alias("bucket"),
    )
    hist = group_matches(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, STATS_QUERY_SET),
        groups,
        mode="boolean",
    ).select("query_id", F.col("group").cast("long").alias("band"), "n_docs")
    out = stats_bucket(hist, "n_docs")
    return out.select(
        "query_id",
        "n_buckets",
        F.col("sum").cast("long").alias("sum"),
        F.col("min").cast("long").alias("min"),
        F.col("max").cast("long").alias("max"),
        F.round("avg", 6).alias("avg"),
    )


def _bucket_stats_oracle_sql(query_set: list[tuple[str, str, int]]) -> str:
    """stats_bucket truth: the histogram CTE folded per query with
    plain SQL aggregates over the bucket counts."""
    from angle_spark.query.boolean import parse_query

    matches = "\n  UNION ALL\n  ".join(
        f"SELECT '{qid}' AS query_id, doc_id "
        f"FROM ({_bool_match_sql(parse_query(text))})"
        for qid, text, _k in query_set
    )
    toks_sql = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks_sql} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), matches AS (
  {matches}
), hist AS (
  SELECT m.query_id,
         (d.n_chars // 150)::BIGINT AS band,
         count(*)::BIGINT AS n_docs
  FROM (SELECT DISTINCT query_id, doc_id FROM matches) m
  JOIN documents d ON d.doc_id = m.doc_id
  WHERE d.n_chars IS NOT NULL
  GROUP BY m.query_id, (d.n_chars // 150)
)
SELECT query_id,
       count(*)::BIGINT AS n_buckets,
       sum(n_docs)::BIGINT AS sum,
       min(n_docs)::BIGINT AS min,
       max(n_docs)::BIGINT AS max,
       round(avg(n_docs), 6) AS avg
FROM hist GROUP BY query_id
"""


# --- BUCKET truncation + seasonal differencing (round 5, ES
#     bucket_sort + serial_diff): serial_diff(lag=2) runs FIRST in band
#     order (differencing needs the calendar axis), then bucket_sort
#     keeps metric ranks (1, 4] per query — `from`=1 skips each query's
#     densest band, exercising both cut parameters; the deterministic
#     tie-break (band ASC) is what lets an oracle pin the cut at all.
def q_bm25_bucket_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.pipeline_aggs import bucket_sort, serial_diff
    from angle_spark.query.wand import group_matches

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    docs = _read(spark, sf_dir, "documents")
    groups = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.floor(F.col("n_chars") / F.lit(150)).cast("string").alias("bucket"),
    )
    hist = group_matches(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, STATS_QUERY_SET),
        groups,
        mode="boolean",
    ).select("query_id", F.col("group").cast("long").alias("band"), "n_docs")
    out = bucket_sort(
        serial_diff(hist, "n_docs", "band", lag=2),
        sort_col="n_docs",
        order_col="band",
        size=3,
        frm=1,
    )
    return out.select(
        "query_id",
        "band",
        "n_docs",
        F.col("serial_diff").cast("long").alias("serial_diff"),
    )


def _bucket_sort_oracle_sql(query_set: list[tuple[str, str, int]]) -> str:
    """bucket_sort + serial_diff truth: lag-2 difference over the band
    axis, then the (n_docs DESC, band ASC) rank window cut to (1, 4]."""
    from angle_spark.query.boolean import parse_query

    matches = "\n  UNION ALL\n  ".join(
        f"SELECT '{qid}' AS query_id, doc_id "
        f"FROM ({_bool_match_sql(parse_query(text))})"
        for qid, text, _k in query_set
    )
    toks_sql = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks_sql} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), matches AS (
  {matches}
), hist AS (
  SELECT m.query_id,
         (d.n_chars // 150)::BIGINT AS band,
         count(*)::BIGINT AS n_docs
  FROM (SELECT DISTINCT query_id, doc_id FROM matches) m
  JOIN documents d ON d.doc_id = m.doc_id
  WHERE d.n_chars IS NOT NULL
  GROUP BY m.query_id, (d.n_chars // 150)
), diffed AS (
  SELECT *,
         (n_docs - lag(n_docs, 2) OVER (
            PARTITION BY query_id ORDER BY band))::BIGINT AS serial_diff
  FROM hist
), ranked AS (
  SELECT *,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY n_docs DESC, band ASC) AS rnk
  FROM diffed
)
SELECT query_id, band, n_docs, serial_diff
FROM ranked WHERE rnk > 1 AND rnk <= 4
"""


def _histogram_oracle_sql(query_set: list[tuple[str, str, int]]) -> str:
    """Histogram truth: membership CTEs counted per 150-char length
    band (integer floor division — exact on BIGINT n_chars)."""
    from angle_spark.query.boolean import parse_query

    matches = "\n  UNION ALL\n  ".join(
        f"SELECT '{qid}' AS query_id, doc_id "
        f"FROM ({_bool_match_sql(parse_query(text))})"
        for qid, text, _k in query_set
    )
    toks_sql = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks_sql} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), matches AS (
  {matches}
)
SELECT m.query_id,
       CAST(d.n_chars // 150 AS VARCHAR) AS bucket,
       count(*)::BIGINT AS n_docs
FROM (SELECT DISTINCT query_id, doc_id FROM matches) m
JOIN documents d ON d.doc_id = m.doc_id
WHERE d.n_chars IS NOT NULL
GROUP BY m.query_id, bucket
"""


# --- DATE_HISTOGRAM aggregation (round 5, the Elasticsearch
#     ``date_histogram`` with ``calendar_interval: month`` — the most
#     used ES aggregation): matched-doc counts per calendar month.
#     ``documents`` carries no timestamp, so the entry materializes a
#     deterministic ingest timestamp (doc_id-derived day offset from a
#     fixed epoch) with the SAME expression on both sides — the thing
#     under test is the calendar bucketing of the matched set, not the
#     clock. Same one-pass group_matches collector as the numeric
#     histogram: bucket labels are computed in the corpus scan
#     (codegen date_trunc), matches count per (query, month) with no
#     per-doc rows leaving the shards.
def q_bm25_date_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import group_matches

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    docs = _read(spark, sf_dir, "documents")
    groups = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.date_format(
            F.date_trunc(
                "month",
                F.expr(
                    "timestamp'2026-01-01' + make_interval(0, 0, 0, "
                    "CAST(doc_id % 360 AS INT))"
                ),
            ),
            "yyyy-MM-dd",
        ).alias("bucket"),
    )
    out = group_matches(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, STATS_QUERY_SET),
        groups,
        mode="boolean",
    )
    return out.select("query_id", F.col("group").alias("month"), "n_docs")


def _date_histogram_oracle_sql(query_set: list[tuple[str, str, int]]) -> str:
    """Calendar truth: membership CTEs counted per month-truncated
    ingest timestamp — the identical doc_id-derived expression."""
    from angle_spark.query.boolean import parse_query

    matches = "\n  UNION ALL\n  ".join(
        f"SELECT '{qid}' AS query_id, doc_id "
        f"FROM ({_bool_match_sql(parse_query(text))})"
        for qid, text, _k in query_set
    )
    toks_sql = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks_sql} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), matches AS (
  {matches}
)
SELECT m.query_id,
       strftime(date_trunc('month',
                TIMESTAMP '2026-01-01'
                + (m.doc_id % 360) * INTERVAL 1 DAY), '%Y-%m-%d') AS month,
       count(*)::BIGINT AS n_docs
FROM (SELECT DISTINCT query_id, doc_id FROM matches) m
GROUP BY m.query_id, month
"""


# --- RANGE aggregation (round 5, the Elasticsearch ``range``
#     aggregation): matched-doc counts per explicit half-open
#     [from, to) band over a numeric doc value, ES bucket-key
#     convention ("*-200", "200-500", "500-*"); docs with a NULL
#     metric fall in no bucket (the ES rule — range has no ``missing``
#     default). The band edges live in ONE codegen CASE in the corpus
#     scan; the collector is the same counts-only group_matches pass.
RANGE_AGG_EDGES = (200, 500)


def _range_bucket_col() -> Column:
    lo, hi = RANGE_AGG_EDGES
    n = F.col("n_chars")
    return (
        F.when(n.isNull(), F.lit(None).cast("string"))
        .when(n < lo, F.lit(f"*-{lo}"))
        .when(n < hi, F.lit(f"{lo}-{hi}"))
        .otherwise(F.lit(f"{hi}-*"))
    )


def q_bm25_range_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import group_matches

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    docs = _read(spark, sf_dir, "documents")
    groups = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        _range_bucket_col().alias("bucket"),
    ).filter(F.col("bucket").isNotNull())
    out = group_matches(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, STATS_QUERY_SET),
        groups,
        mode="boolean",
    )
    return out.select("query_id", F.col("group").alias("bucket"), "n_docs")


def _range_agg_oracle_sql(query_set: list[tuple[str, str, int]]) -> str:
    """Range truth: membership CTEs counted per explicit band CASE —
    the same half-open edges, NULL metric rows dropped."""
    from angle_spark.query.boolean import parse_query

    lo, hi = RANGE_AGG_EDGES
    matches = "\n  UNION ALL\n  ".join(
        f"SELECT '{qid}' AS query_id, doc_id "
        f"FROM ({_bool_match_sql(parse_query(text))})"
        for qid, text, _k in query_set
    )
    toks_sql = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks_sql} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), matches AS (
  {matches}
)
SELECT m.query_id,
       CASE WHEN d.n_chars < {lo} THEN '*-{lo}'
            WHEN d.n_chars < {hi} THEN '{lo}-{hi}'
            ELSE '{hi}-*' END AS bucket,
       count(*)::BIGINT AS n_docs
FROM (SELECT DISTINCT query_id, doc_id FROM matches) m
JOIN documents d ON d.doc_id = m.doc_id
WHERE d.n_chars IS NOT NULL
GROUP BY m.query_id, bucket
"""


# --- PERCENTILES aggregation (round 5, the Elasticsearch
#     ``percentiles`` aggregation): exact p25/p50/p75/p95 of a metric
#     over each query's matched docs. Order statistics don't fold into
#     constant partials, so shards emit one (query, value) row per
#     matched doc WITH a value (collector="values" — O(matches) narrow
#     rows) and one exact percentile aggregate per query replaces the
#     rank window; Spark's exact ``percentile`` and DuckDB's
#     quantile_cont share the linear-interpolation definition, so the
#     oracle matches bitwise after round(6). The metric is n_chars,
#     deterministically missing for doc_id % 3 == 2 (the ES missing
#     rule — skipped entirely). percentile_matches(exact=False) is the
#     disclosed t-digest-style sketch for huge match sets.
def q_bm25_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import percentile_matches

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    docs = _read(spark, sf_dir, "documents")
    vals = docs.filter((F.col("doc_id") % 3) != 2).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_chars").cast("double").alias("value"),
    )
    out = percentile_matches(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, STATS_QUERY_SET),
        vals,
        percentiles=(0.25, 0.5, 0.75, 0.95),
        mode="boolean",
    )
    return out.select(
        "query_id", "pct", F.round("value", 6).alias("value")
    )


def _percentiles_oracle_sql(query_set: list[tuple[str, str, int]]) -> str:
    """Percentiles truth: boolean membership CTEs joined to the metric
    (missing for doc_id % 3 == 2), one quantile_cont per requested pct
    — the same linear-interpolation definition Spark's exact percentile
    uses."""
    from angle_spark.query.boolean import parse_query

    matches = "\n  UNION ALL\n  ".join(
        f"SELECT '{qid}' AS query_id, doc_id "
        f"FROM ({_bool_match_sql(parse_query(text))})"
        for qid, text, _k in query_set
    )
    toks_sql = duckdb_tokens_sql("text")
    arms = "\nUNION ALL\n".join(
        f"SELECT query_id, CAST({p} AS DOUBLE) AS pct, "
        f"round(quantile_cont(v, {p}), 6) AS value FROM mv GROUP BY query_id"
        for p in (0.25, 0.5, 0.75, 0.95)
    )
    return f"""
WITH docs AS (
  SELECT doc_id, {toks_sql} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), matches AS (
  {matches}
), mv AS (
  SELECT m.query_id, CAST(d.n_chars AS DOUBLE) AS v
  FROM (SELECT DISTINCT query_id, doc_id FROM matches) m
  JOIN documents d ON d.doc_id = m.doc_id
  WHERE (d.doc_id % 3) != 2
)
{arms}
"""


# --- MULTI-INDEX SEARCH with merged statistics (round 5, ES
#     `GET /a,b/_search` + search_type=dfs_query_then_fetch —
#     query/multi_index.py): the documents corpus split into TWO
#     physical indexes by docID range (each index's docID space is
#     dense-from-zero per the build contract; id_offsets map back), the
#     DFS phase merges df/N/avgdl, and the fused ranking must equal the
#     SINGLE full-corpus index's ranking bitwise — so the oracle is the
#     standard single-index BM25 oracle, unchanged.
def _cached_split_indexes(spark: SparkSession, sf_dir: str):
    import os
    import tempfile

    from angle_spark.index.build import build_index

    key = (sf_dir, "split2")
    cached = _INDEX_CACHE.get(key)
    if cached is not None and os.path.exists(
        os.path.join(cached[0], "corpus_stats.json")
    ):
        return cached
    docs = with_tokens(_read(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("long").alias("doc_id"), "tokens", "dl"
    )
    n = docs.count()
    cut = n // 2
    halves = []
    for lo, hi, shift in ((0, cut, 0), (cut, n, cut)):
        part = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).withColumn("doc_id", F.col("doc_id") - F.lit(shift))
        d = tempfile.mkdtemp(prefix=f"msearch_idx_{lo}_")
        build_index(
            spark, part, d, segment_docs=128, block_size=16, batch_segments=4096
        )
        halves.append(d)
    cached = (halves[0], halves[1], cut)
    _INDEX_CACHE[key] = cached
    return cached


def q_msearch_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.query.multi_index import search_indices

    dir_a, dir_b, cut = _cached_split_indexes(spark, sf_dir)
    out = search_indices(
        spark,
        [dir_a, dir_b],
        _doc_queries_df(spark),
        dfs=True,
        id_offsets={dir_b: cut},
    )
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


# --- INDEX ALIAS SEARCH (round 5, the ES alias + rollover shape —
#     index/alias.py): the same two split physical indexes joined under
#     ONE durable alias file (gen0 created first, gen1 rolled in as the
#     write index; offsets auto-assign from the running doc watermark).
#     search_alias fans out through the merged-DFS multi-index path, so
#     the alias must answer identically to the single full-corpus index
#     — the oracle is again the standard single-index BM25 oracle.
def q_alias_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from angle_spark.index.alias import add_index, create_alias, search_alias

    dir_a, dir_b, _cut = _cached_split_indexes(spark, sf_dir)
    key = (sf_dir, "alias")
    path = _INDEX_CACHE.get(key)
    if path is None or not os.path.exists(path):
        path = os.path.join(
            tempfile.mkdtemp(prefix="alias_entry_"), "docs.alias.json"
        )
        create_alias(spark, path, dir_a)
        add_index(spark, path, dir_b, write=True)
        _INDEX_CACHE[key] = path
    out = search_alias(spark, path, _doc_queries_df(spark))
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


# --- RANK_EVAL (round 5, the ES _rank_eval API / standard IR metrics —
#     the evaluation gate the reference runs over retrieval prompts,
#     reference tests/test_eval.py:4-20): precision@10 / recall@10 /
#     MRR / exponential-gain NDCG@10 of the boolean BM25 ranking
#     against deterministic graded judgments (grade = (doc*13 + q*7) %
#     4 over every doc, relevant iff grade >= 1). All frames are
#     metadata-sized; the oracle recomputes the ranking AND the metric
#     algebra from the shared scoring CTEs.
RANK_EVAL_K = 10


def q_bm25_rank_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.operators.evaluate import rank_eval
    from angle_spark.query.wand import wand_topk

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    re_set = [(q, t, RANK_EVAL_K) for q, t, _k in STATS_QUERY_SET]
    results = wand_topk(
        spark, merged, tstats, meta, _doc_queries_df(spark, re_set),
        mode="boolean",
    )
    docs = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id")
    )
    qnums = spark.createDataFrame(
        [(qid, i + 1) for i, (qid, _t, _k) in enumerate(STATS_QUERY_SET)],
        "query_id string, qnum int",
    )
    judgments = qnums.crossJoin(docs).select(
        "query_id",
        "doc_id",
        ((F.col("doc_id") * 13 + F.col("qnum") * 7) % 4)
        .cast("double")
        .alias("grade"),
    )
    out = rank_eval(results, judgments, k=RANK_EVAL_K)
    return out.select(
        "query_id",
        F.col("retrieved").cast("long").alias("retrieved"),
        "n_relevant",
        F.round("precision_at_k", 6).alias("precision_at_k"),
        F.round("recall_at_k", 6).alias("recall_at_k"),
        F.round("mrr", 6).alias("mrr"),
        F.round("dcg_at_k", 6).alias("dcg_at_k"),
        F.round("idcg_at_k", 6).alias("idcg_at_k"),
        F.round("ndcg_at_k", 6).alias("ndcg_at_k"),
    )


def _rank_eval_oracle_sql(query_set: list[tuple[str, str, int]]) -> str:
    """Rank-eval truth: the boolean scored CTEs cut at k, the same
    deterministic judgments, and the metric algebra in SQL."""
    k = RANK_EVAL_K
    matches, qterms, boosted = _bool_membership_and_qterms(
        [(q, t, k) for q, t, _k in query_set]
    )
    boost_factor = " * qt.boost" if boosted else ""
    qnum_rows = ", ".join(
        f"('{qid}', {i + 1})" for i, (qid, _t, _k) in enumerate(query_set)
    )
    toks = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS tokens FROM documents
), dl AS (
  SELECT doc_id, len(tokens)::BIGINT AS dl FROM docs
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), stats AS (
  SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM dl
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), matches AS (
  {matches}
), qterms AS (
  {qterms}
), scored AS (
  SELECT m.query_id, m.doc_id,
         sum( ln((s.n_docs - dft.df + 0.5) / (dft.df + 0.5) + 1.0){boost_factor}
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) ) AS raw
  FROM (SELECT DISTINCT query_id, doc_id FROM matches) m
  JOIN qterms qt ON qt.query_id = m.query_id
  JOIN tf  ON tf.doc_id = m.doc_id AND tf.term = qt.term
  JOIN dft ON dft.term = qt.term
  JOIN dl  ON dl.doc_id = m.doc_id
  CROSS JOIN stats s
  GROUP BY m.query_id, m.doc_id
), ranked AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY raw DESC, doc_id ASC) AS rnk
  FROM scored
), results AS (
  SELECT query_id, doc_id, rnk FROM ranked WHERE rnk <= {k}
), qnums AS (
  SELECT * FROM (VALUES {qnum_rows}) AS q(query_id, qnum)
), judg AS (
  SELECT q.query_id,
         d.doc_id,
         CAST((d.doc_id * 13 + q.qnum * 7) % 4 AS DOUBLE) AS grade
  FROM qnums q CROSS JOIN documents d
), joined AS (
  SELECT r.query_id, r.rnk,
         coalesce(j.grade, 0.0) AS grade
  FROM results r
  LEFT JOIN judg j ON j.query_id = r.query_id AND j.doc_id = r.doc_id
), per_q AS (
  SELECT query_id,
         count(*)::BIGINT AS retrieved,
         sum(CASE WHEN grade >= 1.0 THEN 1 ELSE 0 END) AS rel_retrieved,
         min(CASE WHEN grade >= 1.0 THEN rnk END) AS first_rel,
         sum((power(2.0, grade) - 1.0) / log2(rnk + 1.0)) AS dcg
  FROM joined GROUP BY query_id
), ideal AS (
  SELECT query_id,
         sum((power(2.0, grade) - 1.0) / log2(irank + 1.0)) AS idcg
  FROM (
    SELECT query_id, grade,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY grade DESC, doc_id ASC) AS irank
    FROM judg
  ) WHERE irank <= {k} GROUP BY query_id
), nrel AS (
  SELECT query_id, count(*)::BIGINT AS n_relevant
  FROM judg WHERE grade >= 1.0 GROUP BY query_id
)
SELECT p.query_id,
       p.retrieved,
       coalesce(n.n_relevant, 0)::BIGINT AS n_relevant,
       round(p.rel_retrieved * 1.0 / p.retrieved, 6) AS precision_at_k,
       round(CASE WHEN coalesce(n.n_relevant, 0) > 0
                  THEN p.rel_retrieved * 1.0 / n.n_relevant
                  ELSE 0.0 END, 6) AS recall_at_k,
       round(coalesce(1.0 / p.first_rel, 0.0), 6) AS mrr,
       round(p.dcg, 6) AS dcg_at_k,
       round(coalesce(i.idcg, 0.0), 6) AS idcg_at_k,
       round(CASE WHEN coalesce(i.idcg, 0.0) > 0
                  THEN p.dcg / i.idcg ELSE 0.0 END, 6) AS ndcg_at_k
FROM per_q p
LEFT JOIN ideal i ON i.query_id = p.query_id
LEFT JOIN nrel n ON n.query_id = p.query_id
"""


# --- FUNCTION_SCORE (round 5, the ES function_score query with a
#     gauss decay, boost_mode=multiply / Lucene FunctionScoreQuery):
#     BM25 * exp(-d^2 / 2 sigma^2) where d = |n_chars - origin| — the
#     recency/utility-boost idiom ("prefer docs near 600 chars"). FULL
#     answer sets (k > corpus), re-ranked on the rounded product both
#     sides. The oracle rebuilds the decay in SQL on the same scored
#     membership CTEs.
FS_ORIGIN, FS_SCALE, FS_DECAY = 600.0, 300.0, 0.5


def q_bm25_function_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.function_score import (
        decay_factors,
        function_score_topk,
    )

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    docs = _read(spark, sf_dir, "documents")
    factors = decay_factors(
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("n_chars").cast("double").alias("value"),
        ),
        decay="gauss",
        origin=FS_ORIGIN,
        scale=FS_SCALE,
        decay_value=FS_DECAY,
    )
    # FULL answer sets: k > corpus so the rounded re-rank below is safe
    fs_set = [(q, t, 10**9) for q, t, _k in STATS_QUERY_SET]
    out = function_score_topk(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, fs_set),
        factors,
        mode="boolean",
    )
    # FULL answer sets (k > corpus): rank on the rounded score with the
    # doc_id tiebreak, mirroring the oracle (same contract as
    # bm25_boolean — safe because no query truncates)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    return out.select(
        "query_id",
        F.row_number().over(w).cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def _function_score_oracle_sql(
    query_set: list[tuple[str, str, int]],
) -> str:
    """Function-score truth: the boolean membership + BM25 scoring CTEs,
    each product multiplied by the same gauss decay on n_chars
    (sigma^2 = -scale^2 / (2 ln p)), ranked per query on the rounded
    product."""
    import math

    matches, qterms, boosted = _bool_membership_and_qterms(query_set)
    boost_factor = " * qt.boost" if boosted else ""
    sigma2 = -(FS_SCALE * FS_SCALE) / (2.0 * math.log(FS_DECAY))
    toks = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS tokens FROM documents
), dl AS (
  SELECT doc_id, len(tokens)::BIGINT AS dl FROM docs
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), stats AS (
  SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM dl
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), matches AS (
  {matches}
), qterms AS (
  {qterms}
), scored AS (
  SELECT m.query_id, m.doc_id,
         sum( ln((s.n_docs - dft.df + 0.5) / (dft.df + 0.5) + 1.0){boost_factor}
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) ) AS raw
  FROM (SELECT DISTINCT query_id, doc_id FROM matches) m
  JOIN qterms qt ON qt.query_id = m.query_id
  JOIN tf  ON tf.doc_id = m.doc_id AND tf.term = qt.term
  JOIN dft ON dft.term = qt.term
  JOIN dl  ON dl.doc_id = m.doc_id
  CROSS JOIN stats s
  GROUP BY m.query_id, m.doc_id
), boosted AS (
  SELECT sc.query_id, sc.doc_id,
         sc.raw * coalesce(
           exp(-((abs(CAST(d.n_chars AS DOUBLE) - {FS_ORIGIN!r})
                  * abs(CAST(d.n_chars AS DOUBLE) - {FS_ORIGIN!r}))
                 / {2.0 * sigma2!r})), 1.0) AS fscore
  FROM scored sc
  JOIN documents d ON d.doc_id = sc.doc_id
), ranked AS (
  SELECT query_id, doc_id, fscore,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(fscore, 6) DESC, doc_id ASC) AS rnk
  FROM boosted
)
SELECT query_id, rnk AS rank, doc_id, round(fscore, 6) AS score
FROM ranked
"""


# --- MATCHED-IDS export + MATRIX_STATS (round 5): collector="ids" is
#     the bare-membership export surface (no scores — the feed for
#     metadata joins); matrix_stats (the ES aggregation) computes
#     pairwise sample covariance / Pearson correlation between numeric
#     doc fields over each query's matched docs. Fields here: n_chars
#     (stored) and dl (token count — recomputed identically in the
#     oracle), which are strongly correlated by construction, so the
#     correlation numbers are meaningful, not noise.
def q_bm25_matched_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import matched_ids

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    return matched_ids(
        spark, merged, tstats, meta,
        _doc_queries_df(spark, STATS_QUERY_SET), mode="boolean",
    )


def _matched_ids_oracle_sql(query_set: list[tuple[str, str, int]]) -> str:
    from angle_spark.query.boolean import parse_query

    matches = "\n  UNION ALL\n  ".join(
        f"SELECT '{qid}' AS query_id, doc_id "
        f"FROM ({_bool_match_sql(parse_query(text))})"
        for qid, text, _k in query_set
    )
    toks_sql = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks_sql} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), matches AS (
  {matches}
)
SELECT DISTINCT query_id, doc_id FROM matches
"""


def q_bm25_matrix_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import matrix_stats_matches

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    docs = with_tokens(_read(spark, sf_dir, "documents"))
    vals = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("dl").cast("double").alias("dl"),
        F.col("n_chars").cast("double").alias("n_chars"),
    )
    out = matrix_stats_matches(
        spark, merged, tstats, meta,
        _doc_queries_df(spark, STATS_QUERY_SET), vals, mode="boolean",
    )
    return out.select(
        "query_id",
        "field_i",
        "field_j",
        F.col("n").cast("long").alias("n"),
        F.round("mean_i", 6).alias("mean_i"),
        F.round("mean_j", 6).alias("mean_j"),
        F.round("covariance", 6).alias("covariance"),
        F.round("correlation", 6).alias("correlation"),
    )


def _matrix_stats_oracle_sql(query_set: list[tuple[str, str, int]]) -> str:
    """Matrix-stats truth: membership CTEs joined to (dl, n_chars), one
    covar_samp/corr arm per ordered field pair — the same sample
    definitions Spark's covar_samp/corr use."""
    from angle_spark.query.boolean import parse_query

    matches = "\n  UNION ALL\n  ".join(
        f"SELECT '{qid}' AS query_id, doc_id "
        f"FROM ({_bool_match_sql(parse_query(text))})"
        for qid, text, _k in query_set
    )
    toks_sql = duckdb_tokens_sql("text")
    arms = "\nUNION ALL\n".join(
        f"SELECT query_id, '{fi}' AS field_i, '{fj}' AS field_j, "
        f"count(*)::BIGINT AS n, round(avg({fi}), 6) AS mean_i, "
        f"round(avg({fj}), 6) AS mean_j, "
        f"round(covar_samp({fi}, {fj}), 6) AS covariance, "
        f"round(corr({fi}, {fj}), 6) AS correlation "
        "FROM mv GROUP BY query_id"
        for fi, fj in (("dl", "dl"), ("dl", "n_chars"), ("n_chars", "n_chars"))
    )
    return f"""
WITH docs AS (
  SELECT doc_id, {toks_sql} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), matches AS (
  {matches}
), mv AS (
  SELECT m.query_id,
         CAST(len(dk.tokens) AS DOUBLE) AS dl,
         CAST(d.n_chars AS DOUBLE) AS n_chars
  FROM (SELECT DISTINCT query_id, doc_id FROM matches) m
  JOIN documents d ON d.doc_id = m.doc_id
  JOIN docs dk ON dk.doc_id = m.doc_id
)
{arms}
"""


# --- CARDINALITY aggregation (round 5, the ES ``cardinality``
#     aggregation): exact distinct count of a metric over each query's
#     matched docs. Shards ship (query, value) pairs deduped
#     shard-locally (the map-side combine — collector="distinct_values")
#     and one count_distinct per query replaces the rank window. The
#     metric is n_chars, deterministically missing for doc_id % 5 == 4
#     (the ES missing rule — skipped entirely); exact=False is the
#     disclosed HLL++ sketch for huge distinct sets.
def q_bm25_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import cardinality_matches

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    docs = _read(spark, sf_dir, "documents")
    vals = docs.filter((F.col("doc_id") % 5) != 4).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_chars").cast("double").alias("value"),
    )
    return cardinality_matches(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, STATS_QUERY_SET),
        vals,
        mode="boolean",
    )


def _cardinality_oracle_sql(query_set: list[tuple[str, str, int]]) -> str:
    """Cardinality truth: boolean membership CTEs joined to the metric
    (missing for doc_id % 5 == 4), COUNT(DISTINCT value) per query."""
    from angle_spark.query.boolean import parse_query

    matches = "\n  UNION ALL\n  ".join(
        f"SELECT '{qid}' AS query_id, doc_id "
        f"FROM ({_bool_match_sql(parse_query(text))})"
        for qid, text, _k in query_set
    )
    toks_sql = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks_sql} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), matches AS (
  {matches}
)
SELECT m.query_id,
       count(DISTINCT CAST(d.n_chars AS DOUBLE))::BIGINT AS cardinality
FROM (SELECT DISTINCT query_id, doc_id FROM matches) m
JOIN documents d ON d.doc_id = m.doc_id
WHERE (d.doc_id % 5) != 4
GROUP BY m.query_id
"""


# --- TOP-HITS aggregation (round 5, the ES ``top_hits`` sub-agg under
#     a ``terms`` aggregation / Lucene's grouping module): the 3 best
#     hits BY SCORE within each lang bucket of each query's matched
#     docs. Shards ship <= n rows per (query, bucket); the global cut
#     is a window over that bounded frame (wand.top_hits_matches).
#     Docs with NULL lang are skipped (the ES missing-bucket default).
def q_bm25_top_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import top_hits_matches

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    docs = _read(spark, sf_dir, "documents")
    groups = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), F.col("lang")
    )
    out = top_hits_matches(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, STATS_QUERY_SET),
        groups,
        n=3,
        mode="boolean",
    )
    return out.select(
        "query_id",
        "group",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def _top_hits_oracle_sql(
    query_set: list[tuple[str, str, int]],
    n: int = 3,
    cap: int = BOOL_PREFIX_CAP,
) -> str:
    """Top-hits truth: the boolean membership + scoring CTEs of
    _bm25_boolean_oracle_sql, ranked PER (query, lang) bucket instead of
    per query, cut at n. NULL-lang docs are skipped (engine's
    missing-bucket rule); rank ties break (raw DESC, doc_id ASC) — the
    same exact-score order the engine uses."""
    matches, qterms, boosted = _bool_membership_and_qterms(query_set, cap)
    boost_factor = " * qt.boost" if boosted else ""
    toks = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS tokens FROM documents
), dl AS (
  SELECT doc_id, len(tokens)::BIGINT AS dl FROM docs
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), stats AS (
  SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM dl
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), matches AS (
  {matches}
), qterms AS (
  {qterms}
), scored AS (
  SELECT m.query_id, m.doc_id,
         sum( ln((s.n_docs - dft.df + 0.5) / (dft.df + 0.5) + 1.0){boost_factor}
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) ) AS raw
  FROM (SELECT DISTINCT query_id, doc_id FROM matches) m
  JOIN qterms qt ON qt.query_id = m.query_id
  JOIN tf  ON tf.doc_id = m.doc_id AND tf.term = qt.term
  JOIN dft ON dft.term = qt.term
  JOIN dl  ON dl.doc_id = m.doc_id
  CROSS JOIN stats s
  GROUP BY m.query_id, m.doc_id
), ranked AS (
  SELECT sc.query_id, d.lang AS "group", sc.doc_id, sc.raw,
         row_number() OVER (PARTITION BY sc.query_id, d.lang
                            ORDER BY sc.raw DESC, sc.doc_id ASC) AS rnk
  FROM scored sc
  JOIN documents d ON d.doc_id = sc.doc_id
  WHERE d.lang IS NOT NULL
)
SELECT query_id, "group", rnk AS rank, doc_id, round(raw, 6) AS score
FROM ranked WHERE rnk <= {n}
"""


# --- HAS_CHILD / parent-join retrieval (round 5, the ES has_child
#     query / Lucene ToParentBlockJoinQuery — query/join_field.py): the
#     transcripts shape, "which CONVERSATIONS best match", mapped onto
#     the documents table with parent_id = doc_id // 8 (8-turn
#     conversations; docIDs are turn-ordered so parents are
#     docID-contiguous, exactly like real conv_ids). Children score
#     under the boolean grammar; each parent folds its matching
#     children's scores (collector="group_score" — shards ship
#     per-parent partials, never the hit list); parents rank on the
#     rounded best-child score (max mode). Ranking uses round(max, 6) +
#     parent_id on BOTH sides — the full-answer-set discipline, since
#     cross-shard double folds are ULP-nondeterministic.
HAS_CHILD_K = 8
HAS_CHILD_FANOUT = 8


def q_has_child_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.join_field import parent_matches

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    docs = _read(spark, sf_dir, "documents")
    parents = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        (F.col("doc_id") / HAS_CHILD_FANOUT).cast("long").alias("parent_id"),
    )
    agg = parent_matches(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, STATS_QUERY_SET),
        parents,
        mode="boolean",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("max", 6)), F.asc("parent_id")
    )
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.lit(HAS_CHILD_K))
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "parent_id",
            F.col("n_children").cast("long").alias("n_children"),
            F.round("max", 6).alias("best"),
            F.round("sum", 6).alias("total"),
        )
    )


def _has_child_oracle_sql(
    query_set: list[tuple[str, str, int]],
    cap: int = BOOL_PREFIX_CAP,
) -> str:
    """Parent-join truth: the boolean membership + scoring CTEs, each
    matched child joined to its parent (doc_id // fanout), parents fold
    count/max/sum of child scores and rank on (round(max,6) DESC,
    parent ASC) — the engine's exact tie discipline."""
    matches, qterms, boosted = _bool_membership_and_qterms(query_set, cap)
    boost_factor = " * qt.boost" if boosted else ""
    toks = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS tokens FROM documents
), dl AS (
  SELECT doc_id, len(tokens)::BIGINT AS dl FROM docs
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), stats AS (
  SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM dl
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), matches AS (
  {matches}
), qterms AS (
  {qterms}
), scored AS (
  SELECT m.query_id, m.doc_id,
         sum( ln((s.n_docs - dft.df + 0.5) / (dft.df + 0.5) + 1.0){boost_factor}
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) ) AS raw
  FROM (SELECT DISTINCT query_id, doc_id FROM matches) m
  JOIN qterms qt ON qt.query_id = m.query_id
  JOIN tf  ON tf.doc_id = m.doc_id AND tf.term = qt.term
  JOIN dft ON dft.term = qt.term
  JOIN dl  ON dl.doc_id = m.doc_id
  CROSS JOIN stats s
  GROUP BY m.query_id, m.doc_id
), folded AS (
  SELECT query_id, (doc_id // {HAS_CHILD_FANOUT})::BIGINT AS parent_id,
         count(*)::BIGINT AS n_children,
         max(raw) AS best_raw, sum(raw) AS total_raw
  FROM scored
  GROUP BY query_id, (doc_id // {HAS_CHILD_FANOUT})
), ranked AS (
  SELECT query_id, parent_id, n_children, best_raw, total_raw,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(best_raw, 6) DESC,
                                     parent_id ASC) AS rnk
  FROM folded
)
SELECT query_id, rnk AS rank, parent_id, n_children,
       round(best_raw, 6) AS best, round(total_raw, 6) AS total
FROM ranked WHERE rnk <= {HAS_CHILD_K}
"""


# --- CONVERSATION EXPANSION (round 5, Lucene ToChildBlockJoinQuery /
#     ES has_parent with score=true — query/join_field.py
#     expand_to_children): the top-k parents under has_child max-mode,
#     expanded back to EVERY child turn (the transcript RAG shape:
#     retrieve the best conversations, hand back full turn lists for
#     context); each child inherits its parent's rank and score. The
#     matched-parent frame broadcasts into one scan of the assignment
#     frame (plan-asserted in tests) — no corpus shuffle.
def q_conv_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.join_field import expand_to_children

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    docs = _read(spark, sf_dir, "documents")
    parents = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        (F.col("doc_id") / HAS_CHILD_FANOUT).cast("long").alias("parent_id"),
    )
    qs = spark.createDataFrame(
        [(qid, text, HAS_CHILD_K) for qid, text, _k in STATS_QUERY_SET],
        "query_id string, text string, k int",
    )
    out = expand_to_children(
        spark, merged, tstats, meta, qs, parents,
        score_mode="max", rank_on_rounded=True, mode="boolean",
    )
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "parent_id",
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def _conv_expand_oracle_sql(
    query_set: list[tuple[str, str, int]],
    cap: int = BOOL_PREFIX_CAP,
) -> str:
    """Expansion truth: the has_child fold ranked on round(max, 6) and
    cut at k, then joined back to EVERY document of each surviving
    parent (doc_id // fanout) — children inherit rank and score."""
    matches, qterms, boosted = _bool_membership_and_qterms(query_set, cap)
    boost_factor = " * qt.boost" if boosted else ""
    toks = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS tokens FROM documents
), dl AS (
  SELECT doc_id, len(tokens)::BIGINT AS dl FROM docs
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), stats AS (
  SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM dl
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), matches AS (
  {matches}
), qterms AS (
  {qterms}
), scored AS (
  SELECT m.query_id, m.doc_id,
         sum( ln((s.n_docs - dft.df + 0.5) / (dft.df + 0.5) + 1.0){boost_factor}
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) ) AS raw
  FROM (SELECT DISTINCT query_id, doc_id FROM matches) m
  JOIN qterms qt ON qt.query_id = m.query_id
  JOIN tf  ON tf.doc_id = m.doc_id AND tf.term = qt.term
  JOIN dft ON dft.term = qt.term
  JOIN dl  ON dl.doc_id = m.doc_id
  CROSS JOIN stats s
  GROUP BY m.query_id, m.doc_id
), folded AS (
  SELECT query_id, (doc_id // {HAS_CHILD_FANOUT})::BIGINT AS parent_id,
         max(raw) AS best_raw
  FROM scored
  GROUP BY query_id, (doc_id // {HAS_CHILD_FANOUT})
), ranked AS (
  SELECT query_id, parent_id, best_raw,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(best_raw, 6) DESC,
                                     parent_id ASC) AS rnk
  FROM folded
)
SELECT r.query_id, r.rnk AS rank, r.parent_id, d.doc_id,
       round(r.best_raw, 6) AS score
FROM ranked r
JOIN documents d ON (d.doc_id // {HAS_CHILD_FANOUT}) = r.parent_id
WHERE r.rnk <= {HAS_CHILD_K}
"""


# --- PII REDACTION (round 5, the training-data scrubbing pass —
#     operators/redact.py): deterministic PII is planted into each
#     document's text IDENTICALLY in both renditions (email + ip per
#     doc, ssn every 3rd, card every 5th, phone every 7th), then the
#     fixed-order regexp_count + regexp_replace chain runs; the oracle
#     replays the same patterns (the Java-regex/RE2-common dialect is a
#     module contract) and compares per-kind counts plus the md5 of the
#     fully redacted text — byte equality of the scrubbed corpus.
def _pii_augment_spark(doc_id, text):
    return F.concat(
        text,
        F.lit(" contact u"),
        doc_id.cast("string"),
        F.lit("@example.com from 10.0."),
        (doc_id % 256).cast("string"),
        F.lit(".7"),
        F.when(doc_id % 3 == 0, F.lit(" ssn 123-45-6789")).otherwise(F.lit("")),
        F.when(doc_id % 5 == 0, F.lit(" card 4111 1111 1111 1111")).otherwise(
            F.lit("")
        ),
        F.when(doc_id % 7 == 0, F.lit(" call +1 (415) 555-2671")).otherwise(
            F.lit("")
        ),
    )


def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.operators.redact import redact_pii

    docs = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        _pii_augment_spark(F.col("doc_id"), F.col("text")).alias("text"),
    )
    out = redact_pii(docs)
    return out.select(
        "doc_id",
        "n_email", "n_ssn", "n_card", "n_ipv4", "n_phone",
        F.md5("text").alias("fp"),
    )


def _pii_oracle_sql() -> str:
    from angle_spark.operators.redact import PII_KINDS

    pats = dict(PII_KINDS)
    aug = (
        "text || ' contact u' || doc_id || '@example.com from 10.0.' || "
        "(doc_id % 256) || '.7' || "
        "CASE WHEN doc_id % 3 = 0 THEN ' ssn 123-45-6789' ELSE '' END || "
        "CASE WHEN doc_id % 5 = 0 THEN ' card 4111 1111 1111 1111' ELSE '' END || "
        "CASE WHEN doc_id % 7 = 0 THEN ' call +1 (415) 555-2671' ELSE '' END"
    )
    steps = []
    prev = "aug"
    for i, (kind, _p) in enumerate(PII_KINDS):
        pat = pats[kind]
        steps.append(
            f"s{i} AS (SELECT doc_id"
            + "".join(
                f", n_{k}" for k, _ in PII_KINDS[:i]
            )
            + f", len(regexp_extract_all(t, '{pat}'))::BIGINT AS n_{kind}, "
            f"regexp_replace(t, '{pat}', '[{kind.upper()}]', 'g') AS t "
            f"FROM {prev})"
        )
        prev = f"s{i}"
    return (
        f"WITH aug AS (SELECT doc_id, {aug} AS t FROM documents), "
        + ", ".join(steps)
        + f" SELECT doc_id, n_email, n_ssn, n_card, n_ipv4, n_phone, "
        f"md5(t) AS fp FROM {prev}"
    )


# --- MATCH_PHRASE_PREFIX (round 5, the ES match_phrase_prefix query /
#     Lucene MultiPhraseQuery — query/prefix.phrase_prefix_topk): the
#     text is a phrase whose LAST token is still being typed; it
#     expands under the capped top-terms rewrite (df DESC, term ASC,
#     PP_CAP — the cap BINDS for the 'jo' and 'du' stems) into an OR of
#     exact-phrase alternatives through the boolean engine. pp3 is the
#     single-token degeneration (capped prefix disjunction); pp4 has a
#     dead stem (no vocabulary match -> no rows).
PP_CAP = 8
PP_QUERY_SET: list[tuple[str, str, int]] = [
    ("pp1", "hash jo", 1000),
    ("pp2", "customer ord", 1000),
    ("pp3", "du", 1000),
    ("pp4", "zzz qq", 10),
]


def q_bm25_phrase_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.prefix import phrase_prefix_topk

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    out = phrase_prefix_topk(
        spark, merged, tstats, meta,
        _doc_queries_df(spark, PP_QUERY_SET), max_expansions=PP_CAP,
    )
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def _phrase_prefix_oracle_sql(
    query_set: list[tuple[str, str, int]],
    cap: int = PP_CAP,
) -> str:
    """match_phrase_prefix truth: per query, the OR over the capped
    stem expansion of exact-phrase matches (positional chain join with
    the last slot IN the expansion set); scoring terms are the lead
    tokens plus every expansion term — the boolean fold over the
    rewritten tree, exactly what the engine executes."""
    from angle_spark.functions.tokenizer import tokenize_py

    match_arms = []
    qterm_arms = []
    for qid, text, k in query_set:
        toks = tokenize_py(text)
        lead, stem = toks[:-1], toks[-1]
        exp = _prefix_expansion_sql(stem, cap)
        qterm_arms.append(
            f"SELECT '{qid}' AS query_id, term FROM ({exp})"
        )
        for t in lead:
            qterm_arms.append(f"SELECT '{qid}', '{t}'")
        if not lead:
            match_arms.append(
                f"SELECT '{qid}' AS query_id, {k} AS k, doc_id FROM tf "
                f"WHERE term IN (SELECT term FROM ({exp})) GROUP BY doc_id"
            )
            continue
        n = len(lead)
        joins = " ".join(
            f"JOIN pos p{i} ON p{i}.doc_id = p0.doc_id AND p{i}.p = p0.p + {i}"
            for i in range(1, n + 1)
        )
        conds = " AND ".join(
            f"p{i}.term = '{t}'" for i, t in enumerate(lead)
        )
        match_arms.append(
            f"SELECT '{qid}' AS query_id, {k} AS k, p0.doc_id"
            f" FROM pos p0 {joins} WHERE {conds}"
            f" AND p{n}.term IN (SELECT term FROM ({exp}))"
            f" GROUP BY p0.doc_id"
        )
    matches = "\n  UNION ALL\n  ".join(match_arms)
    qterms = "\n  UNION\n  ".join(qterm_arms)
    return _bm25_matches_scored_sql(matches, qterms)


# --- ADJACENCY MATRIX (round 5, the ES adjacency_matrix aggregation —
#     wand.adjacency_matrix): pairwise co-match counts of the boolean
#     query set (a <= b canonical order, diagonal = per-query totals,
#     empty intersections absent). One membership pass + a
#     match-bounded self-join; the oracle self-joins the same distinct
#     membership CTE.
def q_bm25_adjacency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import adjacency_matrix

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    return adjacency_matrix(
        spark, merged, tstats, meta,
        _doc_queries_df(spark, STATS_QUERY_SET), mode="boolean",
    ).select("query_a", "query_b", F.col("n_docs").cast("long").alias("n_docs"))


def _adjacency_oracle_sql(
    query_set: list[tuple[str, str, int]],
    cap: int = BOOL_PREFIX_CAP,
) -> str:
    matches, _qterms, _b = _bool_membership_and_qterms(query_set, cap)
    toks = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), matches AS (
  {matches}
), m AS (
  SELECT DISTINCT query_id, doc_id FROM matches
)
SELECT a.query_id AS query_a, b.query_id AS query_b,
       count(*)::BIGINT AS n_docs
FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.query_id <= b.query_id
GROUP BY a.query_id, b.query_id
"""


# --- COMPOSITE bucket pagination (round 5, the ES composite
#     aggregation — wand.composite_buckets): lang buckets stream in
#     key order, 2 per page, resumed AFTER 'de' — both the cursor and
#     the page size are load-bearing (the result is exactly the en/es
#     page of the 5-lang dictionary for every query that matches docs
#     in those langs).
COMPOSITE_SIZE = 2
COMPOSITE_AFTER = "de"


def q_bm25_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import composite_buckets

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    docs = _read(spark, sf_dir, "documents")
    groups = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), F.col("lang")
    )
    out = composite_buckets(
        spark, merged, tstats, meta,
        _doc_queries_df(spark, STATS_QUERY_SET), groups,
        size=COMPOSITE_SIZE, after=COMPOSITE_AFTER, mode="boolean",
    )
    return out.select(
        "query_id", F.col("group").alias("lang"),
        F.col("n_docs").cast("long").alias("n_docs"),
    )


def _composite_oracle_sql(
    query_set: list[tuple[str, str, int]],
    cap: int = BOOL_PREFIX_CAP,
) -> str:
    matches, _qterms, _b = _bool_membership_and_qterms(query_set, cap)
    toks = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), matches AS (
  {matches}
), buckets AS (
  SELECT m.query_id, d.lang, count(*)::BIGINT AS n_docs
  FROM (SELECT DISTINCT query_id, doc_id FROM matches) m
  JOIN documents d ON d.doc_id = m.doc_id
  WHERE d.lang IS NOT NULL AND d.lang > '{COMPOSITE_AFTER}'
  GROUP BY m.query_id, d.lang
), paged AS (
  SELECT query_id, lang, n_docs,
         row_number() OVER (PARTITION BY query_id ORDER BY lang ASC) AS rn
  FROM buckets
)
SELECT query_id, lang, n_docs FROM paged WHERE rn <= {COMPOSITE_SIZE}
"""


# --- SPAN_FIRST retrieval (round 5, Lucene SpanFirstQuery —
#     query/wand.py mode="span_first"): every query token's FIRST
#     occurrence before position SPAN_FIRST_END ("matches in the
#     opening of a turn" — role prefixes, greetings, error banners).
#     The bound is load-bearing: counts sit strictly between 0 and the
#     plain-AND counts, so neither an AND nor a phrase implementation
#     can pass this oracle. Scores equal the AND scores (positional
#     filters never change the fold).
SPAN_FIRST_END = 6
SPAN_QUERY_SET: list[tuple[str, str, int]] = [
    ("sp1", "the", 1000),
    ("sp2", "hash join", 1000),
    ("sp3", "scan", 1000),
    ("sp4", "zzzz scan", 10),
]


def q_bm25_span_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import wand_topk

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    out = wand_topk(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, SPAN_QUERY_SET),
        mode="span_first",
        slop=SPAN_FIRST_END,
    )
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def _bm25_span_first_oracle_sql() -> str:
    """First-position truth: each term's occurrences restricted to the
    opening window (generate_subscripts is 1-based, the engine's bound
    is exclusive on 0-based positions: pos < END <=> p <= END), doc
    membership is the INTERSECT over the query's distinct terms."""
    from angle_spark.functions.tokenizer import tokenize_py

    def first_select(qid, text, k):
        terms = sorted(set(tokenize_py(text)))
        # DISTINCT is load-bearing: the scored CTE joins matches raw
        # (phrase/near selects are GROUP BY-unique), and a term repeated
        # inside the window would double its doc's score otherwise
        arms = " INTERSECT ".join(
            f"SELECT DISTINCT doc_id FROM pos WHERE term = '{t}' "
            f"AND p <= {SPAN_FIRST_END}"
            for t in terms
        )
        return (
            f"SELECT '{qid}' AS query_id, {k} AS k, doc_id FROM ({arms})"
        )

    return _bm25_positional_oracle_sql(SPAN_QUERY_SET, first_select)


# --- TERM VECTORS read API (round 5, ES _termvectors / Lucene term
#     vectors — query/termvectors.py): each requested doc's terms with
#     tf / dl / df / idf read FROM the posting blocks (the uninvert
#     point-lookup; block-span containment predicates pushed to the
#     scan), never by re-tokenizing source. The oracle IS the
#     re-tokenization — proving the index round-trips the forward view.
TERMVECTOR_IDS = [3, 17, 101, 256, 499]


def q_term_vectors_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.termvectors import term_vectors

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    out = term_vectors(spark, merged, tstats, meta, TERMVECTOR_IDS)
    return out.select(
        "doc_id",
        "term",
        F.col("tf").cast("long").alias("tf"),
        F.col("dl").cast("long").alias("dl"),
        F.col("df").cast("long").alias("df"),
        F.round("idf", 6).alias("idf"),
    )


def _term_vectors_oracle_sql() -> str:
    ids = ", ".join(str(i) for i in TERMVECTOR_IDS)
    toks = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS tokens FROM documents
), dl AS (
  SELECT doc_id, len(tokens)::BIGINT AS dl FROM docs
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), stats AS (
  SELECT count(*)::BIGINT AS n_docs FROM docs
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
)
SELECT t.doc_id, t.term, t.tf, dl.dl, dft.df,
       round(ln((s.n_docs - dft.df + 0.5) / (dft.df + 0.5) + 1.0), 6) AS idf
FROM tf t
JOIN dl  ON dl.doc_id = t.doc_id
JOIN dft ON dft.term = t.term
CROSS JOIN stats s
WHERE t.doc_id IN ({ids})
"""


# --- PERCOLATOR (round 5, Lucene/ES percolate — reverse search): a
#     stored catalog of boolean queries, every document classified
#     against all of them in ONE corpus scan (query/percolate.py). The
#     catalog mixes every leaf kind; fuzzy/regex/prefix use PER-DOC
#     semantics (any doc token within d edits / full-matching the
#     pattern / starting with the stem — Lucene MemoryIndex, no global
#     vocabulary cap), which the oracle expresses directly as
#     levenshtein / regexp_full_match / LIKE predicates instead of the
#     forward-retrieval capped rewrites.
PERC_CATALOG: list[tuple[str, str]] = [
    ("pc01", "hash AND join AND spark"),
    ("pc02", "scan AND NOT filter"),
    ("pc03", "dup OR (group AND batch)"),
    ("pc04", '"join hash"'),
    ("pc05", '"customer order"~5'),
    ("pc06", "fil* AND merge"),
    ("pc07", "merge~1"),
    ("pc08", "/quer(y|ies)/ AND the"),
    ("pc09", "zzzz AND scan"),
    ("pc10", '("the fast" OR sort*) AND NOT du*'),
]


def q_percolate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.query.percolate import compile_catalog, percolate

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    return percolate(docs, compile_catalog(PERC_CATALOG)).select(
        "query_id", F.col("doc_id").cast("long").alias("doc_id")
    )


def _perc_match_sql(node) -> str:
    """AST -> DuckDB membership under PERCOLATION semantics: term /
    phrase / AND / OR exactly as _bool_match_sql; prefix, fuzzy and
    regex leaves match against the document's OWN tokens (uncapped —
    Lucene MemoryIndex), not a capped global-vocabulary rewrite."""
    kind = node[0]
    if kind == "boost":
        return _perc_match_sql(node[1])
    if kind == "prefix":
        return (
            "SELECT DISTINCT doc_id FROM tf "
            f"WHERE term LIKE '{node[1]}%'"
        )
    if kind == "fuzzy":
        return (
            "SELECT DISTINCT doc_id FROM tf "
            f"WHERE levenshtein(term, '{node[1]}') <= {int(node[2])}"
        )
    if kind == "regex":
        pat = node[1].replace("'", "''")
        return (
            "SELECT DISTINCT doc_id FROM tf "
            f"WHERE regexp_full_match(term, '{pat}')"
        )
    if kind == "and":
        s = " INTERSECT ".join(f"({_perc_match_sql(c)})" for c in node[1])
        for c in node[2]:
            s = f"({s}) EXCEPT ({_perc_match_sql(c)})"
        return s
    if kind == "or":
        return " UNION ".join(f"({_perc_match_sql(c)})" for c in node[1])
    return _bool_match_sql(node)  # term / phrase / near primitives


def _percolate_oracle_sql(catalog: list[tuple[str, str]] = PERC_CATALOG) -> str:
    from angle_spark.query.boolean import parse_query

    matches = "\nUNION ALL\n".join(
        f"SELECT '{qid}' AS query_id, doc_id "
        f"FROM ({_perc_match_sql(parse_query(text))})"
        for qid, text in catalog
    )
    toks = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
)
{matches}
"""


# --- SIGNIFICANT TERMS (round 5, the ES significant_terms aggregation /
#     Lucene SignificantTermsAggregation): "docs matching X are also
#     about Y" — each query's full boolean answer set is the foreground,
#     terms score by JLH lift vs the corpus background df, top-10 per
#     query by (rounded score DESC, term ASC). The foreground here is
#     exact membership (oracle-deterministic); production pairs the same
#     operator with top-k hits as the ES sampler does
#     (query/sigterms.py scale notes).
def q_bm25_sig_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.sigterms import significant_terms
    from angle_spark.query.wand import wand_topk

    merged, tstats_c, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    hits = wand_topk(
        spark,
        merged,
        tstats_c,
        meta,
        _doc_queries_df(spark, [(q, t, 10**6) for q, t, _ in STATS_QUERY_SET]),
        mode="boolean",
    ).select("query_id", "doc_id")
    docs = with_tokens(_read(spark, sf_dir, "documents")).select(
        "doc_id", "tokens", "dl"
    )
    tf = term_frequencies(docs).localCheckpoint()
    n_docs, _avgdl = corpus_stats(docs)
    tstats = term_stats(tf, n_docs)
    out = significant_terms(tf, tstats, hits, n_docs)
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "term",
        "fg_count",
        "bg_count",
        F.col("score").alias("score"),
    )


def _sig_terms_oracle_sql(
    query_set: list[tuple[str, str, int]],
    top_terms: int = 10,
    min_doc_count: int = 3,
) -> str:
    """Significant-terms truth: boolean membership CTEs as the
    foreground, JLH = (fg% - bg%) * (fg% / bg%) on the same rounded
    fold, rank on (rounded score DESC, term ASC)."""
    from angle_spark.query.boolean import parse_query

    matches = "\n  UNION ALL\n  ".join(
        f"SELECT '{qid}' AS query_id, doc_id "
        f"FROM ({_bool_match_sql(parse_query(text))})"
        for qid, text, _k in query_set
    )
    toks_sql = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks_sql} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), matches AS (
  {matches}
), m AS (
  SELECT DISTINCT query_id, doc_id FROM matches
), sizes AS (
  SELECT query_id, count(*)::BIGINT AS fg_docs FROM m GROUP BY query_id
), fg AS (
  SELECT m.query_id, tf.term, count(*)::BIGINT AS fg_count
  FROM m JOIN tf ON tf.doc_id = m.doc_id
  GROUP BY m.query_id, tf.term
  HAVING count(*) >= {min_doc_count}
), n AS (
  SELECT count(*)::DOUBLE AS n_docs FROM docs
), scored AS (
  SELECT fg.query_id, fg.term, fg.fg_count, dft.df AS bg_count,
         round(
           ((fg.fg_count / CAST(sizes.fg_docs AS DOUBLE)) - (dft.df / n.n_docs))
           * ((fg.fg_count / CAST(sizes.fg_docs AS DOUBLE)) / (dft.df / n.n_docs)),
           6
         ) AS score
  FROM fg
  JOIN dft ON dft.term = fg.term
  JOIN sizes ON sizes.query_id = fg.query_id
  CROSS JOIN n
), ranked AS (
  SELECT query_id, term, fg_count, bg_count, score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, term ASC
         ) AS rank
  FROM scored
)
SELECT query_id, rank::BIGINT AS rank, term, fg_count, bg_count, score
FROM ranked WHERE rank <= {top_terms}
"""


# --- BOOSTED retrieval over the positional compressed index: query-time
#     ^w weights fold into each term's idf driver-side (one float
#     multiply — the shard fold is unchanged and stays bit-identical to
#     the oracle's ln(idf-arg) * boost * tf * 2.2 / denom association).
#     The oracle rebuilds per-term weights independently: every positive
#     leaf emits (term, boost) rows — expansion terms inherit their
#     leaf's weight — and max(boost) GROUP BY applies the engine's
#     max-over-leaves rule (query/boolean.py, query/wand.py
#     mode="boolean").
def q_bm25_boosted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import wand_topk

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    out = wand_topk(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, BOOST_QUERY_SET),
        mode="boolean",
    )
    # FULL answer sets (k > corpus): rank on the rounded score with the
    # doc_id tiebreak, mirroring the oracle (same contract and reasoning
    # as q_bm25_boolean)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    return out.select(
        "query_id",
        F.row_number().over(w).cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


# Fuzzy rendition (Lucene FuzzyQuery): ``word~d`` leaves expand to the
# nearest vocabulary terms (edit distance ASC, df DESC, term ASC, capped)
# and score as their disjunction — the sparse engine's answer to typos,
# composable with every boolean operator. Cases: single fuzzy leaf (fz1),
# multi-expansion at distance 1 (fz2: sow -> slow|row), default
# fuzziness ``~`` = 2 (fz3: jion -> join), CAP LOAD-BEARING (fz4: pat~2
# has 4 vocabulary terms within 2 edits, cap 3 drops 'fast'), dead fuzzy
# killing an AND (fz5), NEGATED fuzzy — expansions excluded, never
# scored (fz6), phrase + fuzzy composition (fz7), dead fuzzy OR arm
# dropping while the query survives (fz8: jion has no distance-1 match).
FUZZY_QUERY_SET: list[tuple[str, str, int]] = [
    ("fz1", "scal~1", 1000),
    ("fz2", "sow~1 AND hash", 1000),
    ("fz3", "jion~ OR dup", 1000),
    ("fz4", "pat~2 OR dup", 1000),
    ("fz5", "zzzzzz~1 AND scan", 10),
    ("fz6", "merge AND NOT filtr~1", 1000),
    ("fz7", '"hash join" AND sot~2', 1000),
    ("fz8", "jion~1 OR dup", 1000),
]

# fuzzy expansion cap: deliberately small so it BINDS at sf0.01 (fz4);
# the entry passes it to wand_topk, the oracle replicates the same cap
FUZZY_CAP = 3


# --- FUZZY retrieval over the positional compressed index: ``word~d``
#     leaves rewrite driver-side to the nearest vocabulary terms
#     (query/fuzzy.py — one distributed levenshtein pass over
#     term_stats, length-band pruned) and evaluate as boolean trees
#     (query/wand.py mode="boolean"). The oracle re-derives the same
#     capped rewrite with DuckDB's levenshtein over the dft CTE.
def q_bm25_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import wand_topk

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    out = wand_topk(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, FUZZY_QUERY_SET),
        mode="boolean",
        max_expansions=FUZZY_CAP,
    )
    # FULL answer sets (k > corpus): rank on the rounded score with the
    # doc_id tiebreak, mirroring the oracle (same contract and reasoning
    # as q_bm25_boolean)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    return out.select(
        "query_id",
        F.row_number().over(w).cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


REGEX_QUERY_SET: list[tuple[str, str, int]] = [
    ("rx1", "/s.o./ AND hash", 1000),
    ("rx2", "/(scan|sort|merge)/ OR dup", 1000),
    ("rx3", "/.a../ OR dup", 1000),
    ("rx4", "merge AND NOT /[bf]a(st|tch)/", 1000),
    ("rx5", "/zz+/ AND scan", 10),
    ("rx6", "/gr[aeiou]up/^2 OR window", 1000),
    ("rx7", '/qu.*/ AND "hash join"', 1000),
]

# regex expansion cap: deliberately small so it BINDS at sf0.01 (rx3:
# /.a../ full-matches 4 vocabulary terms — hash, data, part, fast — and
# the df-ranked cap drops 'fast'); the entry passes it to wand_topk, the
# oracle replicates the same cap
REGEX_CAP = 3


# --- REGEXP retrieval over the positional compressed index: ``/pat/``
#     leaves rewrite driver-side to the capped top vocabulary terms the
#     pattern FULLY matches (query/regex.py — one distributed anchored
#     rlike pass over term_stats) and evaluate as boolean trees
#     (query/wand.py mode="boolean"). Cases: basic class+dot (rx1),
#     alternation (rx2), cap binding (rx3), NEGATED pattern — expansion
#     terms excluded, never scored (rx4), dead pattern kills its AND
#     (rx5), boosted regex leaf (rx6), regex AND phrase (rx7). The
#     oracle re-derives the same capped rewrite with DuckDB's
#     regexp_full_match over the dft CTE — dialects agree because
#     validate_pattern rejects every divergent construct at parse time.
def q_bm25_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import wand_topk

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    out = wand_topk(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, REGEX_QUERY_SET),
        mode="boolean",
        max_expansions=REGEX_CAP,
    )
    # FULL answer sets (k > corpus): rank on the rounded score with the
    # doc_id tiebreak, mirroring the oracle (same contract and reasoning
    # as q_bm25_boolean)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    return out.select(
        "query_id",
        F.row_number().over(w).cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


# --- FILTERED retrieval: a metadata facet (lang = 'en', 218/500 docs)
#     resolves to a docID allow-list against the corpus table, then rides
#     the shard-cogrouped decode-time masking (query/wand.py doc_filter)
#     — only listed docs are ranked, corpus stats stay full, pruning
#     stays exact. Oracle: candidate filter only, stats CTEs untouched.
def q_bm25_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import wand_topk

    docs_tbl = _read(spark, sf_dir, "documents")
    merged, tstats, meta = load_index(spark, _cached_doc_index(spark, sf_dir))
    out = wand_topk(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark),
        prune=True,
        doc_filter=docs_tbl.filter(F.col("lang") == "en").select("doc_id"),
    )
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


WILDCARD_QUERY_SET: list[tuple[str, str, int]] = [
    ("wc1", "s?o? AND hash", 1000),
    ("wc2", "s*t OR dup", 1000),
    ("wc3", "?a?? OR dup", 1000),
    ("wc4", "merge AND NOT f?st", 1000),
    ("wc5", "zz?q AND scan", 10),
    ("wc6", "gr?up^2 OR window", 1000),
    ("wc7", '*uery AND "hash join"', 1000),
]

# wildcard expansion cap: small so it BINDS at sf0.01 (wc3: ?a??
# desugars to /.a../, which full-matches >= 4 vocabulary terms — the
# df-ranked cap keeps 3 of them), same discipline as REGEX_CAP
WILDCARD_CAP = 3


# --- WILDCARD retrieval (round 5, Lucene WildcardQuery): ``te?t`` /
#     ``h*llo`` / ``*ion`` words desugar AT PARSE TIME to regex leaves
#     (query/regex.wildcard_to_regex), so the capped top-terms rewrite,
#     boosts, NOT and the membership oracle are the SAME machinery as
#     bm25_regex — one expansion engine for the whole leaf family.
#     Cases: single-char holes (wc1), inner * (wc2), cap binding (wc3),
#     negated wildcard (wc4), dead wildcard kills its AND (wc5),
#     boosted (wc6), leading-* + phrase (wc7). A pure trailing-* word
#     (``jo*``) deliberately stays a PREFIX leaf — tested in
#     tests/test_wildcard.py, not here.
def q_bm25_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import wand_topk

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    out = wand_topk(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, WILDCARD_QUERY_SET),
        mode="boolean",
        max_expansions=WILDCARD_CAP,
    )
    # FULL answer sets (k > corpus): rank on the rounded score with the
    # doc_id tiebreak, mirroring the oracle (same contract as
    # q_bm25_boolean)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    return out.select(
        "query_id",
        F.row_number().over(w).cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


BOOSTING_QUERY_SET: list[tuple[str, str, str, int]] = [
    # (qid, positive, negative, k) — nb=0.2 demotes, never excludes
    ("bo1", "hash OR dup", "dup AND merge", 1000),
    ("bo2", "scan AND merge", '"hash join"', 1000),
    ("bo3", "(dup OR spark) AND NOT batch", "fil*", 1000),
    ("bo4", "window OR group", "zzzz", 1000),  # OOV negative: no demotion
    ("bo5", "merge", "merge AND scan", 1000),  # negative subset of positive
]
BOOSTING_NB = 0.2


# --- BOOSTING queries (round 5, ES boosting query / Lucene
#     BoostingQuery): rank by the positive query, multiply the score of
#     docs ALSO matching the negative query by negative_boost — soft
#     demotion, membership unchanged (query/boosting.py: one negative
#     membership pass rides the fieldset channel under a private leaf
#     id, the shard kernel demotes the summed score before selection).
#     Oracle: positive membership+scoring CTEs, LEFT JOIN the negative
#     membership CTE, raw * CASE — the same one-multiply association.
def q_bm25_boosting(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.boosting import boosting_topk

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    queries = spark.createDataFrame(
        [(qid, pos, neg, k) for qid, pos, neg, k in BOOSTING_QUERY_SET],
        "query_id string, text string, negative string, k int",
    )
    out = boosting_topk(
        spark, merged, tstats, meta, queries, negative_boost=BOOSTING_NB
    )
    # FULL answer sets (k > corpus): rank on the rounded score with the
    # doc_id tiebreak, mirroring the oracle (same contract as
    # q_bm25_boolean)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    return out.select(
        "query_id",
        F.row_number().over(w).cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def _boosting_oracle_sql(
    query_set: list[tuple[str, str, str, int]], nb: float
) -> str:
    from angle_spark.query.boolean import parse_query

    matches, qterms, boosted = _bool_membership_and_qterms(
        [(qid, pos, k) for qid, pos, _neg, k in query_set]
    )
    negset = "\n  UNION ALL\n  ".join(
        f"SELECT '{qid}' AS query_id, doc_id "
        f"FROM ({_bool_match_sql(parse_query(neg))})"
        for qid, _pos, neg, _k in query_set
    )
    return _bm25_matches_scored_sql(
        matches,
        qterms,
        rank_on_rounded=True,
        boosted=boosted,
        demote_sql=negset,
        demote_factor=nb,
    )


CONST_SCORE_QUERY_SET: list[tuple[str, str, int]] = [
    ("cs1", '"hash join" OR dup', 15),
    ("cs2", "scan AND NOT filter", 15),
    ("cs3", "zzzz AND scan", 15),  # dead query: no rows
    ("cs4", "merge AND fil*", 15),
]
CONST_SCORE_BOOST = 2.5


# --- CONSTANT-SCORE queries (round 5, ES constant_score / Lucene
#     ConstantScoreQuery): every matching doc scores exactly ``boost``;
#     ranks follow docID (index) order — the deterministic Lucene tie
#     rule. k binds (15 < several answer sets). One membership pass,
#     then a bounded window over the O(matches) id frame
#     (query/boosting.py constant_score_topk). Oracle: the same
#     membership CTEs ranked by doc_id with a literal score.
def q_constant_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.boosting import constant_score_topk

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    out = constant_score_topk(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, CONST_SCORE_QUERY_SET),
        boost=CONST_SCORE_BOOST,
    )
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.col("score").alias("score"),
    )


def _constant_score_oracle_sql(
    query_set: list[tuple[str, str, int]], boost: float
) -> str:
    from angle_spark.query.boolean import parse_query

    matches = "\n  UNION ALL\n  ".join(
        f"SELECT '{qid}' AS query_id, {k} AS k, doc_id "
        f"FROM ({_bool_match_sql(parse_query(text))})"
        for qid, text, k in query_set
    )
    toks = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), matches AS (
  {matches}
), ranked AS (
  SELECT query_id, k, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY doc_id ASC) AS rnk
  FROM (SELECT DISTINCT query_id, k, doc_id FROM matches)
)
SELECT query_id, rnk::BIGINT AS rank, doc_id, {boost!r}::DOUBLE AS score
FROM ranked WHERE rnk <= k
"""


# --- FUZZY prefix_length (round 5, Lucene FuzzyQuery.prefixLength /
#     the ES fuzzy option): expansion candidates must share the word's
#     first N characters exactly — the "typos don't happen in the first
#     letters" heuristic that turns the full-vocabulary levenshtein
#     pass into a prefix-prefiltered one. The entry drives the
#     expansion surface directly (word, max_dist) -> ranked vocabulary
#     rewrites at prefix_length=1 with a binding cap of 8; the oracle
#     replays band + prefix + levenshtein + rank on the tokens-derived
#     vocabulary (Spark and DuckDB levenshtein agree exactly).
FUZZY_PREFIX_PAIRS: list[tuple[str, int]] = [
    ("jion", 2),
    ("scna", 2),
    ("merge", 2),
    ("dup", 1),
]


def q_fuzzy_prefix_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.fuzzy import expansion_frame

    _merged, tstats, _meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    out = expansion_frame(
        spark, tstats, FUZZY_PREFIX_PAIRS, max_expansions=8, prefix_length=1
    )
    return out.select(
        F.col("k1").alias("word"),
        F.col("k2").cast("long").alias("max_dist"),
        "term",
        F.col("r").cast("long").alias("r"),
    )


def _fuzzy_prefix_oracle_sql(pairs: list[tuple[str, int]]) -> str:
    values = ", ".join(f"('{w}', {d})" for w, d in sorted(set(pairs)))
    toks_sql = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks_sql} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pairs(word, max_dist) AS (
  VALUES {values}
), cand AS (
  SELECT p.word, p.max_dist, t.term, t.df,
         levenshtein(p.word, t.term) AS dist
  FROM dft t CROSS JOIN pairs p
  WHERE abs(length(t.term) - length(p.word)) <= p.max_dist
    AND starts_with(t.term, substr(p.word, 1, 1))
), ranked AS (
  SELECT word, max_dist, term,
         row_number() OVER (
           PARTITION BY word, max_dist
           ORDER BY dist ASC, df DESC, term ASC) AS r
  FROM cand WHERE dist <= max_dist
)
SELECT word, max_dist::BIGINT AS max_dist, term, r::BIGINT AS r
FROM ranked WHERE r <= 8
"""


# --- PURE-NEGATION retrieval (round 5, ES bool-with-only-must_not):
#     the engine's grammar rejects pure negation exactly as classic
#     Lucene does; ES makes it legal by implicitly AND-ing
#     MatchAllDocsQuery. must_not_topk IS that insertion, Spark-first:
#     the match_all axis is arithmetic (spark.range(n_docs) — zero
#     corpus/index scan), the negated query is ONE membership pass, a
#     left-anti join subtracts it, constant score in docID order. The
#     OOV query's complement is the FULL universe (k-cut) — the probe
#     that distinguishes complement semantics from a dead query.
MUSTNOT_QUERY_SET: list[tuple[str, str, int]] = [
    ("mn1", "dup OR merge", 12),
    ("mn2", "zzzz", 10),
    ("mn3", "scan AND NOT merge", 15),
]


def q_bm25_must_not(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.boosting import must_not_topk

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    out = must_not_topk(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, MUSTNOT_QUERY_SET),
        boost=1.0,
    )
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.col("score").alias("score"),
    )


def _must_not_oracle_sql(query_set: list[tuple[str, str, int]]) -> str:
    """Complement truth: the full documents id universe EXCEPT each
    query's membership CTE, ranked by docID, cut at k, constant score."""
    from angle_spark.query.boolean import parse_query

    comp = "\n  UNION ALL\n  ".join(
        f"SELECT '{qid}' AS query_id, {k} AS k, doc_id FROM documents "
        f"WHERE doc_id NOT IN (SELECT doc_id FROM "
        f"({_bool_match_sql(parse_query(text))}))"
        for qid, text, k in query_set
    )
    toks = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), complement AS (
  {comp}
), ranked AS (
  SELECT query_id, k, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY doc_id ASC) AS rnk
  FROM complement
)
SELECT query_id, rnk::BIGINT AS rank, doc_id, 1.0::DOUBLE AS score
FROM ranked WHERE rnk <= k
"""


# --- conjunctive (AND) retrieval over the compressed index: only docs
#     matching EVERY distinct query token are ranked (BM25-scored; the
#     shard-local matched-term counter is globally exact because a doc's
#     postings for all terms live in its own segment — query/wand.py
#     mode="and"). Oracle: same SQL BM25 with a matched == |query terms|
#     filter before ranking.
def q_bm25_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import wand_topk

    merged, tstats, meta = load_index(spark, _cached_doc_index(spark, sf_dir))
    out = wand_topk(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, CONJ_QUERY_SET),
        prune=True,
        mode="and",
    )
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


# Hybrid (sparse + dense) rendition: each query carries BOTH a BM25 text
# and a dense anchor (its query vector = the anchor vec_id's embedding,
# oracle-replicable from the embeddings table; vec_id aligns with
# doc_id). Per-side depth 50, fused depth 10.
HYBRID_QUERY_SET: list[tuple[str, str, int]] = [
    ("h1", "join hash", 1),
    ("h2", "scan filter merge", 2),
    ("h3", "dup", 3),
    ("h4", "customer order line", 4),
]
HYBRID_K_SIDE = 50
HYBRID_K_FUSED = 10


# --- HYBRID retrieval: BM25 over the compressed index + embedding-
#     cosine, fused by Reciprocal Rank Fusion (query/hybrid.py — the
#     marriage of this engine's sparse side with the reference's dense
#     retrieval, reference README.md:119-128). Both per-side rankings
#     use the rounded-score + doc_id key so the oracle's tie order is
#     deterministic; fusion itself is exact rank arithmetic.
def q_hybrid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.hybrid import dense_topk, rrf_fuse
    from angle_spark.query.wand import wand_topk

    merged, tstats, meta = load_index(spark, _cached_doc_index(spark, sf_dir))
    queries = spark.createDataFrame(
        [(qid, text, 1_000_000) for qid, text, _ in HYBRID_QUERY_SET],
        schema="query_id string, text string, k int",
    )
    sp = wand_topk(spark, merged, tstats, meta, queries, prune=True)
    ws = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    sp = (
        sp.select("query_id", "doc_id", "score")
        .withColumn("rank", F.row_number().over(ws))
        .filter(F.col("rank") <= HYBRID_K_SIDE)
    )
    emb = _read(spark, sf_dir, "embeddings")
    anchors = spark.createDataFrame(
        [(qid, a) for qid, _, a in HYBRID_QUERY_SET],
        schema="query_id string, anchor long",
    )
    qvecs = anchors.join(emb, anchors.anchor == emb.vec_id).select(
        "query_id", F.col("embedding").alias("qv")
    )
    dn = dense_topk(emb, qvecs, HYBRID_K_SIDE, rank_on_rounded=True)
    out = rrf_fuse(sp, dn, HYBRID_K_FUSED)
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("rrf_score", 9).alias("rrf_score"),
    )


def _hybrid_oracle_sql() -> str:
    toks = duckdb_tokens_sql("text")
    qvals = ", ".join(f"('{q}', '{t}')" for q, t, _ in HYBRID_QUERY_SET)
    anchors = ", ".join(f"('{q}', {a})" for q, _, a in HYBRID_QUERY_SET)
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS tokens FROM documents
), dl AS (
  SELECT doc_id, len(tokens)::BIGINT AS dl FROM docs
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), stats AS (
  SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM dl
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), qterms AS (
  SELECT DISTINCT query_id, unnest({duckdb_tokens_sql('text')}) AS term
  FROM (VALUES {qvals}) AS q(query_id, text)
), bm AS (
  SELECT qt.query_id, tf.doc_id,
         sum( ln((s.n_docs - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) ) AS raw
  FROM qterms qt
  JOIN tf  ON tf.term = qt.term
  JOIN dft ON dft.term = qt.term
  JOIN dl  ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
), branked AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY round(raw, 6) DESC, doc_id ASC) AS srank
  FROM bm
), anch AS (
  SELECT * FROM (VALUES {anchors}) AS a(query_id, anchor)
), qv AS (
  SELECT a.query_id, e.embedding::DOUBLE[] AS qv
  FROM anch a JOIN embeddings e ON e.vec_id = a.anchor
), dcos AS (
  SELECT qv.query_id, e.vec_id AS doc_id,
         list_dot_product(e.embedding::DOUBLE[], qv.qv)
         / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
            * sqrt(list_dot_product(qv.qv, qv.qv))) AS cos_raw
  FROM embeddings e CROSS JOIN qv
), dranked AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY round(cos_raw, 6) DESC, doc_id ASC) AS drank
  FROM dcos
), fused AS (
  SELECT coalesce(b.query_id, d.query_id) AS query_id,
         coalesce(b.doc_id, d.doc_id) AS doc_id,
         coalesce(1.0::DOUBLE / (60 + b.srank), 0.0::DOUBLE)
         + coalesce(1.0::DOUBLE / (60 + d.drank), 0.0::DOUBLE) AS rrf
  FROM (SELECT * FROM branked WHERE srank <= {HYBRID_K_SIDE}) b
  FULL OUTER JOIN (SELECT * FROM dranked WHERE drank <= {HYBRID_K_SIDE}) d
    ON b.query_id = d.query_id AND b.doc_id = d.doc_id
), ranked AS (
  SELECT query_id, doc_id, rrf,
         row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id ASC) AS rnk
  FROM fused
)
SELECT query_id, rnk AS rank, doc_id, round(rrf, 9) AS rrf_score
FROM ranked WHERE rnk <= {HYBRID_K_FUSED}
"""


# --- ANN-FIRST HYBRID (round 5): the same RRF fusion with the dense
#     stage swapped from the exact full scan to IVF-flat
#     (query/hybrid.py dense_ann_topk -> operators/ann.py ivf_topk) —
#     the 100 TB shape, where per-query dense work is the probed cells
#     only. The oracle replays the deterministic smallest-vec_id
#     quantizer exactly (same CTE shapes as the ann_ivf_topk oracle),
#     so the driver hash verifies the ANN algorithm INSIDE the fusion.
#     Dense ranks are on raw cosine (bit-reproducible: DuckDB's
#     list_dot_product folds in the same order as Spark's aggregate);
#     sparse ranks on round(score, 6) as in hybrid_topk.
HYBRID_ANN_N_CELLS, HYBRID_ANN_NPROBE = 16, 8


def q_hybrid_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.hybrid import dense_ann_topk, rrf_fuse
    from angle_spark.query.wand import wand_topk

    merged, tstats, meta = load_index(spark, _cached_doc_index(spark, sf_dir))
    queries = spark.createDataFrame(
        [(qid, text, 1_000_000) for qid, text, _ in HYBRID_QUERY_SET],
        schema="query_id string, text string, k int",
    )
    sp = wand_topk(spark, merged, tstats, meta, queries, prune=True)
    ws = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    sp = (
        sp.select("query_id", "doc_id", "score")
        .withColumn("rank", F.row_number().over(ws))
        .filter(F.col("rank") <= HYBRID_K_SIDE)
    )
    emb = _read(spark, sf_dir, "embeddings")
    anchors = spark.createDataFrame(
        [(qid, a) for qid, _, a in HYBRID_QUERY_SET],
        schema="query_id string, anchor long",
    )
    qvecs = anchors.join(emb, anchors.anchor == emb.vec_id).select(
        "query_id", F.col("embedding").alias("qv")
    )
    dn = dense_ann_topk(
        emb, qvecs, HYBRID_K_SIDE,
        n_cells=HYBRID_ANN_N_CELLS, nprobe=HYBRID_ANN_NPROBE,
    )
    out = rrf_fuse(sp, dn, HYBRID_K_FUSED)
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("rrf_score", 9).alias("rrf_score"),
    )


def _hybrid_ann_oracle_sql() -> str:
    toks = duckdb_tokens_sql("text")
    qvals = ", ".join(f"('{q}', '{t}')" for q, t, _ in HYBRID_QUERY_SET)
    anchors = ", ".join(f"('{q}', {a})" for q, _, a in HYBRID_QUERY_SET)
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS tokens FROM documents
), dl AS (
  SELECT doc_id, len(tokens)::BIGINT AS dl FROM docs
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), stats AS (
  SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM dl
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), qterms AS (
  SELECT DISTINCT query_id, unnest({duckdb_tokens_sql('text')}) AS term
  FROM (VALUES {qvals}) AS q(query_id, text)
), bm AS (
  SELECT qt.query_id, tf.doc_id,
         sum( ln((s.n_docs - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) ) AS raw
  FROM qterms qt
  JOIN tf  ON tf.term = qt.term
  JOIN dft ON dft.term = qt.term
  JOIN dl  ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
), branked AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY round(raw, 6) DESC, doc_id ASC) AS srank
  FROM bm
), e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), cents AS (
  SELECT vec_id AS cell, v AS cv, list_dot_product(v, v) AS cc
  FROM e ORDER BY vec_id LIMIT {HYBRID_ANN_N_CELLS}
), assign AS (
  SELECT vec_id, v, cell FROM (
    SELECT c.vec_id, c.v, t.cell,
           row_number() OVER (
             PARTITION BY c.vec_id
             ORDER BY t.cc - 2 * list_dot_product(c.v, t.cv), t.cell
           ) AS rn
    FROM e c CROSS JOIN cents t
  ) WHERE rn = 1
), anch AS (
  SELECT * FROM (VALUES {anchors}) AS a(query_id, anchor)
), qv AS (
  SELECT a.query_id, e.v AS qv FROM anch a JOIN e ON e.vec_id = a.anchor
), probes AS (
  SELECT query_id, qv, cell FROM (
    SELECT q.query_id, q.qv, t.cell,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY t.cc - 2 * list_dot_product(q.qv, t.cv), t.cell
           ) AS rn
    FROM qv q CROSS JOIN cents t
  ) WHERE rn <= {HYBRID_ANN_NPROBE}
), dcos AS (
  SELECT p.query_id, a.vec_id AS doc_id,
         list_dot_product(a.v, p.qv)
         / (sqrt(list_dot_product(a.v, a.v))
            * sqrt(list_dot_product(p.qv, p.qv))) AS cos_raw
  FROM assign a JOIN probes p USING (cell)
), dranked AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, doc_id ASC) AS drank
  FROM dcos
), fused AS (
  SELECT coalesce(b.query_id, d.query_id) AS query_id,
         coalesce(b.doc_id, d.doc_id) AS doc_id,
         coalesce(1.0::DOUBLE / (60 + b.srank), 0.0::DOUBLE)
         + coalesce(1.0::DOUBLE / (60 + d.drank), 0.0::DOUBLE) AS rrf
  FROM (SELECT * FROM branked WHERE srank <= {HYBRID_K_SIDE}) b
  FULL OUTER JOIN (SELECT * FROM dranked WHERE drank <= {HYBRID_K_SIDE}) d
    ON b.query_id = d.query_id AND b.doc_id = d.doc_id
), ranked AS (
  SELECT query_id, doc_id, rrf,
         row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id ASC) AS rnk
  FROM fused
)
SELECT query_id, rnk AS rank, doc_id, round(rrf, 9) AS rrf_score
FROM ranked WHERE rnk <= {HYBRID_K_FUSED}
"""


# Fielded (BM25F) rendition over (text w=1.0, source w=3.0): fd2-fd4
# mix body terms with source-field keywords (srcN appears ONLY in the
# source field), so a text-only scorer returns the wrong sets AND the
# wrong scores — per-field length normalization must match exactly.
FIELDED_QUERY_SET: list[tuple[str, str, int]] = [
    ("fd1", "join hash", 10),
    ("fd2", "src3 scan", 10),
    ("fd3", "dup src7", 10),
    ("fd4", "the fast src1", 10),
]
FIELDED_WEIGHTS = [("text", 1.0), ("source", 3.0)]


# --- BM25F fielded retrieval (query/bm25f.py): per-field weights folded
#     into tf BEFORE the saturation curve (Zaragoza et al. simple BM25F),
#     idf over the combined document. The oracle rebuilds the exact
#     per-field CTEs + weighted fold in SQL.
def q_bm25_fielded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.query.bm25f import bm25f_topk

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text", "source")
    out = bm25f_topk(
        docs, FIELDED_WEIGHTS, _doc_queries_df(spark, FIELDED_QUERY_SET)
    )
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def _bm25f_oracle_sql() -> str:
    ttoks = duckdb_tokens_sql("text")
    stoks = duckdb_tokens_sql("source")
    wt, ws = dict(FIELDED_WEIGHTS)["text"], dict(FIELDED_WEIGHTS)["source"]
    return f"""
WITH fdocs AS (
  SELECT doc_id, {ttoks} AS ttoks, {stoks} AS stoks FROM documents
), ttf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(ttoks) AS term FROM fdocs) GROUP BY doc_id, term
), stf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(stoks) AS term FROM fdocs) GROUP BY doc_id, term
), fdl AS (
  SELECT doc_id, len(ttoks)::BIGINT AS tdl, len(stoks)::BIGINT AS sdl FROM fdocs
), fstats AS (
  SELECT count(*)::BIGINT AS n_docs, avg(tdl) AS tavg, avg(sdl) AS savg FROM fdl
), tilde AS (
  -- the same left-to-right two-term fold the engine runs: text field
  -- contribution first, source second, each length-normalized by its
  -- OWN (dl, avgdl)
  SELECT coalesce(t.doc_id, s.doc_id) AS doc_id,
         coalesce(t.term, s.term) AS term,
         coalesce({wt} * t.tf / (1.0 - 0.75 + 0.75 * fdl.tdl / st.tavg), 0.0)
         + coalesce({ws} * s.tf / (1.0 - 0.75 + 0.75 * fdl.sdl / st.savg), 0.0) AS tft
  FROM ttf t
  FULL OUTER JOIN stf s ON t.doc_id = s.doc_id AND t.term = s.term
  JOIN fdl ON fdl.doc_id = coalesce(t.doc_id, s.doc_id)
  CROSS JOIN fstats st
), fdft AS (
  SELECT term, count(*)::BIGINT AS df FROM tilde GROUP BY term
), qterms AS (
  SELECT DISTINCT query_id, k, unnest({duckdb_tokens_sql('text')}) AS term
  FROM {_doc_queries_values_sql(FIELDED_QUERY_SET)}
), scored AS (
  SELECT qt.query_id, qt.k, ti.doc_id,
         sum( ln((st.n_docs - fdft.df + 0.5) / (fdft.df + 0.5) + 1.0)
              * 2.2 * ti.tft / (1.2 + ti.tft) ) AS raw
  FROM qterms qt
  JOIN fdft ON fdft.term = qt.term
  JOIN tilde ti ON ti.term = qt.term
  CROSS JOIN fstats st
  GROUP BY qt.query_id, qt.k, ti.doc_id
), ranked AS (
  SELECT query_id, k, doc_id, raw,
         row_number() OVER (PARTITION BY query_id ORDER BY round(raw, 6) DESC, doc_id ASC) AS rnk
  FROM scored
)
SELECT query_id, rnk AS rank, doc_id, round(raw, 6) AS score
FROM ranked WHERE rnk <= k
"""


# --- DIS_MAX fielded retrieval (round 5, Lucene DisjunctionMaxQuery /
#     ES multi_match best_fields — query/bm25f.py dismax_topk): each
#     field scored by standard BM25 with its OWN stats (df_f, avgdl_f)
#     times its ^w boost, combined as max + tie * (sum - max). Same
#     (text, source) fields and query set as the BM25F entry, so the
#     two entries together pin the semantic difference between holistic
#     (BM25F) and best-field (dis_max) fielded scoring.
DISMAX_TIE = 0.3


def q_dismax_fielded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.query.bm25f import dismax_topk

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text", "source")
    out = dismax_topk(
        docs,
        FIELDED_WEIGHTS,
        _doc_queries_df(spark, FIELDED_QUERY_SET),
        tie=DISMAX_TIE,
    )
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def _dismax_oracle_sql() -> str:
    """Dis-max truth: per-field BM25 CTEs with each field's own df and
    avgdl (idf over the field, not the combined doc), the field boost
    multiplying the whole field score, then max + tie * (sum - max)
    per (query, doc)."""
    ttoks = duckdb_tokens_sql("text")
    stoks = duckdb_tokens_sql("source")
    wt, ws = dict(FIELDED_WEIGHTS)["text"], dict(FIELDED_WEIGHTS)["source"]
    return f"""
WITH fdocs AS (
  SELECT doc_id, {ttoks} AS ttoks, {stoks} AS stoks FROM documents
), ttf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(ttoks) AS term FROM fdocs) GROUP BY doc_id, term
), stf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(stoks) AS term FROM fdocs) GROUP BY doc_id, term
), fdl AS (
  SELECT doc_id, len(ttoks)::BIGINT AS tdl, len(stoks)::BIGINT AS sdl FROM fdocs
), fstats AS (
  SELECT count(*)::BIGINT AS n_docs, avg(tdl) AS tavg, avg(sdl) AS savg FROM fdl
), tdft AS (
  SELECT term, count(*)::BIGINT AS df FROM ttf GROUP BY term
), sdft AS (
  SELECT term, count(*)::BIGINT AS df FROM stf GROUP BY term
), qterms AS (
  SELECT DISTINCT query_id, k, unnest({duckdb_tokens_sql('text')}) AS term
  FROM {_doc_queries_values_sql(FIELDED_QUERY_SET)}
), tscored AS (
  SELECT qt.query_id, qt.k, t.doc_id,
         sum( ln((st.n_docs - tdft.df + 0.5) / (tdft.df + 0.5) + 1.0)
              * {wt} * t.tf * 2.2
              / (t.tf + 1.2 * (0.25 + 0.75 * fdl.tdl / st.tavg)) ) AS s
  FROM qterms qt
  JOIN tdft ON tdft.term = qt.term
  JOIN ttf t ON t.term = qt.term
  JOIN fdl ON fdl.doc_id = t.doc_id
  CROSS JOIN fstats st
  GROUP BY qt.query_id, qt.k, t.doc_id
), sscored AS (
  SELECT qt.query_id, qt.k, s.doc_id,
         sum( ln((st.n_docs - sdft.df + 0.5) / (sdft.df + 0.5) + 1.0)
              * {ws} * s.tf * 2.2
              / (s.tf + 1.2 * (0.25 + 0.75 * fdl.sdl / st.savg)) ) AS s
  FROM qterms qt
  JOIN sdft ON sdft.term = qt.term
  JOIN stf s ON s.term = qt.term
  JOIN fdl ON fdl.doc_id = s.doc_id
  CROSS JOIN fstats st
  GROUP BY qt.query_id, qt.k, s.doc_id
), combined AS (
  SELECT query_id, k, doc_id,
         max(s) + {DISMAX_TIE} * (sum(s) - max(s)) AS raw
  FROM (SELECT * FROM tscored UNION ALL SELECT * FROM sscored)
  GROUP BY query_id, k, doc_id
), ranked AS (
  SELECT query_id, k, doc_id, raw,
         row_number() OVER (PARTITION BY query_id ORDER BY round(raw, 6) DESC, doc_id ASC) AS rnk
  FROM combined
)
SELECT query_id, rnk AS rank, doc_id, round(raw, 6) AS score
FROM ranked WHERE rnk <= k
"""


# --- INDEX STATS API (round 5, ES GET /index/_stats + _segments): one
#     bounded observability row per index (index/stats_api.py). The
#     entry selects the corpus-derivable subset — the physical columns
#     (blocks, bytes, segment counts) are layout-dependent and covered
#     by pytest instead.
def q_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.stats_api import index_stats

    out = index_stats(spark, _cached_doc_index(spark, sf_dir))
    return out.select(
        "n_docs",
        "live_docs",
        "deleted",
        F.round("avgdl", 6).alias("avgdl"),
        "n_terms",
        "n_postings",
        "total_tokens",
    )


def _index_stats_oracle_sql() -> str:
    toks = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
)
SELECT (SELECT count(*) FROM docs)::BIGINT AS n_docs,
       (SELECT count(*) FROM docs)::BIGINT AS live_docs,
       0::BIGINT AS deleted,
       (SELECT round(avg(len(tokens)), 6) FROM docs) AS avgdl,
       count(DISTINCT term)::BIGINT AS n_terms,
       count(*)::BIGINT AS n_postings,
       sum(tf)::BIGINT AS total_tokens
FROM tf
"""


SLICED_QUERY_SET: list[tuple[str, str, int]] = [
    ("se1", "scan AND NOT filter", 1),
    ("se2", '"hash join" OR dup', 1),
]
SLICED_MAX = 3


# --- SLICED EXPORT (round 5, ES sliced scroll): a membership export
#     split into ``max`` disjoint, tiling slices by doc_id modulo —
#     independent consumers drain one pass without coordination
#     (query/wand.py matched_ids(slices=...)). The entry unions all 3
#     slices tagged with their slice id; the oracle recomputes the same
#     membership with doc_id % 3 — tiling and disjointness are what the
#     hash compares.
def q_bm25_sliced_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import matched_ids

    merged, tstats, meta = load_index(
        spark, _cached_doc_index(spark, sf_dir, positional=True)
    )
    parts = []
    for sid in range(SLICED_MAX):
        part = matched_ids(
            spark, merged, tstats, meta,
            _doc_queries_df(spark, SLICED_QUERY_SET),
            mode="boolean", slices=(sid, SLICED_MAX),
        ).select(
            "query_id", F.lit(sid).cast("long").alias("slice"), "doc_id"
        )
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _sliced_export_oracle_sql() -> str:
    from angle_spark.query.boolean import parse_query

    matches = "\n  UNION ALL\n  ".join(
        f"SELECT '{qid}' AS query_id, doc_id "
        f"FROM ({_bool_match_sql(parse_query(text))})"
        for qid, text, _k in SLICED_QUERY_SET
    )
    toks = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), matches AS (
  {matches}
)
SELECT DISTINCT query_id, (doc_id % {SLICED_MAX})::BIGINT AS slice, doc_id
FROM matches
"""


UBQ_TEXT = "dup AND NOT merge"
UBQ_PROBES: list[tuple[str, str, int]] = [
    ("u1", "dup", 1),            # dup docs that ALSO have merge survive
    ("u2", "upd8ted", 1),        # the rewritten docs
    ("u3", "scan", 1),           # invariant term: count must not move
    ("u4", "dup OR upd8ted", 1),  # == original dup count (set identity)
    ("u5", "merge AND dup", 1),  # untouched intersection
]


# --- UPDATE BY QUERY (round 5, ES _update_by_query / Lucene
#     updateDocument(Query) — in-place corpus curation, the soft sibling
#     of delete_by_query completing CRUD): every live doc matching
#     "dup AND NOT merge" is tombstoned and re-appended with
#     'dup' -> 'upd8ted' rewritten text (index/update.py — journaled,
#     kill-anywhere idempotent; replacements are streamed delta
#     segments with new docIDs, stats refresh exactly from lineage).
#     The entry counts probe queries over the updated LIVE view — counts
#     are docID-invariant, so the oracle replays the transform on the
#     original corpus and counts the same memberships.
def q_update_by_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from angle_spark.index.build import load_index
    from angle_spark.index.deletes import load_deletes
    from angle_spark.index.update import update_by_query
    from angle_spark.query.wand import count_matches

    out_dir = tempfile.mkdtemp(prefix="bm25_ubq_entry_")
    shutil.rmtree(out_dir)
    shutil.copytree(_cached_doc_index(spark, sf_dir, positional=True), out_dir)
    src = _read(spark, sf_dir, "documents").select("doc_id", "text")
    update_by_query(
        spark, out_dir, UBQ_TEXT, src,
        "regexp_replace(text, '\\\\bdup\\\\b', 'upd8ted')",
    )
    merged, tstats, meta = load_index(spark, out_dir)
    return count_matches(
        spark, merged, tstats, meta,
        _doc_queries_df(spark, UBQ_PROBES),
        mode="boolean", deletes=load_deletes(spark, out_dir),
    )


def _ubq_oracle_sql() -> str:
    """Counts over the corpus with the update replayed in SQL: matched =
    dup AND NOT merge membership on the ORIGINAL text, updated = the
    same regexp_replace on matched rows, then the standard membership
    CTEs over the UPDATED corpus count each probe query."""
    from angle_spark.query.boolean import parse_query

    toks = duckdb_tokens_sql("text")
    utoks = duckdb_tokens_sql("u.text")
    matches = "\n  UNION ALL\n  ".join(
        f"SELECT '{qid}' AS query_id, doc_id "
        f"FROM ({_bool_match_sql(parse_query(text))})"
        for qid, text, _k in UBQ_PROBES
    )
    return f"""
WITH docs0 AS (
  SELECT doc_id, {toks} AS tokens FROM documents
), tf0 AS (
  SELECT doc_id, term FROM (SELECT doc_id, unnest(tokens) AS term FROM docs0)
  GROUP BY doc_id, term
), matched AS (
  SELECT doc_id FROM tf0 WHERE term = 'dup'
  EXCEPT
  SELECT doc_id FROM tf0 WHERE term = 'merge'
), updated AS (
  SELECT d.doc_id,
         CASE WHEN m.doc_id IS NOT NULL
              THEN regexp_replace(d.text, '\\bdup\\b', 'upd8ted', 'g')
              ELSE d.text END AS text
  FROM documents d LEFT JOIN matched m ON m.doc_id = d.doc_id
), docs AS (
  SELECT doc_id, {utoks} AS tokens FROM updated u
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pos AS (
  SELECT doc_id, unnest(tokens) AS term, generate_subscripts(tokens, 1) AS p
  FROM docs
), matches AS (
  {matches}
)
SELECT query_id, count(DISTINCT doc_id)::BIGINT AS total_hits
FROM matches GROUP BY query_id
"""


# --- CROSS-FIELDS fielded retrieval (round 5, ES multi_match
#     type=cross_fields / Lucene BlendedTermQuery — the third member of
#     the multi_match trio): TERM-centric — each query term may live in
#     a different field ("dup src7": dup in text, src7 only in source).
#     Per term the df BLENDS across fields (max — non-inflating), each
#     field scores with its own length norm and ^w boost, the term
#     contributes its best field's saturation times the blended idf.
#     Same fields + query set as bm25f/dismax, pinning the three
#     semantics apart on identical inputs. Oracle: per-field sat CTEs,
#     blended-df CTE, max-then-one-idf-multiply — the engine's exact
#     association.
def q_cross_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.query.bm25f import cross_fields_topk

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text", "source")
    out = cross_fields_topk(
        docs,
        FIELDED_WEIGHTS,
        _doc_queries_df(spark, FIELDED_QUERY_SET),
    )
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def _cross_fields_oracle_sql() -> str:
    """Cross-fields truth: per-field saturation CTEs (field's own
    length norm, ^w boost), blended df = max over fields (restriction
    to query terms is implicit — qterms drives every join), per-term
    max-over-fields THEN one blended-idf multiply, summed per doc."""
    ttoks = duckdb_tokens_sql("text")
    stoks = duckdb_tokens_sql("source")
    wt, ws = dict(FIELDED_WEIGHTS)["text"], dict(FIELDED_WEIGHTS)["source"]
    return f"""
WITH fdocs AS (
  SELECT doc_id, {ttoks} AS ttoks, {stoks} AS stoks FROM documents
), ttf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(ttoks) AS term FROM fdocs) GROUP BY doc_id, term
), stf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(stoks) AS term FROM fdocs) GROUP BY doc_id, term
), fdl AS (
  SELECT doc_id, len(ttoks)::BIGINT AS tdl, len(stoks)::BIGINT AS sdl FROM fdocs
), fstats AS (
  SELECT count(*)::BIGINT AS n_docs, avg(tdl) AS tavg, avg(sdl) AS savg FROM fdl
), tdft AS (
  SELECT term, count(*)::BIGINT AS df FROM ttf GROUP BY term
), sdft AS (
  SELECT term, count(*)::BIGINT AS df FROM stf GROUP BY term
), bdft AS (
  SELECT term, max(df)::BIGINT AS df
  FROM (SELECT * FROM tdft UNION ALL SELECT * FROM sdft) GROUP BY term
), qterms AS (
  SELECT DISTINCT query_id, k, unnest({duckdb_tokens_sql('text')}) AS term
  FROM {_doc_queries_values_sql(FIELDED_QUERY_SET)}
), tsat AS (
  SELECT qt.query_id, qt.k, t.doc_id, qt.term,
         {wt} * t.tf * 2.2
         / (t.tf + 1.2 * (0.25 + 0.75 * fdl.tdl / st.tavg)) AS sat
  FROM qterms qt
  JOIN ttf t ON t.term = qt.term
  JOIN fdl ON fdl.doc_id = t.doc_id
  CROSS JOIN fstats st
), ssat AS (
  SELECT qt.query_id, qt.k, s.doc_id, qt.term,
         {ws} * s.tf * 2.2
         / (s.tf + 1.2 * (0.25 + 0.75 * fdl.sdl / st.savg)) AS sat
  FROM qterms qt
  JOIN stf s ON s.term = qt.term
  JOIN fdl ON fdl.doc_id = s.doc_id
  CROSS JOIN fstats st
), satmax AS (
  SELECT query_id, k, doc_id, term, max(sat) AS sat
  FROM (SELECT * FROM tsat UNION ALL SELECT * FROM ssat)
  GROUP BY query_id, k, doc_id, term
), scored AS (
  SELECT sm.query_id, sm.k, sm.doc_id,
         sum( ln((st.n_docs - b.df + 0.5) / (b.df + 0.5) + 1.0) * sm.sat ) AS raw
  FROM satmax sm
  JOIN bdft b ON b.term = sm.term
  CROSS JOIN fstats st
  GROUP BY sm.query_id, sm.k, sm.doc_id
), ranked AS (
  SELECT query_id, k, doc_id, raw,
         row_number() OVER (PARTITION BY query_id ORDER BY round(raw, 6) DESC, doc_id ASC) AS rnk
  FROM scored
)
SELECT query_id, rnk AS rank, doc_id, round(raw, 6) AS score
FROM ranked WHERE rnk <= k
"""


# --- A9: document frequency per term (exact, grouped agg)
def q_doc_term_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_tokens(_read(spark, sf_dir, "documents")).select("doc_id", "tokens", "dl")
    tf = term_frequencies(docs)
    return tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


# --- P4: tokenize + doc length
def q_doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_tokens(_read(spark, sf_dir, "documents"))
    return docs.select("doc_id", "dl")


# --- A5/A9: corpus scalars
def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_tokens(_read(spark, sf_dir, "documents"))
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("dl"), 6).alias("avgdl"),
    )


# --- A9: term frequencies (the uncompressed posting rows)
def q_term_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_tokens(_read(spark, sf_dir, "documents")).select("doc_id", "tokens", "dl")
    return term_frequencies(docs).select("doc_id", "term", "tf")


# --- P6/SO1: exact dedup by full text (hash-groupBy dedup family)
def q_dedup_exact_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return (
        docs.groupBy("text")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") > 1)
        .select("keep_doc_id", "n_copies")
    )


# --- F14/S9: JSON path extraction over events
def q_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _read(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
    )


# --- A7: grouped aggregate with weighted average
def q_events_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _read(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.round(
            F.sum(F.col("value") * F.col("user_id")) / F.sum("user_id"), 6
        ).alias("weighted_avg"),
    )


# --- W1: top-k per group via row_number window (deterministic tie-break)
def q_events_topk_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("user_id", "rank", "event_id", "value")
    )


# --- P7: label filter + remap (when/otherwise)
def q_orders_label_remap(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderstatus") != "P")
        .withColumn(
            "label",
            F.when(F.col("o_orderstatus") == "F", F.lit(1)).otherwise(F.lit(0)),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        )
    )


# --- P1/F1: prompt templating (the reference's Prompts.C,
#     reference angle_emb/angle.py:64-87)
def q_prompt_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _read(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.format_string(
            "Represent this sentence for searching relevant passages: %s",
            F.col("c_name"),
        ).alias("prompted"),
    )


# --- J1: paired equi-join (zip join by explicit key, never row order)
def q_paired_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders")
    cust = _read(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("segment_total"),
        )
    )


# --- W2/F8: Spearman over the fact table via DISTRIBUTED average-tie
#     ranks (operators/ranks.py — range-partition + offset, no global
#     single-partition rank window; round-1 verdict item 5)
def q_spearman_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.operators.ranks import spearman

    li = _read(spark, sf_dir, "lineitem").select("l_quantity", "l_extendedprice")
    return spearman(li, "l_quantity", "l_extendedprice", alias="spearman")


# --- F4/F5: cosine top-k against a fixed query vector (brute-force ANN).
#     Query side: broadcast 1-row cross join (no driver collect, no extra
#     job); result side: orderBy+limit (TakeOrderedAndProject — per-
#     partition heaps), never an unpartitioned window.
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.operators.topk import global_topk

    emb = _read(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.transform("embedding", lambda x: x.cast("double")).alias("qv")
    )
    dot = F.aggregate(
        F.zip_with(F.col("embedding"), F.col("qv"), lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = F.sqrt(
        F.aggregate(
            F.transform(F.col("embedding"), lambda a: a.cast("double") * a.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    qnrm = F.sqrt(
        F.aggregate(F.transform("qv", lambda a: a * a), F.lit(0.0), lambda acc, x: acc + x)
    )
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", (dot / (nrm * qnrm)).alias("cos_raw"))
    )
    return global_topk(
        scored, [F.desc("cos_raw"), F.asc("vec_id")], 10
    ).select("rank", "vec_id", F.round("cos_raw", 6).alias("cosine"))


# --- SO2: union + distinct
def q_union_distinct_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _read(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = _read(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.union(supp).distinct()


# --- P2: multi-value sampling, made deterministic (element_at by key hash).
#     Zero-token docs (empty/punct-only text) yield NULL — the bare modulo
#     would be a divide-by-zero under Spark 4 ANSI mode.
def q_multivalue_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").withColumn("tokens", tokens_col("text"))
    idx = (F.col("doc_id") % F.size("tokens")).cast("int") + F.lit(1)
    return docs.select(
        "doc_id",
        F.when(F.size("tokens") > 0, F.element_at("tokens", idx))
        .otherwise(F.lit(None).cast("string"))
        .alias("sampled_token"),
    )


# --- A1-A7 composite: TPC-H Q1-style wide aggregation (decimal-exact)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast(
                    "decimal(28,6)"
                )
            ).cast("double").alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- dedup family (SURVEY extras; reference per-batch dedup
#     angle_emb/angle.py:216-227 generalized to global ops)
def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        with_tokens(_read(spark, sf_dir, "documents"))
        .select("doc_id", "tokens")
    )


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures, shingles

    # sig feeds both the band-bucket join and the estimate join; eager
    # localCheckpoint = compute once, blocks GC-freed with the DataFrame
    # (see q_bm25_topk_documents note)
    sig = minhash_signatures(shingles(_doc_tokens(spark, sf_dir))).localCheckpoint()
    return lsh_candidate_pairs(sig)


# --- DECONTAMINATION (round 5): n-gram-overlap contamination check —
#     which training docs share >= 2 shingles with a benchmark probe
#     set (here: every doc with doc_id % 50 == 7 plays the benchmark).
#     The standard pre-training leak check; one equi-join on the
#     shingle key, probe side benchmark-sized.
def q_ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.operators.dedup import ngram_contamination, shingles

    sh = shingles(_doc_tokens(spark, sf_dir)).localCheckpoint()
    probes = sh.filter((F.col("doc_id") % 50) == 7)
    out = ngram_contamination(sh, probes, min_shared=2)
    return out.select(
        "probe_id",
        "doc_id",
        "shared_ngrams",
        "probe_ngrams",
        F.round("overlap", 6).alias("overlap"),
    )


def _ngram_contamination_oracle_sql() -> str:
    return f"""
WITH {_SHINGLES_CTE},
probe AS (
  SELECT doc_id AS probe_id, shingle FROM sh WHERE doc_id % 50 = 7
), sizes AS (
  SELECT probe_id, count(*)::BIGINT AS probe_ngrams FROM probe GROUP BY probe_id
), shared AS (
  SELECT p.probe_id, c.doc_id, count(*)::BIGINT AS shared_ngrams
  FROM sh c JOIN probe p ON c.shingle = p.shingle
  GROUP BY p.probe_id, c.doc_id
  HAVING count(*) >= 2
)
SELECT s.probe_id, s.doc_id, s.shared_ngrams, z.probe_ngrams,
       round(s.shared_ngrams * 1.0 / z.probe_ngrams, 6) AS overlap
FROM shared s JOIN sizes z ON z.probe_id = s.probe_id
"""


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.operators.dedup import ngram_jaccard_pairs, shingles

    return ngram_jaccard_pairs(shingles(_doc_tokens(spark, sf_dir)), threshold=0.8)


def q_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.operators.dedup import simhash

    return simhash(_doc_tokens(spark, sf_dir))


# --- bucketed SimHash near-pairs (pigeonhole bit-chunk equi-join + exact
#     bit_count rescore; operators/dedup.py). The oracle is the
#     ALGORITHM-INDEPENDENT exhaustive Hamming join — stronger than
#     replicating the bucketing: it proves the candidate superset loses
#     no pair.
SIMHASH_MAX_HAMMING = 3


def q_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.operators.dedup import simhash, simhash_near_pairs

    sh = simhash(_doc_tokens(spark, sf_dir))
    return simhash_near_pairs(sh, max_hamming=SIMHASH_MAX_HAMMING)


def q_embedding_topk_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.operators.dedup import embedding_topk_pairs

    return embedding_topk_pairs(_read(spark, sf_dir, "embeddings"), k=20)


# --- embedding near-dup pairs, SCALE path: banded RHP-LSH self-join +
#     exact cosine rescore (operators/dedup.py::embedding_near_pairs_lsh).
#     Complements the disclosed O(N^2) embedding_topk_pairs baseline. The
#     oracle replicates the LSH (hyperplanes as literals), so the hash
#     verifies the bucketing itself.
EMB_PAIRS_THRESHOLD = 0.4


def q_embedding_near_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.operators.dedup import embedding_near_pairs_lsh

    out = embedding_near_pairs_lsh(
        _read(spark, sf_dir, "embeddings"),
        threshold=EMB_PAIRS_THRESHOLD,
        n_planes=ANN_N_PLANES,
        band_bits=ANN_BAND_BITS,
    )
    return out.select("id1", "id2", F.round("cosine", 6).alias("cosine"))


# --- language-ID heuristic (training-data pipeline op)
def q_doc_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.functions.text_stats import lang_id

    docs = _read(spark, sf_dir, "documents")
    return docs.select("doc_id", lang_id(tokens_col("text")).alias("lang_pred"))


# --- token counting variants (P4 family)
def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.functions.text_stats import token_count_subword_est, token_count_ws

    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count_ws(F.col("text")).alias("n_ws"),
        F.size(tokens_col("text")).alias("n_v1"),
        token_count_subword_est(F.col("text")).alias("n_subword"),
    )


# --- rolling-hash document fingerprint (order-sensitive polynomial fold;
#     oracle-checked via a recursive-CTE modpow — see ORACLE_SQL entry)
def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.functions.text_stats import rolling_fingerprint

    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", rolling_fingerprint(tokens_col("text")).alias("fingerprint")
    )


# --- W2/F7/F8 composite: the reference CorrelationEvaluator as one query
#     (reference angle_emb/evaluation.py:55-70): paired cosine vs a label,
#     Pearson + Spearman-via-average-ranks
def q_correlation_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings")
    n_pairs = 250
    a = emb.filter(F.col("vec_id") < n_pairs).select(
        F.col("vec_id").alias("pair_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v1"),
        F.col("label").alias("l1"),
    )
    b = emb.filter(
        (F.col("vec_id") >= n_pairs) & (F.col("vec_id") < 2 * n_pairs)
    ).select(
        (F.col("vec_id") - n_pairs).alias("pair_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v2"),
        F.col("label").alias("l2"),
    )
    dot = F.aggregate(
        F.zip_with("v1", "v2", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    nrm1 = F.sqrt(
        F.aggregate(F.transform("v1", lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    nrm2 = F.sqrt(
        F.aggregate(F.transform("v2", lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    pairs = a.join(b, "pair_id").select(
        "pair_id",
        (dot / (nrm1 * nrm2)).alias("cosine"),
        (F.col("l1") == F.col("l2")).cast("double").alias("label"),
    )
    # distributed average-tie ranks (operators/ranks.py): exact half-
    # integer arithmetic, so values match the oracle's rank window bitwise
    from angle_spark.operators.ranks import with_avg_rank

    ranked = with_avg_rank(with_avg_rank(pairs, "cosine", "rx"), "label", "ry")
    return ranked.agg(
        F.round(F.corr("cosine", "label"), 6).alias("pearson_cosine"),
        F.round(F.corr("rx", "ry"), 6).alias("spearman_cosine"),
    )


# --- selective filter + agg (predicate pushdown showcase; TPC-H Q6 shape)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * F.col("l_discount").cast("decimal(18,2)")
                ).cast("decimal(28,4)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --- 3-way join + grouped agg + top-k (TPC-H Q3 shape)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _read(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _read(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = _read(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    )
    rev = joined.groupBy("l_orderkey", "o_orderdate").agg(
        F.sum(
            (
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
            ).cast("decimal(28,4)")
        )
        .cast("double")
        .alias("revenue")
    )
    from angle_spark.operators.topk import global_topk

    return global_topk(
        rev, [F.desc("revenue"), F.asc("l_orderkey")], 10
    ).select("rank", "l_orderkey", "revenue", "o_orderdate")


# --- sessionization: gap-based sessions via lag window + cumulative sum
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = ev.withColumn(
        "session_id",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("session_value"),
    )


# --- pivot (wide aggregation)
def q_orders_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .withColumnRenamed("F", "n_f")
        .withColumnRenamed("O", "n_o")
        .withColumnRenamed("P", "n_p")
        .na.fill(0, ["n_f", "n_o", "n_p"])
    )


# --- text quality scoring (training-data pipeline op; SURVEY extras)
def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").withColumn("tokens", tokens_col("text"))
    stop = ["the", "a", "of", "and", "to"]
    n_tokens = F.size("tokens")
    n_stop = F.size(F.filter("tokens", lambda t: t.isin(stop)))
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
        F.round(n_stop.cast("double") / n_tokens, 6).alias("stopword_ratio"),
        F.round(
            F.size(F.array_distinct("tokens")).cast("double") / n_tokens, 6
        ).alias("distinct_ratio"),
    )


# ---------------------------------------------------------------------------
# Pooling / vector-math / PCA / ANN driver entries (round-2: every §2
# operator family gets a green oracle row, VERDICT task 4/6).
# ---------------------------------------------------------------------------


# --- A1-A4, A5(cls_avg), W pooling registry over [L, D] state sequences
#     (reference angle_emb/utils.py:58-99). States are built
#     deterministically from the embeddings table: groups of 4 consecutive
#     vec_ids (sorted), mask drops position group_id % 4 (so masked
#     position varies per group and 3 of 4 states are kept). Pooled
#     vectors are exploded to (group_id, pos, value) scalar rows so the
#     hash compare never depends on array stringification.
def q_pooling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.functions.pooling import (
        pool_avg,
        pool_cls,
        pool_cls_avg,
        pool_last,
        pool_max,
        pool_sum,
    )

    emb = _read(spark, sf_dir, "embeddings")
    g = (
        emb.withColumn("group_id", (F.col("vec_id") / 4).cast("long"))
        .groupBy("group_id")
        .agg(F.sort_array(F.collect_list(F.struct("vec_id", "embedding"))).alias("items"))
        .filter(F.size("items") == 4)
    )
    states = F.transform(F.col("items"), lambda s: s["embedding"])
    mask = F.transform(
        F.col("items"),
        lambda s: F.when((s["vec_id"] % 4) == (F.col("group_id") % 4), F.lit(0)).otherwise(
            F.lit(1)
        ),
    )
    pooled = g.select(
        "group_id",
        pool_avg(states, mask).alias("pa"),
        pool_max(states, mask).alias("pm"),
        pool_sum(states, mask).alias("psum"),
        pool_cls(states, mask).alias("pc"),
        pool_last(states, mask).alias("pl"),
        pool_cls_avg(states, mask).alias("pca"),
    )
    ex = pooled.select(
        "group_id", "pm", "psum", "pc", "pl", "pca", F.posexplode("pa").alias("pos", "avg_raw")
    )
    at = lambda c: F.get(F.col(c), F.col("pos"))  # noqa: E731
    return ex.select(
        "group_id",
        F.col("pos").cast("long").alias("pos"),
        F.round("avg_raw", 6).alias("avg_val"),
        F.round(at("pm"), 6).alias("max_val"),
        F.round(at("psum"), 6).alias("sum_val"),
        F.round(at("pc"), 6).alias("cls_val"),
        F.round(at("pl"), 6).alias("last_val"),
        F.round(at("pca"), 6).alias("clsavg_val"),
    )


# --- P8/P9: L2-normalize then Matryoshka prefix slice
#     (reference angle.py:1251-1252, 299-313)
def q_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.functions.pooling import embedding_slice, l2_normalize

    emb = _read(spark, sf_dir, "embeddings")
    sliced = embedding_slice(l2_normalize(F.col("embedding")), 0, 8)
    return emb.select("vec_id", F.posexplode(sliced).alias("pos", "raw")).select(
        "vec_id",
        F.col("pos").cast("long").alias("pos"),
        F.round("raw", 6).alias("nval"),
    )


# --- F6 + F4/F5: the reference CorrelationEvaluator's four similarity
#     kernels via operators/evaluate.paired_similarities
#     (reference evaluation.py:55-58)
def q_vector_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.operators.evaluate import paired_similarities

    emb = _read(spark, sf_dir, "embeddings")
    n_pairs = 250
    a = emb.filter(F.col("vec_id") < n_pairs).select(
        F.col("vec_id").alias("pair_id"),
        F.col("embedding").alias("vec1"),
        F.col("label").alias("l1"),
    )
    b = emb.filter((F.col("vec_id") >= n_pairs) & (F.col("vec_id") < 2 * n_pairs)).select(
        (F.col("vec_id") - n_pairs).alias("pair_id"),
        F.col("embedding").alias("vec2"),
        F.col("label").alias("l2"),
    )
    pairs = a.join(b, "pair_id").withColumn(
        "label", (F.col("l1") == F.col("l2")).cast("double")
    )
    sims = paired_similarities(pairs)
    return sims.select(
        "pair_id",
        F.round("cosine", 6).alias("cosine"),
        F.round("dot", 6).alias("dot"),
        F.round("neg_manhattan", 6).alias("neg_manhattan"),
        F.round("neg_euclidean", 6).alias("neg_euclidean"),
    )


# --- F9/F10/A6: softmax + logsumexp kernels (reference loss.py:40-44)
def q_softmax_lse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.functions.vector_math import logsumexp, softmax

    emb = _read(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id",
        logsumexp(F.col("embedding")).alias("lse_raw"),
        F.posexplode(softmax(F.col("embedding"))).alias("pos", "sm_raw"),
    )
    return ex.select(
        "vec_id",
        F.col("pos").cast("long").alias("pos"),
        F.round("sm_raw", 6).alias("softmax_val"),
        F.round("lse_raw", 6).alias("lse"),
    )


# --- A10: PCA's distributed stage — the D x D population covariance via
#     mapInPandas gram/sum partials (reference ESE pca_compress,
#     angle.py:465-478). The eigendecomposition after it is D x D
#     driver-local linalg (not SQL-expressible), covered by pytest.
def q_pca_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.operators.pca import covariance_stats

    emb = _read(spark, sf_dir, "embeddings")
    cov, _ = covariance_stats(emb)
    d = cov.shape[0]
    rows = [(i, j, round(float(cov[i, j]), 6)) for i in range(d) for j in range(d)]
    return spark.createDataFrame(rows, schema="i long, j long, cov double")


# --- ANN: banded random-hyperplane LSH with exact cosine rescore
#     (operators/ann.py; scale path for the reference's dense retrieval,
#     README.md:119-128). The oracle replicates the EXACT algorithm —
#     hyperplanes are baked into the SQL as literals — so the hash check
#     verifies the LSH itself; recall >= 0.9 vs brute force is gated in
#     tests/test_ann.py. 24 planes x 2-bit bands: random gaussian vectors
#     (no planted cluster structure) need many bands for recall, at the
#     cost of a weak candidate filter at this tiny scale — with real
#     near-duplicate structure the same config prunes far harder.
ANN_N_PLANES, ANN_BAND_BITS, ANN_K, ANN_N_QUERIES = 24, 2, 10, 5


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.operators.ann import lsh_topk

    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < ANN_N_QUERIES).select(
        F.concat(F.lit("q"), F.col("vec_id")).alias("query_id"),
        F.col("embedding").alias("qvec"),
    )
    corpus = emb.filter(F.col("vec_id") >= ANN_N_QUERIES)
    out = lsh_topk(
        corpus,
        queries,
        dim=64,
        k=ANN_K,
        n_planes=ANN_N_PLANES,
        band_bits=ANN_BAND_BITS,
    )
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "vec_id",
        F.round("cosine", 6).alias("cosine"),
    )


# --- ANN, inverted-file path: IVF-flat (operators/ann.py::ivf_topk) —
#     the second classic ANN scale shape next to LSH. The oracle
#     replicates the EXACT algorithm (deterministic smallest-vec_id coarse
#     quantizer, same reduced-L2 assignment, same probe set, same
#     rescore), so the hash verifies the IVF itself. Recall vs brute
#     force is gated in tests/test_ann.py (random gaussian embeddings are
#     IVF's worst case — no cluster structure; 0.70 at cells=16/nprobe=8).
IVF_N_CELLS, IVF_NPROBE = 16, 8


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.operators.ann import ivf_topk

    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < ANN_N_QUERIES).select(
        F.concat(F.lit("q"), F.col("vec_id")).alias("query_id"),
        F.col("embedding").alias("qvec"),
    )
    corpus = emb.filter(F.col("vec_id") >= ANN_N_QUERIES)
    out = ivf_topk(corpus, queries, n_cells=IVF_N_CELLS, nprobe=IVF_NPROBE, k=ANN_K)
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "vec_id",
        F.round("cosine", 6).alias("cosine"),
    )


# --- F11/F12: the reference's loss kernels — angle-difference (complex
#     division, reference loss.py:62-81), MSE (angle.py:374-382) and KL
#     over softmax distributions (loss.py:8-20) — per embedding pair.
def q_loss_kernels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.functions.vector_math import (
        angle_pairwise,
        kl_divergence,
        mse,
        softmax,
    )

    emb = _read(spark, sf_dir, "embeddings")
    n_pairs = 250
    a = emb.filter(F.col("vec_id") < n_pairs).select(
        F.col("vec_id").alias("pair_id"), F.col("embedding").alias("v1")
    )
    b = emb.filter((F.col("vec_id") >= n_pairs) & (F.col("vec_id") < 2 * n_pairs)).select(
        (F.col("vec_id") - n_pairs).alias("pair_id"), F.col("embedding").alias("v2")
    )
    pairs = a.join(b, "pair_id")
    return pairs.select(
        "pair_id",
        F.round(angle_pairwise(F.col("v1"), F.col("v2")), 6).alias("angle_dist"),
        F.round(mse(F.col("v1"), F.col("v2")), 6).alias("mse"),
        F.round(
            kl_divergence(softmax(F.col("v1")), softmax(F.col("v2"))), 6
        ).alias("kl_softmax"),
    )


# --- PREFIX (wildcard) retrieval over the compressed index: `stem*`
#     leaves expand to the top-df vocabulary terms via a distributed
#     startswith filter on term_stats (query/prefix.py), then score as a
#     standard disjunction. max_expansions=3 is deliberately small: at
#     sf0.01 's*' matches 6 vocabulary terms, so the (df DESC, term ASC)
#     cap is load-bearing — an uncapped (or differently-ordered)
#     expansion cannot pass this oracle.
PREFIX_QUERY_SET: list[tuple[str, str, int]] = [
    ("pf1", "jo*", 10),
    ("pf2", "s*", 10),
    ("pf3", "fil* merge", 10),
    ("pf4", "zz* scan", 10),
    ("pf5", "du* qu*", 10),
    ("pf6", "the fast* key", 10),
]
PREFIX_MAX_EXPANSIONS = 3


def q_bm25_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import wand_topk

    merged, tstats, meta = load_index(spark, _cached_doc_index(spark, sf_dir))
    out = wand_topk(
        spark,
        merged,
        tstats,
        meta,
        _doc_queries_df(spark, PREFIX_QUERY_SET),
        mode="prefix",
        max_expansions=PREFIX_MAX_EXPANSIONS,
    )
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def _bm25_prefix_oracle_sql() -> str:
    """The oracle re-derives the expansion independently: per (query,
    stem), the top-PREFIX_MAX_EXPANSIONS terms by (df DESC, term ASC)
    whose text LIKE 'stem%', unioned with the literal tokens, then the
    standard BM25 CTEs. The parse (which chunk is a prefix) is shared
    driver-side — trivial string syntax; the expansion RANKING and the
    scoring are what the engine must match."""
    from angle_spark.query.prefix import parse_prefix_text

    lit_rows: list[tuple[str, int, str]] = []
    stem_rows: list[tuple[str, int, str]] = []
    for qid, text, k in PREFIX_QUERY_SET:
        lits, stems = parse_prefix_text(text)
        lit_rows += [(qid, k, t) for t in lits]
        stem_rows += [(qid, k, s) for s in stems]

    def values(rows, col3):
        if not rows:
            return (
                "(SELECT NULL::VARCHAR, NULL::INT, NULL::VARCHAR WHERE false)"
                f" AS t(query_id, k, {col3})"
            )
        body = ", ".join(f"('{q}', {k}, '{v}')" for q, k, v in rows)
        return f"(VALUES {body}) AS t(query_id, k, {col3})"

    toks = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS tokens FROM documents
), dl AS (
  SELECT doc_id, len(tokens)::BIGINT AS dl FROM docs
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), stats AS (
  SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM dl
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), qliteral AS (
  SELECT query_id, k, term FROM {values(lit_rows, "term")}
), qprefix AS (
  SELECT query_id, k, stem FROM {values(stem_rows, "stem")}
), expanded AS (
  SELECT query_id, k, term FROM (
    SELECT qp.query_id, qp.k, dft.term,
           row_number() OVER (PARTITION BY qp.query_id, qp.stem
                              ORDER BY dft.df DESC, dft.term ASC) AS r
    FROM qprefix qp JOIN dft ON dft.term LIKE qp.stem || '%'
  ) WHERE r <= {PREFIX_MAX_EXPANSIONS}
), qterms AS (
  SELECT DISTINCT query_id, k, term FROM (
    SELECT * FROM qliteral UNION ALL SELECT * FROM expanded
  )
), scored AS (
  SELECT qt.query_id, qt.k, tf.doc_id,
         sum( ln((s.n_docs - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) ) AS raw
  FROM qterms qt
  JOIN tf  ON tf.term = qt.term
  JOIN dft ON dft.term = qt.term
  JOIN dl  ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, qt.k, tf.doc_id
), ranked AS (
  SELECT query_id, k, doc_id, raw,
         row_number() OVER (PARTITION BY query_id ORDER BY raw DESC, doc_id ASC) AS rnk
  FROM scored
)
SELECT query_id, rnk AS rank, doc_id, round(raw, 6) AS score
FROM ranked WHERE rnk <= k
"""


# --- ALTERNATIVE SCORERS over the same posting statistics
#     (query/scorers.py): TF-IDF (SMART ltn) and query-likelihood with
#     Dirichlet smoothing. The LM scorer consumes the cf statistic the
#     index persists through merges (index/stats.py, A9).
def q_tfidf_topk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.query.scorers import tfidf_topk

    docs = with_tokens(_read(spark, sf_dir, "documents")).select(
        "doc_id", "tokens", "dl"
    )
    tf = term_frequencies(docs).localCheckpoint()
    n_docs, _ = corpus_stats(docs)
    tstats = term_stats(tf, n_docs)
    out = tfidf_topk(tf, tstats, _doc_queries_df(spark), n_docs)
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def _tfidf_oracle_sql() -> str:
    toks = duckdb_tokens_sql("text")
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), stats AS (
  SELECT count(*)::BIGINT AS n_docs FROM docs
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), qterms AS (
  SELECT DISTINCT query_id, k, unnest({duckdb_tokens_sql('text')}) AS term
  FROM {_doc_queries_values_sql()}
), scored AS (
  SELECT qt.query_id, qt.k, tf.doc_id,
         sum( (1.0 + ln(tf.tf)) * ln(s.n_docs::DOUBLE / dft.df) ) AS raw
  FROM qterms qt
  JOIN tf  ON tf.term = qt.term
  JOIN dft ON dft.term = qt.term
  CROSS JOIN stats s
  GROUP BY qt.query_id, qt.k, tf.doc_id
), ranked AS (
  SELECT query_id, k, doc_id, raw,
         row_number() OVER (PARTITION BY query_id ORDER BY raw DESC, doc_id ASC) AS rnk
  FROM scored
)
SELECT query_id, rnk AS rank, doc_id, round(raw, 6) AS score
FROM ranked WHERE rnk <= k
"""


LMD_MU = 2000.0


def q_lmd_topk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.query.scorers import lmd_topk

    docs = with_tokens(_read(spark, sf_dir, "documents")).select(
        "doc_id", "tokens", "dl"
    )
    tf = term_frequencies(docs).localCheckpoint()
    out = lmd_topk(tf, _doc_queries_df(spark), mu=LMD_MU)
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def _lmd_oracle_sql() -> str:
    toks = duckdb_tokens_sql("text")
    mu = LMD_MU
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS tokens FROM documents
), dl AS (
  SELECT doc_id, len(tokens)::BIGINT AS dl FROM docs
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), cfs AS (
  SELECT term, sum(tf)::BIGINT AS cf FROM tf GROUP BY term
), tot AS (
  SELECT sum(tf)::BIGINT AS c FROM tf
), qterms AS (
  SELECT DISTINCT query_id, k, unnest({duckdb_tokens_sql('text')}) AS term
  FROM {_doc_queries_values_sql()}
), qv AS (
  SELECT query_id, count(DISTINCT qt.term)::INT AS qlen
  FROM qterms qt JOIN cfs ON cfs.term = qt.term
  GROUP BY query_id
), scored AS (
  SELECT qt.query_id, qt.k, tf.doc_id, dl.dl,
         sum( ln(1.0 + tf.tf / ({mu} * cfs.cf / t.c)) ) AS part
  FROM qterms qt
  JOIN tf  ON tf.term = qt.term
  JOIN cfs ON cfs.term = qt.term
  JOIN dl  ON dl.doc_id = tf.doc_id
  CROSS JOIN tot t
  GROUP BY qt.query_id, qt.k, tf.doc_id, dl.dl
), ranked AS (
  SELECT s.query_id, s.k, s.doc_id,
         s.part + qv.qlen * ln({mu} / (s.dl + {mu})) AS raw,
         row_number() OVER (
           PARTITION BY s.query_id
           ORDER BY s.part + qv.qlen * ln({mu} / (s.dl + {mu})) DESC,
                    s.doc_id ASC
         ) AS rnk
  FROM scored s JOIN qv ON qv.query_id = s.query_id
)
SELECT query_id, rnk AS rank, doc_id, round(raw, 6) AS score
FROM ranked WHERE rnk <= k
"""


# --- FACETED COUNTS + SNIPPETS over the ranked results — the serving
#     surface around the ranked list (query/facets.py, query/snippets.py)
def q_bm25_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.facets import facet_counts
    from angle_spark.query.wand import wand_topk

    merged, tstats, meta = load_index(spark, _cached_doc_index(spark, sf_dir))
    res = wand_topk(spark, merged, tstats, meta, _doc_queries_df(spark))
    return facet_counts(res, _read(spark, sf_dir, "documents"), ("lang", "source"))


def _bm25_facets_oracle_sql() -> str:
    base = _bm25_oracle_sql()
    return f"""
WITH topk AS (
  {base}
)
SELECT t.query_id, d.lang, d.source, count(*)::BIGINT AS n_docs
FROM topk t JOIN documents d USING (doc_id)
GROUP BY t.query_id, d.lang, d.source
"""


SNIPPET_WIDTH = 3


def q_bm25_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.snippets import snippets
    from angle_spark.query.wand import wand_topk

    merged, tstats, meta = load_index(spark, _cached_doc_index(spark, sf_dir))
    q = _doc_queries_df(spark)
    res = wand_topk(spark, merged, tstats, meta, q)
    out = snippets(
        spark, res, _read(spark, sf_dir, "documents"), q, width=SNIPPET_WIDTH
    )
    return out.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "doc_id", "snippet"
    )


def _bm25_snippets_oracle_sql() -> str:
    """Snippet truth in SQL: smallest 1-based first-occurrence position
    over the query's distinct terms (list_position returns 0 when
    absent -> nullif), then an inclusive token slice clamped at the
    document edges."""
    w = SNIPPET_WIDTH
    base = _bm25_oracle_sql()
    return f"""
WITH topk AS (
  {base}
), docs2 AS (
  SELECT doc_id, {duckdb_tokens_sql('text')} AS tokens FROM documents
), qt2 AS (
  SELECT DISTINCT query_id, unnest({duckdb_tokens_sql('text')}) AS term
  FROM {_doc_queries_values_sql()}
), pos1 AS (
  SELECT t.query_id, t.rank, t.doc_id,
         min(nullif(list_position(d.tokens, qt.term), 0)) AS p
  FROM topk t
  JOIN docs2 d USING (doc_id)
  JOIN qt2 qt ON qt.query_id = t.query_id
  GROUP BY t.query_id, t.rank, t.doc_id
)
SELECT p1.query_id, p1.rank, p1.doc_id,
       CASE WHEN p1.p IS NULL THEN ''
            ELSE array_to_string(
                   list_slice(d.tokens, greatest(1, p1.p - {w}), p1.p + {w}),
                   ' ')
       END AS snippet
FROM pos1 p1 JOIN docs2 d USING (doc_id)
"""


# --- MORE-LIKE-THIS: document-as-query relevance feedback
#     (query/mlt.py) — top tf·idf terms of each source doc run as a BM25
#     disjunction, source excluded pre-ranking. The reference's dense
#     twin is encode-doc-and-rank-by-cosine (reference README.md:119-128).
MLT_SOURCE_DOCS = [0, 100, 200]
MLT_MAX_TERMS = 5
MLT_K = 10


def q_more_like_this(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.query.mlt import more_like_this

    docs = with_tokens(_read(spark, sf_dir, "documents")).select(
        "doc_id", "tokens", "dl"
    )
    tf = term_frequencies(docs).localCheckpoint()
    n_docs, avgdl = corpus_stats(docs)
    tstats = term_stats(tf, n_docs)
    out = more_like_this(
        tf, tstats, MLT_SOURCE_DOCS, n_docs, avgdl, k=MLT_K, max_terms=MLT_MAX_TERMS
    )
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def _mlt_oracle_sql() -> str:
    """Term selection truth (top max_terms by tf·ln(N/df), term-asc
    ties), then standard BM25 over the selected terms with the source
    doc excluded BEFORE the rank window."""
    toks = duckdb_tokens_sql("text")
    srcs = ", ".join(f"({d})" for d in MLT_SOURCE_DOCS)
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS tokens FROM documents
), dl AS (
  SELECT doc_id, len(tokens)::BIGINT AS dl FROM docs
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), stats AS (
  SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM dl
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), src AS (
  SELECT src_id FROM (VALUES {srcs}) s(src_id)
), sel AS (
  SELECT src_id, term, df FROM (
    SELECT s.src_id, tf.term, dft.df,
           row_number() OVER (
             PARTITION BY s.src_id
             ORDER BY tf.tf * ln(st.n_docs::DOUBLE / dft.df) DESC,
                      tf.term ASC
           ) AS r
    FROM src s
    JOIN tf  ON tf.doc_id = s.src_id
    JOIN dft ON dft.term = tf.term
    CROSS JOIN stats st
  ) WHERE r <= {MLT_MAX_TERMS}
), scored AS (
  SELECT 'mlt_' || sel.src_id AS query_id, tf.doc_id,
         sum( ln((st.n_docs - sel.df + 0.5) / (sel.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) ) AS raw
  FROM sel
  JOIN tf ON tf.term = sel.term AND tf.doc_id <> sel.src_id
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats st
  GROUP BY sel.src_id, tf.doc_id
), ranked AS (
  SELECT query_id, doc_id, raw,
         row_number() OVER (PARTITION BY query_id ORDER BY raw DESC, doc_id ASC) AS rnk
  FROM scored
)
SELECT query_id, rnk AS rank, doc_id, round(raw, 6) AS score
FROM ranked WHERE rnk <= {MLT_K}
"""


# --- SPELL SUGGESTION over the vocabulary (query/suggest.py): nearest
#     terms by (levenshtein ASC, df DESC, term ASC). 'zzzzzz' is beyond
#     max_dist of everything -> contributes no rows; 'scann' is 1 edit
#     from both 'scan' and 'scans'-like terms so the df tiebreak is
#     load-bearing at sf0.01.
SUGGEST_WORDS = ["joinn", "mrege", "scann", "windoww", "zzzzzz"]
SUGGEST_MAX_DIST = 2
SUGGEST_K = 3


# --- COMPLETION suggester (round 5, Lucene/ES completion suggester —
#     search-as-you-type): top-k vocabulary completions per prefix,
#     popularity-weighted by df, (df DESC, term ASC) deterministic.
#     One term_stats scan with pushable StartsWith predicates; the
#     vocabulary never reaches the driver.
COMPLETE_PREFIXES = ["sca", "jo", "qu", "f", "zzqx"]
COMPLETE_K = 5


def q_suggest_completion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.query.suggest import complete_terms

    docs = with_tokens(_read(spark, sf_dir, "documents")).select(
        "doc_id", "tokens", "dl"
    )
    tf = term_frequencies(docs).localCheckpoint()
    n_docs, _ = corpus_stats(docs)
    tstats = term_stats(tf, n_docs)
    return complete_terms(spark, tstats, COMPLETE_PREFIXES, k=COMPLETE_K)


def _suggest_completion_oracle_sql() -> str:
    toks = duckdb_tokens_sql("text")
    pfx = ", ".join(f"('{p}')" for p in sorted(set(COMPLETE_PREFIXES)))
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), pfx AS (
  SELECT * FROM (VALUES {pfx}) AS p(prefix)
), cand AS (
  SELECT p.prefix, d.term, d.df,
         row_number() OVER (PARTITION BY p.prefix
                            ORDER BY d.df DESC, d.term ASC) AS rank
  FROM pfx p JOIN dft d ON starts_with(d.term, p.prefix)
)
SELECT prefix, rank::BIGINT AS rank, term, df
FROM cand WHERE rank <= {COMPLETE_K}
"""


def q_spell_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.query.suggest import suggest_terms

    docs = with_tokens(_read(spark, sf_dir, "documents")).select(
        "doc_id", "tokens", "dl"
    )
    tf = term_frequencies(docs).localCheckpoint()
    n_docs, _ = corpus_stats(docs)
    tstats = term_stats(tf, n_docs)
    return suggest_terms(
        spark, tstats, SUGGEST_WORDS, max_dist=SUGGEST_MAX_DIST, k=SUGGEST_K
    )


def _spell_suggest_oracle_sql() -> str:
    toks = duckdb_tokens_sql("text")
    words = ", ".join(f"('{w}')" for w in sorted(set(SUGGEST_WORDS)))
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), words AS (
  SELECT word FROM (VALUES {words}) w(word)
), cand AS (
  SELECT w.word, dft.term, dft.df,
         levenshtein(w.word, dft.term)::INT AS dist
  FROM words w CROSS JOIN dft
  WHERE abs(len(dft.term) - len(w.word)) <= {SUGGEST_MAX_DIST}
    AND levenshtein(w.word, dft.term) <= {SUGGEST_MAX_DIST}
), ranked AS (
  SELECT word, term, df, dist,
         row_number() OVER (
           PARTITION BY word ORDER BY dist ASC, df DESC, term ASC
         ) AS r
  FROM cand
)
SELECT word, r AS rank, term, dist, df
FROM ranked WHERE r <= {SUGGEST_K}
"""


# --- SUGGEST MODES (round 5, the ES term-suggester suggest_mode
#     knob): "missing" (ES's default — indexed words yield NO
#     suggestions; their df > 0 proves they need no correction),
#     "popular" (only candidates STRICTLY more frequent than the word's
#     own df — dist-0 identities vanish by construction), "always".
#     The word set mixes in-vocabulary words ("merge", "scan" — the
#     probes that make missing/popular actually bite) with OOV typos;
#     the word's own df resolves inside the one candidate scan.
SUGGEST_MODE_WORDS = ["merge", "scan", "joinn", "mrege", "zzzzzz"]


def q_suggest_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.query.suggest import suggest_terms

    docs = with_tokens(_read(spark, sf_dir, "documents")).select(
        "doc_id", "tokens", "dl"
    )
    tf = term_frequencies(docs).localCheckpoint()
    n_docs, _ = corpus_stats(docs)
    tstats = term_stats(tf, n_docs)
    frames = []
    for m in ("always", "missing", "popular"):
        frames.append(
            suggest_terms(
                spark, tstats, SUGGEST_MODE_WORDS,
                max_dist=SUGGEST_MAX_DIST, k=SUGGEST_K, suggest_mode=m,
            ).withColumn("mode", F.lit(m))
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out.select("mode", "word", "rank", "term", "dist", "df")


def _suggest_modes_oracle_sql() -> str:
    toks = duckdb_tokens_sql("text")
    words = ", ".join(f"('{w}')" for w in sorted(set(SUGGEST_MODE_WORDS)))
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS tokens FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), words AS (
  SELECT w.word, coalesce(d.df, 0)::BIGINT AS word_df
  FROM (VALUES {words}) w(word)
  LEFT JOIN dft d ON d.term = w.word
), cand AS (
  SELECT w.word, w.word_df, dft.term, dft.df,
         levenshtein(w.word, dft.term)::INT AS dist
  FROM words w CROSS JOIN dft
  WHERE abs(len(dft.term) - len(w.word)) <= {SUGGEST_MAX_DIST}
    AND levenshtein(w.word, dft.term) <= {SUGGEST_MAX_DIST}
), modes AS (
  SELECT 'always' AS mode, word, term, df, dist FROM cand
  UNION ALL
  SELECT 'missing', word, term, df, dist FROM cand WHERE word_df = 0
  UNION ALL
  SELECT 'popular', word, term, df, dist FROM cand WHERE df > word_df
), ranked AS (
  SELECT mode, word, term, df, dist,
         row_number() OVER (
           PARTITION BY mode, word ORDER BY dist ASC, df DESC, term ASC
         ) AS r
  FROM modes
)
SELECT mode, word, r AS rank, term, dist, df
FROM ranked WHERE r <= {SUGGEST_K}
"""


# --- RETRIEVE-THEN-RERANK: BM25 top-C candidates, exact-cosine second
#     stage over ONLY those candidates (query/rerank.py) — the
#     production two-stage shape where the reference's dense scorer
#     (reference README.md:119-128) is stage two instead of a full
#     corpus scan. Same query+anchor set as hybrid_topk so the two
#     marriages of sparse and dense are directly comparable.
RERANK_C = 50  # stage-1 candidate depth
RERANK_K = 10  # final depth


def q_bm25_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.rerank import rerank_dense
    from angle_spark.query.wand import wand_topk

    merged, tstats, meta = load_index(spark, _cached_doc_index(spark, sf_dir))
    queries = spark.createDataFrame(
        [(qid, text, 1_000_000) for qid, text, _ in HYBRID_QUERY_SET],
        schema="query_id string, text string, k int",
    )
    sp = wand_topk(spark, merged, tstats, meta, queries, prune=True)
    # candidate selection on the rounded key (oracle-deterministic tie
    # order, same contract as q_hybrid_topk)
    ws = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    cand = (
        sp.select("query_id", "doc_id", "score")
        .withColumn("rank", F.row_number().over(ws))
        .filter(F.col("rank") <= RERANK_C)
    )
    emb = _read(spark, sf_dir, "embeddings")
    anchors = spark.createDataFrame(
        [(qid, a) for qid, _, a in HYBRID_QUERY_SET],
        schema="query_id string, anchor long",
    )
    qvecs = anchors.join(emb, anchors.anchor == emb.vec_id).select(
        "query_id", F.col("embedding").alias("qv")
    )
    out = rerank_dense(cand, emb, qvecs, RERANK_K, rank_on_rounded=True)
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("cosine", 6).alias("cosine"),
        F.round("stage1_score", 6).alias("bm25_score"),
    )


def _rerank_oracle_sql() -> str:
    toks = duckdb_tokens_sql("text")
    qvals = ", ".join(f"('{q}', '{t}')" for q, t, _ in HYBRID_QUERY_SET)
    anchors = ", ".join(f"('{q}', {a})" for q, _, a in HYBRID_QUERY_SET)
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS tokens FROM documents
), dl AS (
  SELECT doc_id, len(tokens)::BIGINT AS dl FROM docs
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), stats AS (
  SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM dl
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), qterms AS (
  SELECT DISTINCT query_id, unnest({duckdb_tokens_sql('text')}) AS term
  FROM (VALUES {qvals}) AS q(query_id, text)
), bm AS (
  SELECT qt.query_id, tf.doc_id,
         sum( ln((s.n_docs - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) ) AS raw
  FROM qterms qt
  JOIN tf  ON tf.term = qt.term
  JOIN dft ON dft.term = qt.term
  JOIN dl  ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
), cand AS (
  SELECT query_id, doc_id, raw,
         row_number() OVER (PARTITION BY query_id ORDER BY round(raw, 6) DESC, doc_id ASC) AS srank
  FROM bm
), anch AS (
  SELECT * FROM (VALUES {anchors}) AS a(query_id, anchor)
), qv AS (
  SELECT a.query_id, e.embedding::DOUBLE[] AS qv
  FROM anch a JOIN embeddings e ON e.vec_id = a.anchor
), rer AS (
  SELECT c.query_id, c.doc_id, c.raw,
         list_dot_product(e.embedding::DOUBLE[], qv.qv)
         / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
            * sqrt(list_dot_product(qv.qv, qv.qv))) AS cos_raw
  FROM (SELECT * FROM cand WHERE srank <= {RERANK_C}) c
  JOIN embeddings e ON e.vec_id = c.doc_id
  JOIN qv ON qv.query_id = c.query_id
), ranked AS (
  SELECT query_id, doc_id, cos_raw, raw,
         row_number() OVER (PARTITION BY query_id ORDER BY round(cos_raw, 6) DESC, doc_id ASC) AS rnk
  FROM rer
)
SELECT query_id, rnk AS rank, doc_id,
       round(cos_raw, 6) AS cosine, round(raw, 6) AS bm25_score
FROM ranked WHERE rnk <= {RERANK_K}
"""


# --- RESULT COLLAPSING (query/collapse.py): best hit per (query,
#     source), re-ranked — "one result per site". k > corpus on the
#     first stage so collapsing is what bounds the output: each query's
#     full answer set (~400 docs at sf0.01) collapses to |sources| = 20
#     groups, of which the top COLLAPSE_K survive.
COLLAPSE_QUERY_SET: list[tuple[str, str, int]] = [
    ("cl1", "hash join", 100000),
    ("cl2", "dup", 100000),
    ("cl3", "scan filter merge", 100000),
]
COLLAPSE_FIELD = "source"
COLLAPSE_K = 10


def q_bm25_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.collapse import collapse_topk
    from angle_spark.query.wand import wand_topk

    merged, tstats, meta = load_index(spark, _cached_doc_index(spark, sf_dir))
    sp = wand_topk(
        spark, merged, tstats, meta, _doc_queries_df(spark, COLLAPSE_QUERY_SET)
    )
    # full answer sets -> rank on the rounded key (q_bm25_boolean contract)
    ws = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    ranked = sp.select("query_id", "doc_id", "score").withColumn(
        "rank", F.row_number().over(ws)
    )
    out = collapse_topk(
        ranked,
        _read(spark, sf_dir, "documents"),
        COLLAPSE_FIELD,
        COLLAPSE_K,
    )
    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
        COLLAPSE_FIELD,
    )


def _collapse_oracle_sql() -> str:
    base = _bm25_oracle_sql(
        query_set=COLLAPSE_QUERY_SET, rank_on_rounded=True
    )
    return f"""
WITH topk AS (
  {base}
), grouped AS (
  SELECT t.query_id, t.rank, t.doc_id, t.score, d.{COLLAPSE_FIELD},
         row_number() OVER (
           PARTITION BY t.query_id, d.{COLLAPSE_FIELD} ORDER BY t.rank ASC
         ) AS grn
  FROM topk t JOIN documents d USING (doc_id)
), winners AS (
  SELECT query_id, rank, doc_id, score, {COLLAPSE_FIELD},
         row_number() OVER (PARTITION BY query_id ORDER BY rank ASC) AS new_rank
  FROM grouped WHERE grn = 1
)
SELECT query_id, new_rank AS rank, doc_id, score, {COLLAPSE_FIELD}
FROM winners WHERE new_rank <= {COLLAPSE_K}
"""


# --- QUERY-TIME SYNONYM EXPANSION (query/synonyms.py): thesaurus terms
#     join the query's token set before retrieval; the index never
#     changes. sy1 is load-bearing: 'copy' alone is OOV (0 hits) but
#     expands to 'dup' (25 docs at sf0.01) — results exist ONLY through
#     expansion. sy4 has no synonym and stays dead.
SYN_PAIRS: list[tuple[str, str]] = [
    ("copy", "dup"),
    ("join", "merge"),
    ("lookup", "scan"),
]
SYN_QUERY_SET: list[tuple[str, str, int]] = [
    ("sy1", "copy", 100000),
    ("sy2", "fast join", 100000),
    ("sy3", "lookup the", 100000),
    ("sy4", "zzzz", 10),
]


def q_bm25_synonyms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.index.build import load_index
    from angle_spark.query.synonyms import expand_queries, synonyms_df
    from angle_spark.query.wand import wand_topk

    merged, tstats, meta = load_index(spark, _cached_doc_index(spark, sf_dir))
    expanded = expand_queries(
        _doc_queries_df(spark, SYN_QUERY_SET), synonyms_df(spark, SYN_PAIRS)
    )
    out = wand_topk(spark, merged, tstats, meta, expanded)
    # full answer sets -> rank on the rounded key (q_bm25_boolean contract)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    return out.select(
        "query_id",
        F.row_number().over(w).cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def _synonyms_oracle_sql() -> str:
    toks = duckdb_tokens_sql("text")
    syn_vals = ", ".join(f"('{a}', '{b}')" for a, b in SYN_PAIRS)
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS tokens FROM documents
), dl AS (
  SELECT doc_id, len(tokens)::BIGINT AS dl FROM docs
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
  GROUP BY doc_id, term
), stats AS (
  SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM dl
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), syn AS (
  SELECT * FROM (VALUES {syn_vals}) s(term, syn)
), qtok AS (
  SELECT query_id, k, unnest({duckdb_tokens_sql('text')}) AS term
  FROM {_doc_queries_values_sql(SYN_QUERY_SET)}
), qterms AS (
  SELECT DISTINCT query_id, k, term FROM (
    SELECT query_id, k, term FROM qtok
    UNION ALL
    SELECT q.query_id, q.k, s.syn AS term FROM qtok q JOIN syn s USING (term)
  )
), scored AS (
  SELECT qt.query_id, qt.k, tf.doc_id,
         sum( ln((s.n_docs - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) ) AS raw
  FROM qterms qt
  JOIN tf  ON tf.term = qt.term
  JOIN dft ON dft.term = qt.term
  JOIN dl  ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, qt.k, tf.doc_id
), ranked AS (
  SELECT query_id, k, doc_id, raw,
         row_number() OVER (PARTITION BY query_id ORDER BY round(raw, 6) DESC, doc_id ASC) AS rnk
  FROM scored
)
SELECT query_id, rnk AS rank, doc_id, round(raw, 6) AS score
FROM ranked WHERE rnk <= k
"""


# --- DISTRIBUTED K-MEANS (operators/kmeans.py): Lloyd iterations over
#     the embeddings table — the topic-clustering / mixture-balancing
#     step of a training-data pipeline, and the principled IVF
#     quantizer trainer. Deterministic init (k smallest vec_ids),
#     smallest-cluster tie-break, empty clusters keep their centroid —
#     so the oracle replays the iterations exactly as unrolled CTEs.
KMEANS_K = 8
KMEANS_ITERS = 3


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from angle_spark.operators.kmeans import kmeans_fit

    emb = _read(spark, sf_dir, "embeddings")
    _, assign = kmeans_fit(emb, KMEANS_K, KMEANS_ITERS)
    return assign.select(
        "vec_id",
        F.col("cluster_id").cast("long").alias("cluster_id"),
        F.round("sqdist", 6).alias("sqdist"),
    )


def _kmeans_oracle_sql() -> str:
    k, iters = KMEANS_K, KMEANS_ITERS
    sqd = (
        "list_sum(list_transform(list_zip(e.v, c.centroid), "
        "p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )
    parts = [
        f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id ASC)::BIGINT AS cluster_id,
         v AS centroid
  FROM e ORDER BY vec_id ASC LIMIT {k}
)"""
    ]
    prev = "c0"
    for i in range(1, iters + 1):
        parts.append(
            f""", a{i} AS (
  SELECT vec_id, cluster_id, sqdist FROM (
    SELECT e.vec_id, c.cluster_id, {sqd} AS sqdist,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {sqd} ASC, c.cluster_id ASC
           ) AS rn
    FROM e CROSS JOIN {prev} c
  ) WHERE rn = 1
), m{i} AS (
  SELECT cluster_id, list(m ORDER BY dim) AS centroid FROM (
    SELECT a.cluster_id, u.dim, avg(u.val) AS m
    FROM e JOIN a{i} a USING (vec_id),
         LATERAL (SELECT unnest(e.v) AS val,
                         generate_subscripts(e.v, 1) AS dim) u
    GROUP BY a.cluster_id, u.dim
  ) GROUP BY cluster_id
), c{i} AS (
  SELECT p.cluster_id, coalesce(m.centroid, p.centroid) AS centroid
  FROM {prev} p LEFT JOIN m{i} m USING (cluster_id)
)"""
        )
        prev = f"c{i}"
    parts.append(
        f"""
SELECT vec_id, cluster_id, round(sqdist, 6) AS sqdist FROM (
  SELECT e.vec_id, c.cluster_id, {sqd} AS sqdist,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY {sqd} ASC, c.cluster_id ASC
         ) AS rn
  FROM e CROSS JOIN {prev} c
) WHERE rn = 1"""
    )
    return "".join(parts)


# --- EXACT LENGTH QUANTILES per language: the corpus-profiling step a
#     training mixture is tuned against (truncation budgets, batch
#     shaping). Spark's exact `percentile` and DuckDB's quantile_cont
#     share the linear-interpolation convention, so the oracle is exact
#     to rounding.
QUANTILE_PROBS = [0.5, 0.9, 0.99]


def q_doc_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_tokens(_read(spark, sf_dir, "documents"))
    return (
        docs.groupBy("lang")
        .agg(
            F.percentile(F.col("dl").cast("double"), QUANTILE_PROBS).alias("q"),
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("dl"), 6).alias("avg_dl"),
            F.max("dl").alias("max_dl"),
        )
        .select(
            "lang",
            F.round(F.col("q")[0], 6).alias("p50"),
            F.round(F.col("q")[1], 6).alias("p90"),
            F.round(F.col("q")[2], 6).alias("p99"),
            "n_docs",
            "avg_dl",
            "max_dl",
        )
    )


def _length_quantiles_oracle_sql() -> str:
    toks = duckdb_tokens_sql("text")
    return f"""
WITH d AS (
  SELECT lang, len({toks})::BIGINT AS dl FROM documents
), q AS (
  SELECT lang, quantile_cont(dl, {QUANTILE_PROBS}) AS qs,
         count(*)::BIGINT AS n_docs,
         round(avg(dl), 6) AS avg_dl, max(dl) AS max_dl
  FROM d GROUP BY lang
)
SELECT lang, round(qs[1], 6) AS p50, round(qs[2], 6) AS p90,
       round(qs[3], 6) AS p99, n_docs, avg_dl, max_dl
FROM q
"""


# --- DETERMINISTIC STRATIFIED SAMPLING: exactly n docs per stratum,
#     chosen by md5(doc_id) order — reproducible across engines and
#     runs (no RNG), the mixture-balancing primitive of a training-data
#     pipeline. One window per stratum over the hash — a single
#     shuffle keyed by the stratum column.
STRATA_COL = "source"
STRATA_N = 5


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").select("doc_id", STRATA_COL)
    w = Window.partitionBy(STRATA_COL).orderBy(
        F.md5(F.col("doc_id").cast("string")), F.asc("doc_id")
    )
    return (
        docs.withColumn("pick", F.row_number().over(w))
        .filter(F.col("pick") <= STRATA_N)
        .select(STRATA_COL, F.col("pick").cast("long").alias("pick"), "doc_id")
    )


def _stratified_sample_oracle_sql() -> str:
    return f"""
SELECT {STRATA_COL}, pick, doc_id FROM (
  SELECT {STRATA_COL}, doc_id,
         row_number() OVER (
           PARTITION BY {STRATA_COL}
           ORDER BY md5(doc_id::VARCHAR), doc_id ASC
         )::BIGINT AS pick
  FROM documents
) WHERE pick <= {STRATA_N}
"""


QUERIES = {
    "bm25_topk_documents": q_bm25_topk_documents,
    "bm25_wand_index": q_bm25_wand_index,
    "bm25_resegmented": q_bm25_resegmented,
    "bm25_delete_mask": q_bm25_delete_mask,
    "bm25_purged_index": q_bm25_purged_index,
    "bm25_conjunctive": q_bm25_conjunctive,
    "bm25_phrase": q_bm25_phrase,
    "bm25_near": q_bm25_near,
    "bm25_ordered": q_bm25_ordered,
    "bm25_boolean": q_bm25_boolean,
    "bm25_common_terms": q_bm25_common_terms,
    "bm25_terms_set": q_bm25_terms_set,
    "bm25_rescore": q_bm25_rescore,
    "phrase_suggest": q_phrase_suggest,
    "bm25_filters": q_bm25_filters,
    "analyze_text": q_analyze_text,
    "bm25_field_query": q_bm25_field_query,
    "bm25_range_query": q_bm25_range_query,
    "bm25_paged": q_bm25_paged,
    "bm25_search_after": q_bm25_search_after,
    "bm25_total_hits": q_bm25_total_hits,
    "bm25_sort_by": q_bm25_sort_by,
    "bm25_sort_docvalues": q_bm25_sort_docvalues,
    "bm25_stats": q_bm25_stats,
    "bm25_extended_stats": q_bm25_extended_stats,
    "bm25_weighted_avg": q_bm25_weighted_avg,
    "bm25_group_stats": q_bm25_group_stats,
    "bm25_histogram": q_bm25_histogram,
    "bm25_date_histogram": q_bm25_date_histogram,
    "bm25_range_agg": q_bm25_range_agg,
    "bm25_histogram_pipeline": q_bm25_histogram_pipeline,
    "bm25_bucket_stats": q_bm25_bucket_stats,
    "bm25_percentile_ranks": q_bm25_percentile_ranks,
    "bm25_t_test": q_bm25_t_test,
    "bm25_boxplot": q_bm25_boxplot,
    "bm25_mad": q_bm25_mad,
    "bm25_string_stats": q_bm25_string_stats,
    "bm25_top_metrics": q_bm25_top_metrics,
    "bm25_multi_terms": q_bm25_multi_terms,
    "bm25_moving_fn": q_bm25_moving_fn,
    "bm25_bucket_sort": q_bm25_bucket_sort,
    "bm25_sig_terms": q_bm25_sig_terms,
    "bm25_percentiles": q_bm25_percentiles,
    "bm25_cardinality": q_bm25_cardinality,
    "bm25_matched_ids": q_bm25_matched_ids,
    "bm25_matrix_stats": q_bm25_matrix_stats,
    "bm25_function_score": q_bm25_function_score,
    "bm25_rank_eval": q_bm25_rank_eval,
    "msearch_indices": q_msearch_indices,
    "alias_search": q_alias_search,
    "has_child_topk": q_has_child_topk,
    "conv_expand": q_conv_expand,
    "term_vectors_docs": q_term_vectors_docs,
    "pii_redaction": q_pii_redaction,
    "bm25_span_first": q_bm25_span_first,
    "bm25_adjacency": q_bm25_adjacency,
    "bm25_phrase_prefix": q_bm25_phrase_prefix,
    "bm25_delete_by_query": q_bm25_delete_by_query,
    "bm25_composite": q_bm25_composite,
    "bm25_top_hits": q_bm25_top_hits,
    "dismax_fielded": q_dismax_fielded,
    "cross_fields": q_cross_fields,
    "update_by_query": q_update_by_query,
    "index_stats": q_index_stats,
    "bm25_sliced_export": q_bm25_sliced_export,
    "percolate_docs": q_percolate_docs,
    "bm25_stemmed": q_bm25_stemmed,
    "bm25_reindexed": q_bm25_reindexed,
    "bm25_explain": q_bm25_explain,
    "bm25_fuzzy": q_bm25_fuzzy,
    "bm25_regex": q_bm25_regex,
    "bm25_wildcard": q_bm25_wildcard,
    "bm25_boosting": q_bm25_boosting,
    "constant_score": q_constant_score,
    "bm25_must_not": q_bm25_must_not,
    "fuzzy_prefix_expand": q_fuzzy_prefix_expand,
    "bm25_boosted": q_bm25_boosted,
    "bm25_filtered": q_bm25_filtered,
    "hybrid_topk": q_hybrid_topk,
    "hybrid_ann_topk": q_hybrid_ann_topk,
    "bm25_fielded": q_bm25_fielded,
    "bm25_prefix": q_bm25_prefix,
    "tfidf_topk_documents": q_tfidf_topk_documents,
    "lmd_topk_documents": q_lmd_topk_documents,
    "bm25_facets": q_bm25_facets,
    "bm25_snippets": q_bm25_snippets,
    "more_like_this": q_more_like_this,
    "spell_suggest": q_spell_suggest,
    "suggest_modes": q_suggest_modes,
    "suggest_completion": q_suggest_completion,
    "bm25_min_match": q_bm25_min_match,
    "bm25_rerank": q_bm25_rerank,
    "bm25_collapse": q_bm25_collapse,
    "bm25_synonyms": q_bm25_synonyms,
    "kmeans_clusters": q_kmeans_clusters,
    "doc_length_quantiles": q_doc_length_quantiles,
    "stratified_sample": q_stratified_sample,
    "doc_term_df": q_doc_term_df,
    "doc_lengths": q_doc_lengths,
    "corpus_stats": q_corpus_stats,
    "term_tf": q_term_tf,
    "dedup_exact_text": q_dedup_exact_text,
    "events_json_extract": q_events_json_extract,
    "events_agg": q_events_agg,
    "events_topk_per_user": q_events_topk_per_user,
    "orders_label_remap": q_orders_label_remap,
    "prompt_format": q_prompt_format,
    "paired_join": q_paired_join,
    "spearman_qty_price": q_spearman_qty_price,
    "cosine_topk": q_cosine_topk,
    "union_distinct_nations": q_union_distinct_nations,
    "multivalue_sample": q_multivalue_sample,
    "tpch_q1": q_tpch_q1,
    "doc_quality": q_doc_quality,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "ngram_contamination": q_ngram_contamination,
    "simhash_fingerprints": q_simhash_fingerprints,
    "simhash_near_pairs": q_simhash_near_pairs,
    "embedding_topk_pairs": q_embedding_topk_pairs,
    "embedding_near_pairs_lsh": q_embedding_near_pairs_lsh,
    "doc_langid": q_doc_langid,
    "token_counts": q_token_counts,
    "doc_fingerprints": q_doc_fingerprints,
    "correlation_eval": q_correlation_eval,
    "tpch_q6": q_tpch_q6,
    "tpch_q3": q_tpch_q3,
    "events_sessionize": q_events_sessionize,
    "orders_pivot": q_orders_pivot,
    "pooling_stats": q_pooling_stats,
    "vector_norms": q_vector_norms,
    "vector_distances": q_vector_distances,
    "softmax_lse": q_softmax_lse,
    "pca_covariance": q_pca_covariance,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "loss_kernels": q_loss_kernels,
}

# shared oracle fragments for the dedup family
from angle_spark.operators.dedup import duckdb_hash32  # noqa: E402
from angle_spark.operators.dedup import A as _MH_A  # noqa: E402
from angle_spark.operators.dedup import B_COEF as _MH_B  # noqa: E402
from angle_spark.operators.dedup import N_HASHES as _NH  # noqa: E402
from angle_spark.operators.dedup import P as _MH_P  # noqa: E402

_FAM_VALUES = ", ".join(f"({k}, {_MH_A[k]}, {_MH_B[k]})" for k in range(_NH))

_TOKS = duckdb_tokens_sql("text")

_SHINGLES_CTE = f"""
toks AS (
  SELECT doc_id, unnest(tokens) AS term, unnest(range(1, len(tokens)+1)) AS pos
  FROM (SELECT doc_id, {_TOKS} AS tokens FROM documents)
), sh AS (
  SELECT DISTINCT doc_id,
         term || ' ' || lead(term,1) OVER w || ' ' || lead(term,2) OVER w AS shingle
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY lead(term,2) OVER w IS NOT NULL
)"""

ORACLE_SQL = {
    "bm25_topk_documents": _bm25_oracle_sql(),
    # the compressed path must be rank- AND score-identical to the same
    # SQL BM25 the declarative path is checked against
    "bm25_wand_index": _bm25_oracle_sql(),
    "bm25_resegmented": _bm25_oracle_sql(),
    "bm25_delete_mask": _bm25_oracle_sql(candidate_where="WHERE tf.doc_id % 7 <> 0"),
    "bm25_purged_index": _bm25_oracle_sql(docs_where="WHERE doc_id % 7 <> 0"),
    "bm25_conjunctive": _bm25_oracle_sql(conjunctive=True, query_set=CONJ_QUERY_SET),
    "bm25_min_match": _bm25_oracle_sql(
        min_match=MM_MIN_MATCH, query_set=MM_QUERY_SET, rank_on_rounded=True
    ),
    "bm25_rerank": _rerank_oracle_sql(),
    "bm25_collapse": _collapse_oracle_sql(),
    "bm25_synonyms": _synonyms_oracle_sql(),
    "kmeans_clusters": _kmeans_oracle_sql(),
    "doc_length_quantiles": _length_quantiles_oracle_sql(),
    "stratified_sample": _stratified_sample_oracle_sql(),
    "bm25_phrase": _bm25_phrase_oracle_sql(),
    "bm25_near": _bm25_near_oracle_sql(),
    "bm25_ordered": _bm25_ordered_oracle_sql(),
    "bm25_boolean": _bm25_boolean_oracle_sql(),
    "bm25_common_terms": _common_terms_oracle_sql(
        COMMON_QUERY_SET, COMMON_CUTOFF
    ),
    "bm25_terms_set": _terms_set_oracle_sql(TERMS_SET_QUERY_SET),
    "bm25_rescore": _rescore_oracle_sql(RESCORE_QUERY_SET),
    "phrase_suggest": _phrase_suggest_oracle_sql(
        PHRASE_SUGGEST_QUERIES, PS_TOP_N
    ),
    "bm25_filters": _filters_agg_oracle_sql(
        FILTERS_AGG_MAINS, FILTERS_AGG_FILTERS
    ),
    "analyze_text": _analyze_oracle_sql(ANALYZE_SAMPLES, ANALYZE_TEXT),
    "bm25_field_query": _bm25_boolean_oracle_sql(FIELD_QUERY_SET),
    "bm25_range_query": _bm25_boolean_oracle_sql(RANGE_QUERY_SET),
    "bm25_paged": _bm25_boolean_oracle_sql(
        PAGED_QUERY_SET, rank_on_rounded=False, offset=PAGE_OFFSET
    ),
    # cursor pages tile the offset ranking exactly — same truth, ranks
    # renumbered per page (search_after restarts at 1)
    "bm25_search_after": (
        f"SELECT query_id, (rank - {PAGE_OFFSET})::BIGINT AS rank, "
        "doc_id, score FROM ("
        + _bm25_boolean_oracle_sql(
            PAGED_QUERY_SET, rank_on_rounded=False, offset=PAGE_OFFSET
        )
        + ")"
    ),
    "bm25_total_hits": _bool_count_oracle_sql(BOOL_QUERY_SET),
    "bm25_sort_by": _sort_by_oracle_sql(SORT_QUERY_SET),
    "bm25_sort_docvalues": _sort_by_oracle_sql(SORT_QUERY_SET),
    "bm25_stats": _stats_oracle_sql(STATS_QUERY_SET),
    "bm25_extended_stats": _extended_stats_oracle_sql(STATS_QUERY_SET),
    "bm25_weighted_avg": _weighted_avg_oracle_sql(STATS_QUERY_SET),
    "bm25_group_stats": _group_stats_oracle_sql(STATS_QUERY_SET),
    "bm25_histogram": _histogram_oracle_sql(STATS_QUERY_SET),
    "bm25_date_histogram": _date_histogram_oracle_sql(STATS_QUERY_SET),
    "bm25_range_agg": _range_agg_oracle_sql(STATS_QUERY_SET),
    "bm25_histogram_pipeline": _histogram_pipeline_oracle_sql(STATS_QUERY_SET),
    "bm25_bucket_stats": _bucket_stats_oracle_sql(STATS_QUERY_SET),
    "bm25_percentile_ranks": _percentile_ranks_oracle_sql(STATS_QUERY_SET, PCTRANK_AT),
    "bm25_t_test": _t_test_oracle_sql(STATS_QUERY_SET),
    "bm25_boxplot": _boxplot_oracle_sql(STATS_QUERY_SET),
    "bm25_mad": _mad_oracle_sql(STATS_QUERY_SET),
    "bm25_string_stats": _string_stats_oracle_sql(STATS_QUERY_SET),
    "bm25_top_metrics": _top_metrics_oracle_sql(STATS_QUERY_SET),
    "bm25_multi_terms": _multi_terms_oracle_sql(STATS_QUERY_SET),
    "bm25_moving_fn": _moving_fn_oracle_sql(STATS_QUERY_SET),
    "bm25_bucket_sort": _bucket_sort_oracle_sql(STATS_QUERY_SET),
    "bm25_sig_terms": _sig_terms_oracle_sql(STATS_QUERY_SET),
    "bm25_percentiles": _percentiles_oracle_sql(STATS_QUERY_SET),
    "bm25_cardinality": _cardinality_oracle_sql(STATS_QUERY_SET),
    "bm25_matched_ids": _matched_ids_oracle_sql(STATS_QUERY_SET),
    "bm25_matrix_stats": _matrix_stats_oracle_sql(STATS_QUERY_SET),
    "bm25_function_score": _function_score_oracle_sql(STATS_QUERY_SET),
    "bm25_rank_eval": _rank_eval_oracle_sql(STATS_QUERY_SET),
    "msearch_indices": _bm25_oracle_sql(),
    "alias_search": _bm25_oracle_sql(),
    "has_child_topk": _has_child_oracle_sql(STATS_QUERY_SET),
    "conv_expand": _conv_expand_oracle_sql(STATS_QUERY_SET),
    "term_vectors_docs": _term_vectors_oracle_sql(),
    "pii_redaction": _pii_oracle_sql(),
    "bm25_span_first": _bm25_span_first_oracle_sql(),
    "bm25_adjacency": _adjacency_oracle_sql(STATS_QUERY_SET),
    "bm25_phrase_prefix": _phrase_prefix_oracle_sql(PP_QUERY_SET),
    "bm25_delete_by_query": _dbq_oracle_sql(),
    "bm25_composite": _composite_oracle_sql(STATS_QUERY_SET),
    "bm25_top_hits": _top_hits_oracle_sql(STATS_QUERY_SET),
    "dismax_fielded": _dismax_oracle_sql(),
    "cross_fields": _cross_fields_oracle_sql(),
    "update_by_query": _ubq_oracle_sql(),
    "index_stats": _index_stats_oracle_sql(),
    "bm25_sliced_export": _sliced_export_oracle_sql(),
    "percolate_docs": _percolate_oracle_sql(),
    "bm25_explain": _explain_oracle_sql(),
    "bm25_stemmed": _bm25_oracle_sql(
        query_set=STEM_QUERY_SET, tokens_sql=duckdb_tokens_v2_sql
    ),
    "bm25_reindexed": _bm25_oracle_sql(
        query_set=STEM_QUERY_SET, tokens_sql=duckdb_tokens_v2_sql
    ),
    "bm25_fuzzy": _bm25_boolean_oracle_sql(FUZZY_QUERY_SET, cap=FUZZY_CAP),
    "bm25_regex": _bm25_boolean_oracle_sql(REGEX_QUERY_SET, cap=REGEX_CAP),
    "bm25_wildcard": _bm25_boolean_oracle_sql(
        WILDCARD_QUERY_SET, cap=WILDCARD_CAP
    ),
    "bm25_boosting": _boosting_oracle_sql(BOOSTING_QUERY_SET, BOOSTING_NB),
    "bm25_must_not": _must_not_oracle_sql(MUSTNOT_QUERY_SET),
    "fuzzy_prefix_expand": _fuzzy_prefix_oracle_sql(FUZZY_PREFIX_PAIRS),
    "constant_score": _constant_score_oracle_sql(
        CONST_SCORE_QUERY_SET, CONST_SCORE_BOOST
    ),
    "bm25_boosted": _bm25_boolean_oracle_sql(BOOST_QUERY_SET),
    "hybrid_topk": _hybrid_oracle_sql(),
    "hybrid_ann_topk": _hybrid_ann_oracle_sql(),
    "bm25_fielded": _bm25f_oracle_sql(),
    "bm25_prefix": _bm25_prefix_oracle_sql(),
    "tfidf_topk_documents": _tfidf_oracle_sql(),
    "lmd_topk_documents": _lmd_oracle_sql(),
    "bm25_facets": _bm25_facets_oracle_sql(),
    "bm25_snippets": _bm25_snippets_oracle_sql(),
    "more_like_this": _mlt_oracle_sql(),
    "spell_suggest": _spell_suggest_oracle_sql(),
    "suggest_modes": _suggest_modes_oracle_sql(),
    "suggest_completion": _suggest_completion_oracle_sql(),
    "bm25_filtered": _bm25_oracle_sql(
        candidate_where="WHERE tf.doc_id IN "
        "(SELECT doc_id FROM documents WHERE lang = 'en')"
    ),
    "doc_term_df": f"""
        SELECT term, count(*)::BIGINT AS df
        FROM (SELECT doc_id, term FROM (
              SELECT doc_id, unnest({_TOKS}) AS term FROM documents)
              GROUP BY doc_id, term)
        GROUP BY term
    """,
    "doc_lengths": f"SELECT doc_id, len({_TOKS})::BIGINT AS dl FROM documents",
    "corpus_stats": f"""
        SELECT count(*)::BIGINT AS n_docs, round(avg(len({_TOKS})), 6) AS avgdl
        FROM documents
    """,
    "term_tf": f"""
        SELECT doc_id, term, count(*)::BIGINT AS tf
        FROM (SELECT doc_id, unnest({_TOKS}) AS term FROM documents)
        GROUP BY doc_id, term
    """,
    "dedup_exact_text": """
        SELECT min(doc_id) AS keep_doc_id, count(*)::BIGINT AS n_copies
        FROM documents GROUP BY text HAVING count(*) > 1
    """,
    "events_json_extract": """
        SELECT event_id, json_extract_string(props, '$.k')::INT AS k_val FROM events
    """,
    "events_agg": """
        SELECT event_type, count(*)::BIGINT AS n,
               round(avg(value), 6) AS avg_value,
               round(sum(value * user_id) / sum(user_id), 6) AS weighted_avg
        FROM events GROUP BY event_type
    """,
    "events_topk_per_user": """
        SELECT user_id, rank, event_id, value FROM (
          SELECT user_id, event_id, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY value DESC, event_id ASC) AS rank
          FROM events) WHERE rank <= 3
    """,
    "orders_label_remap": """
        SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label,
               count(*)::BIGINT AS n,
               sum(o_totalprice::DECIMAL(18,2))::DOUBLE AS total
        FROM orders WHERE o_orderstatus <> 'P' GROUP BY 1
    """,
    "prompt_format": """
        SELECT c_custkey,
               'Represent this sentence for searching relevant passages: ' || c_name
               AS prompted
        FROM customer
    """,
    "paired_join": """
        SELECT c_mktsegment, count(*)::BIGINT AS n_orders,
               sum(o_totalprice::DECIMAL(18,2))::DOUBLE AS segment_total
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "spearman_qty_price": """
        WITH ranked AS (
          SELECT rank() OVER (ORDER BY l_quantity)
                   + (count(*) OVER (PARTITION BY l_quantity) - 1) / 2.0 AS rx,
                 rank() OVER (ORDER BY l_extendedprice)
                   + (count(*) OVER (PARTITION BY l_extendedprice) - 1) / 2.0 AS ry
          FROM lineitem)
        SELECT round(corr(rx, ry), 6) AS spearman FROM ranked
    """,
    "cosine_topk": """
        WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        scored AS (
          SELECT vec_id,
                 list_dot_product(embedding::DOUBLE[], q.qv)
                 / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                    * sqrt(list_dot_product(q.qv, q.qv))) AS cos_raw
          FROM embeddings, q WHERE vec_id <> 0)
        SELECT rank, vec_id, round(cos_raw, 6) AS cosine FROM (
          SELECT vec_id, cos_raw,
                 row_number() OVER (ORDER BY cos_raw DESC, vec_id ASC) AS rank
          FROM scored) WHERE rank <= 10
    """,
    "union_distinct_nations": """
        SELECT DISTINCT nationkey FROM (
          SELECT c_nationkey AS nationkey FROM customer
          UNION ALL SELECT s_nationkey FROM supplier)
    """,
    "multivalue_sample": f"""
        SELECT doc_id,
               CASE WHEN len(tokens) > 0
                    THEN tokens[(doc_id % len(tokens))::INT + 1]
                    ELSE NULL END AS sampled_token
        FROM (SELECT doc_id, {_TOKS} AS tokens FROM documents)
    """,
    "tpch_q1": """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity::DECIMAL(18,2))::DOUBLE AS sum_qty,
               sum(l_extendedprice::DECIMAL(18,2))::DOUBLE AS sum_base_price,
               sum((l_extendedprice::DECIMAL(18,2)
                    * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)))::DECIMAL(28,6))::DOUBLE
                 AS sum_disc_price,
               round(avg(l_quantity), 6) AS avg_qty,
               round(avg(l_discount), 6) AS avg_disc,
               count(*)::BIGINT AS count_order
        FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "doc_quality": f"""
        SELECT doc_id, len(tokens)::INT AS n_tokens,
               length(text)::INT AS n_chars_actual,
               round(len(list_filter(tokens,
                     t -> t IN ('the','a','of','and','to')))::DOUBLE / len(tokens), 6)
                 AS stopword_ratio,
               round(len(list_distinct(tokens))::DOUBLE / len(tokens), 6)
                 AS distinct_ratio
        FROM (SELECT doc_id, text, {_TOKS} AS tokens FROM documents)
    """,
    "minhash_lsh_pairs": f"""
        WITH {_SHINGLES_CTE},
        hashed AS (
          SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh
        ), fam(k, a, b) AS (VALUES {_FAM_VALUES}),
        sig AS (
          SELECT doc_id, k, min((h * a + b) % {_MH_P}) AS mh
          FROM hashed CROSS JOIN fam GROUP BY doc_id, k
        ), bands AS (
          SELECT doc_id, (k // 2)::INT AS band,
                 min(CASE WHEN k % 2 = 0 THEN mh END) AS b0,
                 min(CASE WHEN k % 2 = 1 THEN mh END) AS b1
          FROM sig GROUP BY doc_id, band
        ), cand AS (
          SELECT DISTINCT x.doc_id AS doc1, y.doc_id AS doc2
          FROM bands x JOIN bands y USING (band, b0, b1)
          WHERE x.doc_id < y.doc_id
        )
        SELECT doc1, doc2,
               (sum(CASE WHEN s1.mh = s2.mh THEN 1 ELSE 0 END)::BIGINT / {float(_NH)})
                 AS est_jaccard
        FROM cand
        JOIN sig s1 ON s1.doc_id = doc1
        JOIN sig s2 ON s2.doc_id = doc2 AND s2.k = s1.k
        GROUP BY doc1, doc2
    """,
    "ngram_contamination": _ngram_contamination_oracle_sql(),
    "ngram_jaccard_pairs": f"""
        WITH {_SHINGLES_CTE},
        sizes AS (SELECT doc_id, count(*)::BIGINT AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*)::BIGINT AS i
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY doc1, doc2
        )
        SELECT doc1, doc2, i / (n1.n + n2.n - i)::DOUBLE AS jaccard
        FROM inter
        JOIN sizes n1 ON n1.doc_id = doc1
        JOIN sizes n2 ON n2.doc_id = doc2
        WHERE i / (n1.n + n2.n - i)::DOUBLE >= 0.8
    """,
    "simhash_fingerprints": f"""
        WITH toks AS (
          SELECT doc_id, unnest({_TOKS}) AS term FROM documents
        ), tf AS (
          SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
        ), ht AS (
          SELECT doc_id, tf, ('0x' || substr(md5(term), 1, 8))::BIGINT AS h FROM tf
        ), bits AS (SELECT unnest(range(0, 32)) AS bit),
        wsum AS (
          SELECT doc_id, bit,
                 sum(CASE WHEN (h >> bit) & 1 = 1 THEN tf ELSE -tf END) AS s
          FROM ht CROSS JOIN bits GROUP BY doc_id, bit
        )
        SELECT doc_id,
               sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT
                 AS simhash
        FROM wsum GROUP BY doc_id
    """,
    # algorithm-independent oracle: exhaustive pairwise Hamming (fine at
    # sf scale in DuckDB) — the Spark side must find EXACTLY these pairs
    # through its pigeonhole chunk buckets
    "simhash_near_pairs": f"""
        WITH toks AS (
          SELECT doc_id, unnest({_TOKS}) AS term FROM documents
        ), tf AS (
          SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
        ), ht AS (
          SELECT doc_id, tf, ('0x' || substr(md5(term), 1, 8))::BIGINT AS h FROM tf
        ), bits AS (SELECT unnest(range(0, 32)) AS bit),
        wsum AS (
          SELECT doc_id, bit,
                 sum(CASE WHEN (h >> bit) & 1 = 1 THEN tf ELSE -tf END) AS s
          FROM ht CROSS JOIN bits GROUP BY doc_id, bit
        ), sh AS (
          SELECT doc_id,
                 sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT
                   AS simhash
          FROM wsum GROUP BY doc_id
        )
        SELECT a.doc_id AS doc1, b.doc_id AS doc2,
               bit_count(xor(a.simhash, b.simhash))::INT AS hamming
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    "tpch_q6": """
        SELECT sum((l_extendedprice::DECIMAL(18,2)
                    * l_discount::DECIMAL(18,2))::DECIMAL(28,4))::DOUBLE AS revenue,
               count(*)::BIGINT AS n_rows
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
    "tpch_q3": """
        WITH rev AS (
          SELECT l_orderkey, o_orderdate,
                 sum((l_extendedprice::DECIMAL(18,2)
                      * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)))::DECIMAL(28,4))::DOUBLE
                   AS revenue
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          WHERE c_mktsegment = 'BUILDING'
            AND o_orderdate < DATE '1998-03-15' AND l_shipdate > DATE '1998-03-15'
          GROUP BY l_orderkey, o_orderdate)
        SELECT rank, l_orderkey, revenue, o_orderdate FROM (
          SELECT *, row_number() OVER (ORDER BY revenue DESC, l_orderkey ASC) AS rank
          FROM rev) WHERE rank <= 10
    """,
    "events_sessionize": """
        WITH g AS (
          SELECT user_id, event_id, ts, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                      THEN 1 ELSE 0 END AS new_sess
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
          SELECT user_id, value,
                 sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
          FROM g)
        SELECT user_id, session_id, count(*)::BIGINT AS n_events,
               round(sum(value), 6) AS session_value
        FROM s GROUP BY user_id, session_id
    """,
    "orders_pivot": """
        SELECT o_orderpriority,
               count(*) FILTER (WHERE o_orderstatus = 'F')::BIGINT AS n_f,
               count(*) FILTER (WHERE o_orderstatus = 'O')::BIGINT AS n_o,
               count(*) FILTER (WHERE o_orderstatus = 'P')::BIGINT AS n_p
        FROM orders GROUP BY o_orderpriority
    """,
    # doc_fingerprints: the ordered polynomial fold IS expressible in
    # DuckDB 1.0 — sum-then-mod equals Spark's stepwise-mod fold because
    # addition distributes over mod, and base^i mod m comes from a
    # recursive CTE (list_reduce can't carry the (h, p) struct
    # accumulator). Every intermediate fits int64: (h%m)*(p<m) < 2^62,
    # sum over dl terms < dl * 2^31.
    "doc_fingerprints": f"""
        WITH RECURSIVE t AS (SELECT doc_id, {_TOKS} AS tokens FROM documents),
        tok AS (
          SELECT doc_id, unnest(tokens) AS term,
                 unnest(range(0, len(tokens))) AS i
          FROM t
        ),
        pows(i, p) AS (
          SELECT 0, 1::BIGINT
          UNION ALL
          SELECT i + 1, (p * 1009) % 2147483647 FROM pows
          WHERE i + 1 < (SELECT coalesce(max(len(tokens)), 1) FROM t)
        ),
        contrib AS (
          SELECT doc_id,
                 ((({duckdb_hash32('term')} % 2147483647) * p) % 2147483647) AS c
          FROM tok JOIN pows USING (i)
        )
        SELECT t.doc_id,
               coalesce(sum(c) % 2147483647, 0)::BIGINT AS fingerprint
        FROM t LEFT JOIN contrib ON t.doc_id = contrib.doc_id
        GROUP BY t.doc_id
    """,
    "pooling_stats": """
        WITH e AS (SELECT vec_id, vec_id // 4 AS group_id,
                          embedding::DOUBLE[] AS v FROM embeddings),
        g4 AS (SELECT group_id FROM e GROUP BY group_id HAVING count(*) = 4),
        ex AS (SELECT e.group_id, e.vec_id, unnest(v) AS val,
                      unnest(range(0, len(v))) AS pos
               FROM e JOIN g4 USING (group_id)),
        kept AS (SELECT group_id, pos, list(val ORDER BY vec_id) AS kv
                 FROM ex WHERE vec_id % 4 <> group_id % 4
                 GROUP BY group_id, pos),
        cls AS (SELECT group_id, pos, val AS cv FROM ex WHERE vec_id % 4 = 0)
        SELECT k.group_id, k.pos::BIGINT AS pos,
               round((kv[1] + kv[2] + kv[3]) / 3.0, 6) AS avg_val,
               round(greatest(kv[1], kv[2], kv[3]), 6) AS max_val,
               round(kv[1] + kv[2] + kv[3], 6) AS sum_val,
               round(c.cv, 6) AS cls_val,
               round(kv[3], 6) AS last_val,
               round((c.cv + (kv[1] + kv[2] + kv[3]) / 3.0) / 2.0, 6) AS clsavg_val
        FROM kept k JOIN cls c ON k.group_id = c.group_id AND k.pos = c.pos
    """,
    "vector_norms": """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
        SELECT vec_id, unnest(range(0, 8))::BIGINT AS pos,
               round(unnest(v[1:8]) / nrm, 6) AS nval
        FROM n
    """,
    "vector_distances": """
        WITH a AS (SELECT vec_id AS pair_id, embedding::DOUBLE[] AS v1
                   FROM embeddings WHERE vec_id < 250),
        b AS (SELECT vec_id - 250 AS pair_id, embedding::DOUBLE[] AS v2
              FROM embeddings WHERE vec_id >= 250 AND vec_id < 500),
        p AS (SELECT pair_id, v1, v2 FROM a JOIN b USING (pair_id)),
        px AS (SELECT pair_id, unnest(v1) AS x, unnest(v2) AS y FROM p),
        d AS (SELECT pair_id, sum(abs(x - y)) AS manh,
                     sum((x - y) * (x - y)) AS eu2
              FROM px GROUP BY pair_id)
        SELECT p.pair_id,
               round(list_dot_product(v1, v2)
                     / (sqrt(list_dot_product(v1, v1))
                        * sqrt(list_dot_product(v2, v2))), 6) AS cosine,
               round(list_dot_product(v1, v2), 6) AS dot,
               round(-manh, 6) AS neg_manhattan,
               round(-sqrt(eu2), 6) AS neg_euclidean
        FROM p JOIN d USING (pair_id)
    """,
    "softmax_lse": """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        m AS (SELECT vec_id, v, list_aggregate(v, 'max') AS mx FROM e),
        ex AS (SELECT vec_id, mx, unnest(v) AS val,
                      unnest(range(0, len(v))) AS pos FROM m),
        s AS (SELECT vec_id, sum(exp(val - mx)) AS tot
              FROM ex GROUP BY vec_id)
        SELECT ex.vec_id, pos::BIGINT AS pos,
               round(exp(val - mx) / tot, 6) AS softmax_val,
               round(ln(tot) + mx, 6) AS lse
        FROM ex JOIN s USING (vec_id)
    """,
    "pca_covariance": """
        WITH ex AS (SELECT vec_id, unnest(embedding::DOUBLE[]) AS val,
                           unnest(range(0, len(embedding))) AS i
                    FROM embeddings)
        SELECT a.i, b.i AS j, round(covar_pop(a.val, b.val), 6) AS cov
        FROM ex a JOIN ex b USING (vec_id)
        GROUP BY a.i, b.i
    """,
    "loss_kernels": """
        WITH a AS (SELECT vec_id AS pair_id, embedding::DOUBLE[] AS v1
                   FROM embeddings WHERE vec_id < 250),
        b AS (SELECT vec_id - 250 AS pair_id, embedding::DOUBLE[] AS v2
              FROM embeddings WHERE vec_id >= 250 AND vec_id < 500),
        p AS (SELECT pair_id, v1, v2 FROM a JOIN b USING (pair_id)),
        -- angle kernel: vectors as interleaved complex [re | im] halves
        parts AS (SELECT pair_id,
                         unnest(v1[1:32]) AS re1, unnest(v1[33:64]) AS im1,
                         unnest(v2[1:32]) AS re2, unnest(v2[33:64]) AS im2
                  FROM p),
        ang AS (SELECT pair_id,
                       sum(sqrt(
                         ((re1*re2 + im1*im2)/(re2*re2 + im2*im2))
                           * ((re1*re2 + im1*im2)/(re2*re2 + im2*im2))
                         + ((im1*re2 - re1*im2)/(re2*re2 + im2*im2))
                           * ((im1*re2 - re1*im2)/(re2*re2 + im2*im2))
                       )) AS angle_dist
                FROM parts GROUP BY pair_id),
        px AS (SELECT pair_id, unnest(v1) AS x, unnest(v2) AS y FROM p),
        msev AS (SELECT pair_id, sum((x - y)*(x - y)) / 64 AS mse
                 FROM px GROUP BY pair_id),
        mx AS (SELECT pair_id, list_aggregate(v1, 'max') AS m1,
                      list_aggregate(v2, 'max') AS m2 FROM p),
        tot AS (SELECT px.pair_id, sum(exp(x - m1)) AS t1, sum(exp(y - m2)) AS t2
                FROM px JOIN mx USING (pair_id) GROUP BY px.pair_id),
        klv AS (SELECT px.pair_id,
                       sum((exp(x - m1)/t1)
                           * (ln(exp(x - m1)/t1) - ln(exp(y - m2)/t2))) AS kl
                FROM px JOIN mx USING (pair_id) JOIN tot USING (pair_id)
                GROUP BY px.pair_id)
        SELECT ang.pair_id, round(angle_dist, 6) AS angle_dist,
               round(mse, 6) AS mse, round(kl, 6) AS kl_softmax
        FROM ang JOIN msev USING (pair_id) JOIN klv USING (pair_id)
    """,
    "doc_langid": None,  # filled below (generated from LANG_PROFILES)
    "token_counts": f"""
        SELECT doc_id,
               len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))::INT
                 AS n_ws,
               len(tokens)::INT AS n_v1,
               coalesce(list_sum(list_transform(tokens,
                        t -> ceil(length(t) / 4.0)::INT)), 0)::INT AS n_subword
        FROM (SELECT doc_id, text, {_TOKS} AS tokens FROM documents)
    """,
    "correlation_eval": """
        WITH a AS (SELECT vec_id AS pair_id, embedding::DOUBLE[] AS v1, label AS l1
                   FROM embeddings WHERE vec_id < 250),
        b AS (SELECT vec_id - 250 AS pair_id, embedding::DOUBLE[] AS v2, label AS l2
              FROM embeddings WHERE vec_id >= 250 AND vec_id < 500),
        p AS (SELECT pair_id,
                     list_dot_product(v1, v2)
                     / (sqrt(list_dot_product(v1, v1)) * sqrt(list_dot_product(v2, v2)))
                       AS cosine,
                     (l1 = l2)::INT::DOUBLE AS label
              FROM a JOIN b USING (pair_id)),
        r AS (SELECT cosine, label,
                     rank() OVER (ORDER BY cosine)
                       + (count(*) OVER (PARTITION BY cosine) - 1) / 2.0 AS rx,
                     rank() OVER (ORDER BY label)
                       + (count(*) OVER (PARTITION BY label) - 1) / 2.0 AS ry
              FROM p)
        SELECT round(corr(cosine, label), 6) AS pearson_cosine,
               round(corr(rx, ry), 6) AS spearman_cosine
        FROM r
    """,
    "embedding_topk_pairs": """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        pairs AS (
          SELECT a.vec_id AS id1, b.vec_id AS id2,
                 list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(b.v, b.v))) AS cos_raw
          FROM e a JOIN e b ON a.vec_id < b.vec_id)
        SELECT rank, id1, id2, round(cos_raw, 6) AS cosine FROM (
          SELECT id1, id2, cos_raw,
                 row_number() OVER (ORDER BY cos_raw DESC, id1 ASC, id2 ASC) AS rank
          FROM pairs) WHERE rank <= 20
    """,
}


def _langid_oracle_sql() -> str:
    """generated from LANG_PROFILES; tie-break = lexicographically LAST
    language (matching Spark array_max over (score, lang) structs)."""
    from angle_spark.functions.text_stats import LANG_PROFILES

    frac = {
        lang: (
            "len(list_filter(tokens, x -> x IN ("
            + ", ".join(f"'{w}'" for w in words)
            + ")))::DOUBLE / greatest(len(tokens), 1)"
        )
        for lang, words in LANG_PROFILES.items()
    }
    langs_desc = sorted(LANG_PROFILES, reverse=True)  # fr, es, en, de
    score_cols = ",\n               ".join(f"{frac[lang]} AS s_{lang}" for lang in LANG_PROFILES)
    conds = []
    for i, lang in enumerate(langs_desc[:-1]):
        others = langs_desc[i + 1:]
        cond = " AND ".join(f"s_{lang} >= s_{o}" for o in others)
        conds.append(f"WHEN {cond} THEN '{lang}'")
    case = (
        "CASE WHEN greatest("
        + ", ".join(f"s_{lang}" for lang in LANG_PROFILES)
        + ") = 0 THEN 'und' "
        + " ".join(conds)
        + f" ELSE '{langs_desc[-1]}' END"
    )
    return f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS tokens FROM documents),
        sc AS (SELECT doc_id,
               {score_cols}
        FROM t)
        SELECT doc_id, {case} AS lang_pred FROM sc
    """


ORACLE_SQL["doc_langid"] = _langid_oracle_sql()


def _ann_oracle_sql() -> str:
    """replicates the banded RHP-LSH + exact-rescore algorithm in SQL with
    the hyperplanes baked in as literals (full repr round-trip precision),
    so the driver hash verifies the LSH itself, not just a brute-force
    equivalent."""
    from angle_spark.operators.ann import _hyperplanes

    planes = _hyperplanes(64, n_planes=ANN_N_PLANES, seed=1234)
    vals = ", ".join(
        f"({p}, {j}, {float(w)!r})"
        for p in range(ANN_N_PLANES)
        for j, w in enumerate(planes[p])
    )
    bb = ANN_BAND_BITS
    band_val = (
        f"sum(((d > 0)::BIGINT) << ({bb} - 1 - (p % {bb})))::BIGINT"
    )
    return f"""
        WITH planes(p, j, w) AS (VALUES {vals}),
        e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        corp AS (SELECT vec_id, v FROM e WHERE vec_id >= {ANN_N_QUERIES}),
        qs AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < {ANN_N_QUERIES}),
        cx AS (SELECT vec_id, unnest(v) AS val, unnest(range(0, len(v))) AS j FROM corp),
        cdot AS (SELECT vec_id, p, sum(val * w) AS d
                 FROM cx JOIN planes USING (j) GROUP BY vec_id, p),
        cband AS (SELECT vec_id, (p // {bb})::INT AS band_idx, {band_val} AS band_val
                  FROM cdot GROUP BY vec_id, band_idx),
        qx AS (SELECT qid, unnest(qv) AS val, unnest(range(0, len(qv))) AS j FROM qs),
        qdot AS (SELECT qid, p, sum(val * w) AS d
                 FROM qx JOIN planes USING (j) GROUP BY qid, p),
        qband AS (SELECT qid, (p // {bb})::INT AS band_idx, {band_val} AS band_val
                  FROM qdot GROUP BY qid, band_idx),
        cand AS (SELECT DISTINCT q.qid, c.vec_id
                 FROM cband c JOIN qband q USING (band_idx, band_val)),
        scored AS (
          SELECT cand.qid, cand.vec_id,
                 list_dot_product(corp.v, qs.qv)
                 / (sqrt(list_dot_product(corp.v, corp.v))
                    * sqrt(list_dot_product(qs.qv, qs.qv))) AS cos_raw
          FROM cand
          JOIN corp ON corp.vec_id = cand.vec_id
          JOIN qs ON qs.qid = cand.qid)
        SELECT query_id, rank, vec_id, round(cos_raw, 6) AS cosine FROM (
          SELECT 'q' || qid AS query_id, vec_id, cos_raw,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY cos_raw DESC, vec_id ASC) AS rank
          FROM scored) WHERE rank <= {ANN_K}
    """


ORACLE_SQL["ann_lsh_topk"] = _ann_oracle_sql()


def _ivf_oracle_sql() -> str:
    """replicates ivf_topk exactly: smallest-vec_id coarse quantizer,
    reduced-squared-L2 nearest-cell assignment (c.c - 2 v.c — the v.v
    term is per-row constant), nprobe nearest cells per query, exact
    cosine rescore of probed cells only. list_dot_product folds the
    arrays in order, matching Spark's aggregate/zip_with fold."""
    return f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        corp AS (SELECT vec_id, v FROM e WHERE vec_id >= {ANN_N_QUERIES}),
        qs AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < {ANN_N_QUERIES}),
        cents AS (
          SELECT vec_id AS cell, v AS cv, list_dot_product(v, v) AS cc
          FROM corp ORDER BY vec_id LIMIT {IVF_N_CELLS}
        ),
        assign AS (
          SELECT vec_id, v, cell FROM (
            SELECT c.vec_id, c.v, t.cell,
                   row_number() OVER (
                     PARTITION BY c.vec_id
                     ORDER BY t.cc - 2 * list_dot_product(c.v, t.cv), t.cell
                   ) AS rn
            FROM corp c CROSS JOIN cents t
          ) WHERE rn = 1
        ),
        probes AS (
          SELECT qid, qv, cell FROM (
            SELECT q.qid, q.qv, t.cell,
                   row_number() OVER (
                     PARTITION BY q.qid
                     ORDER BY t.cc - 2 * list_dot_product(q.qv, t.cv), t.cell
                   ) AS rn
            FROM qs q CROSS JOIN cents t
          ) WHERE rn <= {IVF_NPROBE}
        ),
        scored AS (
          SELECT p.qid, a.vec_id,
                 list_dot_product(a.v, p.qv)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(p.qv, p.qv))) AS cos_raw
          FROM assign a JOIN probes p USING (cell)
        )
        SELECT query_id, rank, vec_id, round(cos_raw, 6) AS cosine FROM (
          SELECT 'q' || qid AS query_id, vec_id, cos_raw,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY cos_raw DESC, vec_id ASC) AS rank
          FROM scored) WHERE rank <= {ANN_K}
    """


ORACLE_SQL["ann_ivf_topk"] = _ivf_oracle_sql()


def _embedding_pairs_oracle_sql() -> str:
    """replicates embedding_near_pairs_lsh: same hyperplane literals as
    the ANN oracle, band signatures self-joined, exact cosine >= t."""
    from angle_spark.operators.ann import _hyperplanes

    planes = _hyperplanes(64, n_planes=ANN_N_PLANES, seed=1234)
    vals = ", ".join(
        f"({p}, {j}, {float(w)!r})"
        for p in range(ANN_N_PLANES)
        for j, w in enumerate(planes[p])
    )
    bb = ANN_BAND_BITS
    band_val = f"sum(((d > 0)::BIGINT) << ({bb} - 1 - (p % {bb})))::BIGINT"
    return f"""
        WITH planes(p, j, w) AS (VALUES {vals}),
        e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        ex AS (SELECT vec_id, unnest(v) AS val, unnest(range(0, len(v))) AS j FROM e),
        dots AS (SELECT vec_id, p, sum(val * w) AS d
                 FROM ex JOIN planes USING (j) GROUP BY vec_id, p),
        bands AS (SELECT vec_id, (p // {bb})::INT AS band_idx, {band_val} AS band_val
                  FROM dots GROUP BY vec_id, band_idx),
        cand AS (SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
                 FROM bands a JOIN bands b USING (band_idx, band_val)
                 WHERE a.vec_id < b.vec_id),
        scored AS (
          SELECT id1, id2,
                 list_dot_product(x.v, y.v)
                 / (sqrt(list_dot_product(x.v, x.v))
                    * sqrt(list_dot_product(y.v, y.v))) AS cos_raw
          FROM cand
          JOIN e x ON x.vec_id = id1
          JOIN e y ON y.vec_id = id2)
        SELECT id1, id2, round(cos_raw, 6) AS cosine
        FROM scored WHERE cos_raw >= {EMB_PAIRS_THRESHOLD}
    """


ORACLE_SQL["embedding_near_pairs_lsh"] = _embedding_pairs_oracle_sql()


# --- driver-check rotation (round 5) -----------------------------------
# The per-round driver verifies ALL entries that are new since the last
# CORRECTNESS file plus the FIRST (cap - new) previously-checked ones in
# registry order (cap was 50 in round 4: 20 new + the first 30 old).
# Round 4 rewrote the ANN signature plan (operators/ann.py) but
# ann_lsh_topk / ann_ivf_topk / embedding_near_pairs_lsh sat past the
# cap, so the driver never re-checked the changed code (VERDICT r4
# next-round #3). Rotate: the round-4-skipped entries move to the FRONT
# of the registry — changed-code entries first (the ANN trio), then the
# rest of the skipped set, then the round-4-checked ones (all green 50/50
# there, lowest re-check priority).
_ROTATE_FIRST = [
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_near_pairs_lsh",
    "pca_covariance",
    "pooling_stats",
    "vector_norms",
    "vector_distances",
    "softmax_lse",
    "loss_kernels",
    "doc_langid",
    "token_counts",
    "doc_fingerprints",
    "correlation_eval",
    "tpch_q6",
    "tpch_q3",
    "events_sessionize",
    "orders_pivot",
]
QUERIES = {
    **{k: QUERIES[k] for k in _ROTATE_FIRST},
    **{k: v for k, v in QUERIES.items() if k not in _ROTATE_FIRST},
}
ORACLE_SQL = {
    **{k: ORACLE_SQL[k] for k in _ROTATE_FIRST if k in ORACLE_SQL},
    **{k: v for k, v in ORACLE_SQL.items() if k not in _ROTATE_FIRST},
}

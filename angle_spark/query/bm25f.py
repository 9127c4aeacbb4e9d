"""BM25F: fielded BM25 with per-field weights and length normalization.

The north-rule transcript schema carries more text-bearing fields than
``text`` alone (role, tool — input_hint in BASELINE.json), and classic
retrieval weights a title/keyword field above the body. BM25F (Zaragoza
et al., CIKM 2004 — the "simple BM25F" with per-field length
normalization folded into tf) is the standard way to do that WITHOUT
breaking the saturation curve (naive per-field BM25 sums saturate each
field separately, so stuffing one field keeps paying; BM25F saturates
the COMBINED evidence):

    tf~(t, d) = sum_f  w_f * tf_f(t, d) / (1 - b + b * dl_f(d) / avgdl_f)
    score(q, d) = sum_{t in q} idf(t) * (k1 + 1) * tf~ / (k1 + tf~)

idf uses the document frequency over the combined document (term present
in ANY field), so a term that only ever appears in a tiny keyword field
is still properly rare.

Shape: one tokenize+explode+groupBy per field (same map-side-combined
aggregation the single-field path uses), the per-field tf frames
combined by a full-outer equi-join on (doc_id, term) — deterministic
left-to-right fold, so tf~ is bit-reproducible — then the usual
query-term semi-join and per-query window top-k. Everything JVM-side;
no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from angle_spark.codec import B, K1
from angle_spark.functions.tokenizer import tokens_col


def _field_tf(docs: DataFrame, col: str) -> tuple[DataFrame, DataFrame]:
    """-> (tf: (doc_id, term, tf), dl: (doc_id, dl)) for one field.
    Null/empty field values count as zero-length."""
    toks = F.coalesce(tokens_col(col), F.array().cast("array<string>"))
    based = docs.select("doc_id", toks.alias("toks"))
    tf = (
        based.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = based.select("doc_id", F.size("toks").cast("long").alias("dl"))
    return tf, dl


def bm25f_topk(
    docs: DataFrame,
    fields: list[tuple[str, float]],
    queries: DataFrame,
    k1: float = K1,
    b: float = B,
    rank_on_rounded: bool = True,
) -> DataFrame:
    """-> (query_id, rank, doc_id, score): BM25F top-k over ``docs``.

    docs: (doc_id, <field columns>); fields: [(column, weight), ...] in
    a FIXED order (the tf~ fold adds field contributions left to right,
    so the float64 result is deterministic); queries: (query_id, text,
    k) — query text is tokenized with the same tokenizer as every field.

    rank_on_rounded (default): rank by round(score, 6) with the doc_id
    tiebreak — the oracle-deterministic convention (two docs can differ
    only by SQL-sum-order ULP noise)."""
    if not fields:
        raise ValueError("need at least one (column, weight) field")
    n_docs = docs.count()

    tilde = None
    for col, w in fields:
        tf, dl = _field_tf(docs, col)
        avgdl = dl.agg(F.avg("dl")).collect()[0][0] or 0.0
        contrib = (
            F.lit(float(w))
            * F.col(f"tf_{col}")
            / (1.0 - b + b * F.col(f"dl_{col}") / F.lit(float(avgdl)))
            if avgdl > 0
            else F.lit(0.0)
        )
        part = (
            tf.join(dl, "doc_id")
            .select(
                "doc_id",
                "term",
                F.col("tf").alias(f"tf_{col}"),
                F.col("dl").alias(f"dl_{col}"),
            )
            .select("doc_id", "term", contrib.alias(f"c_{col}"))
        )
        if tilde is None:
            tilde = part
        else:
            tilde = tilde.join(part, ["doc_id", "term"], "full_outer")
    ccols = [f"c_{col}" for col, _ in fields]
    tilde = tilde.select(
        "doc_id",
        "term",
        sum(
            (F.coalesce(F.col(c), F.lit(0.0)) for c in ccols[1:]),
            F.coalesce(F.col(ccols[0]), F.lit(0.0)),
        ).alias("tft"),
    )

    # df over the COMBINED document: tilde holds one row per (doc, term)
    # present in any field
    dft = tilde.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    qterms = (
        queries.select(
            "query_id",
            F.col("k").cast("int").alias("k"),
            F.explode(
                F.array_distinct(
                    F.coalesce(tokens_col("text"), F.array().cast("array<string>"))
                )
            ).alias("term"),
        )
    )
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    scored = (
        qterms.join(dft, "term")
        .withColumn("idf", idf)
        .join(tilde, "term")
        .groupBy("query_id", "k", "doc_id")
        .agg(
            F.sum(
                F.col("idf") * (k1 + 1.0) * F.col("tft") / (k1 + F.col("tft"))
            ).alias("score")
        )
    )
    key = F.round("score", 6) if rank_on_rounded else F.col("score")
    w_rank = Window.partitionBy("query_id").orderBy(F.desc(key), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "doc_id", "score")
    )


def dismax_topk(
    docs: DataFrame,
    fields: list[tuple[str, float]],
    queries: DataFrame,
    tie: float = 0.0,
    k1: float = K1,
    b: float = B,
    rank_on_rounded: bool = True,
) -> DataFrame:
    """-> (query_id, rank, doc_id, score): disjunction-max fielded
    retrieval — Lucene's DisjunctionMaxQuery, the scorer behind ES
    ``multi_match type=best_fields`` (its default).

    Where BM25F folds field evidence into ONE saturation curve (holistic
    relevance), dis_max takes the BEST single field's score and lets the
    others contribute only through the tie_breaker:

        score(q, d) = max_f s_f(q, d) + tie * sum_{f != argmax} s_f(q, d)

    with each s_f a STANDARD BM25 over field f using the FIELD'S OWN
    statistics (df_f, avgdl_f; N global) times the field's ^w boost —
    the Lucene per-field-searcher semantics. tie=0 is the pure max
    (classic DisMax); tie=1 degrades to the per-field score sum
    (most_fields). Right when fields are ALTERNATE phrasings of the
    same content (title vs body): summing saturated per-field scores
    over-rewards documents that repeat the query everywhere.

    Plan shape: one tokenize+explode+groupBy per field (map-side
    combined), per-field scoring joins on term (query-term semi-join
    prunes each field's tf to query terms before any shuffle), a
    per-(query, doc) max/sum fold over the <= |fields| rows per matched
    (query, doc), one rank window. Everything JVM-side; no UDFs.

    rank_on_rounded: same oracle-determinism convention as bm25f_topk
    (per-field sums are SQL-fold-order ULP-noisy)."""
    if not fields:
        raise ValueError("need at least one (column, weight) field")
    if not 0.0 <= tie <= 1.0:
        raise ValueError(f"tie must be in [0, 1], got {tie!r}")
    n_docs = docs.count()
    qterms = queries.select(
        "query_id",
        F.col("k").cast("int").alias("k"),
        F.explode(
            F.array_distinct(
                F.coalesce(tokens_col("text"), F.array().cast("array<string>"))
            )
        ).alias("term"),
    )

    per_field = []
    for col, w in fields:
        tf, dl = _field_tf(docs, col)
        avgdl = dl.agg(F.avg("dl")).collect()[0][0] or 0.0
        if avgdl <= 0:
            continue  # field empty in every doc — contributes nothing
        dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        idf = F.log(
            (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
            + F.lit(1.0)
        )
        denom = F.col("tf") + k1 * (
            1.0 - b + b * F.col("dl") / F.lit(float(avgdl))
        )
        contrib = (
            F.col("idf") * F.lit(float(w)) * F.col("tf") * (k1 + 1.0) / denom
        )
        per_field.append(
            qterms.join(dft, "term")
            .withColumn("idf", idf)
            .join(tf, "term")
            .join(dl, "doc_id")
            .groupBy("query_id", "k", "doc_id")
            .agg(F.sum(contrib).alias("s"))
        )
    if not per_field:
        raise ValueError("every field is empty — nothing to score")
    allf = per_field[0]
    for p in per_field[1:]:
        allf = allf.unionByName(p)
    combined = allf.groupBy("query_id", "k", "doc_id").agg(
        (
            F.max("s") + F.lit(float(tie)) * (F.sum("s") - F.max("s"))
        ).alias("score")
    )
    key = F.round("score", 6) if rank_on_rounded else F.col("score")
    w_rank = Window.partitionBy("query_id").orderBy(F.desc(key), F.asc("doc_id"))
    return (
        combined.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "doc_id", "score")
    )


def cross_fields_topk(
    docs: DataFrame,
    fields: list[tuple[str, float]],
    queries: DataFrame,
    k1: float = K1,
    b: float = B,
    rank_on_rounded: bool = True,
) -> DataFrame:
    """-> (query_id, rank, doc_id, score): term-centric blended fielded
    retrieval — ES ``multi_match type=cross_fields`` / Lucene's
    BlendedTermQuery, the third member of the multi_match trio:

      - BM25F   (bm25f_topk):  field-centric, ONE saturation curve —
                 "fields are parts of one document";
      - dis_max (dismax_topk): query-centric best field — "fields are
                 alternate phrasings, pick the best one";
      - cross_fields (here):   TERM-centric — "each query term may live
                 in a different field" (first name in one column, last
                 name in another; for transcripts: one term in text,
                 one in tool).

    Per term, document-frequency statistics BLEND across fields
    (df~(t) = max_f df_f(t) — Lucene BlendedTermQuery's non-inflating
    blend: a term can't become artificially rare because one field
    seldom uses it), each field scores the term with its own length
    normalization and ^w boost, and the term contributes its BEST
    field's saturation times the blended idf:

        score(q, d) = sum_{t in q} idf~(t) * max_f [ w_f * tf_f(t,d)
                          * (k1+1) / (tf_f + k1*(1-b+b*dl_f/avgdl_f)) ]

    AND-across-fields composes upstream (conjunctive callers filter on
    matched-term counts); this function scores the disjunctive fold.

    Plan shape: one tokenize+explode+groupBy per field (map-side
    combined), per-field df restricted to query terms BEFORE the blend
    union (vocabulary never shuffles whole), per-(query, doc, term) max
    over <= |fields| rows, one idf multiply per term AFTER the max (so
    the max is float-exact and the only fold noise is the final
    per-doc sum — rank_on_rounded handles it, the repo-wide convention).
    Everything JVM-side; no UDFs.
    """
    if not fields:
        raise ValueError("need at least one (column, weight) field")
    n_docs = docs.count()
    qterms = queries.select(
        "query_id",
        F.col("k").cast("int").alias("k"),
        F.explode(
            F.array_distinct(
                F.coalesce(tokens_col("text"), F.array().cast("array<string>"))
            )
        ).alias("term"),
    )
    uterms = qterms.select("term").distinct()

    dft_parts = []
    sat_parts = []
    for col, w in fields:
        tf, dl = _field_tf(docs, col)
        avgdl = dl.agg(F.avg("dl")).collect()[0][0] or 0.0
        if avgdl <= 0:
            continue  # field empty in every doc — contributes nothing
        tf_q = tf.join(uterms, "term")  # all docs, query terms only
        dft_parts.append(
            tf_q.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        )
        denom = F.col("tf") + k1 * (
            1.0 - b + b * F.col("dl") / F.lit(float(avgdl))
        )
        sat = F.lit(float(w)) * F.col("tf") * (k1 + 1.0) / denom
        sat_parts.append(
            qterms.join(tf_q, "term")
            .join(dl, "doc_id")
            .select("query_id", "k", "doc_id", "term", sat.alias("sat"))
        )
    if not dft_parts:
        raise ValueError("every field is empty — nothing to score")
    blend = dft_parts[0]
    for p in dft_parts[1:]:
        blend = blend.unionByName(p)
    blend = blend.groupBy("term").agg(F.max("df").alias("df"))
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    sat_all = sat_parts[0]
    for p in sat_parts[1:]:
        sat_all = sat_all.unionByName(p)
    scored = (
        sat_all.groupBy("query_id", "k", "doc_id", "term")
        .agg(F.max("sat").alias("sat"))
        .join(blend.withColumn("idf", idf).select("term", "idf"), "term")
        .groupBy("query_id", "k", "doc_id")
        .agg(F.sum(F.col("idf") * F.col("sat")).alias("score"))
    )
    key = F.round("score", 6) if rank_on_rounded else F.col("score")
    w_rank = Window.partitionBy("query_id").orderBy(F.desc(key), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "doc_id", "score")
    )

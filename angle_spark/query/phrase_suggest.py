"""Phrase suggester ("did you mean" for WHOLE queries — the ES
``phrase`` suggester): per-token candidate generation + a corpus
bigram language model rescoring entire candidate phrases, so
corrections are picked in context ("hash joint" -> "hash join" even
when "joint" is itself a valid vocabulary word somewhere).

Model is ES's default shape, stupid backoff (Brants et al. 2007,
"Large Language Models in Machine Translation") over corpus bigrams:

    score(w1..wn) = ln P(w1) + sum_i ln P(wi | wi-1)
    P(w1)       = cf(w1) / T                    (unigram MLE)
    P(wi|wi-1)  = cnt(wi-1, wi) / cf(wi-1)      when the bigram occurs
                = 0.4 * cf(wi) / T              otherwise (backoff)

with cf from the index term stats and T = total corpus tokens.
Candidates per token are DirectSpellChecker-shaped (edit distance <=
max_dist, ranked dist ASC / df DESC / term ASC, capped at per_term;
an in-vocabulary token is its own dist-0 candidate, so the original
phrase always competes). ES's confidence / real_word_error_likelihood
knobs are not modeled — suggestions rank purely by the LM score.

Scale shape: everything is Spark frames — candidates come from ONE
length-band-pruned scan of term_stats (the suggest_terms shape); the
candidate-sequence space is (per_term)^n rows per query, built by a
driver loop of n-1 bounded joins (n = query length, a constant; each
join is broadcast-size), each picking up its bigram count from the
bigram frame by key. The bigram model itself is one corpus pass
(adjacent-pair explode + count — a dedup-class job a deployment
refreshes with the index, not per query). Nothing corpus-shaped ships
per query; the vocabulary never reaches the driver.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

BACKOFF = 0.4


def bigram_counts(docs: DataFrame) -> DataFrame:
    """docs(doc_id, tokens) -> (w1, w2, cnt): adjacent-pair counts over
    the corpus token streams — the suggester's language model. One
    explode + one count shuffle, all JVM-side."""
    n1 = F.greatest(F.size("tokens") - 1, F.lit(0))
    pair = F.explode(
        F.arrays_zip(
            F.slice("tokens", 1, n1).alias("w1"),
            F.slice("tokens", 2, n1).alias("w2"),
        )
    ).alias("p")
    return (
        docs.select(pair)
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _candidates(
    tstats: DataFrame, words: list[str], max_dist: int, per_term: int
) -> DataFrame:
    """-> (word, term, cf, dist): up to per_term vocabulary candidates
    per word, DirectSpellChecker order (dist ASC, df DESC, term ASC)."""
    spark = tstats.sparkSession
    w = spark.createDataFrame([(x,) for x in sorted(set(words))], "word string")
    cand = (
        tstats.select("term", "df", "cf")
        .crossJoin(F.broadcast(w))
        .filter(F.abs(F.length("term") - F.length("word")) <= F.lit(max_dist))
        .withColumn("dist", F.levenshtein("word", "term"))
        .filter(F.col("dist") <= F.lit(max_dist))
    )
    win = Window.partitionBy("word").orderBy(
        F.asc("dist"), F.desc("df"), F.asc("term")
    )
    return (
        cand.withColumn("r", F.row_number().over(win))
        .filter(F.col("r") <= per_term)
        .select("word", "term", F.col("cf").cast("double").alias("cf"), "dist")
    )


def phrase_suggest(
    spark: SparkSession,
    tstats: DataFrame,
    bigrams: DataFrame,
    queries,
    total_tokens: float | None = None,
    max_dist: int = 1,
    per_term: int = 3,
    top_n: int = 3,
) -> DataFrame:
    """-> (query_id, rank, suggestion, score).

    queries: list of (query_id, text) or a (query_id, text) DataFrame;
    tstats: the index term stats (term, df, cf); bigrams: from
    bigram_counts. total_tokens defaults to sum(cf) — the exact corpus
    token count."""
    from angle_spark.functions.tokenizer import tokenize_py

    if max_dist < 0 or per_term < 1 or top_n < 1:
        raise ValueError("max_dist >= 0, per_term >= 1, top_n >= 1 required")
    if isinstance(queries, DataFrame):
        queries = [
            (r["query_id"], r["text"])
            for r in queries.select("query_id", "text").collect()
        ]
    toks = [(qid, tokenize_py(text)) for qid, text in queries]
    toks = [(qid, ts) for qid, ts in toks if ts]
    if not toks:
        return spark.createDataFrame(
            [], "query_id string, rank long, suggestion string, score double"
        )
    if total_tokens is None:
        total_tokens = float(
            tstats.agg(F.sum("cf")).collect()[0][0] or 0.0
        )
    if total_tokens <= 0:
        raise ValueError("empty corpus: total_tokens must be > 0")
    words = sorted({w for _, ts in toks for w in ts})
    cand = _candidates(tstats, words, max_dist, per_term).localCheckpoint()
    bg = F.broadcast(
        bigrams.select(
            F.col("w1").alias("_w1"),
            F.col("w2").alias("_w2"),
            F.col("cnt").cast("double").alias("_cnt"),
        ).join(
            F.broadcast(cand.select(F.col("term").alias("_w1")).distinct()),
            "_w1",
        )
    )
    T = float(total_tokens)

    out = None
    # queries of the same length share one join chain; a driver loop
    # over the few distinct lengths keeps the joins schema-uniform
    for n in sorted({len(ts) for _, ts in toks}):
        grp = [(qid, ts) for qid, ts in toks if len(ts) == n]
        qpos = spark.createDataFrame(
            [(qid, i, w) for qid, ts in grp for i, w in enumerate(ts)],
            "query_id string, pos int, word string",
        )
        step = (
            qpos.filter(F.col("pos") == 0)
            .join(cand, "word")
            .select(
                "query_id",
                F.array("term").alias("words"),
                F.col("term").alias("last"),
                F.col("cf").alias("lcf"),
                (F.log("cf") - F.log(F.lit(T))).alias("score"),
            )
        )
        for i in range(1, n):
            nxt = (
                qpos.filter(F.col("pos") == i)
                .join(cand, "word")
                .select(
                    "query_id",
                    F.col("term").alias("nterm"),
                    F.col("cf").alias("ncf"),
                )
            )
            step = (
                step.join(nxt, "query_id")
                .join(
                    bg,
                    (F.col("last") == F.col("_w1"))
                    & (F.col("nterm") == F.col("_w2")),
                    "left",
                )
                .select(
                    "query_id",
                    F.concat(F.col("words"), F.array("nterm")).alias("words"),
                    F.col("nterm").alias("last"),
                    F.col("ncf").alias("lcf"),
                    (
                        F.col("score")
                        + F.when(
                            F.col("_cnt").isNotNull(),
                            # seen bigram: ln(cnt / cf(prev)) — the
                            # previous candidate's cf rides the row
                            F.log("_cnt") - F.log(F.col("lcf")),
                        ).otherwise(
                            F.lit(math.log(BACKOFF))
                            + F.log("ncf")
                            - F.log(F.lit(T))
                        )
                    ).alias("score"),
                )
            )
        out = step if out is None else out.unionByName(step)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("suggestion")
    )
    return (
        out.select(
            "query_id",
            F.array_join("words", " ").alias("suggestion"),
            "score",
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "suggestion",
            "score",
        )
    )

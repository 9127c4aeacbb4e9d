"""Spell suggestion ("did you mean"): nearest vocabulary terms by edit
distance — what a search box offers when a query term matches nothing.

The reference sidesteps typos with subword embeddings (a misspelled
word still lands near its neighbors in embedding space — reference
angle_emb/angle.py:208-214 tokenizer); an inverted index has no such
grace: an OOV term matches nothing (by contract, see wand_topk), so
the engine owns the recovery step instead.

Ranking is Lucene DirectSpellChecker-shaped and fully deterministic:
(edit distance ASC, df DESC, term ASC), capped at ``k`` per word.

Scale shape: the candidate words broadcast into ONE scan of term_stats;
a length-band predicate (|len(term) - len(word)| <= max_dist, a cheap
necessary condition for edit distance) prunes before the levenshtein
evaluation, and the per-word top-k window returns |words| x k rows.
The vocabulary never reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def suggest_terms(
    spark: SparkSession,
    tstats: DataFrame,
    words: list[str],
    max_dist: int = 2,
    k: int = 3,
    suggest_mode: str = "always",
) -> DataFrame:
    """-> (word, rank, term, dist, df): up to ``k`` vocabulary terms
    within ``max_dist`` edits of each input word. A word with no
    near-enough term (or an exact vocabulary hit at dist 0 — callers
    usually pass only the OOV terms) simply yields fewer/no rows.

    ``suggest_mode`` is the ES term-suggester knob:

    - ``"always"`` (this function's default, backward-compatible):
      suggest for every word;
    - ``"missing"`` (ES's own default): suggest ONLY for words absent
      from the vocabulary — an indexed word yields no rows (its df > 0
      proves it needs no correction);
    - ``"popular"``: only candidates whose df is STRICTLY greater than
      the word's own df (0 for an OOV word) — the identity candidate
      can never outrank itself, so dist-0 rows vanish under this mode
      by construction.

    The word's own df resolves inside the same one-scan plan (a
    vocabulary-sized aggregate pushed into the candidate frame — the
    word IS one of its own length-band candidates whenever it's
    indexed), so no second term_stats pass and no driver round-trip."""
    if suggest_mode not in ("always", "missing", "popular"):
        raise ValueError(
            f"suggest_mode must be always|missing|popular, got {suggest_mode!r}"
        )
    if not words:
        return spark.createDataFrame(
            [], "word string, rank long, term string, dist int, df long"
        )
    w = spark.createDataFrame([(x,) for x in sorted(set(words))], "word string")
    cand = (
        tstats.select("term", "df")
        .crossJoin(F.broadcast(w))
        .filter(
            F.abs(F.length("term") - F.length("word")) <= F.lit(max_dist)
        )
        .withColumn("dist", F.levenshtein("word", "term"))
        .filter(F.col("dist") <= F.lit(max_dist))
    )
    if suggest_mode in ("missing", "popular"):
        # the word's own df, from the candidate frame itself: an
        # indexed word always sits in its own length band at dist 0,
        # so max(df where dist=0) over the word's partition IS its df
        # (0 when OOV — the identity candidate is simply absent)
        wdf = F.coalesce(
            F.max(F.when(F.col("dist") == 0, F.col("df"))).over(
                Window.partitionBy("word")
            ),
            F.lit(0),
        )
        cand = cand.withColumn("word_df", wdf)
        if suggest_mode == "missing":
            cand = cand.filter(F.col("word_df") == 0)
        else:
            cand = cand.filter(F.col("df") > F.col("word_df"))
    win = Window.partitionBy("word").orderBy(
        F.asc("dist"), F.desc("df"), F.asc("term")
    )
    return (
        cand.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(
            "word",
            F.col("rank").cast("long").alias("rank"),
            "term",
            F.col("dist").cast("int").alias("dist"),
            F.col("df").cast("long").alias("df"),
        )
    )


def complete_terms(
    spark: SparkSession,
    tstats: DataFrame,
    prefixes: list[str],
    k: int = 5,
) -> DataFrame:
    """-> (prefix, rank, term, df): up to ``k`` vocabulary completions
    per input prefix — the search-as-you-type suggester (Lucene/ES
    completion suggester, popularity-weighted by document frequency:
    the closest corpus-derived analog of stored suggestion weights).

    Ranking is deterministic: (df DESC, term ASC), capped at ``k``. An
    exact vocabulary term is its own first-class completion (``prefix``
    itself appears when indexed). A prefix completing to nothing yields
    no rows.

    Scale shape: prefixes broadcast into ONE scan of term_stats with a
    pushable StartsWith predicate per prefix; the per-prefix top-k
    window returns |prefixes| x k rows. The vocabulary never reaches
    the driver — the same contract as suggest_terms/prefix expansion."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not prefixes:
        return spark.createDataFrame(
            [], "prefix string, rank long, term string, df long"
        )
    clean = sorted(set(prefixes))
    if any(not p for p in clean):
        raise ValueError("empty prefix")
    p = spark.createDataFrame([(x,) for x in clean], "prefix string")
    cand = (
        tstats.select("term", "df")
        .crossJoin(F.broadcast(p))
        .filter(F.col("term").startswith(F.col("prefix")))
    )
    win = Window.partitionBy("prefix").orderBy(F.desc("df"), F.asc("term"))
    return (
        cand.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(
            "prefix",
            F.col("rank").cast("long").alias("rank"),
            "term",
            F.col("df").cast("long").alias("df"),
        )
    )

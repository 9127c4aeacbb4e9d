"""Text analysis for training-data pipelines (all JVM-side column ops).

Language ID is an n-gram/stopword heuristic (the container has no langid
model; the Spark plumbing — scoring per language profile, argmax — is the
real deliverable and a fasttext-style scorer drops into the same shape via
a pandas UDF). Quality scoring follows the usual corpus-filter features
(length, punctuation density, stopword ratio, repetition). Token counting
offers whitespace, tokenizer-v1, and a BPE-ish subword estimate.
Fingerprinting is a polynomial rolling hash over tokens.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from angle_spark.functions.tokenizer import tokens_col

# tiny per-language stopword profiles for the heuristic scorer
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "on"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf"],
    "fr": ["le", "la", "et", "les", "des", "est", "pas", "pour", "que"],
    "es": ["el", "la", "de", "que", "los", "es", "por", "con", "para"],
}


def lang_scores(tokens: Column) -> Column:
    """map<lang, double>: fraction of tokens matching each profile."""
    entries = []
    for lang, words in LANG_PROFILES.items():
        frac = F.size(F.filter(tokens, lambda t: t.isin(words))) / F.greatest(
            F.size(tokens), F.lit(1)
        )
        entries.extend([F.lit(lang), frac.cast("double")])
    return F.create_map(*entries)


def lang_id(tokens: Column) -> Column:
    """argmax language (ties broken by language code order) or 'und'
    when nothing matches."""
    scores = lang_scores(tokens)
    arr = F.array(
        *[
            F.struct(
                scores[lang].alias("score"), F.lit(lang).alias("lang")
            )
            for lang in sorted(LANG_PROFILES)
        ]
    )
    best = F.array_max(F.filter(arr, lambda s: s["score"] > 0))
    return F.when(best.isNull(), F.lit("und")).otherwise(best["lang"])


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """append the standard corpus-filter features."""
    toks = tokens_col(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(text_col)
    non_alnum = F.length(F.regexp_replace(F.lower(F.col(text_col)), "[a-z0-9\\s]", ""))
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("n_chars", n_chars)
        .withColumn(
            "mean_token_len",
            F.when(n_tok > 0, (n_chars - (n_tok - 1)).cast("double") / n_tok).otherwise(0.0),
        )
        .withColumn(
            "punct_ratio",
            F.when(n_chars > 0, non_alnum.cast("double") / n_chars).otherwise(0.0),
        )
        .withColumn(
            "repetition_ratio",
            F.when(
                n_tok > 0,
                1.0 - F.size(F.array_distinct(toks)).cast("double") / n_tok,
            ).otherwise(0.0),
        )
    )


def token_count_ws(text: Column) -> Column:
    """whitespace token count."""
    return F.size(F.filter(F.split(text, "\\s+"), lambda x: x != F.lit("")))


def token_count_subword_est(text: Column) -> Column:
    """BPE-ish subword count estimate: word tokens contribute
    ceil(len/4) pieces (the ~4-chars-per-token rule), digits/punct runs
    one each — a deterministic stand-in for a real BPE vocab."""
    toks = tokens_col(text)
    return F.aggregate(
        toks,
        F.lit(0),
        lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)).cast("int"),
    )


def rolling_fingerprint(tokens: Column, base: int = 1009, mod: int = (1 << 31) - 1) -> Column:
    """polynomial rolling hash over the token sequence (order-sensitive,
    unlike a bag-of-words hash): h = sum(tok_hash * base^i) mod m.
    Uses the portable md5-prefix token hash so engines agree. mod and
    base are sized so every intermediate fits int64 (Spark 4 runs ANSI
    mode — silent wraparound would instead throw)."""
    from angle_spark.operators.dedup import portable_hash32

    return F.aggregate(
        tokens,
        F.struct(F.lit(0).cast("long").alias("h"), F.lit(1).cast("long").alias("p")),
        lambda acc, t: F.struct(
            (
                (acc["h"] + (portable_hash32(t) % F.lit(mod)) * acc["p"]) % F.lit(mod)
            ).alias("h"),
            ((acc["p"] * F.lit(base)) % F.lit(mod)).alias("p"),
        ),
        lambda acc: acc["h"],
    )

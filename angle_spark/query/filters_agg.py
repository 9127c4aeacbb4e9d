"""filters aggregation (the ES ``filters`` agg): named arbitrary-query
buckets counted WITHIN each main query's matched set — the dashboard
primitive ("of the hits for Q, how many are also X / Y / other?").

Unlike terms/histogram buckets (one bucket column per doc), each bucket
here is an arbitrary QUERY — so the engine composes boolean trees:
bucket(Q, F) counts ``(Q) AND (F)``, and the ES ``other_bucket`` counts
``(Q) AND NOT ((F1) OR (F2) OR ...)``. All pairs run as ONE boolean
count batch (one shard pass, candidate blocks shared across buckets —
the same shape a multi-filter Kibana panel costs ES); per ES semantics
an empty bucket still reports 0 (count_matches emits no row for a dead
query, so the bucket list left-joins back with coalesce).

Any engine query text is a valid main query or filter: terms, phrases,
proximity, prefix/fuzzy/regex leaves, NOT — they compose because the
boolean grammar is closed under parenthesization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from angle_spark.index.build import IndexMeta

_SEP = "\x1f"
_OTHER = "_other_"


def filters_agg(
    spark: SparkSession,
    merged: DataFrame,
    tstats,
    meta: IndexMeta,
    queries,
    filters: dict[str, str],
    other_bucket: bool = False,
    **kwargs,
) -> DataFrame:
    """-> (query_id, bucket, n_docs). queries: (query_id, text[, k])
    Spark or pandas frame of MAIN queries (boolean grammar); filters:
    {bucket_name: filter_query_text}."""
    from angle_spark.query.wand import count_matches

    if not filters:
        raise ValueError("filters must be a non-empty {name: query} dict")
    for name in filters:
        if _SEP in name or not name:
            raise ValueError(f"invalid bucket name: {name!r}")
    if other_bucket and _OTHER in filters:
        raise ValueError(f"bucket name {_OTHER!r} is reserved")
    if isinstance(queries, DataFrame):
        qsrc = [
            (r["query_id"], r["text"])
            for r in queries.select("query_id", "text").collect()
        ]
    else:
        qsrc = [(q.query_id, q.text) for q in queries.itertuples(index=False)]
    for qid, _ in qsrc:
        if _SEP in qid:
            raise ValueError(f"query_id may not contain U+001F: {qid!r}")

    names = sorted(filters)
    synth = []
    for qid, text in qsrc:
        for name in names:
            synth.append(
                (f"{qid}{_SEP}{name}", f"({text}) AND ({filters[name]})", 1)
            )
        if other_bucket:
            union = " OR ".join(f"({filters[n]})" for n in names)
            synth.append(
                (
                    f"{qid}{_SEP}{_OTHER}",
                    f"({text}) AND NOT ({union})",
                    1,
                )
            )
    sq = spark.createDataFrame(synth, "query_id string, text string, k int")
    counts = count_matches(
        spark, merged, tstats, meta, sq, mode="boolean", **kwargs
    )
    parts = F.split(F.col("query_id"), _SEP)
    counts = counts.select(
        parts.getItem(0).alias("query_id"),
        parts.getItem(1).alias("bucket"),
        F.col("total_hits").alias("n_docs"),
    )
    all_names = names + ([_OTHER] if other_bucket else [])
    shell = spark.createDataFrame(
        [(qid, n) for qid, _ in qsrc for n in all_names],
        "query_id string, bucket string",
    )
    return shell.join(counts, ["query_id", "bucket"], "left").select(
        "query_id",
        "bucket",
        F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
    )

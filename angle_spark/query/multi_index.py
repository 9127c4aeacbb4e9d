"""Cross-index search with merged global statistics — Elasticsearch's
multi-index search (`GET /a,b/_search`) with
``search_type=dfs_query_then_fetch``.

Sharded deployments keep MANY physical indexes (time-partitioned
transcripts, per-source corpora, the LSM generations of a rolling
build) and query them as one logical index. The classic correctness
trap: BM25 statistics are per-index, so naive fan-out
(query_then_fetch) scores each index against its OWN df/avgdl and the
fused ranking silently compares incomparable numbers — a term that is
rare in a small index outranks the same term in a big one. The DFS
variant fixes it the way ES does: a statistics pre-phase merges df/N/
avgdl across every index, and each index then scores against the
GLOBAL statistics, making scores comparable by construction.

The invariant that makes this testable (and the entry's oracle): for
any partition of one corpus into disjoint indexes,

    search_indices([A, B, ...], dfs=True)  ==  search(A ∪ B ∪ ...)

bitwise — per-doc evidence (tf, dl) is local to the doc, and the DFS
phase reconstructs exactly the union's (df, N, avgdl). The entry
splits the documents corpus by doc_id parity and asserts equality
against the standard single-index BM25 oracle.

Scale shape: the DFS phase is one union+groupBy over the per-index
term_stats (vocabulary-sized, NEVER the corpus); each index then runs
its own unchanged wand_topk (per-index top-k under global scoring —
the global top-k is a subset of the union of per-index top-ks), and
the fuse is a window over |indexes| x k x |queries| rows. Per-index
pruning stays sound: MaxScore bounds use the global idf/avgdl, still
upper bounds within each index.
"""

from __future__ import annotations

import dataclasses

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def search_indices(
    spark: SparkSession,
    index_dirs: list[str],
    queries: DataFrame,
    dfs: bool = True,
    id_offsets: dict[str, int] | None = None,
    **kwargs,
) -> DataFrame:
    """-> (query_id, rank, index, doc_id, score): top-k over the union
    of several physical indexes.

    ``dfs=True`` (default, ES dfs_query_then_fetch): merge df per term,
    live doc counts and average doc length across all indexes, score
    every index against the merged statistics — scores are comparable
    and the result equals a single merged index's ranking bitwise.
    ``dfs=False`` (ES's default query_then_fetch) scores each index
    against its own statistics — cheaper (no stats pre-phase) but the
    fused ranking mixes incomparable scores; offered because it is what
    ES ships by default, disclosed because it is wrong whenever index
    sizes diverge.

    ``index`` in the output is the index dir path. Every physical index
    assigns its own dense-from-zero docID space (the build contract);
    ``id_offsets`` maps them back to one global space BEFORE the fuse
    (``{index_dir: offset}``, missing dirs offset 0) — output doc_ids
    are then global and rank ties break on the global id, which is what
    makes the partition-equality invariant exact. Without offsets,
    disambiguate rows by the index column. kwargs
    (mode/deletes/doc_filter/...) forward to every per-index wand_topk
    unchanged. The ``k`` column of ``queries`` is the GLOBAL page size;
    each index retrieves its local top-k under the chosen scoring, the
    fuse re-ranks (score DESC, doc_id ASC, index ASC) and cuts at k."""
    from angle_spark.index.build import load_index
    from angle_spark.query.wand import wand_topk

    if not index_dirs:
        raise ValueError("need at least one index dir")
    loaded = [load_index(spark, d) for d in index_dirs]

    if dfs:
        # statistics pre-phase: vocabulary-sized union, never the corpus
        lives = [m.n_docs - m.purged_docs for _, _, m in loaded]
        n_total = sum(lives)
        if n_total <= 0:
            raise ValueError("all indexes are empty")
        avgdl_global = (
            sum(m.avgdl * live for (_, _, m), live in zip(loaded, lives))
            / n_total
        )
        df_union = loaded[0][1].select("term", "df")
        for _, ts, _ in loaded[1:]:
            df_union = df_union.unionByName(ts.select("term", "df"))
        tstats_merged = (
            df_union.groupBy("term")
            .agg(F.sum("df").cast("long").alias("df"))
            .withColumn(
                "idf",
                F.log(
                    (F.lit(float(n_total)) - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                    + F.lit(1.0)
                ),
            )
        )

    parts = []
    for d, (merged, tstats, meta) in zip(index_dirs, loaded):
        if dfs:
            # merged stats on an in-memory meta copy: global avgdl for
            # the length norm, scoring_docs for the idf doc count (the
            # engine recomputes idf driver-side from df + live count —
            # tstats_merged's idf column alone would be ignored)
            tstats = tstats_merged
            meta = dataclasses.replace(
                meta, avgdl=avgdl_global, scoring_docs=n_total
            )
        hits = wand_topk(spark, merged, tstats, meta, queries, **kwargs)
        off = int((id_offsets or {}).get(d, 0))
        parts.append(
            hits.select(
                "query_id",
                F.lit(d).alias("index"),
                (F.col("doc_id") + F.lit(off)).alias("doc_id"),
                "score",
            )
        )
    allhits = parts[0]
    for p in parts[1:]:
        allhits = allhits.unionByName(p)

    import pandas as pd

    if isinstance(queries, pd.DataFrame):
        kdf = spark.createDataFrame(
            queries[["query_id", "k"]].drop_duplicates(),
            "query_id string, k int",
        )
    else:
        kdf = queries.select(
            "query_id", F.col("k").cast("int").alias("k")
        ).distinct()
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id"), F.asc("index")
    )
    return (
        allhits.join(F.broadcast(kdf), "query_id")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "index", "doc_id", "score")
    )

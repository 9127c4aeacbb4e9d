"""Index statistics API — the ES ``GET /index/_stats`` + ``_segments``
shape: one bounded row describing a committed index (doc counts, live
view, vocabulary size, posting volume, physical layout). The
observability surface an operator reads before deciding to merge,
purge, or roll over (index/alias.py rollover_due uses the same
watermarks); the reference's analog is its dataset summary logging
(reference angle_emb/angle.py Dataset prep prints).

One distributed pass over the block metadata columns (n_postings,
sum_tf, segment_id — column-pruned, the payload bytes read only for the
physical-size columns); everything else is meta/tombstone arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from angle_spark.index.build import load_index
from angle_spark.index.deletes import _load_deletes_df


def index_stats(spark: SparkSession, out_dir: str) -> DataFrame:
    """-> one row: (n_docs, live_docs, deleted, purged, avgdl, n_terms,
    n_postings, total_tokens, n_blocks, n_segments, posting_bytes,
    n_delta_runs, positional, analyzer).

    n_docs counts every doc ever committed (the dense docID watermark);
    live_docs = n_docs - purged (the scoring corpus); deleted counts
    PENDING tombstones (masked at query time, physically removed by the
    next purge). n_terms/n_postings/total_tokens describe the live block
    set exactly — (term, doc) is unique across blocks, so the sums add
    cleanly (the same invariant merge_index's df rebuild uses)."""
    merged, _tstats, meta = load_index(spark, out_dir)
    deletes = _load_deletes_df(spark, out_dir, meta)
    n_deleted = deletes.count() if deletes is not None else 0
    bin_cols = [
        c for c in ("docs_bin", "tfs_bin", "dls_bin", "pos_bin")
        if c in merged.columns
    ]
    size_expr = sum(
        (F.octet_length(F.col(c)) for c in bin_cols), F.lit(0)
    )
    agg = merged.agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.count_distinct("term").alias("n_terms"),
        F.sum("n_postings").alias("n_postings"),
        F.sum("sum_tf").alias("total_tokens"),
        F.count_distinct("segment_id").alias("n_segments"),
        F.sum(size_expr).alias("posting_bytes"),
    ).collect()[0]
    row = {
        "n_docs": int(meta.n_docs),
        "live_docs": int(meta.live_docs),
        "deleted": int(n_deleted),
        "purged": int(getattr(meta, "purged_docs", 0) or 0),
        "avgdl": float(meta.avgdl),
        "n_terms": int(agg["n_terms"] or 0),
        "n_postings": int(agg["n_postings"] or 0),
        "total_tokens": int(agg["total_tokens"] or 0),
        "n_blocks": int(agg["n_blocks"] or 0),
        "n_segments": int(agg["n_segments"] or 0),
        "posting_bytes": int(agg["posting_bytes"] or 0),
        "n_delta_runs": len(meta.delta_runs),
        "positional": bool(getattr(meta, "positional", False)),
        "analyzer": str(getattr(meta, "analyzer", "v1-ascii-alnum")),
    }
    return spark.createDataFrame(
        [tuple(row.values())],
        schema=(
            "n_docs long, live_docs long, deleted long, purged long, "
            "avgdl double, n_terms long, n_postings long, "
            "total_tokens long, n_blocks long, n_segments long, "
            "posting_bytes long, n_delta_runs long, positional boolean, "
            "analyzer string"
        ),
    )

"""Index stats API (index/stats_api.py) + sliced export
(wand.matched_ids slices): observability row correctness against
independently computed truths, tombstone/purge accounting, and
slice tiling/disjointness."""

from __future__ import annotations

import pandas as pd
import pytest

from angle_spark.index.build import build_index, load_index
from angle_spark.index.deletes import delete_docs
from angle_spark.index.stats import with_tokens
from angle_spark.index.stats_api import index_stats
from angle_spark.operators.docids import assign_doc_ids
from angle_spark.query.wand import matched_ids
from angle_spark.synth import transcripts_df

N_CONVS = 20
SEED = 17


@pytest.fixture()
def index_dir(spark, tmp_path):
    docs = (
        with_tokens(
            assign_doc_ids(transcripts_df(spark, N_CONVS, seed=SEED, partitions=4))
        )
        .select("doc_id", "tokens", "dl")
    )
    out = str(tmp_path / "idx")
    build_index(spark, docs, out, segment_docs=64, block_size=16)
    return out, docs


def test_index_stats_truths(spark, index_dir):
    out, docs = index_dir
    row = index_stats(spark, out).toPandas().iloc[0]
    import pyspark.sql.functions as F

    n = docs.count()
    assert row["n_docs"] == n == row["live_docs"]
    assert row["deleted"] == 0 and row["purged"] == 0
    truth = docs.select(F.explode("tokens").alias("t"), "doc_id")
    n_terms = truth.select("t").distinct().count()
    n_postings = truth.select("t", "doc_id").distinct().count()
    total_tokens = truth.count()
    assert row["n_terms"] == n_terms
    assert row["n_postings"] == n_postings
    assert row["total_tokens"] == total_tokens
    avgdl = docs.agg(F.avg("dl")).collect()[0][0]
    assert abs(row["avgdl"] - avgdl) < 1e-9
    # physical columns are self-consistent
    assert row["n_blocks"] >= row["n_terms"]  # >= one block per term
    assert row["n_segments"] >= 1
    assert row["posting_bytes"] > 0
    assert row["n_delta_runs"] == 0
    assert not row["positional"]
    assert row["analyzer"] == "v1-ascii-alnum"


def test_index_stats_sees_tombstones(spark, index_dir):
    out, docs = index_dir
    delete_docs(spark, out, spark.createDataFrame([(0,), (1,), (2,)], "doc_id long"))
    row = index_stats(spark, out).toPandas().iloc[0]
    assert row["deleted"] == 3
    # n_docs and live_docs unchanged until a purge
    assert row["n_docs"] == row["live_docs"] == docs.count()


def test_sliced_export_tiles(spark, index_dir):
    out, _docs = index_dir
    merged, tstats, meta = load_index(spark, out)
    q = pd.DataFrame(
        [("s1", "w0003 w0005", 1)], columns=["query_id", "text", "k"]
    )
    full = matched_ids(spark, merged, tstats, meta, q).toPandas()
    parts = [
        matched_ids(spark, merged, tstats, meta, q, slices=(i, 4)).toPandas()
        for i in range(4)
    ]
    union = pd.concat(parts)
    assert len(union) == len(full)
    assert set(union["doc_id"]) == set(full["doc_id"])
    for i, p in enumerate(parts):
        assert (p["doc_id"] % 4 == i).all()
    # disjoint
    seen = [set(p["doc_id"]) for p in parts]
    for i in range(4):
        for j in range(i + 1, 4):
            assert not (seen[i] & seen[j])
    for bad in ((4, 4), (-1, 3), (0, 0)):
        with pytest.raises(ValueError, match="slices"):
            matched_ids(spark, merged, tstats, meta, q, slices=bad)

"""Entry-level cache hygiene (round-3 VERDICT task 6): the entries that
materialize shared intermediates must not accumulate catalog-cached tables
across invocations in one long-lived session — eager localCheckpoint
replaces persist(), so the cache manager stays empty and blocks are
ContextCleaner-freed with the DataFrame."""

from __future__ import annotations

from angle_spark.entries import (
    q_bm25_topk_documents,
    q_minhash_lsh_pairs,
    q_spearman_qty_price,
)

SF_DIR = "/root/testdata/sf0.001"


def _cache_manager_empty(spark) -> bool:
    return bool(spark._jsparkSession.sharedState().cacheManager().isEmpty())


def test_entries_leave_no_cached_tables(spark):
    spark.catalog.clearCache()
    assert _cache_manager_empty(spark)
    for _ in range(2):  # repeated invocations must not grow anything
        assert q_bm25_topk_documents(spark, SF_DIR).count() > 0
        assert q_minhash_lsh_pairs(spark, SF_DIR).count() >= 0
        assert q_spearman_qty_price(spark, SF_DIR).count() == 1
        assert _cache_manager_empty(spark), "an entry registered a cached table"

"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementations live in angle_spark.entries; this module is the thin
adapter the driver imports.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the COMPLETE compressed-index engine cycle over sf0.001
    documents — SPIMI per-partition posting lists -> delta+varint block
    codec -> range-partitioned merge -> block-max/MaxScore-pruned BM25
    top-k (SURVEY.md §7 steps 4-8). Same path as the `bm25_wand_index`
    oracle entry; the declarative BM25 stays separately oracle-checked
    as `bm25_topk_documents`."""
    from angle_spark.entries import q_bm25_wand_index

    return q_bm25_wand_index(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from angle_spark.entries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from angle_spark.entries import ORACLE_SQL

    return dict(ORACLE_SQL)

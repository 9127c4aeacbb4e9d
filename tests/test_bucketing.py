"""Bucketed co-located join: pre-bucketing both sides on the join key
removes the exchange entirely (SURVEY.md §2.3 note: 'bucketing for
co-located joins'). The assertion reads the physical plan — the observable
contract is 'no shuffle', not 'same rows'."""

from __future__ import annotations

import contextlib
import io

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark):
    import shutil

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_lens")
    # a fresh session's in-memory catalog forgets managed tables but their
    # warehouse dirs survive -> clear the locations too
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_docs", "b_lens"):
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    (
        docs.write.mode("overwrite")
        .bucketBy(8, "doc_id")
        .sortBy("doc_id")
        .saveAsTable("b_docs")
    )
    (
        docs.select("doc_id", F.length("text").alias("len"))
        .write.mode("overwrite")
        .bucketBy(8, "doc_id")
        .sortBy("doc_id")
        .saveAsTable("b_lens")
    )
    return spark.table("b_docs"), spark.table("b_lens")


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, bucketed):
    a, b = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "doc_id").select("doc_id", "n_chars", "len")
        plan = _plan_of(joined)
        assert "Exchange" not in plan, plan
        # and it actually runs correctly
        assert joined.count() == a.count()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_unbucketed_join_does_exchange(spark, bucketed):
    a, _ = bucketed
    plain = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
        "doc_id", F.length("text").alias("len")
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan_of(a.join(plain, "doc_id"))
        assert "Exchange" in plan  # the contrast case
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )

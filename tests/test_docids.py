from __future__ import annotations

from angle_spark.operators.docids import assign_doc_ids, assign_doc_ids_window
from angle_spark.synth import transcripts_df, transcripts_pdf


def test_docids_match_window_spec(spark):
    df = transcripts_df(spark, 15, seed=42, partitions=4)
    fast = assign_doc_ids(df, num_partitions=6).toPandas()
    spec = assign_doc_ids_window(df).toPandas()
    fast = fast.sort_values("doc_id").reset_index(drop=True)
    spec = spec.sort_values("doc_id").reset_index(drop=True)
    assert list(fast["doc_id"]) == list(spec["doc_id"])
    assert list(fast["conv_id"]) == list(spec["conv_id"])
    assert list(fast["turn_idx"]) == list(spec["turn_idx"])
    assert list(fast["text"]) == list(spec["text"])


def test_docids_dense_and_stable(spark):
    df = transcripts_df(spark, 15, seed=42, partitions=3)
    out = assign_doc_ids(df, num_partitions=5).toPandas().sort_values("doc_id")
    n = len(out)
    assert list(out["doc_id"]) == list(range(n))
    # stable order == pandas lexicographic (conv_id, turn_idx)
    pdf = transcripts_pdf(15, seed=42).sort_values(["conv_id", "turn_idx"])
    assert list(out["text"]) == list(pdf["text"])  # per-turn text equality


def test_docids_partition_count_invariance(spark):
    df = transcripts_df(spark, 10, seed=42, partitions=2)
    a = assign_doc_ids(df, num_partitions=2).toPandas().sort_values("doc_id")
    b = assign_doc_ids(df, num_partitions=7).toPandas().sort_values("doc_id")
    assert list(a["text"]) == list(b["text"])
    assert list(a["doc_id"]) == list(b["doc_id"])

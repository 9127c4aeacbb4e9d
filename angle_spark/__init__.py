"""angle_spark — a PySpark-native full-text (BM25) analytics engine.

A from-scratch re-expression of the query/data-processing capabilities of
the reference embedding library (SeanLee97/AnglE, /root/reference) on top of
Apache Spark DataFrames: batched text ingestion, vectorized per-text
transforms, inverted-index construction (SPIMI segments -> merged,
delta+varint-compressed posting lists), Okapi BM25 top-k retrieval with
block-max WAND pruning, rank-correlation evaluation, plus the training-data
pipeline operators a 100 TB corpus needs (dedup, ANN, text quality,
fingerprinting).

Design stance (SURVEY.md §7): DataFrames + columnar expressions everywhere;
Python touches data only through Arrow-batched pandas UDFs
(mapInPandas / applyInPandas / pandas_udf) — mirroring the reference's
batch-vectorized discipline (reference angle_emb/angle.py:235-241). No RDDs,
no per-row Python UDFs, no custom Catalyst rules.
"""

__version__ = "0.1.0"

"""Index aliases: one durable NAME over many physical indexes — the
Elasticsearch alias + rollover shape, the operational glue for
time-partitioned corpora (transcripts roll into a new physical index
per period; queries keep hitting the one alias).

An alias file is a single crash-safe JSON (fsio temp+atomic-rename,
the same commit discipline as index metadata and percolator catalogs)
holding an ordered list of (index_dir, id_offset) members plus which
member is the WRITE index. Reads fan out through
query/multi_index.search_indices with merged DFS statistics, so scores
stay comparable across members by construction; the per-member
id_offset maps each dense-from-zero docID space into the alias's one
global space (offsets are assigned at add time from the running
watermark, so global ids never collide).

``rollover`` is ES's size-based rollover: when the write index's live
doc count reaches ``max_docs``, the caller's freshly built index joins
the alias as the new write member — one atomic alias-file swap, no data
moves, readers never see a half-state.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from angle_spark import fsio

ALIAS_VERSION = 1


def _load(spark: SparkSession, path: str) -> dict:
    data = json.loads(fsio.read_text(spark, path))
    if data.get("version") != ALIAS_VERSION:
        raise ValueError(f"unknown alias version {data.get('version')!r}")
    return data


def _save(spark: SparkSession, path: str, data: dict) -> None:
    fsio.write_text(spark, path, json.dumps(data, indent=1, sort_keys=True))


def create_alias(spark: SparkSession, path: str, index_dir: str) -> dict:
    """New alias over one member (the write index, offset 0)."""
    if fsio.exists(spark, path):
        raise ValueError(f"alias already exists at {path}")
    meta = _member_meta(spark, index_dir)
    data = {
        "version": ALIAS_VERSION,
        "members": [[index_dir, 0]],
        "write_index": index_dir,
        "next_offset": meta["n_docs"],
    }
    _save(spark, path, data)
    return data


def _member_meta(spark: SparkSession, index_dir: str) -> dict:
    from angle_spark.index.snapshot import META

    p = f"{index_dir}/{META}"
    if not fsio.exists(spark, p):
        raise ValueError(f"{index_dir} is not a committed index")
    return json.loads(fsio.read_text(spark, p))


def add_index(spark: SparkSession, path: str, index_dir: str,
              write: bool = True) -> dict:
    """Add a member; its global docID offset is the alias's running
    watermark (per-index ids are dense-from-zero, so offsets never
    collide). ``write=True`` makes it the new write index — the
    rollover commit."""
    data = _load(spark, path)
    if any(d == index_dir for d, _ in data["members"]):
        raise ValueError(f"{index_dir} is already an alias member")
    meta = _member_meta(spark, index_dir)
    data["members"].append([index_dir, int(data["next_offset"])])
    data["next_offset"] = int(data["next_offset"]) + int(meta["n_docs"])
    if write:
        data["write_index"] = index_dir
    _save(spark, path, data)
    return data


def rollover_due(spark: SparkSession, path: str, max_docs: int) -> bool:
    """True iff the write index's live doc count has reached max_docs
    (the ES size-based rollover condition; the caller then builds the
    next physical index and add_index(write=True) commits it)."""
    data = _load(spark, path)
    meta = _member_meta(spark, data["write_index"])
    live = int(meta["n_docs"]) - int(meta.get("purged_docs", 0))
    return live >= max_docs


def search_alias(spark: SparkSession, path: str, queries: DataFrame,
                 **kwargs) -> DataFrame:
    """-> (query_id, rank, index, doc_id, score): one search over every
    alias member with merged DFS statistics (query/multi_index.py);
    doc_ids are global under the alias's offsets."""
    from angle_spark.query.multi_index import search_indices

    data = _load(spark, path)
    dirs = [d for d, _ in data["members"]]
    offsets = {d: int(o) for d, o in data["members"]}
    return search_indices(
        spark, dirs, queries, id_offsets=offsets, **kwargs
    )

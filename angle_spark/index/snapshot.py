"""Index snapshot/restore — the Elasticsearch snapshot API shape
(point-in-time copy to a repository path, restore into a fresh index
dir), expressed over the Hadoop FileSystem API so file:// s3a:// hdfs://
all work (the same fsio contract index metadata uses).

Commit discipline mirrors the index's own single-atomic-commit-point
design:

- SNAPSHOT captures ``corpus_stats.json`` (the index's commit point)
  FIRST, copies every data directory, then writes the manifest and the
  captured meta LAST (each via fsio's temp+atomic-rename). A snapshot
  missing its meta is debris, never restorable — the meta write IS the
  snapshot's commit. Because index files are immutable once the meta
  references them (builds/appends write-then-commit), the copy is
  point-in-time consistent for everything the captured meta references;
  like compaction, snapshotting must not run concurrently with purge or
  merge maintenance (the documented single-maintainer contract — those
  REWRITE files).
- RESTORE refuses a non-empty destination and a snapshot without its
  manifest+meta (incomplete = crash debris), copies everything back,
  and verifies every manifest entry's size — a truncated copy fails
  loudly instead of serving a corrupt index.

The manifest lists (relative path, size) of every snapshotted file —
the verification surface for restore and for external integrity audits
(scripts/fsck_index.py checks the LIVE index; the manifest checks the
copy)."""

from __future__ import annotations

import json

from pyspark.sql import SparkSession

from angle_spark import fsio

MANIFEST = "snapshot_manifest.json"
META = "corpus_stats.json"


def _jfs(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p, jvm


def _walk_files(spark: SparkSession, root: str) -> list[tuple[str, int]]:
    """recursive (relative_path, size) listing — the checksum layer
    hides .crc sidecars, so only real payload files are listed."""
    fs, p, _ = _jfs(spark, root)
    out = []
    it = fs.listFiles(p, True)
    base = fs.makeQualified(p).toString().rstrip("/") + "/"
    while it.hasNext():
        st = it.next()
        full = st.getPath().toString()
        out.append((full[len(base):], int(st.getLen())))
    return sorted(out)


def _copy(spark: SparkSession, src: str, dst: str) -> None:
    sfs, sp, jvm = _jfs(spark, src)
    dfs, dp, _ = _jfs(spark, dst)
    ok = jvm.org.apache.hadoop.fs.FileUtil.copy(
        sfs, sp, dfs, dp, False, True, spark._jsc.hadoopConfiguration()
    )
    if not ok:
        raise IOError(f"copy failed: {src} -> {dst}")


def snapshot_index(spark: SparkSession, index_dir: str, snap_dir: str) -> dict:
    """Point-in-time snapshot of ``index_dir`` into ``snap_dir`` (must
    not already hold a snapshot). Returns the manifest dict."""
    if not fsio.exists(spark, f"{index_dir}/{META}"):
        raise ValueError(f"{index_dir} is not a committed index (no {META})")
    if fsio.exists(spark, f"{snap_dir}/{META}"):
        raise ValueError(f"{snap_dir} already holds a snapshot")
    meta_text = fsio.read_text(spark, f"{index_dir}/{META}")  # commit point
    fsio.mkdirs(spark, snap_dir)
    fs, p, _ = _jfs(spark, index_dir)
    it = fs.listStatus(p)
    copied = []
    for st in it:
        name = st.getPath().getName()
        if name in (META, MANIFEST) or name.endswith("._tmp"):
            continue
        _copy(spark, f"{index_dir}/{name}", f"{snap_dir}/{name}")
        copied.append(name)
    files = [
        (rel, size)
        for rel, size in _walk_files(spark, snap_dir)
        if rel not in (META, MANIFEST)
    ]
    manifest = {
        "version": 1,
        "source": index_dir,
        "entries": len(files),
        "bytes": sum(s for _, s in files),
        "files": files,
    }
    fsio.write_text(spark, f"{snap_dir}/{MANIFEST}", json.dumps(manifest, indent=1))
    # the meta write IS the snapshot commit — last, atomic
    fsio.write_text(spark, f"{snap_dir}/{META}", meta_text)
    return manifest


def restore_index(spark: SparkSession, snap_dir: str, dest_dir: str) -> dict:
    """Restore a snapshot into ``dest_dir`` (must not be a committed
    index already). Verifies every manifest entry's size after the
    copy; returns the manifest."""
    if not fsio.exists(spark, f"{snap_dir}/{META}") or not fsio.exists(
        spark, f"{snap_dir}/{MANIFEST}"
    ):
        raise ValueError(
            f"{snap_dir} is not a complete snapshot (missing {META} or "
            f"{MANIFEST} — an interrupted snapshot is debris, not data)"
        )
    if fsio.exists(spark, f"{dest_dir}/{META}"):
        raise ValueError(f"{dest_dir} already holds a committed index")
    manifest = json.loads(fsio.read_text(spark, f"{snap_dir}/{MANIFEST}"))
    if manifest.get("version") != 1:
        raise ValueError(f"unknown snapshot version {manifest.get('version')!r}")
    fsio.mkdirs(spark, dest_dir)
    fs, p, _ = _jfs(spark, snap_dir)
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name in (META, MANIFEST):
            continue
        _copy(spark, f"{snap_dir}/{name}", f"{dest_dir}/{name}")
    got = dict(_walk_files(spark, dest_dir))
    bad = [
        (rel, size, got.get(rel))
        for rel, size in manifest["files"]
        if got.get(rel) != size
    ]
    if bad:
        raise IOError(
            f"restore verification failed for {len(bad)} file(s), e.g. "
            f"{bad[0][0]}: manifest {bad[0][1]} bytes, restored {bad[0][2]}"
        )
    # meta last — the restored index's commit point
    fsio.write_text(
        spark, f"{dest_dir}/{META}", fsio.read_text(spark, f"{snap_dir}/{META}")
    )
    return manifest

"""Snapshot-committed parquet sink: atomic publish, time travel, vacuum.

The reference publishes marts by rewriting directories in place (the K2/K4
overwrite + compaction path, streaming_to_curated_stream.py:186-214): a
reader racing the writer can list a half-written directory. Table formats
solve this with a commit log; this sink implements the minimal, dependency-
free core of that idea — enough to make a 100 TB mart publish atomic —
without importing a lakehouse:

* data files are written ONCE into an immutable per-snapshot directory
  (``files/v<version>/``) by Spark's normal parallel committer;
* a snapshot becomes visible only when a single JSON **manifest** naming
  exactly its files is linked into ``_manifests/v<version>.json``. The link
  is ``os.link`` (create-exclusive, atomic on POSIX; fails with EEXIST
  instead of silently replacing — on an object store this step is a
  conditional PUT / putIfAbsent);
* readers resolve a manifest FIRST and read only the files it names
  (``spark.read.parquet(*files)``), so a reader can never observe a partial
  snapshot, and every retained older version stays readable (time travel);
* ``mode="append"`` commits a manifest that references the parent
  snapshot's files PLUS the new directory — an incremental publish reuses
  already-written data files, the property that makes per-batch publishing
  affordable at scale;
* losers of a concurrent commit race get EEXIST, re-read the log, and
  retry with the next version (optimistic concurrency, single winner per
  version — the same contract as Delta/Iceberg's commit point);
* ``vacuum`` deletes data directories no retained manifest references —
  readers of retained versions are never broken.

Layout:
    table/
      files/v00000001/part-*.parquet     (immutable once committed)
      files/v00000002/part-*.parquet
      _manifests/v00000001.json          (the ordered commit log)
      _manifests/v00000002.json
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_MANIFEST_DIR = "_manifests"
_FILES_DIR = "files"


def _manifest_path(table: str, version: int) -> str:
    return os.path.join(table, _MANIFEST_DIR, f"v{version:08d}.json")


def _versions(table: str) -> list[int]:
    mdir = os.path.join(table, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


def _read_manifest(table: str, version: int) -> dict:
    with open(_manifest_path(table, version)) as f:
        return json.load(f)


def _list_part_files(data_dir: str) -> list[str]:
    """Relative paths of the committed parquet parts (Spark's _SUCCESS /
    .crc bookkeeping excluded)."""
    rel = []
    for name in sorted(os.listdir(data_dir)):
        if name.endswith(".parquet") and not name.startswith("."):
            rel.append(name)
    return rel


def write_snapshot(
    df: DataFrame, table: str, mode: str = "overwrite", max_retries: int = 10
) -> int:
    """Publish `df` as a new snapshot of `table`; returns the version.

    ``overwrite``: the new snapshot is exactly `df`. ``append``: the new
    snapshot is the parent snapshot's files plus `df`'s — the parent data
    is NOT rewritten. Either way nothing is visible until the manifest
    link lands, and a crash before it leaves only an orphan data directory
    (invisible to readers, reclaimed by vacuum)."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"unsupported snapshot mode: {mode}")
    os.makedirs(os.path.join(table, _MANIFEST_DIR), exist_ok=True)
    # Stage data under a writer-unique name first: the snapshot version is
    # only decided at commit time, so two racing writers never write into
    # the same directory.
    stage = f"stage-{uuid.uuid4().hex}"
    stage_dir = os.path.join(table, _FILES_DIR, stage)
    df.write.mode("error").parquet(stage_dir)
    new_files = [f"{stage}/{p}" for p in _list_part_files(stage_dir)]
    schema_json = df.schema.json()

    for _ in range(max_retries):
        existing = _versions(table)
        parent = existing[-1] if existing else None
        version = (parent or 0) + 1
        files = list(new_files)
        if mode == "append" and parent is not None:
            pm = _read_manifest(table, parent)
            if pm["schema"] != schema_json:
                # mixing schemas under one manifest would make the reader
                # null-fill silently (explicit-schema parquet scan) — fail
                # loudly; widen via an overwrite snapshot instead
                raise ValueError(
                    f"append schema differs from snapshot v{parent} at "
                    f"{table}; publish mode='overwrite' to change schema"
                )
            files = pm["files"] + files
        manifest = {
            "version": version,
            "parent": parent,
            "mode": mode,
            "schema": schema_json,
            "files": files,
            "num_files": len(files),
        }
        tmp = os.path.join(table, _MANIFEST_DIR, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            # create-exclusive: exactly one writer wins each version
            os.link(tmp, _manifest_path(table, version))
            os.unlink(tmp)
            return version
        except FileExistsError:
            os.unlink(tmp)  # lost the race — re-read the log and retry
    raise RuntimeError(
        f"snapshot commit lost {max_retries} races on {table}; giving up"
    )


def merge_snapshot(
    df: DataFrame, table: str, keys: list[str] | tuple[str, ...]
) -> int:
    """Keyed upsert into the snapshot table — the lake twin of
    `sinks/jdbc.upsert_to_jdbc`: rows of the latest snapshot whose key
    matches an incoming row are replaced, everything else is carried
    forward, and the result publishes atomically as ONE new overwrite
    snapshot (readers see the pre-merge or post-merge table, never a mix).

    Replay-idempotent by construction: merging the same `df` twice yields
    the same table. The anti-join + union is a key-partitioned shuffle of
    the current snapshot — at 100 TB, partition the table so the merge
    prunes to affected partitions (the same discipline the JDBC staged
    merge documents)."""
    spark = df.sparkSession
    if not _versions(table):
        return write_snapshot(df, table, mode="overwrite")
    current = read_snapshot(spark, table)
    # compare name+type only: a parquet read is always nullable, while an
    # in-memory frame may carry non-null fields for the same data
    shape = lambda s: [(f.name, f.dataType) for f in s.fields]  # noqa: E731
    if shape(current.schema) != shape(df.schema):
        raise ValueError(
            f"merge schema differs from the latest snapshot at {table}"
        )
    merged = current.join(
        df.select(*keys).distinct(), list(keys), "left_anti"
    ).unionByName(df)
    return write_snapshot(merged, table, mode="overwrite")


def read_snapshot(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame:
    """Read a committed snapshot (latest, or a pinned `version` for time
    travel). Resolves the manifest first and scans ONLY the files it names,
    so concurrent writers/vacuums of other versions are invisible."""
    versions = _versions(table)
    if not versions:
        raise FileNotFoundError(f"no committed snapshots at {table}")
    if version is None:
        version = versions[-1]
    elif version not in versions:
        raise FileNotFoundError(f"snapshot v{version} not found at {table}")
    manifest = _read_manifest(table, version)
    paths = [os.path.join(table, _FILES_DIR, f) for f in manifest["files"]]
    schema = StructType.fromJson(json.loads(manifest["schema"]))
    return spark.read.schema(schema).parquet(*paths)


def compact_snapshot(
    spark: SparkSession, table: str, target_files: int = 4
) -> int:
    """OPTIMIZE for snapshot tables: rewrite the LATEST version's data into
    `target_files` files and publish the result as a new overwrite
    snapshot — readers of the old (many-small-files) version are
    untouched until vacuum reclaims it, and the swap is atomic like every
    other commit here. The streaming admission path appends one
    micro-batch's files per version, so periodic compaction is what keeps
    scan-side file counts bounded (the parquet sink's `compact()` twin,
    without the in-place rewrite)."""
    current = read_snapshot(spark, table)
    return write_snapshot(
        current.repartition(target_files), table, mode="overwrite"
    )


def snapshots(table: str) -> list[dict]:
    """The commit log, oldest first: version, parent, mode, num_files."""
    out = []
    for v in _versions(table):
        m = _read_manifest(table, v)
        out.append(
            {k: m[k] for k in ("version", "parent", "mode", "num_files")}
        )
    return out


def vacuum(table: str, keep_last: int = 2) -> list[str]:
    """Drop manifests beyond the newest `keep_last` and delete every data
    directory (including crash orphans) that no RETAINED manifest
    references. Returns the deleted directory names. Retained versions
    remain fully readable — referenced directories are never touched."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = _versions(table)
    keep = versions[-keep_last:]
    referenced: set[str] = set()
    for v in keep:
        for f in _read_manifest(table, v)["files"]:
            referenced.add(f.split("/", 1)[0])
    for v in versions[:-keep_last]:
        os.unlink(_manifest_path(table, v))
    deleted = []
    files_root = os.path.join(table, _FILES_DIR)
    if os.path.isdir(files_root):
        for name in sorted(os.listdir(files_root)):
            if name not in referenced:
                shutil.rmtree(os.path.join(files_root, name))
                deleted.append(name)
    return deleted

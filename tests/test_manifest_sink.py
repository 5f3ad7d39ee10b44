"""Snapshot-committed sink (sinks/manifest.py): atomic publish, append
reusing parent files, time travel, crash-orphan invisibility, commit-race
single-winner, and vacuum that never breaks a retained reader."""

from __future__ import annotations

import json
import os

import pytest

from clinical_search_data_pipeline_spark.sinks import manifest as m


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 2 AS v")


def _ids(df):
    return sorted(r.id for r in df.collect())


def test_overwrite_publish_and_time_travel(spark, tmp_path):
    table = str(tmp_path / "t")
    v1 = m.write_snapshot(_df(spark, 0, 5), table)
    v2 = m.write_snapshot(_df(spark, 100, 103), table)
    assert (v1, v2) == (1, 2)
    assert _ids(m.read_snapshot(spark, table)) == [100, 101, 102]
    assert _ids(m.read_snapshot(spark, table, version=1)) == [0, 1, 2, 3, 4]
    log = m.snapshots(table)
    assert [s["version"] for s in log] == [1, 2]
    assert log[1]["parent"] == 1


def test_append_reuses_parent_files(spark, tmp_path):
    table = str(tmp_path / "t")
    m.write_snapshot(_df(spark, 0, 3), table)
    m.write_snapshot(_df(spark, 10, 12), table, mode="append")
    assert _ids(m.read_snapshot(spark, table)) == [0, 1, 2, 10, 11]
    # parent's files are REFERENCED, not rewritten: v2's manifest is a
    # strict superset of v1's
    v1_files = set(m._read_manifest(table, 1)["files"])
    v2_files = set(m._read_manifest(table, 2)["files"])
    assert v1_files < v2_files


def test_crash_orphan_is_invisible_and_vacuumed(spark, tmp_path):
    """A writer that dies after the data write but before the manifest
    link leaves only an orphan directory: readers never see it, and
    vacuum reclaims it without touching any retained snapshot."""
    table = str(tmp_path / "t")
    m.write_snapshot(_df(spark, 0, 3), table)
    # simulate the crash: stage data exactly as write_snapshot does, no commit
    orphan = os.path.join(table, "files", "stage-deadbeef")
    _df(spark, 900, 905).write.parquet(orphan)
    assert _ids(m.read_snapshot(spark, table)) == [0, 1, 2]
    deleted = m.vacuum(table, keep_last=1)
    assert deleted == ["stage-deadbeef"]
    assert _ids(m.read_snapshot(spark, table)) == [0, 1, 2]


def test_commit_race_single_winner_and_retry(spark, tmp_path):
    """Optimistic concurrency: if another writer claims the next version
    between log read and link, the loser gets EEXIST and retries onto the
    following version — no manifest is ever silently replaced."""
    table = str(tmp_path / "t")
    m.write_snapshot(_df(spark, 0, 3), table)
    # a rival claims v2 out from under the writer
    rival = {
        "version": 2,
        "parent": 1,
        "mode": "overwrite",
        "schema": _df(spark, 0, 1).schema.json(),
        "files": m._read_manifest(table, 1)["files"],
        "num_files": 1,
    }
    with open(m._manifest_path(table, 2), "w") as f:
        json.dump(rival, f)
    v = m.write_snapshot(_df(spark, 50, 52), table)
    assert v == 3
    assert _ids(m.read_snapshot(spark, table)) == [50, 51]
    assert _ids(m.read_snapshot(spark, table, version=2)) == [0, 1, 2]


def test_vacuum_drops_old_versions_keeps_retained_readable(spark, tmp_path):
    table = str(tmp_path / "t")
    m.write_snapshot(_df(spark, 0, 2), table)
    m.write_snapshot(_df(spark, 10, 12), table)
    m.write_snapshot(_df(spark, 20, 23), table, mode="append")
    m.vacuum(table, keep_last=2)
    # v1's manifest is gone; v2 and v3 stay fully readable. v3 (append)
    # still references v2's data, which vacuum must therefore retain.
    with pytest.raises(FileNotFoundError):
        m.read_snapshot(spark, table, version=1)
    assert _ids(m.read_snapshot(spark, table, version=2)) == [10, 11]
    assert _ids(m.read_snapshot(spark, table)) == [10, 11, 20, 21, 22]


def test_read_empty_table_and_bad_mode(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        m.read_snapshot(spark, str(tmp_path / "missing"))
    with pytest.raises(ValueError):
        m.write_snapshot(_df(spark, 0, 1), str(tmp_path / "t"), mode="merge")


def test_append_schema_drift_fails_loudly(spark, tmp_path):
    """Mixing schemas under one manifest would silently null-fill on read
    (explicit-schema parquet scan) — append must refuse instead."""
    table = str(tmp_path / "t")
    m.write_snapshot(_df(spark, 0, 3), table)
    widened = _df(spark, 5, 7).selectExpr("id", "v", "v + 1 AS extra")
    with pytest.raises(ValueError, match="schema"):
        m.write_snapshot(widened, table, mode="append")
    # schema CHANGE ships as an overwrite snapshot — and the narrow v1
    # stays time-travel readable with ITS schema
    m.write_snapshot(widened, table)
    assert m.read_snapshot(spark, table).columns == ["id", "v", "extra"]
    assert m.read_snapshot(spark, table, version=1).columns == ["id", "v"]


def test_merge_snapshot_upsert_and_idempotent_replay(spark, tmp_path):
    """Keyed upsert: matched keys replaced, others carried forward, result
    one atomic snapshot; replaying the same merge changes nothing."""
    table = str(tmp_path / "t")
    m.write_snapshot(_df(spark, 0, 4), table)  # ids 0..3, v = 2*id
    patch = spark.range(2, 6).selectExpr("id", "id * 100 AS v")  # upd 2,3; ins 4,5
    v = m.merge_snapshot(patch, table, keys=["id"])
    got = {r.id: r.v for r in m.read_snapshot(spark, table).collect()}
    assert got == {0: 0, 1: 2, 2: 200, 3: 300, 4: 400, 5: 500}
    v2 = m.merge_snapshot(patch, table, keys=["id"])  # replay
    assert v2 == v + 1
    got2 = {r.id: r.v for r in m.read_snapshot(spark, table).collect()}
    assert got2 == got
    # pre-merge table still pinned at version 1 (time travel)
    assert {r.id for r in m.read_snapshot(spark, table, version=1).collect()} == {0, 1, 2, 3}


def test_merge_snapshot_bootstrap_and_schema_guard(spark, tmp_path):
    table = str(tmp_path / "t")
    assert m.merge_snapshot(_df(spark, 0, 2), table, keys=["id"]) == 1
    with pytest.raises(ValueError, match="schema"):
        m.merge_snapshot(
            _df(spark, 0, 1).selectExpr("id"), table, keys=["id"]
        )


def test_compact_snapshot_bounds_files_and_preserves_data(spark, tmp_path):
    """OPTIMIZE: many append-era small files rewrite into target_files in
    ONE new version; the data is unchanged, the pre-compaction version
    stays readable until vacuumed, and vacuum then reclaims the small
    files without touching the compacted ones."""
    table = str(tmp_path / "t")
    # simulate the streaming shape: many tiny appended versions
    for lo in range(0, 50, 10):
        m.write_snapshot(
            _df(spark, lo, lo + 10).repartition(4),
            table,
            mode="append" if lo else "overwrite",
        )
    before = m.snapshots(table)[-1]
    assert before["num_files"] >= 15
    v = m.compact_snapshot(spark, table, target_files=3)
    after = m._read_manifest(table, v)
    assert after["num_files"] <= 3
    assert _ids(m.read_snapshot(spark, table)) == list(range(50))
    # pre-compaction version still readable...
    assert _ids(m.read_snapshot(spark, table, version=v - 1)) == list(range(50))
    # ...until vacuum, which must keep the compacted version intact
    m.vacuum(table, keep_last=1)
    assert _ids(m.read_snapshot(spark, table)) == list(range(50))

"""CommitStore backends (sinks/commitstore.py, VERDICT r12 #2): the
interface contract on both backends, and the racing-committer proof that
the snapshot sink's single-winner protocol holds WITHOUT any POSIX
primitive — the reference's lake is S3
(infrastructure/infrastructure.md:386-390), where os.link/os.replace do
not exist and the commit point must be a conditional PUT."""

from __future__ import annotations

import json
import os
import threading

import pytest

from clinical_search_data_pipeline_spark.sinks import manifest as m
from clinical_search_data_pipeline_spark.sinks.commitstore import (
    MemoryCommitStore,
    PosixCommitStore,
)


def _backends(tmp_path):
    return [PosixCommitStore(), MemoryCommitStore()]


@pytest.mark.parametrize("kind", ["posix", "memory"])
def test_store_contract(kind, tmp_path):
    """The interface contract both backends must satisfy identically."""
    store = PosixCommitStore() if kind == "posix" else MemoryCommitStore()
    root = str(tmp_path / "log")
    a = os.path.join(root, "v00000001.json")

    assert store.get(a) is None
    assert not store.exists(a)
    assert store.list(root) == []
    assert store.fingerprint(a) is None

    assert store.put_if_absent(a, b"first")
    assert not store.put_if_absent(a, b"second")  # single winner
    assert store.get(a) == b"first"  # loser changed nothing
    assert store.exists(a)
    assert store.list(root) == ["v00000001.json"]
    assert store.mtime(a) > 0

    fp = store.fingerprint(a)
    assert fp is not None

    hint = os.path.join(root, "_tip.json")
    store.put(hint, b"{}")
    store.put(hint, b'{"version": 2}')  # last writer wins
    assert store.get(hint) == b'{"version": 2}'
    assert sorted(store.list(root)) == ["_tip.json", "v00000001.json"]

    store.delete(a)
    store.delete(a)  # idempotent
    assert store.get(a) is None
    assert store.fingerprint(a) is None
    with pytest.raises(FileNotFoundError):
        store.mtime(a)


@pytest.mark.parametrize("kind", ["posix", "memory"])
def test_racing_put_if_absent_single_winner(kind, tmp_path):
    """N threads race the SAME key: exactly one wins, and the published
    bytes are exactly the winner's — the property every snapshot commit
    rests on, proven with and without POSIX link semantics."""
    store = PosixCommitStore() if kind == "posix" else MemoryCommitStore()
    key = os.path.join(str(tmp_path), "log", "v00000007.json")
    n = 16
    barrier = threading.Barrier(n)
    results: list[tuple[int, bool]] = []
    lock = threading.Lock()

    def racer(i: int) -> None:
        barrier.wait()
        won = store.put_if_absent(key, f"writer-{i}".encode())
        with lock:
            results.append((i, won))

    threads = [threading.Thread(target=racer, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    winners = [i for i, won in results if won]
    assert len(winners) == 1, results
    assert store.get(key) == f"writer-{winners[0]}".encode()


def test_memory_store_has_no_posix_dependence(tmp_path, monkeypatch):
    """The object-store backend must work with os.link and os.replace
    GONE — the two primitives S3 lacks. (The fake stands in for the
    service's server-side conditional PUT; what this pins is that the
    BACKEND's code path never reaches for a filesystem primitive.)"""

    def boom(*a, **k):  # pragma: no cover - called means failure
        raise AssertionError("object-store backend touched a POSIX primitive")

    monkeypatch.setattr(os, "link", boom)
    monkeypatch.setattr(os, "replace", boom)
    monkeypatch.setattr(os, "rename", boom)
    store = MemoryCommitStore()
    key = str(tmp_path / "log" / "v00000001.json")
    assert store.put_if_absent(key, b"x")
    assert not store.put_if_absent(key, b"y")
    store.put(str(tmp_path / "log" / "_tip.json"), b"{}")
    assert store.get(key) == b"x"
    assert store.list(str(tmp_path / "log")) == ["_tip.json", "v00000001.json"]


def test_racing_snapshot_commits_on_object_store(spark, tmp_path):
    """End-to-end single-winner through the SINK on the S3-semantics
    backend: 6 threads append concurrently to one table with os.link /
    os.replace forbidden for log paths; every append lands exactly once,
    versions are dense, and the final snapshot is the union."""
    table = str(tmp_path / "t")
    with m.commit_store(MemoryCommitStore()):
        m.write_snapshot(
            spark.range(0, 2).selectExpr("id", "id * 2 AS v"), table
        )
        errs: list[Exception] = []

        def appender(i: int) -> None:
            try:
                df = spark.range(100 * i, 100 * i + 3).selectExpr(
                    "id", "id * 2 AS v"
                )
                m.write_snapshot(df, table, mode="append", max_retries=50)
            except Exception as exc:  # pragma: no cover
                errs.append(exc)

        threads = [
            threading.Thread(target=appender, args=(i,)) for i in range(1, 7)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs
        assert m.latest_version(table) == 7  # 1 bootstrap + 6 appends, dense
        got = sorted(r.id for r in m.read_snapshot(spark, table).collect())
        want = sorted(
            [0, 1] + [x for i in range(1, 7) for x in range(100 * i, 100 * i + 3)]
        )
        assert got == want
        # the log never touched the filesystem: no _manifests dir exists
        assert not os.path.exists(os.path.join(table, "_manifests"))


def test_expected_parent_cas_on_object_store(spark, tmp_path):
    """The lost-update guard (expected_parent) is pure protocol on top of
    put_if_absent — it must hold identically on the object-store backend."""
    table = str(tmp_path / "t")
    with m.commit_store(MemoryCommitStore()):
        m.write_snapshot(
            spark.range(0, 3).selectExpr("id", "id * 2 AS v"), table
        )
        m.write_snapshot(
            spark.range(5, 7).selectExpr("id", "id * 2 AS v"),
            table,
            mode="append",
        )
        with pytest.raises(m.SnapshotConflict):
            m.write_snapshot(
                spark.range(9, 10).selectExpr("id", "id * 2 AS v"),
                table,
                expected_parent=1,  # stale pin: tip is 2
            )


def test_store_swap_clears_materialize_cache(spark, tmp_path):
    """set_commit_store clears the materialized-manifest memo — a cached
    entry fingerprinted by one backend must never validate under another."""
    table = str(tmp_path / "t")
    m.write_snapshot(spark.range(0, 2).selectExpr("id", "id * 2 AS v"), table)
    m.write_snapshot(
        spark.range(5, 6).selectExpr("id", "id * 2 AS v"), table, mode="append"
    )
    m._read_manifest(table, 2)  # populate the memo (delta commit)
    with m.commit_store(MemoryCommitStore()):
        assert m._MATERIALIZE_CACHE == {}
    # and restored cleanly: the posix log is still readable
    assert m.latest_version(table) == 2


def test_delta_log_checkpoints_and_vacuum_on_object_store(spark, tmp_path):
    """The r12 delta-log machinery (delta commits, checkpoint sidecars,
    tip hint, vacuum's sidecar-then-reclaim) is protocol, not filesystem:
    run the whole lifecycle on the conditional-PUT backend."""
    table = str(tmp_path / "t")
    store = MemoryCommitStore()
    with m.commit_store(store):
        m.write_snapshot(
            spark.range(0, 2).selectExpr("id", "id * 2 AS v"), table
        )
        for i in range(11):  # v2..v12: deltas, sidecar at v10
            m.write_snapshot(
                spark.range(10 + i, 11 + i).selectExpr("id", "id * 2 AS v"),
                table,
                mode="append",
            )
        assert "delta" in json.loads(
            store.get(m._manifest_path(table, 5))
        )
        assert store.exists(m._checkpoint_path(table, 10))
        assert json.loads(
            store.get(os.path.join(table, "_manifests", "_tip.json"))
        )["version"] == 12
        before = sorted(
            r.id for r in m.read_snapshot(spark, table).collect()
        )
        m.vacuum(table, keep_last=2, retention_seconds=0)
        m._MATERIALIZE_CACHE.clear()
        assert sorted(
            r.id for r in m.read_snapshot(spark, table).collect()
        ) == before
        assert m.latest_version(table) == 12

"""Change-data-feed across rewriting commits (sinks/manifest.py
snapshot_change_feed), opt-in schema evolution on append, timestamp-
resolved snapshot reads, and the round-10 pruning/validation fixes."""

from __future__ import annotations

import datetime
import os
import shutil

import pytest

from clinical_search_data_pipeline_spark.sinks import manifest as m


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 2 AS v")


@pytest.fixture(autouse=True)
def _both_commit_backends(commit_backend):
    """Every test in this module runs under both commit-log backends —
    policy and rationale live in tests/conftest.py::commit_backend."""
    yield


def _ids(df):
    return sorted(r.id for r in df.collect())


def _feed_rows(df):
    return sorted(
        (r._change_type, r._commit_version, r.id, r.v) for r in df.collect()
    )


# ---------------------------------------------------------------- feed


def test_feed_append_is_inserts_only(spark, tmp_path):
    table = str(tmp_path / "t")
    m.write_snapshot(_df(spark, 0, 3), table)
    m.write_snapshot(_df(spark, 10, 12), table, mode="append")
    feed = m.snapshot_change_feed(spark, table, since=1)
    assert _feed_rows(feed) == [
        ("insert", 2, 10, 20),
        ("insert", 2, 11, 22),
    ]


def test_feed_first_version_is_all_inserts(spark, tmp_path):
    """since=0 starts from before the table existed; the bootstrap commit
    is pure inserts whatever its mode."""
    table = str(tmp_path / "t")
    m.write_snapshot(_df(spark, 0, 2), table)  # mode=overwrite bootstrap
    feed = m.snapshot_change_feed(spark, table, since=0)
    assert _feed_rows(feed) == [("insert", 1, 0, 0), ("insert", 1, 1, 2)]


def test_feed_across_merge_sees_exactly_the_upsert(spark, tmp_path):
    """A merge surfaces as delete(pre-image) + insert(post-image) for the
    matched keys and insert for novel keys — never a full-table diff."""
    table = str(tmp_path / "t")
    m.write_snapshot(_df(spark, 0, 4), table)  # ids 0..3, v = 2*id
    inc = spark.createDataFrame([(2, 999), (50, 100)], "id long, v long")
    v2 = m.merge_snapshot(inc, table, keys=["id"])
    feed = m.snapshot_change_feed(spark, table, since=1, until=v2)
    assert _feed_rows(feed) == [
        ("delete", 2, 2, 4),  # pre-image of the matched row
        ("insert", 2, 2, 999),  # post-image
        ("insert", 2, 50, 100),  # novel key
    ]


def test_feed_across_compaction_is_empty(spark, tmp_path):
    table = str(tmp_path / "t")
    m.write_snapshot(_df(spark, 0, 3), table)
    m.write_snapshot(_df(spark, 10, 13), table, mode="append")
    v3 = m.compact_snapshot(spark, table, target_files=1)
    feed = m.snapshot_change_feed(spark, table, since=2, until=v3)
    assert feed.count() == 0
    assert set(feed.columns) == {"id", "v", "_change_type", "_commit_version"}


def test_feed_across_replace_partitions_is_replaced_only(spark, tmp_path):
    """Only the replaced partitions' rows appear (old as deletes, staged
    as inserts); carried-by-reference partitions contribute nothing."""
    table = str(tmp_path / "t")
    base = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3), ("c", 4)], "day string, v long"
    )
    m.write_snapshot(base, table, partition_by=["day"])
    fix = spark.createDataFrame([("b", 30), ("b", 31)], "day string, v long")
    v2 = m.replace_partitions(fix, table, "day")
    feed = m.snapshot_change_feed(spark, table, since=1, until=v2)
    rows = sorted((r._change_type, r.day, r.v) for r in feed.collect())
    assert rows == [
        ("delete", "b", 3),
        ("insert", "b", 30),
        ("insert", "b", 31),
    ]


def test_feed_replays_to_the_final_snapshot(spark, tmp_path):
    """The consumer contract end-to-end: materialize v1, apply the feed's
    deletes-then-inserts per commit, arrive at the latest snapshot —
    across an append, a merge, AND a compaction in one range."""
    table = str(tmp_path / "t")
    m.write_snapshot(_df(spark, 0, 4), table)
    m.write_snapshot(_df(spark, 10, 12), table, mode="append")
    inc = spark.createDataFrame([(1, -1), (99, -2)], "id long, v long")
    m.merge_snapshot(inc, table, keys=["id"])
    last = m.compact_snapshot(spark, table, target_files=1)

    state = {r.id: r.v for r in m.read_snapshot(spark, table, version=1).collect()}
    feed = m.snapshot_change_feed(spark, table, since=1, until=last).collect()
    for r in sorted(feed, key=lambda r: (r._commit_version, r._change_type != "delete")):
        if r._change_type == "delete":
            state.pop(r.id)
        else:
            state[r.id] = r.v
    final = {r.id: r.v for r in m.read_snapshot(spark, table).collect()}
    assert state == final


def test_feed_refuses_opaque_overwrite(spark, tmp_path):
    table = str(tmp_path / "t")
    m.write_snapshot(_df(spark, 0, 3), table)
    m.write_snapshot(_df(spark, 5, 8), table, mode="overwrite")
    with pytest.raises(ValueError, match="opaque overwrite"):
        m.snapshot_change_feed(spark, table, since=1)


def test_feed_horizon_is_vacuum(spark, tmp_path):
    """Reclaimed change files raise a clear horizon error instead of
    silently under-reporting the range."""
    table = str(tmp_path / "t")
    m.write_snapshot(_df(spark, 0, 4), table)
    inc = spark.createDataFrame([(1, -1)], "id long, v long")
    v2 = m.merge_snapshot(inc, table, keys=["id"])
    cdf_dir = m._read_manifest(table, v2)["cdf"]["dir"]
    shutil.rmtree(os.path.join(table, m._FILES_DIR, cdf_dir))
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        m.snapshot_change_feed(spark, table, since=1, until=v2)


def test_vacuum_keeps_retained_merge_change_files(spark, tmp_path):
    """A retained merge commit's change files are referenced — vacuum must
    not reclaim them while the manifest is retained."""
    table = str(tmp_path / "t")
    m.write_snapshot(_df(spark, 0, 4), table)
    inc = spark.createDataFrame([(1, -1)], "id long, v long")
    v2 = m.merge_snapshot(inc, table, keys=["id"])
    m.vacuum(table, keep_last=2, retention_seconds=0)
    feed = m.snapshot_change_feed(spark, table, since=1, until=v2)
    # one matched key -> its pre-image delete + post-image insert
    assert feed.count() == 2


def test_snapshot_changes_empty_table_raises_range_error(spark, tmp_path):
    """ADVICE r9 #3: since == until on an empty table must raise the range
    error, not a raw FileNotFoundError from opening v00000000.json."""
    table = str(tmp_path / "t")
    os.makedirs(os.path.join(table, m._MANIFEST_DIR))
    with pytest.raises(FileNotFoundError, match="not resolvable"):
        m.snapshot_changes(spark, table, since=0)


def test_snapshot_changes_since_equals_until_outside_retained(spark, tmp_path):
    table = str(tmp_path / "t")
    m.write_snapshot(_df(spark, 0, 3), table)
    with pytest.raises(FileNotFoundError, match="not resolvable"):
        m.snapshot_changes(spark, table, since=7, until=7)


# ------------------------------------------------- schema evolution


def test_append_schema_evolution_roundtrip(spark, tmp_path):
    """allow_new_columns: the evolved append lands, old files null-fill
    the added column, time travel to the pre-evolution version returns
    the old schema, and non-opted drift still refuses."""
    table = str(tmp_path / "t")
    m.write_snapshot(_df(spark, 0, 3), table)
    widened = spark.range(10, 12).selectExpr(
        "id", "id * 2 AS v", "CAST(id AS STRING) AS tag"
    )
    with pytest.raises(ValueError, match="allow_new_columns"):
        m.write_snapshot(widened, table, mode="append")
    v2 = m.write_snapshot(
        widened, table, mode="append", allow_new_columns=True
    )
    cur = m.read_snapshot(spark, table)
    assert set(cur.columns) == {"id", "v", "tag"}
    rows = {r.id: r.tag for r in cur.collect()}
    assert rows == {0: None, 1: None, 2: None, 10: "10", 11: "11"}
    # time travel: the pre-evolution version still reads the old schema
    assert set(m.read_snapshot(spark, table, version=1).columns) == {"id", "v"}
    # the feed across the evolution null-fills the older pieces
    m.write_snapshot(
        spark.range(20, 21).selectExpr(
            "id", "id * 2 AS v", "CAST(id AS STRING) AS tag"
        ),
        table,
        mode="append",
    )
    feed = m.snapshot_change_feed(spark, table, since=1)
    assert feed.count() == 3
    assert v2 == 2


def test_append_evolution_refuses_type_change_and_nonnull(spark, tmp_path):
    table = str(tmp_path / "t")
    m.write_snapshot(_df(spark, 0, 3), table)
    retyped = spark.range(5, 6).selectExpr(
        "id", "CAST(id AS STRING) AS v"
    )
    with pytest.raises(ValueError, match="schema differs"):
        m.write_snapshot(
            retyped, table, mode="append", allow_new_columns=True
        )


# ------------------------------------------- timestamp time travel


def test_read_as_of_timestamp(spark, tmp_path):
    table = str(tmp_path / "t")
    m.write_snapshot(_df(spark, 0, 3), table)
    m.write_snapshot(_df(spark, 100, 102), table)
    log = m.snapshots(table)
    t1, t2 = log[0]["committed_at"], log[1]["committed_at"]
    assert t1 <= t2
    # between the two commits (or exactly at t1 if adjacent) -> v1
    mid = (t1 + t2) / 2
    assert _ids(m.read_snapshot(spark, table, as_of_ts=mid)) == _ids(
        m.read_snapshot(spark, table, version=1)
    )
    assert _ids(m.read_snapshot(spark, table, as_of_ts=t2 + 1)) == [100, 101]
    with pytest.raises(FileNotFoundError, match="at or before"):
        m.read_snapshot(spark, table, as_of_ts=t1 - 10)
    with pytest.raises(ValueError, match="not both"):
        m.read_snapshot(spark, table, version=1, as_of_ts=mid)
    # datetime / ISO-string forms resolve identically; naive input is
    # UTC (committed_at is a UTC epoch), so a UTC-rendered wall time
    # resolves the same version on any host timezone (ADVICE r10)
    utc = datetime.timezone.utc
    aware = datetime.datetime.fromtimestamp(mid, tz=utc)
    assert m.version_as_of(table, aware) == 1
    assert m.version_as_of(table, aware.replace(tzinfo=None)) == 1
    assert m.version_as_of(table, aware.replace(tzinfo=None).isoformat()) == 1


# ----------------------------------------- timestamp predicate pruning


def test_timestamp_where_predicate_never_falsely_prunes(spark, tmp_path):
    """ADVICE r9 #1: footer stats store ISO-8601 ('T' separator) while
    str(datetime) uses a space; the comparison key must normalize, or a
    contained point predicate lexically sorts below the file's min and
    the file is wrongly skipped."""
    table = str(tmp_path / "t")
    df = spark.createDataFrame(
        [
            (1, datetime.datetime(2017, 6, 15, 0, 0, 0)),
            (2, datetime.datetime(2017, 6, 15, 12, 0, 0)),
            (3, datetime.datetime(2017, 6, 15, 23, 0, 0)),
        ],
        "id long, ts timestamp",
    ).coalesce(1)
    m.write_snapshot(df, table)
    got = m.read_snapshot(
        spark, table, where={"ts": datetime.datetime(2017, 6, 15, 12)}
    )
    assert _ids(got) == [2]
    rng = m.read_snapshot(
        spark,
        table,
        where={
            "ts": (
                datetime.datetime(2017, 6, 15, 6),
                datetime.datetime(2017, 6, 15, 13),
            )
        },
    )
    assert _ids(rng) == [2]


# ------------------------------------------------ base_version append


def test_append_base_version_skips_orphaned_tip(spark, tmp_path):
    """A publisher pinned to v1 appends relative to v1 even when an
    unpinned (crashed/race-losing) append sits at the tip: the orphan's
    rows are never folded forward."""
    table = str(tmp_path / "t")
    m.write_snapshot(_df(spark, 0, 3), table)  # v1 (pinned)
    m.write_snapshot(_df(spark, 900, 902), table, mode="append")  # orphan v2
    v3 = m.write_snapshot(
        _df(spark, 10, 12), table, mode="append", base_version=1
    )
    assert v3 == 3
    assert _ids(m.read_snapshot(spark, table, version=3)) == [0, 1, 2, 10, 11]
    # the orphan version itself remains readable until vacuumed
    assert 900 in _ids(m.read_snapshot(spark, table, version=2))
    with pytest.raises(FileNotFoundError, match="base_version"):
        m.write_snapshot(
            _df(spark, 50, 51), table, mode="append", base_version=99
        )
    with pytest.raises(ValueError, match="append mode"):
        m.write_snapshot(_df(spark, 50, 51), table, base_version=1)


def test_feed_since_zero_after_vacuum_raises(spark, tmp_path):
    """since=0 promises the FULL history; once vacuum drops the early
    manifests the promise is unservable and must raise — not silently
    start from the oldest retained version."""
    table = str(tmp_path / "t")
    m.write_snapshot(_df(spark, 0, 3), table)
    m.merge_snapshot(
        spark.createDataFrame([(1, -1)], "id long, v long"), table, ["id"]
    )
    m.merge_snapshot(
        spark.createDataFrame([(2, -2)], "id long, v long"), table, ["id"]
    )
    m.vacuum(table, keep_last=2, retention_seconds=0)
    with pytest.raises(FileNotFoundError, match="horizon"):
        m.snapshot_change_feed(spark, table, since=0)


def test_feed_walks_lineage_not_version_order(spark, tmp_path):
    """A base_version append's parent may be an ORPHANED branch (a
    publisher whose external pin never landed): its rows are not in the
    final state and must not surface as feed inserts. The feed walks the
    append_base/parent lineage, and a `since` that sits on the orphaned
    branch is refused."""
    table = str(tmp_path / "t")
    m.write_snapshot(_df(spark, 0, 3), table)  # v1
    m.write_snapshot(_df(spark, 900, 902), table, mode="append")  # orphan v2
    v3 = m.write_snapshot(
        _df(spark, 10, 12), table, mode="append", base_version=1
    )
    feed = m.snapshot_change_feed(spark, table, since=1, until=v3)
    assert _feed_rows(feed) == [
        ("insert", 3, 10, 20),
        ("insert", 3, 11, 22),
    ]
    full = m.snapshot_change_feed(spark, table, since=0, until=v3)
    assert sorted(r.id for r in full.collect()) == [0, 1, 2, 10, 11]
    with pytest.raises(FileNotFoundError, match="lineage"):
        m.snapshot_change_feed(spark, table, since=2, until=v3)


# ------------------------------------------------- CDC -> serving apply


def test_cdc_apply_syncs_serving_table(spark, tmp_path):
    """serve_changes_job / apply_changes_to_jdbc: the change feed replays
    into a keyed serving DB (DuckDB as the DB-API target, like the K7
    tests) — after each sync the serving table equals the snapshot, a
    replayed feed converges (idempotence), and a no-change range applies
    nothing. Covers merge, append, AND compaction commits in one range."""
    import duckdb

    from clinical_search_data_pipeline_spark.jobs.pipelines import (
        serve_changes_job,
    )

    table = str(tmp_path / "t")
    m.write_snapshot(_df(spark, 0, 4), table)

    con = duckdb.connect()
    con.execute("CREATE TABLE serve (id BIGINT PRIMARY KEY, v BIGINT)")
    applied: list[str] = []

    def merge_executor(sql: str) -> None:
        applied.append(sql)
        con.execute(sql)

    def stage_writer(df, staging: str) -> None:
        pdf = df.toPandas()
        con.register(f"{staging}_pdf", pdf)
        con.execute(f"CREATE TABLE {staging} AS SELECT * FROM {staging}_pdf")
        con.unregister(f"{staging}_pdf")

    def serving_rows():
        return sorted(con.execute("SELECT id, v FROM serve").fetchall())

    def snapshot_rows():
        return sorted(
            (r.id, r.v) for r in m.read_snapshot(spark, table).collect()
        )

    # bootstrap sync from nothing
    wm = serve_changes_job(
        spark, table, "serve", ("id",), 0, merge_executor,
        stage_writer=stage_writer,
    )
    assert serving_rows() == snapshot_rows()

    # merge (upsert + novel key) + append + compaction in ONE range
    m.merge_snapshot(
        spark.createDataFrame([(1, -1), (50, 500)], "id long, v long"),
        table, keys=["id"],
    )
    m.write_snapshot(_df(spark, 10, 12), table, mode="append")
    m.compact_snapshot(spark, table, target_files=1)
    wm2 = serve_changes_job(
        spark, table, "serve", ("id",), wm, merge_executor,
        stage_writer=stage_writer,
    )
    assert wm2 > wm
    assert serving_rows() == snapshot_rows()
    # the delete half really ran as a keyed DELETE ... USING
    assert any(sql.startswith("DELETE FROM serve USING") for sql in applied)

    # no-change sync applies nothing
    n_applied = len(applied)
    assert serve_changes_job(
        spark, table, "serve", ("id",), wm2, merge_executor,
        stage_writer=stage_writer,
    ) == wm2
    assert len(applied) == n_applied

    # idempotent replay: re-applying the same range converges
    changes = m.snapshot_change_feed(spark, table, since=wm, until=wm2)
    from clinical_search_data_pipeline_spark.sinks.jdbc import (
        apply_changes_to_jdbc,
    )

    apply_changes_to_jdbc(
        changes, "serve", ["id"], None, merge_executor,
        stage_writer=stage_writer,
    )
    assert serving_rows() == snapshot_rows()


def test_feed_scans_only_delta_files(spark, tmp_path):
    """Scan-boundedness, mechanically: the feed across an append opens
    ONLY the files that append staged — never the base snapshot's — and
    across a merge only the recorded change files. At 100 TB this is the
    property that makes incremental consumption O(delta)."""
    table = str(tmp_path / "t")
    m.write_snapshot(_df(spark, 0, 1000), table)
    v1_files = {
        e["path"] for e in m._entries(m._read_manifest(table, 1))
    }
    m.write_snapshot(_df(spark, 2000, 2010), table, mode="append")
    feed = m.snapshot_change_feed(spark, table, since=1)
    opened = feed.inputFiles()
    assert opened
    assert not any(
        any(f.endswith(p) or p in f for p in v1_files) for f in opened
    ), "append feed must not open the base snapshot's files"

    vm = m.merge_snapshot(
        spark.createDataFrame([(1, -1)], "id long, v long"), table, ["id"]
    )
    cdf_dir = m._read_manifest(table, vm)["cdf"]["dir"]
    merge_feed = m.snapshot_change_feed(spark, table, since=2, until=vm)
    m_opened = merge_feed.inputFiles()
    assert m_opened and all(cdf_dir in f for f in m_opened), (
        "merge feed must read the recorded change files only"
    )


def test_serve_changes_job_durable_watermark(spark, tmp_path):
    """state_path: the watermark persists across job invocations (atomic
    rewrite AFTER the apply), a fresh consumer bootstraps from 0, and the
    at-least-once replay after a simulated crash converges."""
    import duckdb
    import json

    from clinical_search_data_pipeline_spark.jobs.pipelines import (
        serve_changes_job,
    )

    table = str(tmp_path / "t")
    state = str(tmp_path / "wm.json")
    m.write_snapshot(_df(spark, 0, 3), table)
    con = duckdb.connect()
    con.execute("CREATE TABLE serve (id BIGINT PRIMARY KEY, v BIGINT)")

    def merge_executor(sql):
        con.execute(sql)

    def stage_writer(df, staging):
        con.register(f"{staging}_pdf", df.toPandas())
        con.execute(f"CREATE TABLE {staging} AS SELECT * FROM {staging}_pdf")
        con.unregister(f"{staging}_pdf")

    kw = dict(merge_executor=merge_executor, stage_writer=stage_writer,
              state_path=state)
    assert serve_changes_job(spark, table, "serve", ("id",), **kw) == 1
    assert json.load(open(state))["version"] == 1
    m.write_snapshot(_df(spark, 10, 12), table, mode="append")
    assert serve_changes_job(spark, table, "serve", ("id",), **kw) == 2
    got = sorted(con.execute("SELECT id FROM serve").fetchall())
    assert [r[0] for r in got] == [0, 1, 2, 10, 11]
    # simulated crash between apply and state write: stale watermark ->
    # the range replays, and the idempotent apply converges
    json.dump({"table": table, "version": 1}, open(state, "w"))
    assert serve_changes_job(spark, table, "serve", ("id",), **kw) == 2
    got = sorted(con.execute("SELECT id, v FROM serve").fetchall())
    assert got == [(0, 0), (1, 2), (2, 4), (10, 20), (11, 22)]


def test_serve_changes_job_rejects_foreign_state_file(spark, tmp_path):
    """A state file written for one table must not seed another table's
    watermark — applying the wrong feed from it silently skips or
    double-spans history (ADVICE r10)."""
    import json

    from clinical_search_data_pipeline_spark.jobs.pipelines import (
        serve_changes_job,
    )

    t1, t2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    m.write_snapshot(_df(spark, 0, 3), t1)
    m.write_snapshot(_df(spark, 0, 3), t2)
    state = str(tmp_path / "wm.json")
    json.dump({"table": t1, "version": 1}, open(state, "w"))
    with pytest.raises(ValueError, match="watermark for"):
        serve_changes_job(
            spark, t2, "serve", ("id",),
            merge_executor=lambda sql: None,
            stage_writer=lambda df, staging: None,
            state_path=state,
        )
    # explicit since= bypasses the state file and stays usable
    assert serve_changes_job(
        spark, t2, "serve", ("id",), since=1,
        merge_executor=lambda sql: None,
        stage_writer=lambda df, staging: None,
    ) == 1


# ------------------------------------------------- DELETE FROM ... WHERE


def test_delete_from_snapshot_unpartitioned(spark, tmp_path):
    """DELETE WHERE rewrites only the touched files, records the deleted
    rows for the feed, keeps time travel intact, and a no-match predicate
    commits nothing."""
    table = str(tmp_path / "t")
    m.write_snapshot(_df(spark, 0, 10), table)
    v, n = m.delete_from_snapshot(spark, table, {"id": (3, 5)})
    assert (v, n) == (2, 3)
    assert _ids(m.read_snapshot(spark, table)) == [0, 1, 2, 6, 7, 8, 9]
    assert _ids(m.read_snapshot(spark, table, version=1)) == list(range(10))
    feed = m.snapshot_change_feed(spark, table, since=1, until=v)
    assert _feed_rows(feed) == [
        ("delete", 2, 3, 6),
        ("delete", 2, 4, 8),
        ("delete", 2, 5, 10),
    ]
    # no-match: unchanged tip, no commit
    assert m.delete_from_snapshot(spark, table, {"id": 999}) == (2, 0)
    assert len(m.snapshots(table)) == 2
    # legacy inserts-only reader refuses across the rewrite
    with pytest.raises(ValueError, match="not an append"):
        m.snapshot_changes(spark, table, since=1)


def test_delete_from_snapshot_prunes_partitions(spark, tmp_path):
    """Partitioned DELETE: untouched partitions' files carry forward BY
    REFERENCE (path-identical across versions), only the matching
    partition rewrites."""
    table = str(tmp_path / "t")
    base = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3), ("b", 4), ("c", 5)],
        "day string, v long",
    )
    m.write_snapshot(base, table, partition_by=["day"])
    v, n = m.delete_from_snapshot(
        spark, table, {"day": "b", "v": (4, 9)}
    )
    assert n == 1
    rows = sorted((r.day, r.v) for r in m.read_snapshot(spark, table).collect())
    assert rows == [("a", 1), ("a", 2), ("b", 3), ("c", 5)]
    before = {
        e["path"]: e for e in m._entries(m._read_manifest(table, 1))
    }
    after = {e["path"] for e in m._entries(m._read_manifest(table, v))}
    def overlaps(e):
        lo, hi = e["stats"].get("v", (None, None))
        return lo is not None and lo <= 9 and hi >= 4

    untouched = {
        p for p, e in before.items()
        if e["partition"].get("day") != "b" or not overlaps(e)
    }
    assert untouched <= after  # carried by reference, not rewritten
    # every day=b file whose stats bracket the deleted range was rewritten
    assert not any(
        p in after for p, e in before.items()
        if e["partition"].get("day") == "b" and overlaps(e)
    )
    # the replay contract holds across a delete commit too
    state = {
        (r.day, r.v) for r in m.read_snapshot(spark, table, version=1).collect()
    }
    for r in m.snapshot_change_feed(spark, table, since=1, until=v).collect():
        assert r._change_type == "delete"
        state.remove((r.day, r.v))
    assert state == set(
        (r.day, r.v) for r in m.read_snapshot(spark, table).collect()
    )


# ------------------------------------------------- UPDATE ... SET ... WHERE


def test_update_snapshot_unpartitioned(spark, tmp_path):
    """UPDATE SET WHERE (VERDICT r10 #3): touched rows re-emit with the
    set expressions applied (literal and Column forms, cast to existing
    types), the feed reports delete(pre)+insert(post) under one version,
    time travel keeps the pre-update state, and a no-match predicate
    commits nothing."""
    from pyspark.sql import functions as F

    table = str(tmp_path / "t")
    m.write_snapshot(_df(spark, 0, 10), table)
    v, n = m.update_snapshot(
        spark, table, {"id": (3, 5)}, {"v": F.col("v") + 100}
    )
    assert (v, n) == (2, 3)
    rows = {r.id: r.v for r in m.read_snapshot(spark, table).collect()}
    assert rows == {i: i * 2 + (100 if 3 <= i <= 5 else 0) for i in range(10)}
    assert _ids(m.read_snapshot(spark, table)) == list(range(10))
    # time travel: pre-update state intact
    old = {r.id: r.v for r in m.read_snapshot(spark, table, version=1).collect()}
    assert old == {i: i * 2 for i in range(10)}
    feed = m.snapshot_change_feed(spark, table, since=1, until=v)
    assert _feed_rows(feed) == [
        ("delete", 2, 3, 6), ("delete", 2, 4, 8), ("delete", 2, 5, 10),
        ("insert", 2, 3, 106), ("insert", 2, 4, 108), ("insert", 2, 5, 110),
    ]
    # literal set value is cast to the column's existing type
    v2, n2 = m.update_snapshot(spark, table, {"id": 0}, {"v": 7.0})
    assert n2 == 1
    got = m.read_snapshot(spark, table).filter("id = 0").collect()[0]
    assert got.v == 7 and isinstance(got.v, int)
    # no-match: unchanged tip, no commit
    assert m.update_snapshot(spark, table, {"id": 999}, {"v": 0}) == (v2, 0)
    assert len(m.snapshots(table)) == 3
    # schema guards
    with pytest.raises(KeyError, match="set columns"):
        m.update_snapshot(spark, table, {"id": 1}, {"nope": 1})
    with pytest.raises(ValueError, match="at least one"):
        m.update_snapshot(spark, table, {"id": 1}, {})


def test_update_snapshot_set_reads_pre_image(spark):
    """SQL UPDATE semantics: every SET expression evaluates against the
    row's PRE-image — {'a': col('b'), 'b': col('a')} swaps, in either
    dict order (code-review r11)."""
    from pyspark.sql import functions as F

    import tempfile

    for order in (("a", "b"), ("b", "a")):
        table = tempfile.mkdtemp(prefix="upd_swap_") + "/t"
        m.write_snapshot(
            spark.createDataFrame([(1, 10, 20)], "id long, a long, b long"),
            table,
        )
        st = {order[0]: F.col(order[1]), order[1]: F.col(order[0])}
        _, n = m.update_snapshot(spark, table, {"id": 1}, st)
        assert n == 1
        row = m.read_snapshot(spark, table).collect()[0]
        assert (row.a, row.b) == (20, 10), order


def test_update_snapshot_prunes_partitions_and_replays(spark, tmp_path):
    """Partitioned UPDATE: untouched partitions carry forward BY
    REFERENCE (path identity), and the feed's deletes-then-inserts replay
    from the pre-update snapshot arrives at the updated one."""
    table = str(tmp_path / "t")
    base = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("b", 3, 30), ("b", 4, 40), ("c", 5, 50)],
        "day string, id long, v long",
    )
    m.write_snapshot(base, table, partition_by=["day"])
    v, n = m.update_snapshot(spark, table, {"day": "b", "id": 4}, {"v": -1})
    assert n == 1
    rows = sorted((r.day, r.id, r.v) for r in m.read_snapshot(spark, table).collect())
    assert rows == [("a", 1, 10), ("a", 2, 20), ("b", 3, 30), ("b", 4, -1), ("c", 5, 50)]
    before = {e["path"]: e for e in m._entries(m._read_manifest(table, 1))}
    after = {e["path"] for e in m._entries(m._read_manifest(table, v))}
    untouched = {
        p for p, e in before.items() if e["partition"].get("day") != "b"
    }
    assert untouched <= after  # carried by reference
    # replay contract: apply deletes by key then inserts -> final state
    state = {
        (r.day, r.id): r.v
        for r in m.read_snapshot(spark, table, version=1).collect()
    }
    feed = m.snapshot_change_feed(spark, table, since=1, until=v).collect()
    for r in (x for x in feed if x._change_type == "delete"):
        del state[(r.day, r.id)]
    for r in (x for x in feed if x._change_type == "insert"):
        state[(r.day, r.id)] = r.v
    assert state == {
        (r.day, r.id): r.v for r in m.read_snapshot(spark, table).collect()
    }


def test_update_snapshot_cdc_syncs_serving_table(spark, tmp_path):
    """Composition: an UPDATE commit flows through serve_changes_job /
    apply_changes_to_jdbc into a keyed DuckDB serving table — the net-out
    turns delete(pre)+insert(post) into one upsert."""
    import duckdb

    from clinical_search_data_pipeline_spark.jobs.pipelines import (
        serve_changes_job,
    )
    from pyspark.sql import functions as F

    table = str(tmp_path / "t")
    m.write_snapshot(_df(spark, 0, 5), table)
    con = duckdb.connect()
    con.execute("CREATE TABLE serve (id BIGINT PRIMARY KEY, v BIGINT)")

    def merge_executor(sql):
        con.execute(sql)

    def stage_writer(df, staging):
        con.register(f"{staging}_pdf", df.toPandas())
        con.execute(f"CREATE TABLE {staging} AS SELECT * FROM {staging}_pdf")
        con.unregister(f"{staging}_pdf")

    kw = dict(merge_executor=merge_executor, stage_writer=stage_writer)
    wm = serve_changes_job(spark, table, "serve", ("id",), since=0, **kw)
    m.update_snapshot(spark, table, {"id": (1, 2)}, {"v": F.col("v") * 10})
    serve_changes_job(spark, table, "serve", ("id",), since=wm, **kw)
    got = dict(con.execute("SELECT id, v FROM serve ORDER BY id").fetchall())
    assert got == {0: 0, 1: 20, 2: 40, 3: 6, 4: 8}


def test_merge_snapshot_schema_evolution(spark, tmp_path):
    """merge_snapshot(allow_new_columns=True): Delta's mergeSchema — the
    increment's new nullable column widens the table, carried-forward
    rows null-fill, the feed spans the evolution (pre-images under the
    widened schema), and the default still refuses drift."""
    table = str(tmp_path / "t")
    m.write_snapshot(_df(spark, 0, 4), table)
    inc = spark.createDataFrame(
        [(1, 100, 0.9), (10, 20, 0.1)], "id long, v long, score double"
    )
    with pytest.raises(ValueError, match="allow_new_columns"):
        m.merge_snapshot(inc, table, keys=["id"])
    v = m.merge_snapshot(inc, table, keys=["id"], allow_new_columns=True)
    rows = {
        r.id: (r.v, r.score) for r in m.read_snapshot(spark, table).collect()
    }
    assert rows == {
        0: (0, None), 1: (100, 0.9), 2: (4, None), 3: (6, None),
        10: (20, 0.1),
    }
    # pre-evolution time travel keeps the old schema
    assert "score" not in m.read_snapshot(spark, table, version=1).columns
    # the feed spans the evolution: the matched pre-image null-fills
    feed = m.snapshot_change_feed(spark, table, since=1, until=v)
    got = sorted(
        (r._change_type, r.id, r.v, r.score) for r in feed.collect()
    )
    assert got == [
        ("delete", 1, 2, None),
        ("insert", 1, 100, 0.9),
        ("insert", 10, 20, 0.1),
    ]
    # a dropped/retyped column is refused even with the opt-in
    bad = spark.createDataFrame([(1, "x")], "id long, v string")
    with pytest.raises(ValueError, match="merge schema differs"):
        m.merge_snapshot(bad, table, keys=["id"], allow_new_columns=True)


def test_update_snapshot_on_evolved_table(spark, tmp_path):
    """UPDATE over a schema-evolved table: pre-evolution files read under
    the widened schema (null-filled), matched rows update, untouched
    evolved data survives."""
    from pyspark.sql import functions as F

    table = str(tmp_path / "t")
    m.write_snapshot(_df(spark, 0, 3), table)
    m.write_snapshot(
        spark.createDataFrame([(10, 20, 0.5)], "id long, v long, score double"),
        table, mode="append", allow_new_columns=True,
    )
    v, n = m.update_snapshot(
        spark, table, {"id": (0, 1)}, {"score": F.lit(7.0)}
    )
    assert n == 2
    rows = {
        r.id: (r.v, r.score) for r in m.read_snapshot(spark, table).collect()
    }
    assert rows == {0: (0, 7.0), 1: (2, 7.0), 2: (4, None), 10: (20, 0.5)}


# --------------------------------------------- ADVICE r12 hardening


def test_net_changes_rejects_duplicate_key_inserts_per_commit(spark):
    """Keyed application of a non-key-unique source must fail loudly, not
    pick an arbitrary survivor (ADVICE r11): two inserts for one key in
    ONE commit is undefined under latest-commit-wins; across commits it
    is the normal upsert shape and stays legal."""
    rows = [
        (1, 10, "insert", 3),
        (1, 11, "insert", 3),  # same key, same commit — ambiguous
    ]
    changes = spark.createDataFrame(
        rows, "id long, v long, _change_type string, _commit_version int"
    )
    with pytest.raises(ValueError, match="not key-unique per commit"):
        m.net_changes(changes, ["id"]).collect()
    # strict=False restores the old pick-one behavior for proven feeds
    assert m.net_changes(changes, ["id"], strict=False).count() == 1
    # the legal cross-commit shape: later commit wins, no error
    rows2 = [
        (1, 10, "insert", 3),
        (1, 10, "delete", 4),
        (1, 99, "insert", 4),
    ]
    changes2 = spark.createDataFrame(
        rows2, "id long, v long, _change_type string, _commit_version int"
    )
    out = m.net_changes(changes2, ["id"]).collect()
    assert len(out) == 1 and out[0].v == 99


def test_replay_of_applied_range_is_version_noop(spark, tmp_path):
    """ADVICE r11: at-least-once redelivery must converge in VERSION
    HISTORY, not only content — re-applying an already-applied range
    publishes no new replica commit and emits no spurious change rows
    for chained consumers."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    m.write_snapshot(_df(spark, 0, 4), src)
    m.merge_snapshot(
        spark.range(2, 6).selectExpr("id", "id * 7 AS v"), src, keys=["id"]
    )
    feed = m.snapshot_change_feed(spark, src, since=0)
    v1 = m.apply_changes_to_snapshot(feed, dst, keys=["id"])
    # replay the SAME range: content converged, so no new version
    v2 = m.apply_changes_to_snapshot(
        m.snapshot_change_feed(spark, src, since=0), dst, keys=["id"]
    )
    assert v2 == v1
    assert [s["version"] for s in m.snapshots(dst)] == [v1]
    # and the replica's own feed carries no replay-era change rows
    assert m.snapshot_change_feed(spark, dst, since=v1).count() == 0
    # a genuinely new source commit still applies and bumps the version
    m.write_snapshot(_df(spark, 50, 52), src, mode="append")
    v3 = m.apply_changes_to_snapshot(
        m.snapshot_change_feed(spark, src, since=0), dst, keys=["id"]
    )
    assert v3 == v1 + 1
    assert _ids(m.read_snapshot(spark, dst)) == _ids(
        m.read_snapshot(spark, src)
    )


def test_replay_noop_survives_maintenance_commits(spark, tmp_path):
    """ADVICE r12: a maintenance commit between applies (compact, DELETE,
    UPDATE) must carry `applied_source_tip` forward — otherwise a
    redelivered range re-applies on the replica and emits spurious change
    rows in its own feed. The watermark lives on the tip manifest after
    each maintenance op, and the replay short-circuit keeps holding."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    m.write_snapshot(_df(spark, 0, 6), src)
    feed = m.snapshot_change_feed(spark, src, since=0)
    v1 = m.apply_changes_to_snapshot(feed, dst, keys=["id"])

    # four row-preserving commits: compact, DELETE, UPDATE, plain append
    v2 = m.compact_snapshot(spark, dst, target_files=2)
    v3, n_del = m.delete_from_snapshot(spark, dst, {"id": 5})
    assert n_del == 1
    from pyspark.sql import functions as F

    v4, n_upd = m.update_snapshot(
        spark, dst, {"id": 0}, {"v": F.col("v") + 100}
    )
    assert n_upd == 1
    v5 = m.write_snapshot(_df(spark, 90, 92), dst, mode="append")
    assert v2 == v1 + 1 and v3 == v2 + 1 and v4 == v3 + 1 and v5 == v4 + 1
    # every row-preserving tip still names the applied watermark (the
    # append case is code review r13: appends preserve base rows too)
    for v in (v2, v3, v4, v5):
        assert "applied_source_tip" in m._read_stored(dst, v), v

    # replay of the SAME source range: still a version no-op
    tip_changes_before = m.snapshot_change_feed(spark, dst, since=v5).count()
    v_replay = m.apply_changes_to_snapshot(
        m.snapshot_change_feed(spark, src, since=0), dst, keys=["id"]
    )
    assert v_replay == v5
    assert m.snapshot_change_feed(spark, dst, since=v5).count() == (
        tip_changes_before
    )

    # a genuinely NEW source commit still applies
    m.write_snapshot(_df(spark, 50, 52), src, mode="append")
    v6 = m.apply_changes_to_snapshot(
        m.snapshot_change_feed(spark, src, since=0), dst, keys=["id"]
    )
    assert v6 == v5 + 1


def test_manual_overwrite_drops_replay_watermark(spark, tmp_path):
    """The flip side of the carry-forward: a wholesale overwrite severs
    the replica from the feed's history, so the watermark must NOT
    survive it — the next apply re-applies rather than wrongly skipping."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    m.write_snapshot(_df(spark, 0, 4), src)
    v1 = m.apply_changes_to_snapshot(
        m.snapshot_change_feed(spark, src, since=0), dst, keys=["id"]
    )
    assert "applied_source_tip" in m._read_stored(dst, v1)
    v2 = m.write_snapshot(_df(spark, 90, 93), dst, mode="overwrite")
    assert "applied_source_tip" not in m._read_stored(dst, v2)
    # the redelivered range now re-applies (content reconverges)
    v3 = m.apply_changes_to_snapshot(
        m.snapshot_change_feed(spark, src, since=0), dst, keys=["id"]
    )
    assert v3 == v2 + 1

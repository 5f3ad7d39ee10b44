"""Streaming change-feed source (streaming/change_source.py) and the
streaming serving loop (jobs/pipelines.serve_changes_stream_job): the
snapshot change feed as a first-class Structured Streaming source."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from clinical_search_data_pipeline_spark.sinks import manifest as m
from clinical_search_data_pipeline_spark.streaming.change_source import (
    SnapshotChangeStreamReader,
    read_change_stream,
    _feed_schema,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 2 AS v")


def _collect_stream(spark, table, tmp_path, since=0, name="ck"):
    rows = []
    q = (
        read_change_stream(spark, table, since=since)
        .writeStream.foreachBatch(lambda b, _: rows.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / name))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()
        raise TimeoutError("change stream did not finish")
    return rows


def _feed_tuples(rows):
    return sorted(
        (r._change_type, r._commit_version, r.id, r.v) for r in rows
    )


def test_stream_matches_batch_feed_across_commit_kinds(spark, tmp_path):
    """Parity: the streamed rows equal snapshot_change_feed over the same
    range across append, merge, DELETE, UPDATE, and compaction commits."""
    table = str(tmp_path / "t")
    m.write_snapshot(_df(spark, 0, 5), table)                       # v1
    m.write_snapshot(_df(spark, 10, 13), table, mode="append")      # v2
    m.merge_snapshot(
        spark.range(1, 3).selectExpr("id", "id * 100 AS v"), table,
        keys=["id"],
    )                                                               # v3
    m.delete_from_snapshot(spark, table, {"id": 4})                 # v4
    m.update_snapshot(spark, table, {"id": 0}, {"v": 999})          # v5
    m.compact_snapshot(spark, table)                                # v6 noop
    tip = m.latest_version(table)

    batch = m.snapshot_change_feed(spark, table, since=0, until=tip)
    streamed = _collect_stream(spark, table, tmp_path)
    assert _feed_tuples(streamed) == _feed_tuples(batch.collect())
    # and a mid-history start point agrees too
    batch3 = m.snapshot_change_feed(spark, table, since=3, until=tip)
    streamed3 = _collect_stream(spark, table, tmp_path, since=3, name="ck3")
    assert _feed_tuples(streamed3) == _feed_tuples(batch3.collect())


def test_stream_matches_batch_feed_partitioned_replace(spark, tmp_path):
    """fileset commits (replace_partitions): pre-image deletes + staged
    inserts stream with their hive partition column reconstructed."""
    table = str(tmp_path / "t")
    base = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("b", 3, 30)],
        "day string, id long, v long",
    )
    m.write_snapshot(base, table, partition_by=["day"])
    repl = spark.createDataFrame([("b", 4, 40)], "day string, id long, v long")
    m.replace_partitions(repl, table, "day", values=["b"])
    tip = m.latest_version(table)

    batch = sorted(
        (r._change_type, r._commit_version, r.day, r.id, r.v)
        for r in m.snapshot_change_feed(spark, table, since=0, until=tip).collect()
    )
    rows = []
    q = (
        read_change_stream(spark, table)
        .writeStream.foreachBatch(lambda b, _: rows.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r._change_type, r._commit_version, r.day, r.id, r.v) for r in rows
    )
    assert got == batch


def test_reader_offsets_rate_limit_and_empty_range(spark, tmp_path):
    """Unit: latestOffset caps at max_versions_per_trigger commits past
    the current offset (T8), an empty range yields only the no-op marker
    partition, and read() of the marker yields nothing."""
    table = str(tmp_path / "t")
    m.write_snapshot(_df(spark, 0, 2), table)                   # v1
    for lo in (10, 20, 30):
        m.write_snapshot(_df(spark, lo, lo + 1), table, mode="append")

    schema = _feed_schema(table)
    r = SnapshotChangeStreamReader(
        schema, {"table": table, "since": "0", "max_versions_per_trigger": "2"}
    )
    assert r.initialOffset() == {"version": 0}
    first = r.latestOffset()
    assert first == {"version": 2}  # capped: 2 of 4 commits
    r.commit(first)
    r._since = 2
    assert r.latestOffset() == {"version": 4}

    unlimited = SnapshotChangeStreamReader(schema, {"table": table})
    assert unlimited.latestOffset() == {"version": 4}
    parts = unlimited.partitions({"version": 4}, {"version": 4})
    assert len(parts) == 1 and parts[0].path == ""
    assert list(unlimited.read(parts[0])) == []
    # a table that does not exist yet: offset stays put instead of raising
    ghost = SnapshotChangeStreamReader(
        schema, {"table": str(tmp_path / "nope"), "since": "0"}
    )
    assert ghost.latestOffset() == {"version": 0}


def _duck_serving(con, name):
    con.execute(f"CREATE TABLE {name} (id BIGINT PRIMARY KEY, v BIGINT)")

    def merge_executor(sql):
        con.execute(sql)

    def stage_writer(df, staging):
        con.register(f"{staging}_pdf", df.toPandas())
        con.execute(f"CREATE TABLE {staging} AS SELECT * FROM {staging}_pdf")
        con.unregister(f"{staging}_pdf")

    return dict(merge_executor=merge_executor, stage_writer=stage_writer)


def test_streamed_serve_equals_batch_serve_and_resumes(spark, tmp_path):
    """serve_changes_stream_job == serve_changes_job over the same range
    (two DuckDB serving tables converge to identical content), and the
    durable watermark resumes the stream past already-applied commits."""
    import duckdb
    import json

    from clinical_search_data_pipeline_spark.jobs.pipelines import (
        serve_changes_job,
        serve_changes_stream_job,
    )

    table = str(tmp_path / "t")
    m.write_snapshot(_df(spark, 0, 5), table)
    m.merge_snapshot(
        spark.range(2, 4).selectExpr("id", "id * 100 AS v"), table,
        keys=["id"],
    )
    m.delete_from_snapshot(spark, table, {"id": 0})

    con = duckdb.connect()
    kw_b = _duck_serving(con, "serve_batch")
    kw_s = _duck_serving(con, "serve_stream")
    state = str(tmp_path / "wm.json")

    wm_b = serve_changes_job(spark, table, "serve_batch", ("id",), since=0, **kw_b)
    wm_s = serve_changes_stream_job(
        spark, table, "serve_stream", ("id",), state_path=state, **kw_s
    )
    assert wm_s == wm_b == m.latest_version(table)
    assert json.load(open(state)) == {"table": table, "version": wm_s}
    q = "SELECT id, v FROM {} ORDER BY id"
    assert (
        con.execute(q.format("serve_batch")).fetchall()
        == con.execute(q.format("serve_stream")).fetchall()
    )

    # new commits land; the streamed job resumes from the state file and
    # applies ONLY the delta
    m.update_snapshot(spark, table, {"id": 1}, {"v": -1})
    wm2 = serve_changes_stream_job(
        spark, table, "serve_stream", ("id",), state_path=state, **kw_s
    )
    assert wm2 == m.latest_version(table) > wm_s
    got = dict(con.execute(q.format("serve_stream")).fetchall())
    assert got == {1: -1, 2: 200, 3: 300, 4: 8}
    # foreign state file refused, same contract as the batch job
    with pytest.raises(ValueError, match="watermark for"):
        serve_changes_stream_job(
            spark, str(tmp_path / "other"), "serve_stream", ("id",),
            state_path=state, **kw_s
        )


def test_stream_null_fills_pre_evolution_files(spark, tmp_path):
    """A stream whose range spans an allow_new_columns append reads the
    pre-evolution files under the WIDENED schema (worker-side pyarrow
    null-fill), matching the batch feed exactly."""
    table = str(tmp_path / "t")
    m.write_snapshot(_df(spark, 0, 3), table)
    m.write_snapshot(
        spark.createDataFrame([(10, 20, 0.5)], "id long, v long, score double"),
        table, mode="append", allow_new_columns=True,
    )
    batch = sorted(
        (r._change_type, r.id, r.v, r.score)
        for r in m.snapshot_change_feed(spark, table, since=0).collect()
    )
    streamed = sorted(
        (r._change_type, r.id, r.v, r.score)
        for r in _collect_stream(spark, table, tmp_path)
    )
    assert streamed == batch
    assert ("insert", 0, 0, None) in streamed
    assert ("insert", 10, 20, 0.5) in streamed


# ------------------------------------------- lake-to-lake CDC replication


def _snap_rows(spark, table):
    return sorted((r.id, r.v) for r in m.read_snapshot(spark, table).collect())


def test_replica_converges_across_commit_kinds(spark, tmp_path):
    """apply_changes_to_snapshot / replicate_snapshot_job: a replica
    bootstrapped and maintained from the source's change feed equals the
    source snapshot across append/merge/DELETE/UPDATE commits, the
    replay of an already-applied range converges, and the REPLICA's own
    feed is consumable (replication chains compose)."""
    import json

    from clinical_search_data_pipeline_spark.jobs.pipelines import (
        replicate_snapshot_job,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    state = str(tmp_path / "wm.json")
    m.write_snapshot(_df(spark, 0, 5), src)
    m.write_snapshot(_df(spark, 10, 12), src, mode="append")

    wm = replicate_snapshot_job(spark, src, dst, ("id",), state_path=state)
    assert wm == m.latest_version(src)
    assert _snap_rows(spark, dst) == _snap_rows(spark, src)
    assert json.load(open(state)) == {"table": src, "version": wm}

    # source evolves by every rewriting commit kind; replica follows
    m.merge_snapshot(
        spark.range(1, 3).selectExpr("id", "id * 100 AS v"), src, keys=["id"]
    )
    m.delete_from_snapshot(spark, src, {"id": 4})
    m.update_snapshot(spark, src, {"id": 0}, {"v": 999})
    wm2 = replicate_snapshot_job(spark, src, dst, ("id",), state_path=state)
    assert wm2 == m.latest_version(src) > wm
    assert _snap_rows(spark, dst) == _snap_rows(spark, src)

    # replaying the SAME range converges (at-least-once safety)
    changes = m.snapshot_change_feed(spark, src, since=wm, until=wm2)
    m.apply_changes_to_snapshot(changes, dst, ["id"])
    assert _snap_rows(spark, dst) == _snap_rows(spark, src)

    # an empty net range commits nothing
    tip = m.latest_version(dst)
    empty = m.snapshot_change_feed(spark, src, since=wm2, until=wm2)
    assert m.apply_changes_to_snapshot(empty, dst, ["id"]) == tip
    assert m.latest_version(dst) == tip

    # replication chains: a second-hop replica fed from the REPLICA's feed
    dst2 = str(tmp_path / "dst2")
    m.apply_changes_to_snapshot(
        m.snapshot_change_feed(spark, dst, since=0), dst2, ["id"]
    )
    assert _snap_rows(spark, dst2) == _snap_rows(spark, src)


def test_streamed_replication_equals_batch(spark, tmp_path):
    """replicate_snapshot_job(streaming=True): the change-stream-driven
    replica equals the batch-fed one over the same history and resumes
    from the durable watermark."""
    from clinical_search_data_pipeline_spark.jobs.pipelines import (
        replicate_snapshot_job,
    )

    src = str(tmp_path / "src")
    m.write_snapshot(_df(spark, 0, 4), src)
    m.merge_snapshot(
        spark.range(1, 2).selectExpr("id", "id * 100 AS v"), src, keys=["id"]
    )
    m.delete_from_snapshot(spark, src, {"id": 3})

    d_batch, d_stream = str(tmp_path / "db"), str(tmp_path / "ds")
    state = str(tmp_path / "wm_stream.json")
    replicate_snapshot_job(spark, src, d_batch, ("id",), since=0)
    wm = replicate_snapshot_job(
        spark, src, d_stream, ("id",), state_path=state, streaming=True
    )
    assert wm == m.latest_version(src)
    assert _snap_rows(spark, d_stream) == _snap_rows(spark, d_batch)

    m.update_snapshot(spark, src, {"id": 2}, {"v": -5})
    wm2 = replicate_snapshot_job(
        spark, src, d_stream, ("id",), state_path=state, streaming=True
    )
    assert wm2 == m.latest_version(src) > wm
    assert _snap_rows(spark, d_stream) == _snap_rows(spark, src)


def test_mid_stream_schema_evolution_fails_loudly(spark, tmp_path):
    """ADVICE r11: a schema-evolution commit landing AFTER the stream
    planned its schema must not silently project the new column away
    (batch and streamed consumers would disagree until restart) — read()
    detects the widened change file and raises with restart guidance.
    A restarted reader (fresh schema pin) consumes the same commit fine."""
    table = str(tmp_path / "t")
    m.write_snapshot(_df(spark, 0, 3), table)  # v1
    pinned = _feed_schema(table)  # stream plans under the NARROW schema
    r = SnapshotChangeStreamReader(pinned, {"table": table, "since": "1"})
    # evolution commit lands mid-stream
    m.write_snapshot(
        spark.createDataFrame([(10, 20, 0.5)], "id long, v long, score double"),
        table, mode="append", allow_new_columns=True,
    )  # v2
    parts = r.partitions({"version": 1}, {"version": 2})
    data_parts = [p for p in parts if p.path]
    assert data_parts, "expected at least one change-file partition"
    with pytest.raises(ValueError, match="Restart the streaming query"):
        for p in data_parts:
            list(r.read(p))
    # restart: the fresh reader pins the widened schema and reads cleanly
    r2 = SnapshotChangeStreamReader(
        _feed_schema(table), {"table": table, "since": "1"}
    )
    rows = []
    for p in r2.partitions({"version": 1}, {"version": 2}):
        if p.path:
            rows += list(r2.read(p))
    assert sum(b.num_rows for b in rows) == 1


def test_catchup_handoff_equals_pure_stream(spark, tmp_path):
    """VERDICT r11 #6: a replicator restarting far behind the tip folds
    the backlog in ONE JVM batch feed apply, then hands off to the Python
    streaming source — and the result (content AND final watermark)
    equals draining the same range purely through the stream."""
    from clinical_search_data_pipeline_spark.jobs import pipelines as pl

    src = str(tmp_path / "src")
    m.write_snapshot(_df(spark, 0, 4), src)
    for lo in range(5):  # a deep-ish backlog of mixed commit kinds
        m.write_snapshot(_df(spark, 10 + lo, 11 + lo), src, mode="append")
    m.merge_snapshot(
        spark.range(1, 2).selectExpr("id", "id * 100 AS v"), src, keys=["id"]
    )
    m.delete_from_snapshot(spark, src, {"id": 3})
    tip = m.latest_version(src)
    assert tip >= 8

    d_hand, d_pure = str(tmp_path / "dh"), str(tmp_path / "dp")
    s_hand, s_pure = str(tmp_path / "wh.json"), str(tmp_path / "wp.json")
    # handoff path: threshold far below the backlog depth -> batch apply
    # runs, stream starts at the caught-up tip
    wm_h = pl.replicate_snapshot_job(
        spark, src, d_hand, ("id",), since=0, state_path=s_hand,
        streaming=True, catchup_threshold=2,
    )
    # pure-stream path: threshold disabled
    wm_p = pl.replicate_snapshot_job(
        spark, src, d_pure, ("id",), since=0, state_path=s_pure,
        streaming=True, catchup_threshold=None,
    )
    assert wm_h == wm_p == tip
    assert _snap_rows(spark, d_hand) == _snap_rows(spark, d_pure)
    # the handoff wrote the watermark durably at the catch-up point too:
    # a crash right after the batch apply resumes from the tip, not 0
    import json as _json

    assert _json.load(open(s_hand))["version"] == tip
    # close behind (<= threshold): no batch apply, the stream serves it
    m.write_snapshot(_df(spark, 50, 52), src, mode="append")
    wm2 = pl.replicate_snapshot_job(
        spark, src, d_hand, ("id",), state_path=s_hand,
        streaming=True, catchup_threshold=2,
    )
    assert wm2 == m.latest_version(src)
    assert _snap_rows(spark, d_hand) == _snap_rows(spark, src)


def test_serve_stream_catchup_handoff_equals_batch_serve(spark, tmp_path):
    """The JDBC serving twin: a deep-backlog streamed serve with the
    handoff enabled converges the serving table to exactly the full
    batch-fed state."""
    import duckdb

    from clinical_search_data_pipeline_spark.jobs.pipelines import (
        serve_changes_job,
        serve_changes_stream_job,
    )

    src = str(tmp_path / "src")
    m.write_snapshot(_df(spark, 0, 4), src)
    for lo in range(4):
        m.write_snapshot(_df(spark, 10 + lo, 11 + lo), src, mode="append")
    m.update_snapshot(spark, src, {"id": 1}, {"v": -9})

    con_h, con_b = duckdb.connect(), duckdb.connect()
    wm = serve_changes_stream_job(
        spark, src, "serving", ("id",), since=0,
        state_path=str(tmp_path / "w.json"),
        catchup_threshold=2, **_duck_serving(con_h, "serving"),
    )
    serve_changes_job(
        spark, src, "serving", ("id",), since=0,
        **_duck_serving(con_b, "serving"),
    )
    assert wm == m.latest_version(src)
    rows = lambda c: sorted(  # noqa: E731
        map(tuple, c.execute("SELECT id, v FROM serving").fetchall())
    )
    assert rows(con_h) == rows(con_b)


def test_on_evolution_restart_continues_and_matches_batch_feed(spark, tmp_path):
    """VERDICT r12 #7: `run_change_stream_with_restart(on_evolution=
    "restart")` — the long-running-consumer shape. The stream PLANS under
    the narrow schema, a widening commit lands before its trigger fires,
    the first attempt fails with the evolution error, and the helper
    re-plans under the widened tip schema and resumes from the durable
    watermark (deliberately NOT Spark's checkpoint — the availableNow
    fallback skips uncommitted batches on reuse):
    the collected rows equal the batch feed's exactly (pre-evolution rows
    null-filled), with exactly one restart consumed. Default behavior
    (on_evolution="fail") still raises — pinned too."""
    from clinical_search_data_pipeline_spark.streaming.change_source import (
        run_change_stream_with_restart,
    )
    from clinical_search_data_pipeline_spark.streaming.runner import (
        checkpoint_dir,
    )

    table = str(tmp_path / "t")
    m.write_snapshot(_df(spark, 0, 3), table)                    # v1
    m.write_snapshot(_df(spark, 10, 12), table, mode="append")   # v2
    # a long-running consumer's plan: resolved under the NARROW schema
    narrow_stream = read_change_stream(spark, table, since=0)
    # ... then evolution lands before the next trigger
    m.write_snapshot(
        spark.createDataFrame([(50, 51, 0.5)], "id long, v long, score double"),
        table, mode="append", allow_new_columns=True,
    )                                                            # v3
    m.write_snapshot(
        spark.createDataFrame([(60, 61, 0.7)], "id long, v long, score double"),
        table, mode="append",
    )                                                            # v4

    # default: the loud failure (unchanged)
    rows_fail: list = []
    with pytest.raises(Exception, match="schema-evolution commit"):
        run_change_stream_with_restart(
            spark, table,
            lambda b, _i: rows_fail.extend(b.collect()),
            since=0, stream=narrow_stream, timeout_sec=120,
        )

    # opt-in restart: fresh checkpoint, first attempt planned narrow
    # (re-starting the same pre-widen DataFrame), re-planned wide on the
    # evolution error, content converges
    rows: list = []
    restarts = run_change_stream_with_restart(
        spark, table,
        lambda b, _i: rows.extend(b.collect()),
        since=0,
        stream=narrow_stream,  # planned before the widen
        on_evolution="restart",
        checkpoint_location=checkpoint_dir("csdp_cdc_test"),
        timeout_sec=120,
    )
    want = sorted(
        tuple(r) for r in m.snapshot_change_feed(spark, table, since=0)
        .select("id", "v", "score", "_change_type", "_commit_version")
        .collect()
    )
    got = sorted(
        (r.id, r.v, r.score, r._change_type, r._commit_version) for r in rows
    )
    assert got == want
    assert restarts == 1

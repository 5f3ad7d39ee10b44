"""Snapshot change feed as a first-class Structured Streaming source.

`sinks/manifest.snapshot_change_feed` is a batch relation over a version
range; the serving loop (`jobs/pipelines.serve_changes_job`) re-invokes it
per call. This module closes the loop the reference's hot-mart stream
implies (streaming_to_analytics_mart_realtime.py:334-381) the Spark-4 way:
a PYTHON DATA SOURCE (`pyspark.sql.datasource.DataSourceStreamReader`)
whose offsets are snapshot VERSIONS, so

    spark.readStream.format("snapshot_changes")
         .option("table", path).option("since", v).load()

yields the same (table columns + _change_type + _commit_version) rows the
batch feed does, micro-batch by micro-batch, with Spark's own trigger /
foreachBatch machinery driving the cadence.

Scale shape: offset resolution (driver) reads only the manifest log;
`partitions()` maps each commit's delta to ONE InputPartition PER FILE, so
a large commit fans out across the cluster while a quiet table costs
nothing. `read()` executes on workers with pyarrow directly against the
manifest-named files — change files for merge/delete/update commits, the
file DIFF for appends, pre/post-image filesets for replace commits — and
never lists directories or scans carried-forward data. Rate limiting
(`max_versions_per_trigger`) bounds a micro-batch to N commits, the T8
discipline for catch-up after downtime.

The feed horizon is vacuum's, exactly as in the batch feed: a range that
reaches vacuumed versions raises rather than under-reporting.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType


@dataclass
class _ChangeFilePartition(InputPartition):
    """One change-contributing file of one commit: enough for a worker to
    produce its rows without any driver state."""

    path: str  # absolute parquet path
    version: int
    change_type: str | None  # None -> the file carries _change_type itself
    partition_values: dict = field(default_factory=dict)  # hive columns


def _feed_schema(table: str) -> StructType:
    from clinical_search_data_pipeline_spark.sinks import manifest as m

    base = m.snapshot_schema(table)
    from pyspark.sql.types import LongType, StringType, StructField

    return StructType(
        list(base.fields)
        + [
            StructField("_change_type", StringType(), False),
            StructField("_commit_version", LongType(), False),
        ]
    )


def _partitions_for_range(
    table: str, since: int, until: int
) -> list[_ChangeFilePartition]:
    """Driver-side: map the lineage chain of (since, until] to per-file
    partitions — the same commit-kind dispatch as the batch feed. An
    empty or inverted range (a rate-limited restart's first trigger can
    plan end < checkpointed start) yields no partitions."""
    from clinical_search_data_pipeline_spark.sinks import manifest as m

    out: list[_ChangeFilePartition] = []
    if until <= since:
        return out
    chain = m.lineage_chain(table, since, until)
    for v in reversed(chain):
        man = m._read_manifest(table, v)
        parent = man.get("parent")
        cdf = man.get("cdf") or {}

        def _file_parts(entries, change, ver=v):
            return [
                _ChangeFilePartition(
                    path=os.path.join(table, m._FILES_DIR, e["path"]),
                    version=ver,
                    change_type=change,
                    partition_values=dict(e.get("partition") or {}),
                )
                for e in entries
            ]

        if parent is None:
            out += _file_parts(m._entries(man), "insert")
        elif man["mode"] == "append":
            base = man.get("append_base", parent)
            stored = m._read_stored(table, v)
            if "delta" in stored and stored["delta"]["vs"] == base:
                # the stored delta records exactly the appended entries —
                # no base materialization (manifest.py's feed does the same)
                new = stored["delta"]["add"]
            else:
                base_files = {
                    e["path"]
                    for e in m._entries(m._read_manifest(table, base))
                }
                new = [
                    e for e in m._entries(man) if e["path"] not in base_files
                ]
            out += _file_parts(new, "insert")
        elif cdf.get("kind") == "noop":
            continue
        elif cdf.get("kind") == "rows":
            cdir = os.path.join(table, m._FILES_DIR, cdf["dir"])
            if not os.path.isdir(cdir):
                raise FileNotFoundError(
                    f"change files of v{v} at {table} were vacuumed; the "
                    "feed horizon passed — re-read the full snapshot"
                )
            out += [
                _ChangeFilePartition(
                    path=os.path.join(cdir, f),
                    version=v,
                    change_type=None,  # _change_type is in the file
                )
                for f in sorted(os.listdir(cdir))
                if f.endswith(".parquet") and not f.startswith(".")
            ]
        elif cdf.get("kind") == "fileset":
            pm = m._read_manifest(table, parent)
            removed_set = set(cdf["removed"])
            added_set = set(cdf["added"])
            removed = [
                e for e in m._entries(pm) if e["path"] in removed_set
            ]
            gone = [
                e["path"]
                for e in removed
                if not os.path.exists(
                    os.path.join(table, m._FILES_DIR, e["path"])
                )
            ]
            if gone:
                raise FileNotFoundError(
                    f"pre-image files of v{v} at {table} were vacuumed; "
                    "the feed horizon passed — re-read the full snapshot"
                )
            added = [e for e in m._entries(man) if e["path"] in added_set]
            out += _file_parts(removed, "delete")
            out += _file_parts(added, "insert")
        else:
            raise ValueError(
                f"version {v} at {table} is an opaque overwrite — no "
                "change feed is derivable across it; re-read the full "
                "snapshot instead"
            )
    return out


class SnapshotChangeStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        table = options.get("table") or options.get("path")
        if not table:
            raise ValueError(
                "snapshot_changes needs .option('table', <snapshot path>)"
            )
        self._table = table
        self._since = int(options.get("since", 0))
        self._max_versions = int(options.get("max_versions_per_trigger", 0))
        self._schema_json = schema.json()

    # -- driver side -------------------------------------------------
    def initialOffset(self) -> dict:
        return {"version": self._since}

    def latestOffset(self) -> dict:
        from clinical_search_data_pipeline_spark.sinks import manifest as m

        try:
            tip = m.latest_version(self._table)
        except FileNotFoundError:
            return {"version": self._since}
        if self._max_versions > 0:
            # rate limit (T8): at most N commits per micro-batch. The
            # lineage chain length is the honest measure — version numbers
            # may skip orphaned branches.
            chain = m.lineage_chain(self._table, self._since, tip)
            if len(chain) > self._max_versions:
                tip = sorted(chain)[self._max_versions - 1]
        return {"version": max(tip, self._since)}

    def partitions(self, start: dict, end: dict):
        # A restarted query replays its CHECKPOINTED start, which a fresh
        # reader's rate-limit floor (`since` option) knows nothing about:
        # ratchet the floor up to every start Spark hands us, so the
        # capped latestOffset can never lag the checkpoint for more than
        # one (empty) trigger, and an end below the start degrades to the
        # no-op marker batch instead of an error.
        self._since = max(self._since, int(start["version"]))
        parts = _partitions_for_range(
            self._table, int(start["version"]), int(end["version"])
        )
        # Spark requires >= 1 partition per batch; an empty range yields
        # one no-op marker partition.
        return parts or [
            _ChangeFilePartition(path="", version=int(end["version"]),
                                 change_type=None)
        ]

    def commit(self, end: dict) -> None:
        # Downstream progress is owned by the consumer's durable watermark
        # (serve_changes_stream_job) / the query's checkpoint; nothing to
        # reclaim source-side.
        self._since = max(self._since, int(end["version"]))

    # -- executor side -----------------------------------------------
    def read(self, partition: _ChangeFilePartition):
        if not partition.path:
            return iter(())
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(
            StructType.fromJson(json.loads(self._schema_json))
        )
        src = pq.read_table(partition.path)
        # A schema-evolution commit landing MID-STREAM widens the table
        # past the schema this stream was planned under; projecting the
        # new column away would silently diverge from the batch feed
        # (ADVICE r11). Fail loudly with the remedy instead: restart the
        # stream so it re-plans under the widened schema (the checkpoint
        # resumes from the same offset, so no changes are lost).
        known = set(target.names) | set(partition.partition_values) | {
            "_change_type"
        }
        widened = [c for c in src.column_names if c not in known]
        if widened:
            raise ValueError(
                f"change file {partition.path} carries columns {widened} "
                "beyond the schema this stream started under — a schema-"
                "evolution commit landed mid-stream. Restart the streaming "
                "query (same checkpoint) to pick up the widened schema."
            )
        n = src.num_rows
        cols = []
        for fld in target:
            if fld.name == "_commit_version":
                cols.append(pa.array([partition.version] * n, fld.type))
            elif fld.name == "_change_type" and partition.change_type:
                cols.append(pa.array([partition.change_type] * n, fld.type))
            elif fld.name in src.column_names:
                cols.append(src.column(fld.name).cast(fld.type))
            elif fld.name in partition.partition_values:
                raw = partition.partition_values[fld.name]
                cols.append(pa.array([raw] * n, pa.string()).cast(fld.type))
            else:
                # pre-evolution file: null-fill the widened column
                cols.append(pa.nulls(n, fld.type))
        return iter(pa.table(cols, schema=target).to_batches())


class SnapshotChangeDataSource(DataSource):
    """`format("snapshot_changes")` — register once per session via
    `register_change_source(spark)`."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_changes"

    def schema(self) -> StructType:
        table = self.options.get("table") or self.options.get("path")
        if not table:
            raise ValueError(
                "snapshot_changes needs .option('table', <snapshot path>)"
            )
        return _feed_schema(table)

    def streamReader(self, schema: StructType) -> SnapshotChangeStreamReader:
        return SnapshotChangeStreamReader(schema, dict(self.options))


def register_change_source(spark) -> None:
    spark.dataSource.register(SnapshotChangeDataSource)


def read_change_stream(
    spark,
    table: str,
    since: int = 0,
    max_versions_per_trigger: int | None = None,
):
    """readStream over a snapshot table's change feed starting after
    version `since`. Rows match `snapshot_change_feed`'s schema."""
    register_change_source(spark)
    reader = (
        spark.readStream.format("snapshot_changes")
        .option("table", table)
        .option("since", str(since))
    )
    if max_versions_per_trigger is not None:
        reader = reader.option(
            "max_versions_per_trigger", str(max_versions_per_trigger)
        )
    return reader.load()


# The executor-side raise a mid-stream schema-evolution commit produces
# (read() above). The restart helper matches on this marker — it is part
# of the error contract, so keep the message and the constant in sync.
EVOLUTION_ERROR_MARKER = "schema-evolution commit landed mid-stream"


def is_evolution_error(exc: BaseException) -> bool:
    """Does this (possibly Py4J/StreamingQueryException-wrapped) error
    carry the mid-stream schema-evolution marker?"""
    seen = set()
    cur: BaseException | None = exc
    while cur is not None and id(cur) not in seen:
        seen.add(id(cur))
        if EVOLUTION_ERROR_MARKER in str(cur):
            return True
        cur = cur.__cause__ or cur.__context__
    return False


def run_change_stream_with_restart(
    spark,
    table: str,
    apply,
    since: int = 0,
    max_versions_per_trigger: int | None = None,
    timeout_sec: int = 300,
    trigger: dict | None = None,
    on_evolution: str = "fail",
    checkpoint_location: str | None = None,
    max_restarts: int = 3,
    stream=None,
    resume_since=None,
) -> int:
    """Drive `apply` per micro-batch over the change stream, optionally
    surviving mid-stream schema evolution (VERDICT r12 #7).

    A streaming query's schema is fixed at plan time, so a widened commit
    landing mid-run can only fail the query (the loud raise in `read()` —
    the r11 ADVICE fix; silently projecting the new column away would
    diverge from the batch feed). ``on_evolution="fail"`` (default) keeps
    exactly that behavior. ``on_evolution="restart"`` automates the
    documented remedy for a long-running consumer: catch the evolution
    error, re-plan the reader — the new plan resolves the WIDENED schema
    from the tip manifest — and restart, replaying the failed range once
    under the widened schema (pre-evolution files null-fill the new
    columns exactly as the batch feed does). Restarts are bounded by
    ``max_restarts`` (each legitimate evolution consumes one; anything
    else re-raises).

    Restart position: this source's durable progress is the CONSUMER's
    watermark, not Spark's checkpoint — offsets are commit versions, so
    ``resume_since()`` (e.g. ``lambda: progress["wm"]`` in the serving
    jobs) names the last successfully APPLIED version and the restarted
    reader replays exactly the unapplied range; omitted, the restart
    replays from the original ``since`` (safe for the same reason every
    crash-replay here is: the CDC applies are idempotent). The restart
    deliberately does NOT reuse the failed attempt's Spark checkpoint:
    under availableNow, Python data sources fall back to single-batch
    execution, and Spark documents that a resumed run "may not guarantee
    processing new data if there is an uncommitted batch" — measured
    here, the uncommitted failed batch is SKIPPED on checkpoint reuse,
    which would silently drop the evolution commit's own rows. A fresh
    checkpoint + version-watermark resume replays it instead.

    ``stream`` optionally supplies the first attempt's already-planned
    DataFrame — the long-running-consumer shape, where the plan predates
    the evolution commit; when omitted the first attempt plans fresh.
    Each attempt gets ``timeout_sec``. Returns the number of restarts
    consumed."""
    if on_evolution not in ("fail", "restart"):
        raise ValueError(f"on_evolution must be fail|restart: {on_evolution}")
    from clinical_search_data_pipeline_spark.streaming.runner import (
        checkpoint_dir,
        run_foreach_batch,
    )

    ckpt = checkpoint_location or checkpoint_dir("csdp_cdc")
    restarts = 0
    attempt_stream = stream
    start = since
    while True:
        if attempt_stream is None:
            attempt_stream = read_change_stream(
                spark,
                table,
                since=start,
                max_versions_per_trigger=max_versions_per_trigger,
            )
        try:
            run_foreach_batch(
                attempt_stream,
                apply,
                timeout_sec=timeout_sec,
                trigger=trigger,
                checkpoint_location=ckpt,
            )
            return restarts
        except Exception as exc:
            if (
                on_evolution != "restart"
                or restarts >= max_restarts
                or not is_evolution_error(exc)
            ):
                raise
            restarts += 1
            attempt_stream = None  # re-plan under the widened tip schema
            start = int(resume_since()) if resume_since is not None else since
            ckpt = checkpoint_dir("csdp_cdc")  # see docstring: no reuse

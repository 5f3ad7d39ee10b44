"""Bounded streaming-run helpers.

The reference bounds its streaming jobs with `awaitTermination(3600)` wall
clock (streaming_to_curated_stream.py:181). For deterministic tests and
backfills this engine prefers `Trigger.AvailableNow`: process everything
available, respecting per-batch rate limits, then stop — same code path as a
continuous run.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame


def checkpoint_dir(prefix: str = "csdp_ckpt") -> str:
    return tempfile.mkdtemp(prefix=prefix)


def _capture_stream_plan(q) -> None:
    """Feed the terminated query's last-executed micro-batch plan to the
    streaming lint collector (plans/introspect — no-op when inactive).
    For a foreachBatch query this is only the source->sink wrapper; the
    gates lint their composed batch-side frames via collect_stream_lint."""
    from clinical_search_data_pipeline_spark.plans.introspect import (
        collect_stream_plan_text,
    )

    try:
        collect_stream_plan_text(q._jsq.explainInternal(False))
    except Exception:
        pass  # zero micro-batches executed — nothing to lint


def run_to_memory(
    df: DataFrame,
    output_mode: str = "append",
    timeout_sec: int = 300,
    query_name: str | None = None,
    shuffle_partitions: int | None = None,
) -> str:
    """Run a streaming DataFrame to completion (availableNow) into an
    in-memory table; returns the table name. Test/fixture-scale sink only —
    results are collected on the driver.

    ``shuffle_partitions`` sizes the stateful-operator partition count for
    THIS query (the state-store count is fixed by the conf at first start
    and recorded in the fresh checkpoint). Bounded fixture replays carry a
    per-partition state-store setup cost that dwarfs the data, so callers
    pass a small value; production continuous jobs leave it None and inherit
    the cluster-sized session conf."""
    spark = df.sparkSession
    prev = None
    if shuffle_partitions is not None:
        prev = spark.conf.get("spark.sql.shuffle.partitions", None)
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    name = query_name or f"mem_{uuid.uuid4().hex[:12]}"
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", checkpoint_dir())
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
        if q.isActive:
            q.stop()
            raise TimeoutError(f"streaming query {name} did not finish in {timeout_sec}s")
        _capture_stream_plan(q)
    finally:
        # Unconditional restore: when the conf was unset before the override,
        # unset it again rather than leaking the query-local width.
        if shuffle_partitions is not None:
            if prev is None:
                spark.conf.unset("spark.sql.shuffle.partitions")
            else:
                spark.conf.set("spark.sql.shuffle.partitions", prev)
    return name


def run_foreach_batch(
    df: DataFrame,
    fn,
    timeout_sec: int = 300,
    trigger: dict | None = None,
    shuffle_partitions: int | None = None,
    checkpoint_location: str | None = None,
) -> None:
    """foreachBatch runner (reference K8). `trigger` defaults to availableNow
    for bounded runs; pass {'processingTime': '5 minutes'} for continuous.
    `shuffle_partitions` has run_to_memory's semantics: bounded fixture
    replays pass a small value so micro-batch-sized joins don't pay a
    cluster-width shuffle; production jobs leave it None.
    `checkpoint_location` defaults to a FRESH isolated dir per call; pass
    an existing path to RESUME a previous run's source offsets from a new
    query instance (the file source replays nothing it already committed —
    exactly-once accumulation across restarts, pinned in
    tests/test_streaming_sinks.py)."""
    spark = df.sparkSession
    prev = None
    if shuffle_partitions is not None:
        prev = spark.conf.get("spark.sql.shuffle.partitions", None)
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        writer = df.writeStream.foreachBatch(fn).option(
            "checkpointLocation", checkpoint_location or checkpoint_dir()
        )
        writer = writer.trigger(**(trigger or {"availableNow": True}))
        q = writer.start()
        q.awaitTermination(timeout_sec)
        if q.isActive:
            q.stop()
            raise TimeoutError(f"foreachBatch query did not finish in {timeout_sec}s")
        _capture_stream_plan(q)
    finally:
        if shuffle_partitions is not None:
            if prev is None:
                spark.conf.unset("spark.sql.shuffle.partitions")
            else:
                spark.conf.set("spark.sql.shuffle.partitions", prev)

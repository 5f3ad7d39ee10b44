"""Streaming watermark dedup — the reference's signature silver-layer op.

Reference: streaming_to_curated_stream.py:144-151 —
`withWatermark("event_ts", "10 minutes").dropDuplicates(["dedup_key"])` over
an at-least-once Kafka feed gives effectively-once parquet. This module
generalizes it: parameterized keys/watermark, any streaming source, and a
partitioned-parquet foreachBatch sink whose compaction is an idiomatic
dynamic-partition overwrite instead of the reference's JVM
FileSystem.delete+rename swap (:186-214).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def watermark_dedup(
    stream: DataFrame,
    keys: Sequence[str],
    event_time_col: str = "event_ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate keys within the watermark horizon.

    State sizing at scale: state holds one entry per distinct key inside the
    watermark; a producer-stamped content key (functions/hashing) keeps
    entries small. Use `dropDuplicatesWithinWatermark` semantics when the
    event-time column is not part of the key and re-delivery can exceed the
    horizon.
    """
    return stream.withWatermark(event_time_col, watermark).dropDuplicates(list(keys))


def watermark_dedup_within(
    stream: DataFrame,
    keys: Sequence[str],
    event_time_col: str = "event_ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """`dropDuplicatesWithinWatermark` (Spark 3.5+) — dedups when duplicates
    arrive within the watermark delay of EACH OTHER even if the event-time
    column differs between them (e.g. broker-stamped times on producer
    retries). Use this when `event_time_col` is not part of the key; plain
    `watermark_dedup` when re-delivery reproduces the row exactly."""
    return stream.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def silver_writer(lake_path: str, partition_col: str = "event_date"):
    """foreachBatch sink: append each deduped micro-batch to the partitioned
    silver lake (reference K1/K8, streaming_to_curated_stream.py:157-176).

    No `coalesce(1)` (reference K3 hazard — caps write parallelism at scale);
    small-file control belongs to AQE coalescing + periodic `compact()`
    (sinks/parquet.py).

    Delivery contract: foreachBatch is at-least-once — a crash between the
    parquet commit and the checkpoint commit replays that batch on restart
    (same as the reference). The rows carry dedup keys, so the lake stays
    dedup-able downstream; for exactly-once at scale write to a
    transactional table format or make the write idempotent on batch_id.
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df.write.mode("append").partitionBy(partition_col).parquet(lake_path)

    return _write

"""Kafka source adapters (reference S1/S2).

No broker exists in the test container, so these are thin, untested-at-
runtime wrappers whose *contracts* matter:

* batch reads take explicit offset/timestamp bounds — the reference re-reads
  the whole topic daily (`startingOffsets=earliest`,
  batch_to_archive_raw.py:107-115), which grows without bound (SURVEY.md
  §4.3 hazard 5). Incremental archiving passes the previous run's end
  offsets (or a starting timestamp) instead.
* streaming reads default to `latest` + `failOnDataLoss=false`, matching
  streaming_to_curated_stream.py:110-118.

Downstream parsing is the same `operators/ingest.parse_click_log` used by
the file-backed paths — the Kafka `value` column is the wire format the
staged click log reproduces, so everything after the source is
oracle-tested without a broker.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession


def read_kafka_batch(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str | dict = "earliest",
    ending_offsets: str | dict = "latest",
    starting_timestamp_ms: int | None = None,
) -> DataFrame:
    """Bounded batch scan of a topic (S1). Pass per-partition offset dicts
    ({"topic": {"0": 42, ...}}) to archive incrementally."""
    reader = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("endingOffsets", _fmt(ending_offsets))
    )
    if starting_timestamp_ms is not None:
        reader = reader.option("startingTimestamp", str(starting_timestamp_ms))
    else:
        reader = reader.option("startingOffsets", _fmt(starting_offsets))
    return reader.load()


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str | dict = "latest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = False,
) -> DataFrame:
    """Streaming scan (S2). `max_offsets_per_trigger` is the Kafka analogue
    of the file source's maxFilesPerTrigger rate limit (T8)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", _fmt(starting_offsets))
        .option("failOnDataLoss", str(fail_on_data_loss).lower())
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


def _fmt(offsets: str | dict) -> str:
    return offsets if isinstance(offsets, str) else json.dumps(offsets)

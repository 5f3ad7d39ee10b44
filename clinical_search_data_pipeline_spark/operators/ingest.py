"""Ingestion-side operators: bronze archive parse, legacy-timestamp regex
extraction, and linear event-time remapping.

These generalize the reference's ingest/prep path:

* bronze archive — JSON-lines click log -> `from_json` with the pinned
  schema -> null-guard -> lineage columns (reference
  batch_to_archive_raw.py:118-161: Kafka value parse + kafka metadata +
  `ingested_at`/`ingestion_type`). Here the wall-clock `current_timestamp()`
  is an `as_of` parameter (SURVEY.md §7.0 determinism rule).
* /Date(ms)/ extraction — the TripClick export stamps legacy .NET JSON
  timestamps; the reference regex-extracts epoch-ms into ISO ts + date in
  driver-side Python (ingestion/sample_data/session_based_splitter.py:24-34).
  Here it is `regexp_extract` + epoch arithmetic — distributed, codegen'd.
* linear time remap — the reference rewrites a day of history onto a target
  range with a min/max scan then per-row scaling, in Python
  (session_based_mapping.py:46-103, time_compression.py:20-34). Here:
  one `agg(min,max)` + a broadcast of the 1-row bounds + integer projection.

Scale notes: the bounds aggregation is a full scan but reduces to one row —
partial aggregation makes it cheap; the broadcast join adds no shuffle to
the big side. All expressions are integer epoch arithmetic (timeops pairs),
bit-identical with the DuckDB oracle.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_search_data_pipeline_spark.functions import timeops
from clinical_search_data_pipeline_spark.functions.hashing import duck_hash64, hash64
from clinical_search_data_pipeline_spark.functions.timeops import (
    duck_epoch_sec,
    duck_event_date,
    duck_sec_to_ts_string,
)
from clinical_search_data_pipeline_spark.registry import register
from clinical_search_data_pipeline_spark.schemas import CLICK_EVENT_SCHEMA
from clinical_search_data_pipeline_spark.sources.readers import load_events
from clinical_search_data_pipeline_spark.session import apply_runtime_confs

AS_OF = "2024-01-31 00:00:00"
MSDATE_PATTERN = r"/Date\((\d+)\)/"


# ---------------------------------------------------------------------------
# Builders
# ---------------------------------------------------------------------------


def click_log_json(events: DataFrame) -> DataFrame:
    """Render the fixture event relation as click-event JSON lines (the wire
    format the producers emit — one JSON object per Kafka message)."""
    ts_str = timeops.sec_to_ts_string(F.col("ts_sec"))
    return events.select(
        F.to_json(
            F.struct(
                F.concat(F.lit("/Date("), F.expr("ts div 1000000"), F.lit(")/")).alias(
                    "date_created"
                ),
                F.col("user_id").cast("string").alias("session_id"),
                (F.col("event_id") % 1000).cast("int").alias("document_id"),
                F.col("event_type").alias("keywords"),
                ts_str.alias("event_ts"),
                F.col("event_date"),
                hash64(
                    F.concat_ws("|", F.col("user_id").cast("string"), ts_str)
                ).cast("string").alias("dedup_key"),
            )
        ).alias("value")
    )


def parse_click_log(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """P1-P4 + F1: JSON value -> typed struct -> flattened columns, dropping
    rows whose dedup_key failed to parse (reference
    streaming_to_curated_stream.py:123-139)."""
    return (
        raw.select(
            F.from_json(F.col(value_col).cast("string"), CLICK_EVENT_SCHEMA).alias("data")
        )
        .select("data.*")
        .filter(F.col("dedup_key").isNotNull())
    )


def bronze_archive(
    raw: DataFrame, as_of: str = AS_OF, ingestion_type: str = "batch"
) -> DataFrame:
    """Parsed click log + lineage columns (bronze contract, K1 input)."""
    return (
        parse_click_log(raw)
        .withColumn("ingested_at", F.lit(as_of))
        .withColumn("ingestion_type", F.lit(ingestion_type))
    )


def extract_msdate(df: DataFrame, col: str = "date_created") -> DataFrame:
    """P14: '/Date(1451606400000)/' -> epoch ms -> ISO ts string + date."""
    ms = F.regexp_extract(F.col(col), MSDATE_PATTERN, 1).cast("long")
    sec = (ms / 1000).cast("long")
    return df.withColumn("created_sec", sec).withColumn(
        "created_ts", timeops.sec_to_ts_string(sec)
    )


def remap_event_times(
    events: DataFrame, target_start_sec: int, target_span_sec: int
) -> DataFrame:
    """P15: linearly map [min(ts), max(ts)] onto [target_start,
    target_start+span] — integer arithmetic end-to-end."""
    bounds = events.agg(
        F.min("ts_sec").alias("mn"), F.max("ts_sec").alias("mx")
    )
    return (
        events.crossJoin(F.broadcast(bounds))
        .withColumn(
            "remapped_sec",
            F.expr(
                f"{target_start_sec} + ((ts_sec - mn) * {target_span_sec})"
                " div greatest(mx - mn, 1)"
            ),
        )
        .select("event_id", "ts_sec", "remapped_sec")
    )


# ---------------------------------------------------------------------------
# Registered queries + oracles
# ---------------------------------------------------------------------------


def stage_click_log(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the JSON-lines wire form of the events fixture once per
    fixture *content* (stands in for the Kafka topic); returns the directory
    path. The staging dir is keyed by the source parquet's mtime+size
    fingerprint, so a regenerated fixture at the same path can never be
    served from a stale staged copy."""
    apply_runtime_confs(spark)
    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    fingerprint = f"{int(st.st_mtime)}_{st.st_size}"
    staging = os.path.join(
        tempfile.gettempdir(),
        f"csdp_clicklog_{sf_dir.strip('/').replace('/', '_')}_{fingerprint}",
    )
    marker = os.path.join(staging, "_SUCCESS")
    if not os.path.exists(marker):
        click_log_json(load_events(spark, sf_dir)).write.mode("overwrite").text(staging)
    return staging


def _staged_click_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The staged wire log as a text scan (one row per message, col `value`)."""
    return spark.read.text(stage_click_log(spark, sf_dir))


_DUCK_TS_STR = duck_sec_to_ts_string(duck_epoch_sec("ts"))


@register(
    "q_bronze_archive",
    oracle=f"""
SELECT CAST(user_id AS VARCHAR) AS session_id,
       CAST(event_id % 1000 AS INTEGER) AS document_id,
       {_DUCK_TS_STR} AS event_ts,
       {duck_event_date('ts')} AS event_date,
       {duck_hash64(f"user_id || '|' || {_DUCK_TS_STR}")} AS dedup_key,
       '{AS_OF}' AS ingested_at,
       'batch' AS ingestion_type
FROM events
""",
    tags=("ingest", "reference", "bronze"),
)
def q_bronze_archive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5+P2+P3+F1+lineage: JSON-lines click log -> typed bronze relation
    (reference batch_to_archive_raw.py:118-161, Kafka replaced by the staged
    wire file)."""
    bronze = bronze_archive(_staged_click_log(spark, sf_dir))
    return bronze.select(
        "session_id",
        "document_id",
        "event_ts",
        "event_date",
        F.col("dedup_key").cast("long").alias("dedup_key"),
        "ingested_at",
        "ingestion_type",
    )


@register(
    "q_parse_msdate",
    oracle=f"""
SELECT CAST(user_id AS VARCHAR) AS session_id,
       (epoch_ns(ts) // 1000000) // 1000 AS created_sec,
       {duck_sec_to_ts_string('(epoch_ns(ts) // 1000000) // 1000')} AS created_ts
FROM events
""",
    tags=("ingest", "reference", "regex"),
)
def q_parse_msdate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P14: legacy /Date(ms)/ strings regex-extracted back to event time
    (reference session_based_splitter.py:24-34, distributed)."""
    events = load_events(spark, sf_dir)
    legacy = events.select(
        F.col("user_id").cast("string").alias("session_id"),
        F.concat(F.lit("/Date("), F.expr("ts div 1000000"), F.lit(")/")).alias(
            "date_created"
        ),
    )
    return extract_msdate(legacy).select("session_id", "created_sec", "created_ts")


TARGET_START = 1_706_659_200  # 2024-01-31 00:00:00 UTC
TARGET_SPAN = 3 * 3600  # compress history into a 3-hour replay window


@register(
    "q_time_remap",
    oracle=f"""
WITH b AS (
  SELECT min({duck_epoch_sec('ts')}) AS mn, max({duck_epoch_sec('ts')}) AS mx
  FROM events
)
SELECT event_id,
       {duck_epoch_sec('ts')} AS ts_sec,
       {TARGET_START} + (({duck_epoch_sec('ts')} - mn) * {TARGET_SPAN})
         // greatest(mx - mn, 1) AS remapped_sec
FROM events, b
""",
    tags=("ingest", "reference", "remap"),
)
def q_time_remap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P15: two-pass linear event-time remap (min/max bounds broadcast into a
    per-row integer projection; reference session_based_mapping.py:46-103)."""
    return remap_event_times(load_events(spark, sf_dir), TARGET_START, TARGET_SPAN)

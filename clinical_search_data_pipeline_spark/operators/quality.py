"""Data-quality audit + multi-granularity rollup operators.

The reference leaves data-quality validation as an unchecked TODO
(README.md:215, mart/mart.md:524 — "Great Expectations"); this module makes
the audit a first-class, oracle-checked query: per-column null counts,
distinct counts, and range bounds in ONE pass (one aggregation, no
per-column scans — at 100 TB a per-column loop of `.count()`s is the same
re-computation hazard as the reference's mart recounts, SURVEY.md §4.3).

The hypertable-style rollup aggregates day/hour/minute granularities in a
single GROUPING SETS pass (one shuffle; Expand feeds all granularities)
instead of three jobs over the same scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_search_data_pipeline_spark.functions import timeops
from clinical_search_data_pipeline_spark.functions.timeops import (
    duck_epoch_sec,
    duck_event_date,
    duck_hour_of_day,
    duck_sec_to_ts_string,
)
from clinical_search_data_pipeline_spark.registry import register
from clinical_search_data_pipeline_spark.sources.readers import load_events


def column_audit(df: DataFrame, columns: list[str]) -> DataFrame:
    """One-pass per-column profile: rows, nulls, distincts, min/max (as
    strings — type-uniform output schema). Unpivoted to one row per column."""
    total = F.count(F.lit(1))
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            total.alias("n_rows"),
            F.sum(F.col(c).isNull().cast("long")).alias("n_null"),
            F.countDistinct(c).alias("n_distinct"),
            F.min(c).cast("string").alias("min_value"),
            F.max(c).cast("string").alias("max_value"),
        ).alias(f"_{c}")
        for c in columns
    ]
    wide = df.agg(*structs)
    stacked = wide.select(
        F.explode(F.array(*[F.col(f"_{c}") for c in columns])).alias("s")
    )
    return stacked.select("s.*")


def traffic_rollup(events: DataFrame) -> DataFrame:
    """Day/hour/minute counts in one GROUPING SETS pass; `grain` labels the
    granularity (replaces three scans of the same lake)."""
    base = events.select(
        timeops.event_date("ts").alias("event_date"),
        timeops.hour_of_day("ts").alias("hour"),
        timeops.sec_to_ts_string(timeops.bucket_start_sec("ts", 60)).alias("minute"),
    )
    return (
        base.groupingSets(
            [["event_date"], ["event_date", "hour"], ["event_date", "hour", "minute"]],
            "event_date",
            "hour",
            "minute",
        )
        .agg(F.count("*").alias("event_count"), F.grouping_id().alias("grain_id"))
        .select(
            "event_date",
            "hour",
            "minute",
            "event_count",
            F.when(F.col("grain_id") == 3, "day")
            .when(F.col("grain_id") == 1, "hour")
            .otherwise("minute")
            .alias("grain"),
        )
    )


@register(
    "q_column_audit",
    oracle="""
WITH a AS (
  SELECT 'event_type' AS "column", count(*) AS n_rows,
         CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         count(DISTINCT event_type) AS n_distinct,
         CAST(min(event_type) AS VARCHAR) AS min_value,
         CAST(max(event_type) AS VARCHAR) AS max_value
  FROM events
  UNION ALL
  SELECT 'user_id', count(*),
         CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         count(DISTINCT user_id),
         CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR)
  FROM events
  UNION ALL
  SELECT 'value', count(*),
         CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         count(DISTINCT value),
         CAST(min(value) AS VARCHAR), CAST(max(value) AS VARCHAR)
  FROM events
)
SELECT * FROM a
""",
    tags=("quality", "northstar"),
)
def q_column_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass data-quality profile of the event log (nulls, distincts,
    bounds per column)."""
    return column_audit(load_events(spark, sf_dir), ["event_type", "user_id", "value"])


@register(
    "q_traffic_rollup",
    oracle=f"""
WITH base AS (
  SELECT {duck_event_date('ts')} AS event_date,
         {duck_hour_of_day('ts')} AS hour,
         {duck_sec_to_ts_string(f"(({duck_epoch_sec('ts')}) // 60) * 60")} AS minute
  FROM events
)
SELECT event_date, hour, minute, count(*) AS event_count,
       CASE GROUPING(event_date, hour, minute)
         WHEN 3 THEN 'day' WHEN 1 THEN 'hour' ELSE 'minute' END AS grain
FROM base
GROUP BY GROUPING SETS ((event_date), (event_date, hour), (event_date, hour, minute))
""",
    tags=("rollup", "northstar", "hypertable"),
)
def q_traffic_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup in one pass."""
    return traffic_rollup(load_events(spark, sf_dir))

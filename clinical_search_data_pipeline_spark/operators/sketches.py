"""Sketch aggregates: approximate distinct counts and quantiles.

At 100 TB, exact `countDistinct` is an Expand + full shuffle per distinct
column (visible in q_daily_traffic's plan); sketches give fixed-size state
and one pass. Spark's HLL++ (`approx_count_distinct`) and t-digest
(`percentile_approx`) estimates are implementation-specific, so these
queries are declared WITHOUT an oracle (driver rows-only contract);
accuracy is asserted against exact values in tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_search_data_pipeline_spark.registry import register
from clinical_search_data_pipeline_spark.sources.readers import load_events

HLL_RSD = 0.02  # ~2 % relative standard deviation


def approx_daily_traffic(events: DataFrame, rsd: float = HLL_RSD) -> DataFrame:
    """The daily-traffic mart's distinct counts as HLL++ sketches — the
    scale path for A3's two exact countDistincts (one Expand shuffle
    becomes two fixed-size sketch states). Columns mirror the mart:
    `unique_sessions` = distinct user_id, `unique_documents` = distinct
    event_type (document := event_type per the fixture mapping,
    operators/marts.daily_traffic)."""
    return (
        events.groupBy("event_date")
        .agg(
            F.count("*").alias("total_events"),
            F.approx_count_distinct("user_id", rsd).alias("approx_sessions"),
            F.approx_count_distinct("event_type", rsd).alias("approx_documents"),
        )
        .orderBy("event_date")
    )


def value_quantiles(events: DataFrame, accuracy: int = 10_000) -> DataFrame:
    """Per-type p50/p95/p99 of `value` via percentile_approx (t-digest-like
    sketch; single pass, mergeable across partitions)."""
    return events.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.95, 0.99], accuracy).alias("p"),
    ).select(
        "event_type",
        F.round(F.col("p")[0], 4).alias("p50"),
        F.round(F.col("p")[1], 4).alias("p95"),
        F.round(F.col("p")[2], 4).alias("p99"),
    )


@register("q_approx_daily_traffic", tags=("sketch", "northstar", "rows-only"))
def q_approx_daily_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return approx_daily_traffic(load_events(spark, sf_dir))


@register("q_value_quantiles", tags=("sketch", "northstar", "rows-only"))
def q_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return value_quantiles(load_events(spark, sf_dir))

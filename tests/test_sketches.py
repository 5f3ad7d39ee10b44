"""Accuracy bounds for the sketch aggregates (no DuckDB oracle — estimates
are implementation-specific; we assert against exact Spark values)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clinical_search_data_pipeline_spark.operators.sketches import (
    approx_daily_traffic,
    value_quantiles,
)
from clinical_search_data_pipeline_spark.sources.readers import load_events
from tests.conftest import SF_SMOKE


def test_approx_distinct_within_bounds(spark):
    events = load_events(spark, SF_SMOKE)
    approx = approx_daily_traffic(events)
    exact = events.groupBy("event_date").agg(
        F.countDistinct("user_id").alias("exact_sessions"),
        F.countDistinct("event_type").alias("exact_documents"),
    )
    joined = approx.join(exact, "event_date").collect()
    assert joined
    for row in joined:
        assert abs(row.approx_sessions - row.exact_sessions) <= max(
            3, 0.1 * row.exact_sessions
        )
        assert abs(row.approx_documents - row.exact_documents) <= max(
            3, 0.1 * row.exact_documents
        )


def test_quantiles_bracket_exact(spark):
    events = load_events(spark, SF_SMOKE)
    got = {r.event_type: r for r in value_quantiles(events).collect()}
    exact = {
        r.event_type: r
        for r in events.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.45)").alias("e45"),
            F.expr("percentile(value, 0.55)").alias("e55"),
            F.expr("percentile(value, 0.97)").alias("e97"),
            F.max("value").alias("hi"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for t, row in got.items():
        e = exact[t]
        # rank-bracket bounds: the sketch may land on any nearby sample, so
        # p50 must fall in [p45, p55] and p99 in [p97, max].
        assert e.e45 <= row.p50 <= e.e55
        assert e.e97 <= row.p99 <= e.hi
        assert row.p50 <= row.p95 <= row.p99 <= e.hi

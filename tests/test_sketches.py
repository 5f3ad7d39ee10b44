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


def test_cms_never_undercounts_and_bounds_overcount(spark):
    """The two CMS guarantees on the fixture: est >= exact for EVERY key
    (min of rows that each counted the key plus non-negative collisions),
    and — the depth-4 min at work — max overcount within the classic
    e*N/width Markov bound, which P[exceed] <= e^-depth makes effectively
    deterministic on a fixed fixture."""
    import math

    from clinical_search_data_pipeline_spark.operators.sketches import (
        CMS_WIDTH,
        cms_user_counts,
    )

    events = load_events(spark, SF_SMOKE)
    rows = cms_user_counts(events).collect()
    n = events.count()
    assert len(rows) == events.select("user_id").distinct().count()
    assert all(r.est >= r.exact for r in rows)
    assert all(r.overcount == r.est - r.exact for r in rows)
    assert max(r.overcount for r in rows) <= math.ceil(math.e * n / CMS_WIDTH)


def test_cms_heavy_flag_is_exact_integer_threshold(spark):
    """is_heavy := est * 64 >= total(events), in integer arithmetic. At
    sf0.001 every user clears the 1/64 bar (15 uniform users), so the flag
    is exercised TRUE here and FALSE at the driver's sf0.01 (150 users) —
    non-vacuous in both directions across the suite."""
    from clinical_search_data_pipeline_spark.operators.sketches import (
        CMS_HEAVY_DEN,
        cms_user_counts,
    )

    events = load_events(spark, SF_SMOKE)
    rows = cms_user_counts(events).collect()
    total = events.count()
    for r in rows:
        assert r.is_heavy == (r.est * CMS_HEAVY_DEN >= total)
    assert all(r.is_heavy for r in rows)  # 15 users, ~1/15 share each

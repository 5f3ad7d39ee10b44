"""Physical-plan introspection: assert the plan shape we designed for.

Correctness is the oracle's job (tests/test_oracle_parity.py); this module
guards the *scale* contract — a query that silently regresses from a
broadcast join to a cartesian product, or loses parquet filter pushdown,
still returns the right rows at sf0.01 but dies at 100 TB. The bench
catches gross regressions; these assertions catch them at unit speed and
name the exact plan property that broke (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The plan string `.explain(mode)` would print."""
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def assert_in_plan(df: DataFrame, *fragments: str) -> None:
    plan = physical_plan(df)
    missing = [f for f in fragments if f not in plan]
    assert not missing, f"plan lacks {missing}:\n{plan}"


def assert_not_in_plan(df: DataFrame, *fragments: str) -> None:
    plan = physical_plan(df)
    present = [f for f in fragments if f in plan]
    assert not present, f"plan unexpectedly contains {present}:\n{plan}"


def assert_broadcast_join(df: DataFrame) -> None:
    """Small-dim joins must broadcast — no shuffle of the big side."""
    assert_in_plan(df, "BroadcastHashJoin")


def assert_no_cartesian(df: DataFrame) -> None:
    """Candidate generation must be an equi-join (LSH/band/bucket key),
    never an all-pairs product."""
    assert_not_in_plan(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def assert_partial_aggregation(df: DataFrame) -> None:
    """Aggregations must map-side combine: HashAggregate above and below the
    exchange (Spark always plans partial+final for hash aggs — this guards
    against accidental sort-based fallback on high-cardinality string keys)."""
    plan = physical_plan(df, "simple")
    assert plan.count("HashAggregate") >= 2, f"no partial aggregation:\n{plan}"


def assert_pushed_filters(df: DataFrame) -> None:
    """At least one parquet scan carries a pushed filter."""
    plan = physical_plan(df)
    assert "PushedFilters: [" in plan, f"no scan in plan:\n{plan}"
    pushed = [
        line.split("PushedFilters:", 1)[1].strip()
        for line in plan.splitlines()
        if "PushedFilters:" in line
    ]
    assert any(p != "[]" for p in pushed), f"no pushed filters:\n{plan}"

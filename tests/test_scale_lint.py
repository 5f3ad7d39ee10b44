"""scale_lint (plans/introspect.py): the plan-test hazards surfaced as a
user-facing diagnostic."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from clinical_search_data_pipeline_spark.plans.introspect import scale_lint
from clinical_search_data_pipeline_spark.sources.readers import read_table
from tests.conftest import SF_SMOKE


def test_clean_plan_has_no_findings(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    df = (
        docs.filter(F.col("doc_id") < 100)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
    )
    assert scale_lint(df) == []


def test_cartesian_and_global_window_flagged(spark):
    docs = read_table(spark, SF_SMOKE, "documents").select("doc_id")
    other = read_table(spark, SF_SMOKE, "documents").select(
        F.col("doc_id").alias("other_id")
    )
    cross = docs.crossJoin(other)
    # at smoke scale Spark plans the product as a BroadcastNestedLoopJoin;
    # either spelling of the all-pairs hazard must surface
    assert any(
        "CartesianProduct" in f or "BroadcastNestedLoopJoin" in f
        for f in scale_lint(cross)
    )

    w = Window.orderBy("doc_id")  # global window: one task
    ranked = docs.withColumn("r", F.row_number().over(w))
    assert any("SinglePartition" in f for f in scale_lint(ranked))


def test_registered_queries_lint_clean_or_allowlisted(spark):
    """Every registered batch query linted: the only permitted finding is
    the bounded-scalar BroadcastNestedLoopJoin on the allowlisted names —
    the user-facing diagnostic and the plan tests tell one story."""
    from clinical_search_data_pipeline_spark.caching import release_caches
    from clinical_search_data_pipeline_spark.registry import all_specs
    from tests.test_plans import BOUNDED_BROADCAST_NLJ_OK

    bad = []
    for name, spec in all_specs().items():
        if name.startswith("q_stream_"):
            continue
        try:
            findings = scale_lint(spec.builder(spark, SF_SMOKE))
        finally:
            release_caches()
        for f in findings:
            if "BroadcastNestedLoopJoin" in f and name in BOUNDED_BROADCAST_NLJ_OK:
                continue
            # advisory findings (SMJ-without-broadcast, pushdown notes,
            # SinglePartition on metadata-sized relations) stay warnings —
            # test_plans pins the per-family single-partition properties
            # (e.g. test_train_order_single_partition_only_for_offsets);
            # the HARD hazard here is all-pairs candidate generation
            if (
                "SortMergeJoin" in f
                or "PushedFilters" in f
                or "SinglePartition" in f
            ):
                continue
            bad.append((name, f))
    assert not bad, bad

"""Physical-plan shape guards (scale contract, SURVEY.md §4).

Each assertion names a plan property the 100 TB design depends on; a
regression here means a query still passes the oracle but would not survive
a 1000-executor scale-up."""

from __future__ import annotations

import pytest

from clinical_search_data_pipeline_spark.plans import introspect as pl
from clinical_search_data_pipeline_spark.registry import all_specs
from tests.conftest import SF_SMOKE


def build(spark, name):
    return all_specs()[name].builder(spark, SF_SMOKE)


@pytest.mark.parametrize(
    "name",
    ["q_daily_traffic", "q_top_revenue_orders", "q_region_customer_stats",
     "q_events_orders_asof"],
)
def test_dim_joins_broadcast(spark, name):
    pl.assert_broadcast_join(build(spark, name))


@pytest.mark.parametrize(
    "name",
    ["q_minhash_lsh_pairs", "q_ann_lsh_topk", "q_simhash_buckets",
     "q_top_revenue_orders", "q_daily_traffic", "q_order_priority_counts",
     "q_customers_without_orders"],
)
def test_candidate_generation_is_equi_join(spark, name):
    """LSH/band/bucket candidate pairs and all relational joins must never
    plan an all-pairs product. (q_cosine_topk / q_embedding_neardup /
    q_jaccard_pairs are the *intentional* exact-quadratic baselines and are
    excluded.)"""
    pl.assert_no_cartesian(build(spark, name))


@pytest.mark.parametrize(
    "name",
    ["q_pricing_summary", "q_session_analysis", "q_daily_traffic",
     "q_clinical_areas", "q_lang_profile"],
)
def test_aggregations_partial(spark, name):
    pl.assert_partial_aggregation(build(spark, name))


@pytest.mark.parametrize("name", ["q_pricing_summary", "q_top_revenue_orders"])
def test_filters_reach_parquet_scan(spark, name):
    pl.assert_pushed_filters(build(spark, name))


def test_rank_filter_uses_window_group_limit(spark):
    """The peak-hour argmax (W1) must plan WindowGroupLimit — Spark's
    top-k-per-partition pushdown — not a full sort of every group."""
    pl.assert_in_plan(build(spark, "q_daily_traffic"), "WindowGroupLimit")


def test_topk_plans_take_ordered(spark):
    """orderBy().limit() must fuse to TakeOrderedAndProject (O2), never a
    global sort."""
    pl.assert_in_plan(build(spark, "q_top_revenue_orders"), "TakeOrderedAndProject")

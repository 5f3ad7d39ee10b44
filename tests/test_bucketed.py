"""Bucketed co-located join: both sides bucketed by the join key on the
same count -> SortMergeJoin with NO shuffle exchange (the 100 TB fact-fact
join strategy, sources/bucketed.py)."""

from __future__ import annotations

from clinical_search_data_pipeline_spark.plans.introspect import physical_plan
from clinical_search_data_pipeline_spark.sources.bucketed import (
    read_bucketed,
    write_bucketed,
)
from clinical_search_data_pipeline_spark.sources.readers import read_table
from tests.conftest import SF_SMOKE


def test_bucketed_join_is_shuffle_free(spark):
    orders = read_table(spark, SF_SMOKE, "orders")
    lineitem = read_table(spark, SF_SMOKE, "lineitem")
    write_bucketed(orders, "b_orders", "o_orderkey", 4, sort_col="o_orderkey")
    write_bucketed(lineitem, "b_lineitem", "l_orderkey", 4, sort_col="l_orderkey")
    try:
        with_buckets = read_bucketed(spark, "b_orders").join(
            read_bucketed(spark, "b_lineitem"),
            read_bucketed(spark, "b_orders")["o_orderkey"]
            == read_bucketed(spark, "b_lineitem")["l_orderkey"],
        )
        # force the sort-merge path (broadcast would hide the exchange question)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = physical_plan(with_buckets, mode="simple")
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # the same join on plain parquet DOES shuffle
        plain = orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        assert "Exchange" in physical_plan(plain, mode="simple")
        # and results agree
        assert with_buckets.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")

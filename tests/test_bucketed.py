"""Bucketed-table co-located joins (sources/bucketed.py write_bucketed /
read_bucketed): the zero-exchange join plan, one-file-per-bucket layout,
and value transparency vs the plain-parquet join. The 100 TB claim under
test: a lake that pays ONE bucketed write per fact table never shuffles
either side again on that join key.
"""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from clinical_search_data_pipeline_spark.plans import introspect as pl
from clinical_search_data_pipeline_spark.sources.bucketed import (
    N_JOIN_BUCKETS,
    read_bucketed,
    write_bucketed,
)
from clinical_search_data_pipeline_spark.sources.readers import read_table
from tests.conftest import SF_SMOKE


def _bucketed_pair(spark, tmp_path):
    orders = read_table(spark, SF_SMOKE, "orders").select(
        F.col("o_orderkey").alias("orderkey"), "o_orderstatus"
    )
    items = read_table(spark, SF_SMOKE, "lineitem").select(
        F.col("l_orderkey").alias("orderkey"), "l_extendedprice"
    )
    root = str(tmp_path / "bkt")
    t_o = write_bucketed(orders, "t_bkt_orders", "orderkey", path_root=root)
    t_l = write_bucketed(items, "t_bkt_lineitem", "orderkey", path_root=root)
    return t_o, t_l, root, orders, items


def test_bucketed_join_plans_zero_exchanges(spark, tmp_path):
    # force the sort-merge path (both sides are tiny at the smoke SF, so
    # the planner would otherwise broadcast and hide the property under
    # test), then: co-bucketed scan -> SortMergeJoin with NO exchange on
    # either side, vs TWO hash exchanges for the identical plain join.
    t_o, t_l, _root, orders, items = _bucketed_pair(spark, tmp_path)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bucketed = read_bucketed(spark, t_l).join(
            read_bucketed(spark, t_o), "orderkey"
        )
        plan = pl.physical_plan(bucketed, "simple")
        assert "SortMergeJoin" in plan, plan
        assert plan.count("Exchange hashpartitioning") == 0, plan
        assert "Bucketed: true" in pl.physical_plan(bucketed, "formatted")

        plain = items.join(orders, "orderkey")
        plain_plan = pl.physical_plan(plain, "simple")
        assert plain_plan.count("Exchange hashpartitioning") == 2, plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_layout_one_file_per_bucket(spark, tmp_path):
    # the pre-write repartition uses the same Murmur3-pmod hash as the
    # bucket spec, so every bucket's rows land in one task -> <= n_buckets
    # data files, keeping the sorted-scan property intact.
    _t_o, _t_l, root, _orders, _items = _bucketed_pair(spark, tmp_path)
    for name in ("t_bkt_orders", "t_bkt_lineitem"):
        files = glob.glob(f"{root}/{name}/part-*.parquet")
        assert 0 < len(files) <= N_JOIN_BUCKETS, (name, files)


def test_bucketed_join_values_match_plain_join(spark, tmp_path):
    # the layout must be invisible to readers: identical rows either way.
    t_o, t_l, _root, orders, items = _bucketed_pair(spark, tmp_path)
    agg = lambda df: sorted(
        map(
            tuple,
            df.groupBy("o_orderstatus")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("l_extendedprice"), 2).alias("total"),
            )
            .collect(),
        )
    )
    assert agg(
        read_bucketed(spark, t_l).join(read_bucketed(spark, t_o), "orderkey")
    ) == agg(items.join(orders, "orderkey"))

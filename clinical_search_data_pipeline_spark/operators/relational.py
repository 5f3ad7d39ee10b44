"""Relational coverage beyond the reference's single left join.

The reference contains exactly one join (etl_to_analytics_mart.py:147 —
daily aggregates ⟕ peak-hour) and no set ops, semi/anti joins, rollups, or
frame-spec windows. The fixture star schema (TPC-H-ish) justifies declaring
the standard relational repertoire as first-class engine queries
(SURVEY.md §2.9, §7.1 step 3). Everything is built-in DataFrame API —
Catalyst picks broadcast-hash vs sort-merge; AQE re-plans at runtime.

Scale notes:
* dim joins (region/nation/customer-as-dim) are explicitly `broadcast()`;
* fact-fact joins (orders⋈lineitem) shuffle on the join key — at 100 TB both
  sides should be bucketed by orderkey in the lake, which makes this a
  zero-shuffle sort-merge join;
* top-k uses orderBy().limit() which Spark plans as TakeOrderedAndProject
  (per-partition heap + driver merge — no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clinical_search_data_pipeline_spark.registry import register
from clinical_search_data_pipeline_spark.sources.readers import read_table

# ---------------------------------------------------------------------------
# Builders
# ---------------------------------------------------------------------------


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1-shaped pricing summary. All money aggregates rounded to 2
    decimals (both engines accumulate doubles; rounding pins the hash)."""
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def top_revenue_orders(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, segment: str = "BUILDING", k: int = 10
) -> DataFrame:
    """TPC-H Q3-shaped: revenue per order for one market segment, top-k.

    customer (post-filter, small) is broadcast into orders; orders⋈lineitem
    shuffles on orderkey (bucket-able at scale). Top-k is
    TakeOrderedAndProject, deterministic via orderkey tie-break.
    """
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    revenue = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    return (
        revenue.orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(k)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
    )


def region_customer_stats(
    region: DataFrame, nation: DataFrame, customer: DataFrame
) -> DataFrame:
    """Dim-chain broadcast join: region ⟵ nation ⟵ customer rollup."""
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("customers"),
            F.countDistinct("n_name").alias("nations"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        )
    )


def customers_without_orders(
    customer: DataFrame, orders: DataFrame, since: str = "2001-01-01"
) -> DataFrame:
    """Left-anti join (DuckDB oracle: NOT EXISTS): customers with no order
    since a cutoff (date-bounded so the fixture result is non-empty — at
    sf0.01 every customer has *some* order)."""
    recent = orders.filter(F.col("o_orderdate") >= F.lit(since).cast("timestamp_ntz"))
    return (
        customer.join(recent, customer.c_custkey == recent.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def order_priority_counts(orders: DataFrame, lineitem: DataFrame, min_qty: float = 45.0) -> DataFrame:
    """Left-semi join (TPC-H Q4-shaped): orders having any lineitem with
    quantity >= min_qty, counted by priority."""
    big = lineitem.filter(F.col("l_quantity") >= min_qty).select("l_orderkey")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def pricing_rollup(lineitem: DataFrame) -> DataFrame:
    """ROLLUP (returnflag, linestatus): subtotals + grand total. Group keys
    are coalesced to 'ALL' so the null-marker representation can't diverge
    between engines."""
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_items",
            "sum_price",
        )
    )


def customer_running_spend(orders: DataFrame) -> DataFrame:
    """Frame-spec window (absent from the reference — SURVEY.md §2.7): per
    customer, running total + previous order gap via lag."""
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.round(F.sum("o_totalprice").over(running), 2).alias("running_spend"),
        F.lag("o_orderkey", 1).over(w).alias("prev_orderkey"),
        F.row_number().over(w).alias("order_seq"),
    )


def segment_stats(customer: DataFrame) -> DataFrame:
    return (
        customer.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
            F.round(F.min("c_acctbal"), 2).alias("min_acctbal"),
            F.round(F.max("c_acctbal"), 2).alias("max_acctbal"),
        )
    )


def supplier_part_volume(
    lineitem: DataFrame, supplier: DataFrame, part: DataFrame
) -> DataFrame:
    """Fact⋈dim⋈dim: shipped volume per (supplier nation-less) brand."""
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
            F.countDistinct("s_name").alias("suppliers"),
            F.count("*").alias("shipments"),
        )
    )


def events_orders_asof(events: DataFrame, orders: DataFrame) -> DataFrame:
    """As-of join (no Spark builtin — composed from join + argmax window,
    SURVEY.md custom-operator rule (a)): for each order, the latest event of
    the matching user at-or-before the order date.

    At scale this is a range join; the composition below shuffles once on the
    equi-key (user) and resolves the temporal predicate with a per-order
    argmax — the standard Spark formulation when the probe side per key is
    bounded. (events.ts_sec is epoch seconds; o_orderdate is cast likewise.)
    """
    ev = events.select(
        F.col("user_id"), F.col("ts_sec").alias("ev_sec"), F.col("event_id")
    )
    od = orders.select(
        "o_orderkey",
        (F.col("o_custkey") % 150).alias("ou_user"),
        F.unix_timestamp(F.col("o_orderdate").cast("timestamp")).alias("o_sec"),
    )
    joined = od.join(ev, (od.ou_user == ev.user_id) & (ev.ev_sec <= od.o_sec), "left")
    w = Window.partitionBy("o_orderkey").orderBy(
        F.col("ev_sec").desc_nulls_last(), F.col("event_id").desc_nulls_last()
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "o_orderkey",
            F.col("user_id").alias("matched_user"),
            F.col("ev_sec").alias("event_sec"),
            F.col("event_id").alias("latest_event_id"),
        )
    )


# ---------------------------------------------------------------------------
# Registered queries + oracles
# ---------------------------------------------------------------------------


@register(
    "q_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 2) AS avg_qty,
       round(avg(l_extendedprice), 2) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    tags=("relational", "tpch"),
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pricing_summary(read_table(spark, sf_dir, "lineitem"))


@register(
    "q_top_revenue_orders",
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
""",
    tags=("relational", "tpch"),
)
def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_revenue_orders(
        read_table(spark, sf_dir, "customer"),
        read_table(spark, sf_dir, "orders"),
        read_table(spark, sf_dir, "lineitem"),
    )


@register(
    "q_region_customer_stats",
    oracle="""
SELECT r_name,
       count(*) AS customers,
       count(DISTINCT n_name) AS nations,
       round(sum(c_acctbal), 2) AS total_acctbal,
       round(avg(c_acctbal), 4) AS avg_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
    tags=("relational", "tpch"),
)
def q_region_customer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return region_customer_stats(
        read_table(spark, sf_dir, "region"),
        read_table(spark, sf_dir, "nation"),
        read_table(spark, sf_dir, "customer"),
    )


@register(
    "q_customers_without_orders",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2001-01-01')
""",
    tags=("relational", "antijoin"),
)
def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return customers_without_orders(
        read_table(spark, sf_dir, "customer"), read_table(spark, sf_dir, "orders")
    )


@register(
    "q_order_priority_counts",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45.0)
GROUP BY o_orderpriority
""",
    tags=("relational", "semijoin"),
)
def q_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return order_priority_counts(
        read_table(spark, sf_dir, "orders"), read_table(spark, sf_dir, "lineitem")
    )


@register(
    "q_pricing_rollup",
    oracle="""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*) AS n_items,
       round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    tags=("relational", "rollup"),
)
def q_pricing_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pricing_rollup(read_table(spark, sf_dir, "lineitem"))


@register(
    "q_customer_running_spend",
    oracle="""
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       round(sum(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
       lag(o_orderkey, 1) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_orderkey,
       row_number() OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS order_seq
FROM orders
""",
    tags=("relational", "window"),
)
def q_customer_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    return customer_running_spend(read_table(spark, sf_dir, "orders"))


@register(
    "q_segment_stats",
    oracle="""
SELECT c_mktsegment,
       count(*) AS customers,
       round(avg(c_acctbal), 4) AS avg_acctbal,
       round(min(c_acctbal), 2) AS min_acctbal,
       round(max(c_acctbal), 2) AS max_acctbal
FROM customer GROUP BY c_mktsegment
""",
    tags=("relational",),
)
def q_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return segment_stats(read_table(spark, sf_dir, "customer"))


@register(
    "q_supplier_part_volume",
    oracle="""
SELECT p_brand,
       round(sum(l_quantity), 2) AS total_qty,
       count(DISTINCT s_name) AS suppliers,
       count(*) AS shipments
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY p_brand
""",
    tags=("relational", "tpch"),
)
def q_supplier_part_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    return supplier_part_volume(
        read_table(spark, sf_dir, "lineitem"),
        read_table(spark, sf_dir, "supplier"),
        read_table(spark, sf_dir, "part"),
    )


@register(
    "q_events_orders_asof",
    oracle="""
WITH ev AS (
  SELECT user_id, (epoch_ns(ts) // 1000000000) AS ev_sec, event_id FROM events
), od AS (
  SELECT o_orderkey, o_custkey % 150 AS ou_user, epoch(o_orderdate)::BIGINT AS o_sec
  FROM orders
), ranked AS (
  SELECT od.o_orderkey, ev.user_id, ev.ev_sec, ev.event_id,
         row_number() OVER (PARTITION BY od.o_orderkey
                            ORDER BY ev.ev_sec DESC NULLS LAST,
                                     ev.event_id DESC NULLS LAST) AS rn
  FROM od LEFT JOIN ev ON od.ou_user = ev.user_id AND ev.ev_sec <= od.o_sec
)
SELECT o_orderkey, user_id AS matched_user, ev_sec AS event_sec,
       event_id AS latest_event_id
FROM ranked WHERE rn = 1
""",
    tags=("relational", "asof"),
)
def q_events_orders_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_search_data_pipeline_spark.sources.readers import load_events

    return events_orders_asof(
        load_events(spark, sf_dir), read_table(spark, sf_dir, "orders")
    )


def pricing_cube(lineitem: DataFrame) -> DataFrame:
    """CUBE (returnflag, linestatus) with grouping_id — completes the
    grouping-set family next to q_pricing_rollup's ROLLUP: the cube adds
    the column-wise marginals ROLLUP omits, and gid disambiguates a
    genuine NULL key from an aggregate row (Spark's grouping_id and
    DuckDB's GROUPING share the bitmask convention: leftmost column =
    most significant bit). One Expand + one partial-agg shuffle — the
    4x row expansion happens map-side, never a second scan."""
    return (
        lineitem.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "gid",
            "n_items",
            "sum_price",
        )
    )


@register(
    "q_pricing_cube",
    oracle="""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       GROUPING(l_returnflag, l_linestatus) AS gid,
       count(*) AS n_items,
       round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    tags=("relational", "cube"),
)
def q_pricing_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pricing_cube(read_table(spark, sf_dir, "lineitem"))


def unpivot_order_stats(orders: DataFrame) -> DataFrame:
    """Wide -> long via stack(): per order-priority, one row per metric
    (the inverse of q_pivot_event_types' long -> wide). stack is a
    Generate — narrow, zero extra shuffle beyond the source agg."""
    wide = orders.groupBy("o_orderpriority").agg(
        F.count("*").cast("double").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )
    return wide.selectExpr(
        "o_orderpriority",
        "stack(4, 'n_orders', n_orders, 'sum_price', sum_price, "
        "'min_price', min_price, 'max_price', max_price) AS (metric, value)",
    )


@register(
    "q_unpivot_order_stats",
    oracle="""
WITH wide AS (
  SELECT o_orderpriority,
         count(*)::DOUBLE AS n_orders,
         round(sum(o_totalprice), 2) AS sum_price,
         round(min(o_totalprice), 2) AS min_price,
         round(max(o_totalprice), 2) AS max_price
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, metric, value
FROM wide
UNPIVOT (value FOR metric IN (n_orders, sum_price, min_price, max_price))
""",
    tags=("relational", "unpivot"),
)
def q_unpivot_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return unpivot_order_stats(read_table(spark, sf_dir, "orders"))

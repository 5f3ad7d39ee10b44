"""SQL entry point: the engine's relations as temp views + `spark.sql`.

The reference has no SQL surface (its queries are hard-coded DataFrame
pipelines, SURVEY.md §3); on Spark the SQL entry point is free — register
the fixture/lake tables as views and every registered capability is
reachable from ANSI SQL through the same Catalyst planner. `q_sql_nation_
revenue` proves the path: the Spark builder executes the *identical* SQL
string the DuckDB oracle runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clinical_search_data_pipeline_spark.registry import register
from clinical_search_data_pipeline_spark.schemas import ALL_TABLES
from clinical_search_data_pipeline_spark.sources.readers import load_events, read_table


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every fixture table as a temp view, plus `events_enriched`
    (the canonical event relation with derived time columns)."""
    for name in ALL_TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)
    load_events(spark, sf_dir).createOrReplaceTempView("events_enriched")


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run ANSI SQL over the registered views."""
    register_views(spark, sf_dir)
    return spark.sql(query)


_NATION_REVENUE_SQL = """
SELECT n.n_name AS nation,
       count(DISTINCT c.c_custkey) AS n_customers,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


@register("q_sql_nation_revenue", oracle=_NATION_REVENUE_SQL, tags=("sql", "tpch"))
def q_sql_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four-table join + agg submitted as a SQL string — the identical text
    runs on DuckDB as the oracle (SQL-dialect parity check)."""
    return sql(spark, sf_dir, _NATION_REVENUE_SQL)

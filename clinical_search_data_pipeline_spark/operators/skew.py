"""Skew-aware aggregation: explicit two-stage salted combine.

AQE skew-join handling (on in session.py) fixes skewed *joins* at runtime,
but a groupBy whose hot key floods one reducer needs salting: aggregate on
(key, salt) first — the hot key's rows split across `n_salts` reducers —
then combine the partials on key alone. Spark's partial aggregation already
does this for algebraic aggregates when map-side partials fit; explicit
salting is the insurance for high-cardinality maps + hot keys (the
reference's anomaly sessions — 50+ clicks/5 min — are precisely the hot
keys, SURVEY.md §7.3 risk 6).

Salt must be deterministic to stay oracle-checkable: `pmod(hash64(row id),
n_salts)` — production can use a random salt, semantics identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_search_data_pipeline_spark.functions.timeops import duck_event_date
from clinical_search_data_pipeline_spark.registry import register
from clinical_search_data_pipeline_spark.sources.readers import load_events

N_SALTS = 16


def salted_counts(
    df: DataFrame,
    keys: list[str],
    salt_source: str,
    n_salts: int = N_SALTS,
) -> DataFrame:
    """count(*) + sum(value) per key via salted two-stage aggregation.

    Stage 1 shuffles on (keys..., salt) — bounded reducer load per hot key;
    stage 2 shuffles n_salts rows per key. Result == a direct groupBy.
    """
    salt = F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salts)).alias("_salt")
    partial = (
        df.select(*keys, salt, "value")
        .groupBy(*keys, "_salt")
        .agg(F.count("*").alias("_cnt"), F.sum("value").alias("_sum"))
    )
    return partial.groupBy(*keys).agg(
        F.sum("_cnt").alias("event_count"),
        F.round(F.sum("_sum"), 4).alias("value_sum"),
    )


@register(
    "q_salted_counts",
    oracle=f"""
SELECT event_type,
       {duck_event_date('ts')} AS event_date,
       count(*) AS event_count,
       round(sum(value), 4) AS value_sum
FROM events GROUP BY 1, 2
""",
    tags=("skew", "agg", "northstar"),
)
def q_salted_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation; oracle is the plain GROUP BY, proving
    the salting is semantically transparent."""
    events = load_events(spark, sf_dir)
    return salted_counts(
        events, keys=["event_type", "event_date"], salt_source="event_id"
    )

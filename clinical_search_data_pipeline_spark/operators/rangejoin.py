"""Point-in-interval range join via time binning.

The reference joins only on equality (its single join:
etl_to_analytics_mart.py:147). A range join — "every event whose timestamp
falls inside some interval" — has no Spark builtin either: a naive
``a.join(b, (pt >= lo) & (pt < hi))`` with no equi-conjunct is planned as
BroadcastNestedLoopJoin, O(|points| x |intervals|), which dies at scale.

The scale path (SURVEY.md custom-operator rule (a) — compose from existing
DataFrame ops) is **binning**: quantize time into fixed-width bins, explode
each interval into the bins it overlaps, tag each point with its single bin,
equi-join on the bin id, then re-apply the exact range predicate as a
residual filter. Catalyst plans a plain shuffled hash/sort-merge join on the
bin key; the residual is evaluated post-match. Cost drops from |P|x|I| to
sum over bins of |P_bin| x |I_bin| — linear when intervals are short
relative to the bin width. A point lies in exactly one bin, so no
per-pair dedup is needed.

Choose ``bin_sec`` on the order of the typical interval length: much
smaller -> interval fan-out (rows = len/bin_sec per interval); much larger
-> bins collapse into few hot join keys (skew). Both engines see the same
integer arithmetic, so the oracle is a plain inequality join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_search_data_pipeline_spark.registry import register
from clinical_search_data_pipeline_spark.sources.readers import load_events

WINDOW_SEC = 600  # analysis window length: 10 min after each trigger event
BIN_SEC = 600  # bin width ~ interval length (see module docstring)
TRIGGER_USERS = 30  # windows are opened by error events of users [0, 30)


def bin_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_sec: str,
    start_sec: str,
    end_sec: str,
    bin_sec: int = BIN_SEC,
) -> DataFrame:
    """Equi-join ``points`` to the ``intervals`` containing them.

    Interval semantics are half-open ``[start_sec, end_sec)``. Returns the
    full cross of both schemas for each containment pair, exactly once.
    """
    binned = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.expr(f"{start_sec} div {bin_sec}"),
                F.expr(f"({end_sec} - 1) div {bin_sec}"),
            )
        ),
    )
    tagged = points.withColumn("_bin", F.expr(f"{point_sec} div {bin_sec}"))
    return tagged.join(
        binned,
        (tagged["_bin"] == binned["_bin"])
        & (F.col(point_sec) >= F.col(start_sec))
        & (F.col(point_sec) < F.col(end_sec)),
    ).drop("_bin")


def error_window_activity(events: DataFrame) -> DataFrame:
    """Site-activity profile around failures: for each error event raised by
    a trigger-cohort user, count all traffic (any user) in the 10 minutes
    that follow. A pure range join — no equi-key links a window to the
    traffic inside it."""
    windows = (
        events.filter(
            (F.col("event_type") == "error") & (F.col("user_id") < TRIGGER_USERS)
        )
        .select(
            F.col("event_id").alias("window_id"),
            F.col("ts_sec").alias("w_start"),
            (F.col("ts_sec") + WINDOW_SEC).alias("w_end"),
        )
    )
    points = events.select(
        F.col("ts_sec").alias("p_sec"), "user_id", "event_type"
    )
    pairs = bin_interval_join(points, windows, "p_sec", "w_start", "w_end")
    return pairs.groupBy("window_id", "w_start").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
            "n_errors"
        ),
    )


@register(
    "q_range_join_windows",
    oracle=f"""
WITH w AS (
  SELECT event_id AS window_id,
         epoch_ns(ts) // 1000000000 AS w_start
  FROM events
  WHERE event_type = 'error' AND user_id < {TRIGGER_USERS}
)
SELECT w.window_id,
       w.w_start,
       count(*) AS n_events,
       count(DISTINCT e.user_id) AS n_users,
       CAST(sum(CASE WHEN e.event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_errors
FROM w
JOIN events e
  ON (epoch_ns(e.ts) // 1000000000) >= w.w_start
 AND (epoch_ns(e.ts) // 1000000000) < w.w_start + {WINDOW_SEC}
GROUP BY 1, 2
""",
    tags=("rangejoin", "northstar"),
)
def q_range_join_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic profile of the 10 minutes after each monitored error — binned
    point-in-interval range join (the oracle states the same join as a plain
    inequality join, which DuckDB runs via its IE-join)."""
    return error_window_activity(load_events(spark, sf_dir))

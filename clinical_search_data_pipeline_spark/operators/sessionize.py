"""Gap-based sessionization (batch form).

The reference never computes sessions — TripClick pre-assigns `SessionId`
upstream and the marts only aggregate within it (SURVEY.md §2.12 T10). A
general engine must *derive* sessions from raw event time: a session breaks
after `gap_sec` of inactivity. Classic two-window formulation, all builtins:

    lag(ts)  -> is_new_session flag
    running sum of flags -> session index
    groupBy (user, session_idx) -> bounds + size

This also exercises `lag` and a cumulative frame (`rowsBetween`), which the
reference's two `row_number` windows never touch (SURVEY.md §2.7).

Scale: both windows and the final aggregation share one hash partitioning on
`user_id` — Catalyst plans a single shuffle; the per-user sort is bounded by
a user's own event count. Skewed users (bots) are exactly the anomaly-mart
targets; AQE skew handling applies to the shuffle.

The streaming twin (arbitrary stateful processing, applyInPandasWithState)
lives in streaming/stateful.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clinical_search_data_pipeline_spark.functions import timeops
from clinical_search_data_pipeline_spark.functions.timeops import (
    duck_epoch_sec,
    duck_sec_to_ts_string,
)
from clinical_search_data_pipeline_spark.registry import register
from clinical_search_data_pipeline_spark.sources.readers import load_events

GAP_SEC = 1800


def sessionize(events: DataFrame, gap_sec: int = GAP_SEC) -> DataFrame:
    """One row per derived session: bounds, size, duration.

    Ordering inside a user is (ts_sec, event_id) — the tie-break makes the
    session assignment deterministic when events share a second.
    """
    order = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    cumulative = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = events.select("user_id", "ts_sec", "event_id").withColumn(
        "is_new",
        F.when(
            F.col("ts_sec") - F.lag("ts_sec").over(order) <= gap_sec, F.lit(0)
        ).otherwise(F.lit(1)),
    )
    indexed = flagged.withColumn("session_idx", F.sum("is_new").over(cumulative))
    return (
        indexed.groupBy("user_id", "session_idx")
        .agg(
            F.min("ts_sec").alias("_start_sec"),
            F.max("ts_sec").alias("_end_sec"),
            F.count("*").alias("n_events"),
        )
        .select(
            "user_id",
            "session_idx",
            timeops.sec_to_ts_string(F.col("_start_sec")).alias("session_start"),
            timeops.sec_to_ts_string(F.col("_end_sec")).alias("session_end"),
            "n_events",
            (F.col("_end_sec") - F.col("_start_sec")).alias("duration_sec"),
        )
    )


@register(
    "q_sessionize",
    oracle=f"""
WITH e AS (
  SELECT user_id, {duck_epoch_sec('ts')} AS ts_sec, event_id FROM events
),
flagged AS (
  SELECT user_id, ts_sec, event_id,
         CASE WHEN ts_sec - lag(ts_sec) OVER w <= {GAP_SEC} THEN 0 ELSE 1 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
),
indexed AS (
  SELECT user_id, ts_sec,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
  FROM flagged
)
SELECT user_id, session_idx,
       {duck_sec_to_ts_string('min(ts_sec)')} AS session_start,
       {duck_sec_to_ts_string('max(ts_sec)')} AS session_end,
       count(*) AS n_events,
       max(ts_sec) - min(ts_sec) AS duration_sec
FROM indexed GROUP BY user_id, session_idx
""",
    tags=("sessionize", "window", "northstar"),
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization over the event log (30-min inactivity gap)."""
    return sessionize(load_events(spark, sf_dir))


# ---------------------------------------------------------------------------
# Session funnel: ordered step conversion within gap sessions
# ---------------------------------------------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")  # must occur in this order


def session_funnel(
    events: DataFrame,
    steps: tuple[str, ...] = FUNNEL_STEPS,
    gap_sec: int = GAP_SEC,
) -> DataFrame:
    """(step_idx, step, n_sessions): how many gap-sessions progress through
    the step sequence IN ORDER (a later step only counts if it occurs
    after the session had already reached the previous one — the classic
    ordered-funnel semantic, not mere presence).

    Plan: the session index rides the same per-user window as
    `sessionize`; each session's events are re-collected in (ts, event_id)
    order and a state-machine LEFT FOLD (Spark `aggregate` HOF; DuckDB
    list_reduce) advances depth d when the next event matches steps[d].
    One user-keyed window + one (user, session)-keyed aggregation; the
    final depth histogram is step-count-sized. Step presence alone cannot
    fake a conversion: ('click' before any 'view') leaves d at 0.
    """
    order = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    cumulative = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = events.select("user_id", "ts_sec", "event_id", "event_type").withColumn(
        "is_new",
        F.when(
            F.col("ts_sec") - F.lag("ts_sec").over(order) <= gap_sec, F.lit(0)
        ).otherwise(F.lit(1)),
    )
    indexed = flagged.withColumn("session_idx", F.sum("is_new").over(cumulative))
    # fold over step ORDINALS (0 = not a funnel step): d advances only on
    # the exact next step — integer-typed on both engines (DuckDB's
    # list_reduce needs accumulator and element types to match)
    to_ord = " ".join(
        f"WHEN s.event_type = '{step}' THEN {i + 1}" for i, step in enumerate(steps)
    )
    depth = (
        f"aggregate(transform(evs, s -> CASE {to_ord} ELSE 0 END), 0, "
        f"(d, x) -> CASE WHEN x = d + 1 THEN x ELSE d END)"
    )
    depths = (
        indexed.groupBy("user_id", "session_idx")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts_sec", "event_id", "event_type"))
            ).alias("evs")
        )
        .select(F.expr(depth).alias("depth"))
    )
    # histogram FIRST: the session relation collapses to <= len(steps)+1
    # rows via an ordinary partial-agg shuffle, so the non-equi >= join
    # below is tiny x tiny — never a loop over the session relation
    hist = depths.groupBy("depth").agg(F.count("*").alias("n"))
    steps_df = events.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], ["step_idx", "step"]
    )
    return (
        F.broadcast(steps_df)
        .join(hist, F.col("depth") >= F.col("step_idx"), "left")
        .groupBy("step_idx", "step")
        .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("n_sessions"))
    )


def _funnel_oracle(steps: tuple[str, ...] = FUNNEL_STEPS) -> str:
    to_ord = " ".join(
        f"WHEN s = '{step}' THEN {i + 1}" for i, step in enumerate(steps)
    )
    values = ", ".join(f"({i + 1}, '{s}')" for i, s in enumerate(steps))
    return f"""
WITH e AS (
  SELECT user_id, {duck_epoch_sec('ts')} AS ts_sec, event_id, event_type
  FROM events
),
flagged AS (
  SELECT user_id, ts_sec, event_id, event_type,
         CASE WHEN ts_sec - lag(ts_sec) OVER w <= {GAP_SEC} THEN 0 ELSE 1 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
),
indexed AS (
  SELECT user_id, ts_sec, event_id, event_type,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
  FROM flagged
),
depths AS (
  SELECT list_reduce(
           list_prepend(0, list_transform(
             list(event_type ORDER BY ts_sec, event_id),
             s -> CASE {to_ord} ELSE 0 END)),
           (d, x) -> CASE WHEN x = d + 1 THEN x ELSE d END
         ) AS depth
  FROM indexed GROUP BY user_id, session_idx
),
steps(step_idx, step) AS (VALUES {values})
SELECT step_idx, step, count(depth) AS n_sessions
FROM steps LEFT JOIN depths ON depth >= step_idx
GROUP BY step_idx, step
"""


@register(
    "q_session_funnel",
    oracle=_funnel_oracle(),
    tags=("sessionize", "window", "northstar"),
)
def q_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view -> click -> purchase funnel over gap sessions: a later
    step counts only after the session reached the previous one."""
    return session_funnel(load_events(spark, sf_dir))


# ---------------------------------------------------------------------------
# Event-type transition matrix (within-session Markov transitions)
# ---------------------------------------------------------------------------


def event_transitions(events: DataFrame, gap_sec: int = GAP_SEC) -> DataFrame:
    """(from_type, to_type, n_transitions, p): consecutive event-type
    pairs WITHIN a gap session (a transition never crosses a session
    boundary), with p the row-normalized transition probability.

    Plan: the lead() rides the same per-user (ts, event_id) window as
    sessionize; the session index computed in the same pass masks
    cross-session pairs. The matrix is event-type^2-sized and the row
    totals are type-sized — small in practice but growing with the type
    vocabulary, so the normalizing join carries no forced broadcast; AQE
    broadcasts it while it is actually small."""
    order = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    cumulative = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = events.select("user_id", "ts_sec", "event_id", "event_type").withColumn(
        "is_new",
        F.when(
            F.col("ts_sec") - F.lag("ts_sec").over(order) <= gap_sec, F.lit(0)
        ).otherwise(F.lit(1)),
    )
    indexed = flagged.withColumn("session_idx", F.sum("is_new").over(cumulative))
    pairs = indexed.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(order).alias("to_type"),
        (
            F.lead("session_idx").over(order) == F.col("session_idx")
        ).alias("same_session"),
    ).filter(F.col("same_session") & F.col("to_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n_transitions")
    )
    totals = counts.groupBy("from_type").agg(F.sum("n_transitions").alias("total"))
    return counts.join(totals, "from_type").select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(F.col("n_transitions") / F.col("total"), 4).alias("p"),
    )


@register(
    "q_event_transitions",
    oracle=f"""
WITH e AS (
  SELECT user_id, {duck_epoch_sec('ts')} AS ts_sec, event_id, event_type
  FROM events
),
flagged AS (
  SELECT user_id, ts_sec, event_id, event_type,
         CASE WHEN ts_sec - lag(ts_sec) OVER w <= {GAP_SEC} THEN 0 ELSE 1 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
),
indexed AS (
  SELECT user_id, ts_sec, event_id, event_type,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
  FROM flagged
),
pairs AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER w AS to_type,
         lead(session_idx) OVER w = session_idx AS same_session
  FROM indexed
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
),
counts AS (
  SELECT from_type, to_type, count(*) AS n_transitions
  FROM pairs WHERE same_session AND to_type IS NOT NULL
  GROUP BY 1, 2
),
totals AS (SELECT from_type, sum(n_transitions) AS total FROM counts GROUP BY 1)
SELECT from_type, to_type, n_transitions,
       round(n_transitions / total::DOUBLE, 4) AS p
FROM counts JOIN totals USING (from_type)
""",
    tags=("sessionize", "window", "northstar"),
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-session Markov transition matrix over event types."""
    return event_transitions(load_events(spark, sf_dir))

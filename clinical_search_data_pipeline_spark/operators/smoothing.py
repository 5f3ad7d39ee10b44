"""Per-key EWMA smoothing via grouped `applyInPandas` — the one Arrow
pattern the engine had not yet exercised in batch (mapInPandas: multimodal;
pandas_udf: vectorized cosine; applyInPandasWithState: streaming counters).

An exponentially-weighted moving average is a per-key RECURRENCE
(y_t = (1-a)*y_{t-1} + a*x_t): not expressible as a Spark window function
(the closed form needs (1-a)^t factors that overflow for long series), so
this is a legitimate grouped-map use — per-user series arrive as Arrow
batches, the recurrence runs in the Python worker, results return as
columns.

Oracle strategy: the recurrence is evaluated with EXACTLY the same double
arithmetic on both engines — an explicit `(1-a)*y + a*x` loop here, the
identical expression in a DuckDB RECURSIVE CTE — so the comparison holds
bit-for-bit (rounded to 6 dp for belt and braces). A pytest additionally
pins the loop against pandas' production `ewm(alpha, adjust=False).mean()`
to 1e-12, so swapping the loop for the C-accelerated pandas path (the
100 TB choice) is a measured one-liner, not a leap.

Scale posture: groupBy(user_id).applyInPandas is ONE shuffle on the key;
state per task is a single partial series. Skewed users are the hazard
(one task holds the whole series) — the standard remedy is sessionized or
windowed chunking upstream; the fixture's series are bounded.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from clinical_search_data_pipeline_spark.functions.timeops import duck_epoch_sec
from clinical_search_data_pipeline_spark.registry import register
from clinical_search_data_pipeline_spark.sources.readers import load_events

EWMA_ALPHA = 0.3

_OUT_SCHEMA = "user_id long, event_id long, rn int, ewma double"


def _ewma_series(values, alpha: float):
    out = []
    y = None
    for x in values:
        y = x if y is None else (1.0 - alpha) * y + alpha * x
        out.append(y)
    return out


def ewma_per_user(events: DataFrame, alpha: float = EWMA_ALPHA) -> DataFrame:
    """(user_id, event_id, rn, ewma) — each user's event values smoothed in
    (ts_sec, event_id) order; rn is the 1-based position in that order."""

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_sec", "event_id"]).reset_index(drop=True)
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "rn": range(1, len(pdf) + 1),
                # raw doubles out — the display rounding happens JVM-side
                # (F.round is HALF_UP like DuckDB's round; Python's round
                # is nearest-even and diverges exactly at the .5 boundary)
                "ewma": _ewma_series(pdf["value"], alpha),
            }
        )

    from pyspark.sql import functions as F

    sub = events.select("user_id", "event_id", "ts_sec", "value").filter(
        "value IS NOT NULL"
    )
    # Pin the pre-group partition count: the engine's size-based AQE
    # coalescing (tuned for JVM stages) collapses this byte-tiny shuffle to
    # ONE task, serializing every per-group pandas call through a single
    # Python worker (measured 4.6 s for ~1.5k groups at sf0.1; per-GROUP
    # overhead dominates, not bytes). An explicit keyed repartition holds
    # the worker parallelism; groupBy reuses the partitioning, so this is
    # still exactly one exchange.
    n = max(sub.sparkSession.sparkContext.defaultParallelism, 8)
    out = sub.repartition(n, "user_id").groupBy("user_id").applyInPandas(
        smooth, _OUT_SCHEMA
    )
    return out.withColumn("ewma", F.round("ewma", 6))


@register(
    "q_ewma_user_values",
    oracle=f"""
WITH RECURSIVE o AS (
  SELECT user_id, event_id, value,
         row_number() OVER (
           PARTITION BY user_id
           ORDER BY {duck_epoch_sec('ts')}, event_id
         ) AS rn
  FROM events WHERE value IS NOT NULL
),
r(user_id, event_id, rn, y) AS (
  SELECT user_id, event_id, rn, value FROM o WHERE rn = 1
  UNION ALL
  SELECT o.user_id, o.event_id, o.rn,
         (1.0 - {EWMA_ALPHA}) * r.y + {EWMA_ALPHA} * o.value
  FROM r JOIN o ON o.user_id = r.user_id AND o.rn = r.rn + 1
)
SELECT user_id, event_id, rn, round(y, 6) AS ewma FROM r
""",
    tags=("smoothing", "udf", "northstar"),
)
def q_ewma_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ewma_per_user(load_events(spark, sf_dir))

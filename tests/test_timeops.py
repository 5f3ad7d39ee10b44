"""Event-time normalization and the unit-drift guard.

Round 3 regressed on exactly this surface: the driver environment moved to
PySpark 4.1.2 (which silently ignores `spark.sql.legacy.parquet.nanosAsLong`)
and regenerated the fixtures as parquet TIMESTAMP(MICROS). These tests pin
the adaptive behavior so the next physical-type drift is an immediate,
named failure instead of 1000×-wrong answers (VERDICT r03 #1/#2/#3).
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from clinical_search_data_pipeline_spark.functions import timeops
from clinical_search_data_pipeline_spark.sources.readers import (
    SANE_TS_SEC_MAX,
    SANE_TS_SEC_MIN,
    assert_event_time_sane,
    load_events,
)
from tests.conftest import SF_SMOKE

# 2024-03-01 12:34:56.789123 UTC
_EPOCH_US = 1_709_296_496_789_123
_NTZ = datetime.datetime(2024, 3, 1, 12, 34, 56, 789123)


def test_to_epoch_ns_from_long_passthrough(spark):
    df = spark.createDataFrame([(_EPOCH_US * 1000,)], "ts long")
    got = df.select(timeops.to_epoch_ns(LongType()).alias("ns")).first().ns
    assert got == _EPOCH_US * 1000


def test_to_epoch_ns_from_ntz_is_timezone_free(spark):
    """TIMESTAMP_NTZ wall time is defined as UTC; the derivation must not
    depend on spark.sql.session.timeZone (the session we get handed may not
    honor our conf — that was round 3's failure mode)."""
    df = spark.createDataFrame(
        [(_NTZ,)], StructType([StructField("ts", TimestampNTZType())])
    )
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/New_York", "Asia/Seoul"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            got = df.select(timeops.to_epoch_ns(TimestampNTZType()).alias("ns")).first().ns
            assert got == _EPOCH_US * 1000, tz
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_to_epoch_ns_rejects_unsupported_types():
    with pytest.raises(TypeError, match="unsupported physical type"):
        timeops.to_epoch_ns(StringType())


def test_load_events_normalizes_current_fixture(spark):
    """Whatever the fixture's physical ts type, the canonical relation is
    epoch-ns long with in-range derived seconds."""
    df = load_events(spark, SF_SMOKE)
    assert dict(df.dtypes)["ts"] == "bigint"
    assert dict(df.dtypes)["ts_sec"] == "bigint"
    row = df.select(F.min("ts_sec").alias("mn"), F.max("ts_sec").alias("mx")).first()
    assert SANE_TS_SEC_MIN <= row.mn <= row.mx < SANE_TS_SEC_MAX


def test_guard_fires_on_unit_misread(spark, tmp_path):
    """Replay round 3's silent corruption: read a µs-timestamp parquet file
    through a pinned LongType schema (raw int64 µs reinterpreted as ns) and
    derive seconds — the guard must fail loudly, naming the physical type."""
    p = str(tmp_path / "events_us.parquet")
    spark.createDataFrame(
        [(_NTZ,)], StructType([StructField("ts", TimestampNTZType())])
    ).write.parquet(p)
    misread = (
        spark.read.schema(StructType([StructField("ts", LongType())]))
        .parquet(p)
        .withColumn("ts_sec", timeops.epoch_sec("ts"))
    )
    # sanity: the misread value is ~1970-01-20, i.e. 1000x off
    assert misread.first().ts_sec == _EPOCH_US // 1_000_000_000
    with pytest.raises(ValueError, match="event-time sanity check failed"):
        assert_event_time_sane(misread, p, "bigint(misread)")


def test_guard_passes_in_range_and_caches(spark):
    df = spark.range(1).select(F.lit(_EPOCH_US // 1_000_000).alias("ts_sec"))
    assert_event_time_sane(df, "synthetic-ok", "bigint")
    # second call is a cached no-op (same source+dtype key)
    assert_event_time_sane(df, "synthetic-ok", "bigint")


def test_guard_vacuous_sample_does_not_cache(spark):
    """An empty or all-null sample proves nothing: the guard must neither
    raise nor mark the (source, dtype) key verified, so the first batch that
    actually carries event times still gets checked (ADVICE r04)."""
    from clinical_search_data_pipeline_spark.sources import readers

    empty = spark.range(0).select(F.col("id").alias("ts_sec"))
    allnull = spark.range(4).select(F.lit(None).cast("bigint").alias("ts_sec"))
    for df, src in ((empty, "synthetic-empty"), (allnull, "synthetic-allnull")):
        assert_event_time_sane(df, src, "bigint")
        assert f"{src}:bigint" not in readers._time_guard_ok
    # and a later non-null out-of-range batch from the same source still fails
    bad = spark.range(1).select(F.lit(123).alias("ts_sec"))
    with pytest.raises(ValueError, match="event-time sanity check failed"):
        assert_event_time_sane(bad, "synthetic-allnull", "bigint")


def test_runtime_conf_failures_are_recorded(spark):
    """apply_runtime_confs must verify readback, not trust `set` (the r03
    nanosAsLong lesson). A conf the session accepts-and-honors leaves no
    failure entry; the module records any that don't take effect."""
    from clinical_search_data_pipeline_spark import session as sess

    sess.apply_runtime_confs(spark)
    # Every conf we claim to run with must actually be in effect on the
    # session the tests run under — otherwise the entry names the reason.
    for key, value in sess.RUNTIME_CONFS.items():
        if key in sess.CONF_FAILURES:
            pytest.fail(f"{key}: {sess.CONF_FAILURES[key]}")
        assert spark.conf.get(key) == value


def test_to_epoch_ns_from_instant_timestamp(spark, tmp_path):
    """TIMESTAMP (instant) parquet: unix_micros is exact regardless of the
    session timezone used to write or read."""
    from pyspark.sql.types import TimestampType

    p = str(tmp_path / "events_instant.parquet")
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Seoul")
        aware = _NTZ.replace(tzinfo=datetime.timezone.utc)
        spark.createDataFrame(
            [(aware,)], StructType([StructField("ts", TimestampType())])
        ).write.parquet(p)
        df = spark.read.parquet(p)
        dtype = df.schema["ts"].dataType
        # parquet stores instants as isAdjustedToUTC=true; Spark may read it
        # back as TIMESTAMP or (config-dependent) TIMESTAMP_NTZ — normalize
        # through the adaptive path either way.
        got = df.select(timeops.to_epoch_ns(dtype).alias("ns")).first().ns
        assert got == _EPOCH_US * 1000, dtype.simpleString()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_to_epoch_ns_property_ntz_matches_python_epoch(spark):
    """Property check across the sane window: for arbitrary µs-precision
    datetimes, the NTZ normalization equals Python's own UTC epoch
    arithmetic. One Spark job over the whole example batch (a per-example
    round-trip through the JVM would be too slow, so examples are drawn
    once — seeded, hence reproducible — and asserted in bulk)."""
    import random

    rng = random.Random(0xC5D9)
    epoch = datetime.datetime(1970, 1, 1)
    span_us = (datetime.datetime(2100, 1, 1) - datetime.datetime(2000, 1, 1)) // datetime.timedelta(microseconds=1)
    base = datetime.datetime(2000, 1, 1)
    examples = [
        base + datetime.timedelta(microseconds=rng.randrange(span_us))
        for _ in range(200)
    ]
    expected = [
        ((e - epoch).days * 86_400_000_000
         + (e - epoch).seconds * 1_000_000
         + (e - epoch).microseconds) * 1000
        for e in examples
    ]
    df = spark.createDataFrame(
        [(e,) for e in examples], StructType([StructField("ts", TimestampNTZType())])
    )
    got = [
        r.ns
        for r in df.select(timeops.to_epoch_ns(TimestampNTZType()).alias("ns"))
        .collect()
    ]
    assert sorted(got) == sorted(expected)

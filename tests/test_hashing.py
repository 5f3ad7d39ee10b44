"""Fixed-vector pins for the hash-key functions.

The md5-derived 60-bit path is oracle-checked by the driver (q_dedup_keys);
the PRODUCTION xxhash64 path (functions/hashing.dedup_key_xxhash, mirroring
reference ingestion/producer/producer_base.py:42-53) has no DuckDB twin, so
its bit-level behavior is pinned here against known vectors (Spark xxhash64
= XXH64 over the UTF-8 bytes, seed 42) and its structural contract asserted
on the fixture (one key per event, deterministic across recomputation).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clinical_search_data_pipeline_spark.functions.hashing import (
    dedup_key_md5,
    dedup_key_xxhash,
)
from clinical_search_data_pipeline_spark.operators.marts import dedup_keys_xxhash
from clinical_search_data_pipeline_spark.sources.readers import load_events
from tests.conftest import SF_SMOKE

# XXH64(utf8(s), seed=42) — independent of Spark version; any engine
# implementing the production key must reproduce these exactly.
KNOWN_VECTORS = {
    "abc": 1423657621850124518,
    "1001|17|1700000000": -6061075137243008185,
    "": -7444071767201028348,
}


def test_xxhash64_fixed_vectors(spark):
    df = spark.createDataFrame([(s,) for s in KNOWN_VECTORS], ["s"])
    got = {r.s: r.h for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    assert got == KNOWN_VECTORS


def test_dedup_key_xxhash_matches_joined_tuple(spark):
    # dedup_key_xxhash(cols) == xxhash64 of the '|'-joined tuple string.
    df = spark.createDataFrame(
        [(1001, 17, 1700000000)], ["user_id", "event_id", "ts_sec"]
    )
    row = df.select(
        dedup_key_xxhash("user_id", "event_id", "ts_sec").alias("k")
    ).collect()[0]
    assert row.k == KNOWN_VECTORS["1001|17|1700000000"]


def test_dedup_keys_xxhash_structural(spark):
    events = load_events(spark, SF_SMOKE)
    keys = dedup_keys_xxhash(events)
    n_events = events.count()
    assert keys.count() == n_events
    # (user_id, event_id, ts_sec) is unique in the fixture => keys collide
    # only if xxhash64 collides; at fixture scale expect zero collisions.
    assert keys.select("dedup_key").distinct().count() == n_events
    # deterministic: recomputation yields the identical key per event
    a = {r.event_id: r.dedup_key for r in keys.collect()}
    b = {r.event_id: r.dedup_key for r in dedup_keys_xxhash(events).collect()}
    assert a == b


def test_md5_and_xxhash_paths_agree_on_input(spark):
    # Both families hash the same separator-joined tuple — pin the joined
    # string itself so the two paths cannot drift apart on input framing.
    df = spark.createDataFrame([(7, "x", 3)], ["a", "b", "c"])
    joined = df.select(F.concat_ws("|", "a", "b", "c").alias("j")).collect()[0].j
    assert joined == "7|x|3"
    md5_direct = df.select(F.md5(F.lit("7|x|3")).alias("m")).collect()[0].m
    md5_key = df.select(dedup_key_md5("a", "b", "c").alias("m")).collect()[0].m
    assert md5_key == md5_direct

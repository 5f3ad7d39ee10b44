"""Single source of truth for schemas.

The reference duplicates the same 12-field event schema literal in three jobs
(reference: processing/spark/jobs/streaming_to_curated_stream.py:68-81,
batch_to_archive_raw.py:68-81, consumer_batch.py:80-92). Here it lives once.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

# ---------------------------------------------------------------------------
# Reference-domain schema: one clinical-search click event as produced to the
# log stream (column names already snake_cased, as the silver layer does at
# parse time — reference streaming_to_curated_stream.py:127-137).
# ---------------------------------------------------------------------------
CLICK_EVENT_SCHEMA = StructType(
    [
        StructField("date_created", StringType()),  # legacy /Date(ms)/ string
        StructField("session_id", StringType()),
        StructField("document_id", IntegerType()),
        StructField("url", StringType()),
        StructField("title", StringType()),
        StructField("doi", StringType()),
        StructField("keywords", StringType()),
        StructField("clinical_areas", StringType()),  # comma-joined, may lead with ','
        StructField("documents", ArrayType(StringType())),
        StructField("event_ts", StringType()),  # ISO-8601; parsed downstream
        StructField("event_date", StringType()),  # lake partition column
        StructField("dedup_key", StringType()),  # producer-stamped hash
    ]
)

# CSV twin of the click-event schema: CSV cannot carry the `documents`
# array, so it rides as a pipe-joined string (split downstream with the
# same explode(split(...)) normalizer as clinical_areas). Every other
# field is already scalar.
CLICK_EVENT_CSV_SCHEMA = StructType(
    [
        f if f.name != "documents" else StructField("documents", StringType())
        for f in CLICK_EVENT_SCHEMA.fields
    ]
)

# Bronze lineage columns added by the archive job
# (reference batch_to_archive_raw.py:130-161).
ARCHIVE_METADATA_COLUMNS = (
    "kafka_key",
    "topic",
    "partition",
    "offset",
    "kafka_timestamp",
    "ingested_at",
    "ingestion_type",
)

# ---------------------------------------------------------------------------
# Fixture tables (/root/testdata/sf*/, see FIXTURES.md §2).
#
# EVENTS_SCHEMA describes the engine's CANONICAL (normalized) event relation —
# what `sources.readers.load_events` / `streaming.events_stream` emit and what
# lake re-reads of engine output contain. The raw fixture's physical `ts` type
# is an environment detail (TIMESTAMP(MICROS) → TIMESTAMP_NTZ under PySpark
# 4.x; epoch-ns long under legacy nanosAsLong readers) and is normalized to
# epoch-ns long at the read boundary by `timeops.to_epoch_ns`. Do NOT use this
# schema to read the raw fixture directly: pinning LongType over a µs
# timestamp file silently misreads values 1000× (VERDICT r03).
# ---------------------------------------------------------------------------
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # epoch nanoseconds (canonical, normalized)
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),  # JSON string
    ]
)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

EMBEDDINGS_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)

TPCH_SCHEMAS: dict[str, StructType] = {
    "region": StructType(
        [StructField("r_regionkey", IntegerType()), StructField("r_name", StringType())]
    ),
    "nation": StructType(
        [
            StructField("n_nationkey", IntegerType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", IntegerType()),
        ]
    ),
    "customer": StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_name", StringType()),
            StructField("c_nationkey", IntegerType()),
            StructField("c_acctbal", DoubleType()),
            StructField("c_mktsegment", StringType()),
        ]
    ),
    "supplier": StructType(
        [
            StructField("s_suppkey", LongType()),
            StructField("s_name", StringType()),
            StructField("s_nationkey", IntegerType()),
            StructField("s_acctbal", DoubleType()),
        ]
    ),
    "part": StructType(
        [
            StructField("p_partkey", LongType()),
            StructField("p_name", StringType()),
            StructField("p_brand", StringType()),
            StructField("p_type", StringType()),
            StructField("p_size", IntegerType()),
            StructField("p_retailprice", DoubleType()),
        ]
    ),
    "orders": StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderdate", TimestampNTZType()),
            StructField("o_orderpriority", StringType()),
        ]
    ),
    "lineitem": StructType(
        [
            StructField("l_orderkey", LongType()),
            StructField("l_partkey", LongType()),
            StructField("l_suppkey", LongType()),
            StructField("l_linenumber", IntegerType()),
            StructField("l_quantity", DoubleType()),
            StructField("l_extendedprice", DoubleType()),
            StructField("l_discount", DoubleType()),
            StructField("l_tax", DoubleType()),
            StructField("l_returnflag", StringType()),
            StructField("l_linestatus", StringType()),
            StructField("l_shipdate", TimestampNTZType()),
        ]
    ),
}

ALL_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

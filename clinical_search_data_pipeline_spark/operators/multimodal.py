"""Multimodal (binary-column) plumbing: opaque payloads + typed metadata.

Design for a 100 TB multimodal corpus: media lives as opaque `binary`
columns (or object-store pointers) with typed metadata alongside; decode /
feature-extract / resize / frame-sample run as Arrow-batched `mapInPandas`
stages so bytes never leave the executor and Python sees whole record
batches, not rows.

The decode step itself is STUBBED here (no image/audio libs in this
container — clearly marked `NotImplementedError`), but everything Spark-side
is real and tested: schema contracts, batch iteration, partitioning, and a
deterministic metadata extractor whose output is DuckDB-oracle-checked
(`q_media_meta`).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from clinical_search_data_pipeline_spark.registry import register
from clinical_search_data_pipeline_spark.sources.readers import fan_out, read_table

MEDIA_TYPES = ("image", "audio", "video")

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """Fixture adapter: treat each document's UTF-8 bytes as an opaque media
    payload with a deterministic media_type. Real pipelines read the binary
    column straight from parquet."""
    media_type = F.element_at(
        F.array(*[F.lit(m) for m in MEDIA_TYPES]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    # fan_out: mapInPandas stages downstream are narrow — without the
    # spread, Arrow batches of every payload would flow through one task
    # (sources/readers.fan_out).
    return fan_out(docs).select(
        "doc_id",
        media_type.alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


def decode_image(payload: bytes) -> "object":
    """Real decoder hook — requires an image library not present in this
    container. The Spark-side contract (batch shape, schema) is tested via
    `extract_media_meta`; swap this in production."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; wire your decoder here"
    )


def extract_media_meta(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads.

    A deterministic stand-in for a real decoder: dimensions are pure
    functions of the byte length, so the result is oracle-checkable while
    exercising the exact production plumbing (mapInPandas over binary
    columns, explicit output schema).
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            byte_len = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": byte_len.astype("int64"),
                    "width": (byte_len % 640 + 16).astype("int32"),
                    "height": ((byte_len * 7) % 480 + 16).astype("int32"),
                    "n_frames": pdf["media_type"].map(
                        lambda m: 1 if m != "video" else 0
                    ).astype("int32")
                    + (byte_len % 120).astype("int32")
                    * (pdf["media_type"] == "video").astype("int32"),
                }
            )

    return media.mapInPandas(_extract, schema=MEDIA_META_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled 'frame' (byte
    slice stand-in). Demonstrates the 1->N mapInPandas expansion shape a real
    video frame sampler uses (output rows >> input rows, schema explicit)."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_bytes = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i, off in enumerate(range(0, len(payload), every_n_bytes)):
                    out_doc.append(doc_id)
                    out_idx.append(i)
                    out_bytes.append(bytes(payload[off : off + every_n_bytes]))
            yield pd.DataFrame(
                {"doc_id": out_doc, "frame_idx": out_idx, "frame_bytes": out_bytes}
            )

    return media.mapInPandas(_sample, schema=FRAME_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("out_bytes", LongType()),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("feature", StringType()),  # hex digest per 16-byte stride
    ]
)


def resize_media(media: DataFrame, target_bytes: int = 256) -> DataFrame:
    """Resize plumbing: cap each payload at `target_bytes` (the byte-slice
    stand-in for a real thumbnailer — wire PIL/ffmpeg inside `_resize` in
    production; batch shape, schema, and 1:1 row contract are the real
    thing)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["payload"].map(lambda b: bytes(b[:target_bytes]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload": resized,
                    "out_bytes": resized.map(len).astype("int64"),
                }
            )

    return media.mapInPandas(_resize, schema=RESIZED_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """Feature-extraction plumbing: a deterministic digest per payload (the
    embedding-model stand-in; in production the batch loop calls the model
    on the whole Arrow batch — the GPU-friendly shape)."""
    import hashlib as _hashlib

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "feature": pdf["payload"].map(
                        lambda b: _hashlib.md5(bytes(b)).hexdigest()[:FEATURE_DIM]
                    ),
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


@register(
    "q_media_resize",
    oracle="""
SELECT doc_id,
       ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS media_type,
       CAST(least(octet_length(encode(text)), 256) AS BIGINT) AS out_bytes
FROM documents
""",
    tags=("multimodal", "northstar", "pandas-udf"),
)
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage: output size contract oracled (bytes are Spark-side)."""
    resized = resize_media(attach_payload(read_table(spark, sf_dir, "documents")))
    return resized.select("doc_id", "media_type", "out_bytes")


@register(
    "q_media_features",
    oracle=f"""
SELECT doc_id, substring(md5(text), 1, {FEATURE_DIM}) AS feature
FROM documents
""",
    tags=("multimodal", "northstar", "pandas-udf"),
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction: md5-derived stand-in digest — bit-identical in
    DuckDB (payload bytes are the UTF-8 text, so md5(payload)==md5(text))."""
    return extract_features(attach_payload(read_table(spark, sf_dir, "documents")))


@register(
    "q_media_meta",
    oracle="""
WITH m AS (
  SELECT doc_id,
         ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS media_type,
         octet_length(encode(text)) AS byte_len
  FROM documents
)
SELECT doc_id, media_type, byte_len,
       CAST(byte_len % 640 + 16 AS INT) AS width,
       CAST((byte_len * 7) % 480 + 16 AS INT) AS height,
       CAST(CASE WHEN media_type = 'video' THEN byte_len % 120 ELSE 1 END AS INT) AS n_frames
FROM m
""",
    tags=("multimodal", "northstar", "pandas-udf"),
)
def q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_media_meta(attach_payload(read_table(spark, sf_dir, "documents")))


@register(
    "q_media_frames",
    oracle="""
WITH m AS (
  SELECT doc_id, octet_length(encode(text)) AS byte_len FROM documents
),
f AS (
  SELECT doc_id, byte_len,
         unnest(range(0, CAST(ceil(byte_len / 64.0) AS BIGINT))) AS frame_idx
  FROM m
)
SELECT doc_id,
       CAST(frame_idx AS INT) AS frame_idx,
       CAST(least(64, byte_len - frame_idx * 64) AS INT) AS frame_len
FROM f
""",
    tags=("multimodal", "northstar", "pandas-udf"),
)
def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1->N frame expansion via mapInPandas. DuckDB cannot slice blobs, so
    the oracle checks the expansion *shape* — (doc, frame index, frame byte
    length) — which pins row multiplicity and slicing arithmetic; the bytes
    themselves are covered by test_multimodal-style reassembly in Spark."""
    frames = sample_frames(attach_payload(read_table(spark, sf_dir, "documents")))
    return frames.select(
        "doc_id",
        "frame_idx",
        F.length("frame_bytes").cast("int").alias("frame_len"),
    )

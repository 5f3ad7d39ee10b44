"""Bucketed tables: shuffle-free co-located joins.

At 100 TB the fact-fact join (orders x lineitem) shuffles both sides every
run; bucketing both tables by the join key at write time moves that shuffle
to ingestion — every subsequent join/aggregation on the key is
exchange-free (Spark scans bucket i of each side into the same task).

`spark.sql.sources.bucketing.enabled` is on by default; bucket metadata
lives in the session catalog (saveAsTable), so this requires a warehouse —
session.py pins a local one. Bucket counts should be sized so one bucket
of the larger table fits an executor's scan budget (~shuffle-partition
sizing rules); both sides MUST use the same count or Spark falls back to a
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (optionally sort-within-bucket) catalog table."""
    writer = (
        df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    )
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)

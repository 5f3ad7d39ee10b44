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
shuffle. The bucket function is Spark's Murmur3-pmod — the same hash
`repartition(n, key)` applies — so the pre-write repartition below lands
each bucket's rows in exactly one task => one file per bucket, keeping the
sorted-scan property usable. Pass `path_root` to create the table EXTERNAL
(explicit location) so the layout lives with the lake rather than the
session's warehouse dir.

Driver-verified end to end by `layout.q_bucketed_join` (revenue by order
status computed THROUGH the bucketed round-trip against the plain-parquet
DuckDB oracle); the zero-exchange plan itself is pinned in
tests/test_bucketed.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_JOIN_BUCKETS = 8


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = N_JOIN_BUCKETS,
    sort_col: str | None = None,
    path_root: str | None = None,
) -> str:
    """Persist as a bucketed (sort-within-bucket) catalog table; returns
    the table name. `sort_col` defaults to the bucket column — sorted
    buckets are what make the downstream SortMergeJoin exchange-AND-
    sort-free when each bucket is a single file."""
    writer = (
        df.repartition(n_buckets, F.col(bucket_col))
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(sort_col or bucket_col)
    )
    if path_root is not None:
        writer = writer.option("path", f"{path_root}/{table}")
    writer.saveAsTable(table)
    return table


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)

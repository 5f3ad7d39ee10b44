"""Partitioned parquet lake sinks + compaction (reference K1-K4).

The reference controls small files with `coalesce(1)` before every write and
an end-of-run compaction that rewrites the lake and atomically swaps
directories via JVM Hadoop FileSystem delete+rename
(streaming_to_curated_stream.py:162,186-214). Both are anti-patterns at
100 TB: `coalesce(1)` serializes the write; the FS swap is non-transactional
and driver-orchestrated. Here:

* writes stay fully parallel — AQE's coalescePartitions sizes output splits;
* `compact()` is a pure-Spark rewrite using dynamic partition overwrite
  (`partitionOverwriteMode=dynamic`, set by session.RUNTIME_CONFS): each
  partition is replaced atomically-per-partition by the committed job, no
  JVM FS calls, no full-lake lock.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clinical_search_data_pipeline_spark.session import apply_runtime_confs


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_col: str = "event_date",
    mode: str = "append",
    target_files_per_partition: int | None = None,
) -> None:
    """Append/overwrite a hive-partitioned parquet lake (reference K1/K2).

    `target_files_per_partition` repartitions by the partition column first —
    the scale-aware replacement for the reference's `coalesce(1)`: one
    shuffle, then each lake partition is written by a bounded set of tasks.
    """
    out = df
    if target_files_per_partition:
        out = df.repartition(target_files_per_partition, partition_col)
    out.write.mode(mode).partitionBy(partition_col).parquet(path)


def compact(
    spark: SparkSession,
    path: str,
    partition_col: str = "event_date",
    target_files_per_partition: int = 1,
) -> None:
    """Rewrite a partitioned lake to `target_files_per_partition` files per
    partition (reference K4, re-expressed).

    Dynamic partition overwrite replaces exactly the partitions present in
    the rewrite — concurrent appends to *other* partitions are untouched.
    """
    apply_runtime_confs(spark)
    # compact() reads and overwrites the SAME path; that is only safe when
    # overwrite replaces just the partitions present in the rewrite. If the
    # host locked the conf (apply_runtime_confs swallows set failures), a
    # static overwrite would drop every partition not in this rewrite — fail
    # loudly instead of corrupting the lake.
    mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    if mode.lower() != "dynamic":
        raise RuntimeError(
            "compact() requires spark.sql.sources.partitionOverwriteMode=dynamic "
            f"(got {mode!r}); refusing an in-place static overwrite"
        )
    # NOTE: appends racing into a partition *while it is being compacted* can
    # still be replaced at commit; run compaction when the partition is cold
    # (the reference has the same constraint on its FS rename swap).
    df = spark.read.parquet(path)
    (
        df.repartition(target_files_per_partition, partition_col)
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(path)
    )

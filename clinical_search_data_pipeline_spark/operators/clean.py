"""Cleaning / normalization operators.

Generalizes the reference's inline cleanup idioms (SURVEY.md §2.4, §2.5,
§2.10) into reusable builders:

* multi-value string normalization — the reference explodes the comma-joined
  ``ClinicalAreas`` field (which carries a leading comma, so empty tokens must
  be dropped after trim): etl_to_analytics_mart.py:161-167.
* batch deduplication — the batch-equivalent of the reference's streaming
  watermark dedup (streaming_to_curated_stream.py:144-151): keep exactly one
  row per key, deterministically (explicit tie-break ordering, unlike
  ``dropDuplicates`` whose survivor is arrival-order dependent).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def normalize_multivalue(
    df: DataFrame,
    src: str | Column,
    out: str = "value",
    sep: str = ",",
) -> DataFrame:
    """Explode a separator-joined multi-value string into one trimmed,
    non-empty value per row.

    Semantics (must match the DuckDB oracle exactly — SURVEY.md §7.3 risk 4):
    null/empty source rows are dropped, tokens are trimmed, and empty tokens
    (e.g. from a leading separator) are dropped.
    """
    src_col = F.col(src) if isinstance(src, str) else src
    return (
        df.filter(src_col.isNotNull() & (src_col != ""))
        .withColumn(out, F.explode(F.split(src_col, sep)))
        .withColumn(out, F.trim(F.col(out)))
        .filter(F.col(out) != "")
    )


def dedup_keep_first(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
) -> DataFrame:
    """Keep exactly one row per key tuple, ordered by ``order_by``.

    Deterministic batch dedup: callers must make ``order_by`` a total order
    within each key group (e.g. ts then a unique id) so the survivor — hence
    the value hash — is stable. Plans as a single hash-shuffle + window; at
    100 TB scale prefer pre-bucketing the lake by the dedup key so the
    shuffle is avoided entirely.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def drop_null_keys(df: DataFrame, *cols: str) -> DataFrame:
    """Null-guard filter (reference streaming_to_curated_stream.py:139)."""
    pred = None
    for c in cols:
        cond = F.col(c).isNotNull()
        pred = cond if pred is None else (pred & cond)
    return df.filter(pred) if pred is not None else df

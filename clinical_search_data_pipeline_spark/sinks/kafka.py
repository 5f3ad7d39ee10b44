"""Kafka sink (reference K9): key/value framing for `df.write.format("kafka")`.

The reference's producer sends key=session_id, value=JSON, acks=1
(producer_base.py:76-89; producer.py:151-155). In Spark the same contract is
a DataFrame with `key`/`value` binary columns. No broker exists in the test
container, so only the framing (pure projection) is unit-tested; `publish`
is the thin I/O wrapper.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def frame_for_kafka(df: DataFrame, key_col: str, value_cols: list[str] | None = None) -> DataFrame:
    """Project to the Kafka sink contract: key = key_col, value = JSON of the
    selected columns (all columns by default)."""
    cols = value_cols or [c for c in df.columns]
    value: Column = F.to_json(F.struct(*[F.col(c) for c in cols]))
    return df.select(
        F.col(key_col).cast("string").alias("key"), value.alias("value")
    )


def publish(df: DataFrame, topic: str, bootstrap_servers: str) -> None:
    (
        df.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .save()
    )

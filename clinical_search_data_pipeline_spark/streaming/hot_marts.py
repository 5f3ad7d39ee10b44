"""Hot-mart micro-batch fan-out (reference T9).

Reference: streaming_to_analytics_mart_realtime.py:345-381 — each micro-batch
is cached, pushed through 4 mart pipelines, written to Postgres, unpersisted.
Here the mart builders are the *same* batch functions from operators/marts.py
(single implementation, batch == streaming semantics), sinks are injected
callables (JDBC upsert in production — sinks/jdbc.py — anything in tests),
and the snapshot instant is a parameter, not wall clock.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

from pyspark.sql import DataFrame

from clinical_search_data_pipeline_spark.operators import marts

Sink = Callable[[DataFrame, str], None]


def default_mart_builders(as_of: str, as_of_sec: int) -> Mapping[str, Callable[[DataFrame], DataFrame]]:
    return {
        "mart_traffic_minute": marts.traffic_by_minute,
        "mart_top_docs": lambda df: marts.top_documents(df, as_of=as_of),
        "mart_clinical_trend": lambda df: marts.clinical_trend(
            df, as_of_sec=as_of_sec, as_of=as_of
        ),
        "mart_anomaly_sessions": lambda df: marts.anomaly_sessions(df, as_of=as_of),
    }


def make_hot_mart_processor(
    sink: Sink,
    as_of: str = marts.AS_OF_STR,
    as_of_sec: int = marts.AS_OF_SEC,
    builders: Mapping[str, Callable[[DataFrame], DataFrame]] | None = None,
):
    """foreachBatch callback: cache -> N mart pipelines -> sink -> unpersist."""
    builders = builders or default_mart_builders(as_of, as_of_sec)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df.cache()
        try:
            for table, build in builders.items():
                sink(build(batch_df), table)
        finally:
            batch_df.unpersist()

    return _process

"""Batch and streaming source adapters."""

from clinical_search_data_pipeline_spark.sources.readers import (  # noqa: F401
    load_events,
    read_json_log,
    read_table,
)

"""Sink adapters: partitioned parquet lake, compaction, JDBC, Kafka."""

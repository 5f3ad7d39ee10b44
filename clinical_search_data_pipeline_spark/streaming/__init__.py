"""Structured Streaming pipelines (watermark dedup, hot marts, runners)."""

"""clinical_search_data_pipeline_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the query & data-processing
capabilities of the reference clickstream pipeline
(SangjunRyu/clinical-search-data-pipeline): its hard-coded DataFrame jobs are
generalized into a reusable, parameterized operator/query library, extended
with LLM-training-data-pipeline operators (dedup, similarity search,
multimodal plumbing, text analysis) designed for a 1000-executor / 100 TB
deployment while remaining verifiable on small local fixtures.

Layout:
    session     SparkSession factory + engine runtime confs (UTC, AQE, Arrow)
    schemas     single source of truth for StructTypes (reference + fixtures)
    registry    query registry: name -> (spark builder, DuckDB oracle SQL)
    sources/    batch + streaming readers (parquet lake, JSON, Kafka)
    sinks/      partitioned parquet, compaction, JDBC (overwrite/append/upsert), Kafka
    functions/  column-level helpers (time arithmetic, hashing, text, vectors)
    operators/  DataFrame -> DataFrame builders (marts, relational, dedup,
                similarity, text analysis, multimodal)
    streaming/  Structured Streaming pipelines (watermark dedup, hot marts)
    plans/      physical-plan inspection utilities (pushdown/broadcast asserts)
"""

__version__ = "0.1.0"

"""End-to-end pipeline jobs.

One module per reference job (SURVEY.md §0 inventory), each a parameterized
composition of engine operators + sinks — what a user of the reference runs
day-to-day. I/O endpoints (paths, sinks) are injected so the same job runs
against S3/Kafka/Postgres in production and tmp dirs/recorders in tests.

| job module        | reference job file                                  |
|-------------------|-----------------------------------------------------|
| silver_streaming  | processing/spark/jobs/streaming_to_curated_stream.py|
| bronze_archive    | processing/spark/jobs/batch_to_archive_raw.py       |
| mart_etl          | processing/spark/jobs/etl_to_analytics_mart.py      |
| mart_load         | processing/spark/jobs/load_to_postgres.py           |
| hot_marts_realtime| .../streaming_to_analytics_mart_realtime.py         |
"""

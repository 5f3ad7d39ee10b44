"""Bounded streaming queries exposed through the registry.

Each stages the fixture events parquet into a file-streaming source dir,
runs a real Structured Streaming query to completion (availableNow), and
returns the materialized result — so the driver's batch-oriented check
exercises true streaming execution. Both results are deterministic, hence
fully ORACLED (stronger than the rows-only fallback the driver allows for
streaming ops):

* q_stream_dedup_keys  — watermark dedup; output = the distinct key set, so
  survivor nondeterminism (which physical row wins) cannot leak into values.
* q_stream_traffic_minute — tumbling 1-minute event-time window counts in
  complete mode; equals the batch per-minute aggregation.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_search_data_pipeline_spark.functions import timeops
from clinical_search_data_pipeline_spark.functions.timeops import (
    duck_epoch_sec,
    duck_event_date,
    duck_sec_to_ts_string,
)
from clinical_search_data_pipeline_spark.plans.introspect import (
    collect_stream_lint,
)
from clinical_search_data_pipeline_spark.registry import register
from clinical_search_data_pipeline_spark.session import apply_runtime_confs
from clinical_search_data_pipeline_spark.sources.readers import load_events
from clinical_search_data_pipeline_spark.streaming.dedup import watermark_dedup
from clinical_search_data_pipeline_spark.streaming.runner import run_to_memory


def stage_events_source(sf_dir: str) -> str:
    """Copy the fixture events parquet into a dedicated source directory
    (file streaming sources list a directory). Keyed by the source file's
    mtime+size fingerprint so a regenerated fixture is re-staged, never
    silently served stale."""
    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    fingerprint = f"{int(st.st_mtime)}_{st.st_size}"
    staging = os.path.join(
        tempfile.gettempdir(),
        f"csdp_stream_src_{sf_dir.strip('/').replace('/', '_')}_{fingerprint}",
    )
    os.makedirs(staging, exist_ok=True)
    dst = os.path.join(staging, "events.parquet")
    if not os.path.exists(dst):
        shutil.copyfile(src, dst)
    return staging


def events_stream(spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 10) -> DataFrame:
    """File-backed streaming scan of the canonical event relation (stands in
    for the Kafka source S2; rate-limited per micro-batch like reference T8).

    The stream schema is taken from the staged file's own footer (one batch
    metadata read), NOT pinned a priori: round 3 proved that pinning ``ts``
    as LongType over a TIMESTAMP(MICROS) file silently reinterprets raw µs
    int64s as ns — wrong answers, no error (VERDICT r03 #2). Reading the
    file's native type and normalizing through the same `to_epoch_ns` path
    as the batch reader keeps stream and batch bit-identical.
    """
    apply_runtime_confs(spark)
    src = stage_events_source(sf_dir)
    physical = spark.read.parquet(src).schema
    ts_dtype = physical["ts"].dataType
    stream = (
        spark.readStream.schema(physical)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src)
    )
    return (
        stream.withColumn("ts", timeops.to_epoch_ns(ts_dtype))
        .withColumn("ts_sec", timeops.epoch_sec("ts"))
        .withColumn("event_ts", timeops.ts_micros("ts"))
        .withColumn("event_date", timeops.event_date("ts"))
    )


@register(
    "q_stream_dedup_keys",
    oracle=f"""
SELECT DISTINCT user_id, event_type,
       {duck_event_date('ts')} AS event_date
FROM events
""",
    tags=("streaming", "dedup", "reference"),
)
def q_stream_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming watermark dedup (D1): distinct key set after
    `withWatermark(10 min).dropDuplicates` over the replayed event stream."""
    deduped = watermark_dedup(
        events_stream(spark, sf_dir),
        keys=["user_id", "event_type", "event_date"],
    ).select("user_id", "event_type", "event_date")
    table = run_to_memory(deduped, output_mode="append", shuffle_partitions=8)
    return spark.table(table)


@register(
    "q_stream_traffic_minute",
    oracle=f"""
SELECT {duck_sec_to_ts_string(f"(({duck_epoch_sec('ts')}) // 60) * 60")} AS event_minute,
       count(*) AS event_count
FROM events GROUP BY 1
""",
    tags=("streaming", "reference", "hot"),
)
def q_stream_traffic_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregation (T2/A6) run as a real stream;
    complete output mode makes the bounded result equal the batch answer."""
    stream = events_stream(spark, sf_dir)
    agg = (
        stream.groupBy(F.window("event_ts", "1 minute").alias("win"))
        .agg(F.count("*").alias("event_count"))
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("event_minute"),
            "event_count",
        )
    )
    table = run_to_memory(agg, output_mode="complete", shuffle_partitions=8)
    return spark.table(table)


@register(
    "q_stream_anomaly",
    oracle=f"""
SELECT user_id AS session_id,
       {duck_sec_to_ts_string(f"(({duck_epoch_sec('ts')}) // 300) * 300")} AS window_start,
       count(*) AS click_count,
       CASE WHEN count(*) >= 3 THEN 'CRITICAL' ELSE 'WARNING' END AS severity
FROM events
GROUP BY 1, 2 HAVING count(*) >= 2
""",
    tags=("streaming", "reference", "hot"),
)
def q_stream_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot anomaly mart (A9/T2/P11) as a real stream: tumbling 5-minute
    window counts per session, threshold filter + severity grading applied
    to the aggregate (reference
    streaming_to_analytics_mart_realtime.py:284-300)."""
    stream = events_stream(spark, sf_dir)
    agg = (
        stream.groupBy(
            F.col("user_id").alias("session_id"),
            F.window("event_ts", "5 minutes").alias("win"),
        )
        .agg(F.count("*").alias("click_count"))
        .filter(F.col("click_count") >= 2)
        .select(
            "session_id",
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "click_count",
            F.when(F.col("click_count") >= 3, F.lit("CRITICAL"))
            .otherwise(F.lit("WARNING"))
            .alias("severity"),
        )
    )
    table = run_to_memory(agg, output_mode="complete", shuffle_partitions=8)
    return spark.table(table)


@register(
    "q_stream_stream_join",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, event_type, {duck_epoch_sec('ts')} AS sec FROM events
)
SELECT c.user_id,
       c.event_id AS click_id,
       p.event_id AS purchase_id,
       p.sec - c.sec AS lag_sec
FROM e c JOIN e p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.sec >= c.sec AND p.sec <= c.sec + 300
""",
    tags=("streaming", "join", "northstar"),
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with watermarks: purchases attributed to
    clicks by the same user within 5 minutes. Both sides carry watermarks
    and the join has an event-time range bound, so state for each side is
    evicted once the other side's watermark passes — the bounded-state
    formulation of the attribution join (absent from the reference, which
    has no streaming joins at all).

    The attribution contract is WHOLE-SECOND granularity (p_sec within
    [c_sec, c_sec+300]) — the exact predicate is on epoch seconds on BOTH
    engines (sub-second parts must not decide boundary pairs). The
    event-time range condition is a strict SUPERSET of the seconds predicate
    ([-1 s, +301 s]); it exists for Spark's watermark-based state eviction,
    while the seconds predicate decides membership."""
    s = events_stream(spark, sf_dir)
    clicks = (
        s.filter("event_type = 'click'")
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("event_ts").alias("click_ts"),
            F.col("ts_sec").alias("click_sec"),
        )
        .withWatermark("click_ts", "10 minutes")
    )
    purchases = (
        s.filter("event_type = 'purchase'")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("event_ts").alias("purchase_ts"),
            F.col("ts_sec").alias("purchase_sec"),
        )
        .withWatermark("purchase_ts", "10 minutes")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        # state-eviction range on the watermarked event-time columns
        & (F.col("purchase_ts") >= F.col("click_ts") - F.expr("INTERVAL 1 SECOND"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 301 SECONDS"))
        # exact whole-second attribution predicate (the contract)
        & (F.col("purchase_sec") >= F.col("click_sec"))
        & (F.col("purchase_sec") <= F.col("click_sec") + 300),
    ).select(
        "user_id",
        "click_id",
        "purchase_id",
        (F.col("purchase_sec") - F.col("click_sec")).alias("lag_sec"),
    )
    table = run_to_memory(joined, output_mode="append", shuffle_partitions=8)
    return spark.table(table)


@register(
    "q_stream_stream_left_outer",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, event_type, {duck_epoch_sec('ts')} AS sec FROM events
),
bounds AS (
  SELECT least(max(sec) FILTER (WHERE event_type = 'click'),
               max(sec) FILTER (WHERE event_type = 'purchase')) AS wm_sec
  FROM e
)
SELECT c.user_id,
       c.event_id AS click_id,
       p.event_id AS purchase_id,
       p.sec - c.sec AS lag_sec
FROM e c
LEFT JOIN e p
  ON c.user_id = p.user_id
 AND p.event_type = 'purchase'
 AND p.sec >= c.sec AND p.sec <= c.sec + 300
CROSS JOIN bounds
WHERE c.event_type = 'click' AND c.sec <= bounds.wm_sec - 302
""",
    tags=("streaming", "join", "outer", "northstar"),
)
def q_stream_stream_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join: every click, with its attributed
    purchases or a null row if none arrived in the window. Unlike the inner
    join, null-extended rows can only be emitted once the watermark proves
    no match can still arrive — so the deterministic contract is scoped to
    clicks at least (window + 2 s) older than the FINAL GLOBAL WATERMARK.
    Spark's multi-input watermark is the MIN over each input's max event
    time (spark.sql.streaming.multipleWatermarkPolicy=min), so the bound is
    least(max click time, max purchase time) on both engines; the margin
    keeps Spark's microsecond eviction boundary out of the compared set,
    whatever its exact <=/< semantics.
    Same whole-second attribution predicate as q_stream_stream_join."""
    s = events_stream(spark, sf_dir)
    clicks = (
        s.filter("event_type = 'click'")
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("event_ts").alias("click_ts"),
            F.col("ts_sec").alias("click_sec"),
        )
        .withWatermark("click_ts", "0 seconds")
    )
    purchases = (
        s.filter("event_type = 'purchase'")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("event_ts").alias("purchase_ts"),
            F.col("ts_sec").alias("purchase_sec"),
        )
        .withWatermark("purchase_ts", "0 seconds")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts") - F.expr("INTERVAL 1 SECOND"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 301 SECONDS"))
        & (F.col("purchase_sec") >= F.col("click_sec"))
        & (F.col("purchase_sec") <= F.col("click_sec") + 300),
        "leftOuter",
    ).select(
        "user_id",
        "click_id",
        "purchase_id",
        (F.col("purchase_sec") - F.col("click_sec")).alias("lag_sec"),
        "click_sec",
    )
    table = run_to_memory(joined, output_mode="append", shuffle_partitions=8)
    # Margin-safe deterministic cut, same bound as the oracle: Spark's
    # multipleWatermarkPolicy=min means the final global watermark is the
    # MIN over each input's max event time, i.e. least(max click ts,
    # max purchase ts) — NOT the global max over all events (an unrelated
    # late event type must not widen the emitted set).
    mx = (
        load_events(spark, sf_dir)
        .agg(
            F.least(
                F.max(F.when(F.col("event_type") == "click", F.col("ts_sec"))),
                F.max(F.when(F.col("event_type") == "purchase", F.col("ts_sec"))),
            ).alias("mx")
        )
    )
    return (
        spark.table(table)
        .join(F.broadcast(mx))
        .filter(F.col("click_sec") <= F.col("mx") - 302)
        .drop("click_sec", "mx")
    )


SESSION_GAP_SEC = 1800


@register(
    "q_stream_session_window",
    oracle=f"""
WITH e AS (
  SELECT user_id, {duck_epoch_sec('ts')} AS ts_sec FROM events
),
flagged AS (
  SELECT user_id, ts_sec,
         CASE WHEN ts_sec - lag(ts_sec) OVER w <= {SESSION_GAP_SEC} THEN 0 ELSE 1 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec)
),
idx AS (
  SELECT user_id, ts_sec,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_sec
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS si
  FROM flagged
),
sess AS (
  SELECT user_id,
         min(ts_sec) AS start_sec,
         max(ts_sec) + {SESSION_GAP_SEC} AS end_sec,
         count(*) AS n_events
  FROM idx GROUP BY user_id, si
),
wm AS (SELECT max({duck_epoch_sec('ts')}) AS mx FROM events)
SELECT s.user_id,
       {duck_sec_to_ts_string('s.start_sec')} AS session_start,
       {duck_sec_to_ts_string('s.end_sec')} AS session_end,
       s.n_events
FROM sess s, wm WHERE s.end_sec <= wm.mx
""",
    tags=("streaming", "sessionize", "northstar"),
)
def q_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native streaming sessionization (T10 streaming form): Spark's
    `session_window` merges an event's [ts, ts+gap) window with any
    TOUCHING-or-overlapping neighbor (gap of exactly `gap` sec still merges
    — note the INCLUSIVE `<= gap` in the oracle, unlike the batch
    `q_sessionize` islands formulation whose break is `> gap`); append mode
    emits a session once the watermark passes its end (last event + gap), so
    sessions still open at stream end are correctly withheld — the oracle
    applies the same watermark cut (end_sec <= max event time, 0s delay).
    State is per (user, open-session) and evicted on emission — bounded by
    active users, the production-correct formulation. The
    applyInPandasWithState twin (custom eviction logic) lives in
    streaming/stateful.py."""
    s = events_stream(spark, sf_dir).withColumn(
        "sec_ts", F.timestamp_seconds(F.col("ts_sec"))
    )
    agg = (
        s.withWatermark("sec_ts", "0 seconds")
        .groupBy(
            "user_id",
            F.session_window("sec_ts", f"{SESSION_GAP_SEC} seconds").alias("sw"),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("sw.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )
    table = run_to_memory(agg, output_mode="append", shuffle_partitions=8)
    return spark.table(table)


@register(
    "q_stream_enriched_traffic",
    oracle="""
SELECT e.event_type,
       CASE WHEN e.user_id % 2 = 0 THEN 'EU' ELSE 'US' END AS region,
       count(*) AS event_count
FROM events e
GROUP BY 1, 2
""",
    tags=("streaming", "join", "reference"),
)
def q_stream_enriched_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: the event stream joins a small static
    dimension (broadcast per micro-batch — no stream state), then
    aggregates in complete mode. The pattern behind every 'enrich the
    stream with a reference table' pipeline; the reference has no joins in
    its streaming path at all."""
    stream = events_stream(spark, sf_dir).withColumn(
        "dim_key", F.col("user_id") % 16
    )
    dim = spark.range(16).select(
        F.col("id").alias("dim_key"),
        F.when(F.col("id") % 2 == 0, "EU").otherwise("US").alias("region"),
    )
    agg = (
        stream.join(F.broadcast(dim), "dim_key")
        .groupBy("event_type", "region")
        .agg(F.count("*").alias("event_count"))
    )
    table = run_to_memory(agg, output_mode="complete", shuffle_partitions=8)
    return spark.table(table)


@register(
    "q_stream_running_counts",
    oracle="""
SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
""",
    tags=("streaming", "stateful", "northstar"),
)
def q_stream_running_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary stateful streaming (applyInPandasWithState): per-user
    cumulative counters emitted every micro-batch. Counts are monotone, so
    the max over all emitted updates equals the batch count regardless of
    micro-batch boundaries — making a *stateful* streaming op fully
    oracle-checkable."""
    from clinical_search_data_pipeline_spark.streaming.stateful import running_counts

    stream = events_stream(spark, sf_dir).select("user_id")
    table = run_to_memory(running_counts(stream), output_mode="update", shuffle_partitions=8)
    return (
        spark.table(table)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )


# ---------------------------------------------------------------------------
# Streaming curation: the quality gate applied at ingest time
# ---------------------------------------------------------------------------


def stage_documents_source(sf_dir: str) -> str:
    """documents twin of stage_events_source (same mtime+size keying)."""
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    fingerprint = f"{int(st.st_mtime)}_{st.st_size}"
    staging = os.path.join(
        tempfile.gettempdir(),
        f"csdp_stream_docs_{sf_dir.strip('/').replace('/', '_')}_{fingerprint}",
    )
    os.makedirs(staging, exist_ok=True)
    dst = os.path.join(staging, "documents.parquet")
    if not os.path.exists(dst):
        shutil.copyfile(src, dst)
    return staging


def documents_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 10
) -> DataFrame:
    """File-backed streaming scan of the document corpus — the ingest-time
    twin of the batch documents relation (schema from the staged footer,
    per-trigger rate limit like events_stream)."""
    apply_runtime_confs(spark)
    src = stage_documents_source(sf_dir)
    physical = spark.read.parquet(src).schema
    return (
        spark.readStream.schema(physical)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src)
    )


def _stream_corpus_filter_oracle() -> str:
    # The streaming twin shares the batch contract EXACTLY — same SQL, plus
    # a marker line so the duplicate-oracle hygiene guard sees a deliberate
    # twin rather than a mislabeled registration.
    from clinical_search_data_pipeline_spark.operators.pipeline import (
        CORPUS_FILTER_ORACLE,
    )

    return CORPUS_FILTER_ORACLE + "\n-- streaming twin of q_corpus_filter\n"


@register(
    "q_stream_corpus_filter",
    oracle=_stream_corpus_filter_oracle(),
    tags=("streaming", "pipeline", "quality", "northstar"),
)
def q_stream_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus quality gate applied per micro-batch at ingest: corpus_filter
    is a NARROW projection, so streaming it is watermark-free and its
    availableNow output is bit-identical to the batch run (pytest-pinned) —
    the shape a 100 TB pipeline uses to score documents as they land
    instead of re-scanning the lake."""
    from clinical_search_data_pipeline_spark.operators.pipeline import corpus_filter

    scored = corpus_filter(documents_stream(spark, sf_dir))
    table = run_to_memory(scored, output_mode="append", shuffle_partitions=8)
    return spark.table(table)


# ---------------------------------------------------------------------------
# Streaming incremental dedup: batch-vs-frozen-corpus admission at ingest
# ---------------------------------------------------------------------------


def stage_incremental_batch_source(spark: SparkSession, sf_dir: str, n_files: int = 4) -> str:
    """Stage the batch side of the incremental-dedup fixture partition
    (doc_id >= INCREMENT_SPLIT) as `n_files` parquet files so an
    availableNow run with maxFilesPerTrigger=1 genuinely processes MULTIPLE
    micro-batches (the single-file staging dirs always collapse to one).
    Same mtime+size fingerprint keying as stage_events_source."""
    from clinical_search_data_pipeline_spark.operators.curation import INCREMENT_SPLIT

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    fingerprint = f"{int(st.st_mtime)}_{st.st_size}_{n_files}"
    staging = os.path.join(
        tempfile.gettempdir(),
        f"csdp_stream_incr_{sf_dir.strip('/').replace('/', '_')}_{fingerprint}",
    )
    if not os.path.exists(os.path.join(staging, "_SUCCESS")):
        (
            spark.read.parquet(src)
            .filter(F.col("doc_id") >= INCREMENT_SPLIT)
            .repartitionByRange(n_files, "doc_id")
            .write.mode("overwrite")
            .parquet(staging)
        )
    return staging


def _stream_incremental_oracle() -> str:
    # The micro-batch-invariant half of q_incremental_dedup's contract:
    # each batch doc judged against the FROZEN corpus only (operators/
    # curation.py batch_vs_corpus docstring explains why micro-batch
    # boundaries cannot change these rows).
    from clinical_search_data_pipeline_spark.operators.curation import INCREMENT_SPLIT
    from clinical_search_data_pipeline_spark.operators.fragments import (
        _DUCK_SHINGLES_CTE,
        JACCARD_THRESHOLD,
    )

    s = INCREMENT_SPLIT
    return f"""
WITH {_DUCK_SHINGLES_CTE},
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::DOUBLE AS c
  FROM sh a JOIN sh b ON a.shingle = b.shingle
  WHERE a.doc_id < {s} AND b.doc_id >= {s}
  GROUP BY 1, 2
),
p AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i JOIN sz sa ON sa.doc_id = i.doc_a JOIN sz sb ON sb.doc_id = i.doc_b
  WHERE i.c / (sa.n + sb.n - i.c) >= {JACCARD_THRESHOLD}
),
per_doc AS (SELECT doc_b AS doc_id, count(*) AS cm FROM p GROUP BY 1)
SELECT d.doc_id,
       CASE WHEN coalesce(cm, 0) > 0 THEN 'dup_of_corpus' ELSE 'admitted' END AS status,
       coalesce(cm, 0) AS n_corpus_matches
FROM documents d LEFT JOIN per_doc USING (doc_id)
WHERE d.doc_id >= {s}
"""


@register(
    "q_stream_incremental_dedup",
    oracle=_stream_incremental_oracle(),
    tags=("streaming", "curation", "dedup", "northstar"),
)
def q_stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time dedup against a standing corpus (VERDICT r05 #7): the
    frozen corpus prefix index is built ONCE as a static side; incoming
    documents stream in over multiple micro-batches (maxFilesPerTrigger=1
    over a multi-file staging dir) and each micro-batch runs
    `batch_vs_corpus` inside foreachBatch, appending its verdicts to the
    sink — exactly how a 100 TB pipeline admits deltas without ever
    re-pairing the corpus against itself. Per-doc verdicts are
    micro-batch-invariant (see batch_vs_corpus), so the accumulated result
    equals the one-shot batch run and the query is fully oracled."""
    from clinical_search_data_pipeline_spark.operators.curation import (
        INCREMENT_SPLIT,
        batch_vs_corpus,
        corpus_prefix_index,
    )
    from clinical_search_data_pipeline_spark.sources.readers import read_table
    from clinical_search_data_pipeline_spark.streaming.runner import (
        run_foreach_batch,
    )

    apply_runtime_confs(spark)
    corpus = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < INCREMENT_SPLIT
    )
    index = corpus_prefix_index(corpus)

    staging = stage_incremental_batch_source(spark, sf_dir)
    schema = spark.read.parquet(staging).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    out_dir = tempfile.mkdtemp(prefix="csdp_incr_out_")

    def admit(batch_df: DataFrame, _batch_id: int) -> None:
        verdicts = batch_vs_corpus(index, batch_df)
        collect_stream_lint(verdicts)
        verdicts.write.mode("append").parquet(out_dir)

    run_foreach_batch(stream, admit, shuffle_partitions=8)
    return spark.read.parquet(out_dir)


# ---------------------------------------------------------------------------
# Streaming DSIR admission gate: frozen-model importance scoring at ingest
# ---------------------------------------------------------------------------


def _stream_dsir_oracle() -> str:
    # Score ONLY the batch partition (doc_id >= INCREMENT_SPLIT) under the
    # model fit ONLY on the standing corpus (doc_id < INCREMENT_SPLIT);
    # unseen buckets take the smoothed zero-count ratio — the LEFT-join
    # default in importance.dsir_score. Scores depend on one document +
    # the frozen model (dense over the whole bucket domain, so zero-count
    # buckets carry the smoothed ratio), so micro-batch boundaries cannot
    # change any row.
    from clinical_search_data_pipeline_spark.operators.curation import (
        INCREMENT_SPLIT,
    )
    from clinical_search_data_pipeline_spark.operators.fragments import (
        _DUCK_FEATS_CTE,
        DSIR_GATE,
        N_BUCKETS,
        TARGET_LANG,
    )

    s = INCREMENT_SPLIT
    return f"""
WITH {_DUCK_FEATS_CTE},
cnt AS (
  SELECT bucket, count(*) AS n_raw,
         count(*) FILTER (WHERE lang = '{TARGET_LANG}') AS n_t
  FROM feats WHERE doc_id < {s} GROUP BY bucket
),
tot AS (SELECT sum(n_raw) AS t_r, sum(n_t) AS t_t FROM cnt),
lr AS (
  SELECT b.bucket,
         ln((coalesce(n_t, 0) + 1) / (t_t + {N_BUCKETS}.0))
           - ln((coalesce(n_raw, 0) + 1) / (t_r + {N_BUCKETS}.0)) AS lr
  FROM (SELECT range AS bucket FROM range(0, {N_BUCKETS})) b
  LEFT JOIN cnt USING (bucket) CROSS JOIN tot
),
scored AS (
  SELECT f.doc_id, f.lang, count(*) AS n_feats,
         list(lr.lr ORDER BY f.pos, f.kind) AS lrs
  FROM feats f JOIN lr USING (bucket)
  WHERE f.doc_id >= {s}
  GROUP BY f.doc_id, f.lang
),
w8 AS (
  SELECT doc_id, lang, n_feats,
         round(list_reduce(list_prepend(0.0::DOUBLE, lrs),
                           (acc, x) -> acc + x), 4) AS logw
  FROM scored
)
SELECT doc_id, lang, n_feats, logw,
       CASE WHEN logw >= {DSIR_GATE} THEN 'admitted' ELSE 'rejected' END AS status
FROM w8
"""


@register(
    "q_stream_dsir_gate",
    oracle=_stream_dsir_oracle(),
    tags=("streaming", "curation", "northstar"),
)
def q_stream_dsir_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time DSIR admission gate: the bucket log-ratio model is fit
    ONCE on the standing corpus (doc_id < INCREMENT_SPLIT) and engine-
    cached as a static broadcast side (dense over the bucket domain, so
    out-of-vocabulary features score under the smoothed zero-count
    ratio); incoming documents stream over
    multiple micro-batches (maxFilesPerTrigger=1) and each micro-batch is
    scored + thresholded inside foreachBatch. A document's score depends
    only on itself and the frozen model, so the accumulated sink equals
    the one-shot batch scoring and the query is fully hash-oracled —
    the importance-resampling twin of q_stream_incremental_dedup."""
    from clinical_search_data_pipeline_spark.caching import engine_cache
    from clinical_search_data_pipeline_spark.operators.curation import (
        INCREMENT_SPLIT,
    )
    from clinical_search_data_pipeline_spark.operators.importance import (
        DSIR_GATE,
        dsir_model,
        dsir_score,
    )
    from clinical_search_data_pipeline_spark.sources.readers import read_table
    from clinical_search_data_pipeline_spark.streaming.runner import (
        run_foreach_batch,
    )

    apply_runtime_confs(spark)
    corpus = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < INCREMENT_SPLIT
    )
    lr = engine_cache(dsir_model(corpus))

    staging = stage_incremental_batch_source(spark, sf_dir)
    schema = spark.read.parquet(staging).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    out_dir = tempfile.mkdtemp(prefix="csdp_dsir_out_")

    def admit(batch_df: DataFrame, _batch_id: int) -> None:
        scored = dsir_score(batch_df, lr).withColumn(
            "status",
            F.when(F.col("logw") >= DSIR_GATE, "admitted").otherwise("rejected"),
        )
        collect_stream_lint(scored)
        scored.write.mode("append").parquet(out_dir)

    run_foreach_batch(stream, admit, shuffle_partitions=8)
    return spark.read.parquet(out_dir)


# ---------------------------------------------------------------------------
# Streaming substring-contamination gate: batch docs vs a frozen corpus
# gram index
# ---------------------------------------------------------------------------


def _stream_span_gate_oracle() -> str:
    # Screen ONLY the batch partition against the DISTINCT k-gram set of
    # the standing corpus; per-doc coverage/island aggregates depend on one
    # document + the frozen index, so micro-batch boundaries cannot change
    # any row. Island merge mirrors spans.dup_spans (running max end).
    from clinical_search_data_pipeline_spark.operators.curation import (
        INCREMENT_SPLIT,
    )
    from clinical_search_data_pipeline_spark.operators.fragments import (
        SPAN_GATE_FRAC,
        SPAN_GRAM_K,
    )

    s, k = INCREMENT_SPLIT, SPAN_GRAM_K
    return f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
g AS (
  SELECT doc_id, i AS s, i + {k} - 1 AS e,
         array_to_string(list_slice(w, i, i + {k} - 1), ' ') AS gram
  FROM w, unnest(range(1, greatest(len(w) - {k} + 1, 0) + 1)) AS t(i)
),
idx AS (SELECT DISTINCT gram FROM g WHERE doc_id < {s}),
hits AS (
  SELECT g.doc_id, g.s, g.e FROM g JOIN idx USING (gram)
  WHERE g.doc_id >= {s}
),
isl AS (
  SELECT doc_id, s, e,
         CASE WHEN s > coalesce(max(e) OVER (
                PARTITION BY doc_id ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
              THEN 1 ELSE 0 END AS brk
  FROM hits
),
isl2 AS (
  SELECT doc_id, s, e,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY s) AS island
  FROM isl
),
runs AS (
  SELECT doc_id, island, max(e) - min(s) + 1 AS run_len, count(*) AS n_grams
  FROM isl2 GROUP BY doc_id, island
),
per_doc AS (
  SELECT doc_id, sum(n_grams)::BIGINT AS n_dup_grams,
         sum(run_len)::BIGINT AS covered_words,
         max(run_len)::BIGINT AS longest_run
  FROM runs GROUP BY doc_id
)
SELECT d.doc_id, len(w.w) AS n_words,
       coalesce(n_dup_grams, 0) AS n_dup_grams,
       coalesce(covered_words, 0) AS covered_words,
       coalesce(longest_run, 0) AS longest_run,
       CASE WHEN coalesce(covered_words, 0) > len(w.w) * {SPAN_GATE_FRAC}
            THEN 'contaminated' ELSE 'clean' END AS status
FROM documents d JOIN w ON d.doc_id = w.doc_id
LEFT JOIN per_doc ON d.doc_id = per_doc.doc_id
WHERE d.doc_id >= {s}
"""


@register(
    "q_stream_span_gate",
    oracle=_stream_span_gate_oracle(),
    tags=("streaming", "dedup", "northstar"),
)
def q_stream_span_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time substring-contamination screen: the standing corpus's
    DISTINCT k-gram index is built once and engine-cached; each incoming
    micro-batch is screened by spans.span_contamination in foreachBatch
    (per-doc coverage, longest duplicated run, covered-fraction gate).
    Completes the admission triple with q_stream_incremental_dedup
    (near-dup) and q_stream_dsir_gate (distribution): this one catches
    verbatim copied REGIONS at any offset. Per-doc rows depend only on
    the document and the frozen index, so the accumulated sink equals
    one-shot batch screening and the query is fully hash-oracled.

    The gram probe rides the broadcast Bloom pre-filter
    (spans.corpus_gram_bloom): definitely-novel batch grams never reach
    the gram-keyed shuffle. Output is bit-identical (exact join verifies
    every Bloom survivor), so the oracle is unchanged."""
    from clinical_search_data_pipeline_spark.caching import engine_cache
    from clinical_search_data_pipeline_spark.operators.curation import (
        INCREMENT_SPLIT,
    )
    from clinical_search_data_pipeline_spark.operators.spans import (
        corpus_gram_bloom,
        corpus_gram_index,
        span_contamination,
    )
    from clinical_search_data_pipeline_spark.sources.readers import read_table
    from clinical_search_data_pipeline_spark.streaming.runner import (
        run_foreach_batch,
    )

    apply_runtime_confs(spark)
    corpus = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < INCREMENT_SPLIT
    )
    index = engine_cache(corpus_gram_index(corpus))
    bloom = engine_cache(corpus_gram_bloom(index))

    staging = stage_incremental_batch_source(spark, sf_dir)
    schema = spark.read.parquet(staging).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    out_dir = tempfile.mkdtemp(prefix="csdp_spangate_out_")

    def screen(batch_df: DataFrame, _batch_id: int) -> None:
        verdicts = span_contamination(batch_df, index, bloom=bloom)
        collect_stream_lint(verdicts)
        verdicts.write.mode("append").parquet(out_dir)

    run_foreach_batch(stream, screen, shuffle_partitions=8)
    return spark.read.parquet(out_dir)


@register(
    "q_span_gate_bloom",
    # the SAME exact-screen semantics as q_stream_span_gate, re-stated as
    # an explicit projection: passing an oracle with NO bloom in it is the
    # transparency proof (the Bloom path may only drop rows the exact join
    # would drop anyway)
    oracle=(
        "SELECT doc_id, n_words, n_dup_grams, covered_words, longest_run, "
        "status FROM (" + _stream_span_gate_oracle() + ") exact_screen"
    ),
    tags=("dedup", "text", "northstar"),
)
def q_span_gate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the substring admission gate with the Bloom
    pre-filter made a first-class, hash-oracled surface: incoming docs are
    screened against the corpus gram index, but their grams pass through
    the broadcast hashed-bitset (operators/bloom.py) BEFORE the exact
    gram join. The oracle is the plain exact-screen SQL — passing it
    proves the Bloom path removes only definitely-absent grams (zero
    false negatives), while tests/test_bloom.py pins the false-positive
    bound and the broadcast plan shape."""
    from clinical_search_data_pipeline_spark.operators.curation import (
        INCREMENT_SPLIT,
    )
    from clinical_search_data_pipeline_spark.operators.spans import (
        corpus_gram_bloom,
        corpus_gram_index,
        span_contamination,
    )
    from clinical_search_data_pipeline_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") < INCREMENT_SPLIT)
    batch = docs.filter(F.col("doc_id") >= INCREMENT_SPLIT)
    # cache the gram index like the streaming twin does: it is a SHUFFLED
    # intermediate (gram explode + distinct) with THREE consumers — the
    # bloom self-sizing count (its own action), the bloom bitset build,
    # and the exact verify join — so without the cache the distinct
    # shuffle executes up to three times per run
    from clinical_search_data_pipeline_spark.caching import engine_cache

    index = engine_cache(corpus_gram_index(corpus))
    return span_contamination(batch, index, bloom=corpus_gram_bloom(index))


# ---------------------------------------------------------------------------
# Streaming quality-classifier gate: frozen NB model scoring at ingest
# ---------------------------------------------------------------------------


def _stream_quality_gate_oracle() -> str:
    # Train ONLY on the standing corpus (labels AND feature counts
    # restricted to doc_id < INCREMENT_SPLIT), score ONLY the batch
    # partition. A score depends on one document + the frozen dense model,
    # so micro-batch boundaries cannot change any row — same invariance
    # argument as the DSIR gate.
    from clinical_search_data_pipeline_spark.operators.classifier import (
        duck_classifier_sql,
    )
    from clinical_search_data_pipeline_spark.operators.curation import (
        INCREMENT_SPLIT,
    )

    s = INCREMENT_SPLIT
    return duck_classifier_sql(f"doc_id < {s}", f"f.doc_id >= {s}")


@register(
    "q_stream_quality_gate",
    oracle=_stream_quality_gate_oracle(),
    tags=("streaming", "curation", "quality", "northstar"),
)
def q_stream_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time learned-quality gate: the naive-Bayes classifier is fit
    ONCE on the standing corpus (bootstrap-labeled by the rule-based
    corpus filter — the CCNet construction) and engine-cached as a dense
    broadcast model; incoming documents stream over multiple micro-batches
    (maxFilesPerTrigger=1) and each batch is scored sigmoid(bias + w·x) +
    thresholded inside foreachBatch. The FOURTH admission gate: near-dup,
    distribution (DSIR), verbatim spans, and now learned quality. Scores
    are micro-batch-invariant, fully hash-oracled."""
    from clinical_search_data_pipeline_spark.caching import engine_cache
    from clinical_search_data_pipeline_spark.operators.classifier import (
        nb_quality_model,
        quality_labels,
        quality_score,
    )
    from clinical_search_data_pipeline_spark.operators.curation import (
        INCREMENT_SPLIT,
    )
    from clinical_search_data_pipeline_spark.sources.readers import read_table
    from clinical_search_data_pipeline_spark.streaming.runner import (
        run_foreach_batch,
    )

    apply_runtime_confs(spark)
    corpus = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < INCREMENT_SPLIT
    )
    model = engine_cache(nb_quality_model(quality_labels(corpus)))

    staging = stage_incremental_batch_source(spark, sf_dir)
    schema = spark.read.parquet(staging).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    out_dir = tempfile.mkdtemp(prefix="csdp_qualgate_out_")

    def score(batch_df: DataFrame, _batch_id: int) -> None:
        scored = quality_score(batch_df, model)
        collect_stream_lint(scored)
        scored.write.mode("append").parquet(out_dir)

    run_foreach_batch(stream, score, shuffle_partitions=8)
    return spark.read.parquet(out_dir)


# ---------------------------------------------------------------------------
# Streaming image-dedup gate: incoming images vs a frozen corpus hash index
# ---------------------------------------------------------------------------


def _stream_image_gate_oracle() -> str:
    # Hash both partitions with the SAME arithmetic (wrap_base makes batch
    # copies reference corpus leaders: (doc_id - doc_id%10) % split), then
    # screen ONLY batch docs against ONLY corpus bands. A verdict depends
    # on one image + the frozen index -> micro-batch-invariant.
    from clinical_search_data_pipeline_spark.operators.curation import (
        INCREMENT_SPLIT,
    )
    from clinical_search_data_pipeline_spark.operators.phash import (
        PHASH_HAM_MAX,
        duck_phash_cte,
    )

    s = INCREMENT_SPLIT
    return f"""
WITH {duck_phash_cte(wrap_base=s)},
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
  WHERE a.doc_id < {s} AND b.doc_id >= {s}
),
ham AS (
  SELECT p.doc_b, p.doc_a
  FROM pairs p
  JOIN bits ba ON ba.doc_id = p.doc_a
  JOIN bits bb ON bb.doc_id = p.doc_b AND bb.r = ba.r AND bb.c = ba.c
  GROUP BY 1, 2
  HAVING count(*) FILTER (WHERE ba.bit != bb.bit) <= {PHASH_HAM_MAX}
),
per_doc AS (SELECT doc_b AS doc_id, count(*) AS n FROM ham GROUP BY 1)
SELECT d.doc_id,
       coalesce(n, 0) AS n_corpus_matches,
       CASE WHEN coalesce(n, 0) > 0 THEN 'dup_image' ELSE 'admitted' END
         AS status
FROM documents d LEFT JOIN per_doc USING (doc_id)
WHERE d.doc_id >= {s}
"""


@register(
    "q_stream_image_gate",
    oracle=_stream_image_gate_oracle(),
    tags=("streaming", "multimodal", "dedup", "northstar", "pandas-udf"),
)
def q_stream_image_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time IMAGE near-dup gate — the fifth admission screen and the
    perceptual twin of q_stream_incremental_dedup: the standing corpus's
    dHash index is computed ONCE (real PPM/BMP decode) and engine-cached;
    each incoming micro-batch's images are decoded + hashed in Arrow
    batches and probed against the frozen band index (band equi-join +
    bit_count verify — never batch x corpus). Batch copies reference
    corpus leaders via the wrap_base planting, so the gate has real
    cross-split duplicates to catch; verdicts are micro-batch-invariant
    and fully hash-oracled."""
    from clinical_search_data_pipeline_spark.caching import engine_cache
    from clinical_search_data_pipeline_spark.operators.curation import (
        INCREMENT_SPLIT,
    )
    from clinical_search_data_pipeline_spark.operators.phash import (
        dhash_neardup_images,
        image_vs_corpus,
    )
    from clinical_search_data_pipeline_spark.sources.readers import read_table
    from clinical_search_data_pipeline_spark.streaming.runner import (
        run_foreach_batch,
    )

    apply_runtime_confs(spark)
    corpus = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < INCREMENT_SPLIT
    )
    corpus_hashes = engine_cache(
        dhash_neardup_images(corpus, wrap_base=INCREMENT_SPLIT)
    )
    # materialize the frozen index BEFORE the stream starts: the first
    # micro-batch must not pay the corpus decode+hash build (the index
    # build is an offline step in production; the scale bench times it
    # separately from the per-batch screen for the same reason)
    corpus_hashes.count()

    staging = stage_incremental_batch_source(spark, sf_dir)
    schema = spark.read.parquet(staging).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    out_dir = tempfile.mkdtemp(prefix="csdp_imggate_out_")

    def screen(batch_df: DataFrame, _batch_id: int) -> None:
        # ONE job per micro-batch (guide §2.4): image_vs_corpus consumes
        # the batch hash relation exactly once, so the decode+hash stays
        # LAZY inside the verdict write action — the former per-batch
        # localCheckpoint (a second job whose only purpose was to pin the
        # thrice-referenced batch hashes) is gone; the all-docs universe
        # comes from the raw batch's doc_ids (no decode).
        batch_hashes = dhash_neardup_images(
            batch_df, wrap_base=INCREMENT_SPLIT
        )
        verdicts = image_vs_corpus(
            corpus_hashes, batch_hashes, batch_docs=batch_df
        )
        collect_stream_lint(verdicts)
        verdicts.write.mode("append").parquet(out_dir)

    run_foreach_batch(stream, screen, shuffle_partitions=8)
    return spark.read.parquet(out_dir)


# ---------------------------------------------------------------------------
# Streaming audio/video-dedup gates: the gate x modality matrix completed
# ---------------------------------------------------------------------------


def _stream_fp_gate_oracle(fp_cte: str, bit_key: str, ham_max: int, dup: str) -> str:
    """Shared oracle template for the audio/video admission gates — the
    same screen-only-batch-against-corpus shape as the image gate, with
    the modality's fingerprint CTE plugged in (`bit_key` is the bit
    relation's position column: frame index `f` for both fingerprints)."""
    from clinical_search_data_pipeline_spark.operators.curation import (
        INCREMENT_SPLIT,
    )

    s = INCREMENT_SPLIT
    return f"""
WITH {fp_cte},
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
  WHERE a.doc_id < {s} AND b.doc_id >= {s}
),
ham AS (
  SELECT p.doc_b, p.doc_a
  FROM pairs p
  JOIN bits ba ON ba.doc_id = p.doc_a
  JOIN bits bb ON bb.doc_id = p.doc_b AND bb.{bit_key} = ba.{bit_key}
  GROUP BY 1, 2
  HAVING count(*) FILTER (WHERE ba.bit != bb.bit) <= {ham_max}
),
per_doc AS (SELECT doc_b AS doc_id, count(*) AS n FROM ham GROUP BY 1)
SELECT d.doc_id,
       coalesce(n, 0) AS n_corpus_matches,
       CASE WHEN coalesce(n, 0) > 0 THEN '{dup}' ELSE 'admitted' END
         AS status
FROM documents d LEFT JOIN per_doc USING (doc_id)
WHERE d.doc_id >= {s}
"""


def _run_fp_gate(
    spark: SparkSession,
    sf_dir: str,
    corpus_fp: DataFrame,
    batch_fp_fn,
    ham_max: int,
    dup_status: str,
    out_prefix: str,
) -> DataFrame:
    """Shared driver for the fingerprint admission gates: materialize the
    frozen corpus index BEFORE the stream (the index build is an offline
    step in production), then per micro-batch decode+fingerprint in Arrow
    batches and probe via band equi-join + bit_count verify — never
    batch x corpus."""
    from clinical_search_data_pipeline_spark.caching import engine_cache
    from clinical_search_data_pipeline_spark.operators.phash import image_vs_corpus
    from clinical_search_data_pipeline_spark.streaming.runner import (
        run_foreach_batch,
    )

    corpus_hashes = engine_cache(corpus_fp)
    corpus_hashes.count()

    staging = stage_incremental_batch_source(spark, sf_dir)
    schema = spark.read.parquet(staging).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    out_dir = tempfile.mkdtemp(prefix=out_prefix)

    def screen(batch_df: DataFrame, _batch_id: int) -> None:
        # one job per micro-batch — same restructure as the image gate:
        # the fingerprint relation is consumed once inside the verdict
        # write, no per-batch localCheckpoint job
        batch_hashes = batch_fp_fn(batch_df)
        verdicts = image_vs_corpus(
            corpus_hashes,
            batch_hashes,
            ham_max=ham_max,
            dup_status=dup_status,
            batch_docs=batch_df,
        )
        collect_stream_lint(verdicts)
        verdicts.write.mode("append").parquet(out_dir)

    run_foreach_batch(stream, screen, shuffle_partitions=8)
    return spark.read.parquet(out_dir)


def _stream_audio_gate_oracle() -> str:
    from clinical_search_data_pipeline_spark.operators.audiofp import (
        AF_HAM_MAX,
        duck_audio_fp_cte,
    )
    from clinical_search_data_pipeline_spark.operators.curation import (
        INCREMENT_SPLIT,
    )

    return _stream_fp_gate_oracle(
        duck_audio_fp_cte(wrap_base=INCREMENT_SPLIT), "f", AF_HAM_MAX, "dup_audio"
    )


@register(
    "q_stream_audio_gate",
    oracle=_stream_audio_gate_oracle(),
    tags=("streaming", "multimodal", "dedup", "northstar", "pandas-udf"),
)
def q_stream_audio_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time AUDIO near-dup gate — the sixth admission screen,
    completing the audio column of the gate x modality matrix: the
    standing corpus's Haitsma-Kalker fingerprint index is computed ONCE
    (real RIFF/WAV chunk-walk decode) and engine-cached; each micro-batch
    is decoded + fingerprinted in Arrow batches and probed against the
    frozen band index (band equi-join + bit_count verify). Batch copies
    reference corpus leaders via wrap_base planting, so the gate has real
    cross-split duplicates to catch; verdicts are micro-batch-invariant
    and fully hash-oracled."""
    from clinical_search_data_pipeline_spark.operators.audiofp import (
        AF_HAM_MAX,
        audio_neardup_fingerprints,
    )
    from clinical_search_data_pipeline_spark.operators.curation import (
        INCREMENT_SPLIT,
    )
    from clinical_search_data_pipeline_spark.sources.readers import read_table

    apply_runtime_confs(spark)
    corpus = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < INCREMENT_SPLIT
    )
    return _run_fp_gate(
        spark,
        sf_dir,
        audio_neardup_fingerprints(corpus, wrap_base=INCREMENT_SPLIT),
        lambda b: audio_neardup_fingerprints(b, wrap_base=INCREMENT_SPLIT),
        AF_HAM_MAX,
        "dup_audio",
        "csdp_audgate_out_",
    )


def _stream_video_gate_oracle() -> str:
    from clinical_search_data_pipeline_spark.operators.curation import (
        INCREMENT_SPLIT,
    )
    from clinical_search_data_pipeline_spark.operators.videofp import (
        VF_HAM_MAX,
        duck_video_fp_cte,
    )

    return _stream_fp_gate_oracle(
        duck_video_fp_cte(wrap_base=INCREMENT_SPLIT), "f", VF_HAM_MAX, "dup_video"
    )


@register(
    "q_stream_video_gate",
    oracle=_stream_video_gate_oracle(),
    tags=("streaming", "multimodal", "dedup", "northstar", "pandas-udf"),
)
def q_stream_video_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time VIDEO near-dup gate — the seventh admission screen,
    completing the gate x modality matrix (text near-dup, DSIR, spans,
    quality, image, audio, video): the standing corpus's temporal-
    signature index is computed ONCE (real Y4M frame-walk decode) and
    engine-cached; each micro-batch is decoded + fingerprinted in Arrow
    batches and probed against the frozen band index. Cross-split planted
    copies via wrap_base; micro-batch-invariant, fully hash-oracled."""
    from clinical_search_data_pipeline_spark.operators.curation import (
        INCREMENT_SPLIT,
    )
    from clinical_search_data_pipeline_spark.operators.videofp import (
        VF_HAM_MAX,
        video_neardup_fingerprints,
    )
    from clinical_search_data_pipeline_spark.sources.readers import read_table

    apply_runtime_confs(spark)
    corpus = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < INCREMENT_SPLIT
    )
    return _run_fp_gate(
        spark,
        sf_dir,
        video_neardup_fingerprints(corpus, wrap_base=INCREMENT_SPLIT),
        lambda b: video_neardup_fingerprints(b, wrap_base=INCREMENT_SPLIT),
        VF_HAM_MAX,
        "dup_video",
        "csdp_vidgate_out_",
    )


# ---------------------------------------------------------------------------
# Streaming embedding-similarity (semantic) admission gate
# ---------------------------------------------------------------------------


def stage_embedding_batch_source(
    spark: SparkSession, sf_dir: str, n_files: int = 4
) -> str:
    """Stage the increment side of the embeddings fixture (vec_id >=
    EMB_SPLIT) as `n_files` parquet files so availableNow +
    maxFilesPerTrigger=1 genuinely processes multiple micro-batches. Same
    mtime+size fingerprint keying as stage_incremental_batch_source."""
    from clinical_search_data_pipeline_spark.operators.similarity import (
        EMB_SPLIT,
    )

    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    fingerprint = f"{int(st.st_mtime)}_{st.st_size}_{n_files}"
    staging = os.path.join(
        tempfile.gettempdir(),
        f"csdp_stream_emb_{sf_dir.strip('/').replace('/', '_')}_{fingerprint}",
    )
    if not os.path.exists(os.path.join(staging, "_SUCCESS")):
        (
            spark.read.parquet(src)
            .filter(F.col("vec_id") >= EMB_SPLIT)
            .repartitionByRange(n_files, "vec_id")
            .write.mode("overwrite")
            .parquet(staging)
        )
    return staging


def _stream_embedding_gate_oracle() -> str:
    """The gate's batch twin in SQL: reproduce the deterministic md5-seeded
    (GATE_BANDS x GATE_BITS) banding, restrict candidates to corpus x
    increment across EMB_SPLIT, verify with the exact cosine, and emit one
    verdict row per increment vector."""
    from clinical_search_data_pipeline_spark.operators.fragments import (
        DIM,
        NEARDUP_THRESHOLD,
        _DUCK_BASE_CTE,
        _duck_dot,
    )
    from clinical_search_data_pipeline_spark.operators.similarity import (
        EMB_SPLIT,
        GATE_BANDS,
        GATE_BITS,
    )

    s = EMB_SPLIT
    return f"""
WITH {_DUCK_BASE_CTE},
planes AS (
  SELECT p, list_transform(range(0, {DIM}), d ->
    ((CAST(('0x' || substring(md5(CAST(p AS VARCHAR) || '_' || CAST(d AS VARCHAR)), 1, 15)) AS BIGINT)
      % 2001) - 1000) / 1000.0) AS pw
  FROM range(0, {GATE_BANDS * GATE_BITS}) t(p)
),
dots AS (
  SELECT n.vec_id, pl.p,
         list_reduce(list_transform(range(1, {DIM} + 1), i -> n.v[i] * pl.pw[i]),
                     (a, b) -> a + b) AS dot
  FROM n, planes pl
),
bk AS (
  SELECT vec_id, p // {GATE_BITS} AS band,
         sum(CASE WHEN dot >= 0 THEN (1 << (p % {GATE_BITS})) ELSE 0 END) AS bucket
  FROM dots GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.vec_id < {s} AND b.vec_id >= {s}
),
hits AS (
  SELECT c.vec_b, count(*) AS n
  FROM cand c
  JOIN n x ON x.vec_id = c.vec_a
  JOIN n y ON y.vec_id = c.vec_b
  WHERE {_duck_dot('x.v', 'y.v')} / (x.norm * y.norm) >= {NEARDUP_THRESHOLD}
  GROUP BY 1
)
SELECT e.vec_id,
       coalesce(h.n, 0) AS n_corpus_matches,
       CASE WHEN coalesce(h.n, 0) > 0 THEN 'dup_embedding' ELSE 'admitted' END
         AS status
FROM n e LEFT JOIN hits h ON h.vec_b = e.vec_id
WHERE e.vec_id >= {s}
"""


@register(
    "q_stream_embedding_gate",
    oracle=_stream_embedding_gate_oracle(),
    tags=("streaming", "similarity", "dedup", "northstar"),
)
def q_stream_embedding_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time SEMANTIC near-dup gate — the eighth admission screen,
    extending the gate matrix from surface forms (text/image/audio/video)
    to the embedding space (the streaming face of SemDeDup): the standing
    corpus's LSH band index and norm'd vectors are computed ONCE and
    engine-cached (at 100 TB: the persisted index); each incoming
    micro-batch of vectors is banded with the same deterministic planes
    and probed via a (band, bucket) equi-join + exact-cosine verify —
    never batch x corpus. The gate banding is recall-tuned (GATE_BANDS x
    GATE_BITS = 16x6: catches every sf0.001 and 8/11 sf0.01 cross-split
    true dups at the fixture's hard tau=0.45 regime, ~99.96% recall at a
    production 0.9 threshold) and the whole verdict relation is
    hash-oracled — micro-batch boundaries cannot change any row."""
    from clinical_search_data_pipeline_spark.caching import engine_cache
    from clinical_search_data_pipeline_spark.operators.similarity import (
        EMB_SPLIT,
        GATE_BANDS,
        GATE_BITS,
        banded_lsh_keys,
        embedding_vs_corpus,
        vectors_with_norms,
    )
    from clinical_search_data_pipeline_spark.sources.readers import read_table
    from clinical_search_data_pipeline_spark.streaming.runner import (
        run_foreach_batch,
    )

    apply_runtime_confs(spark)
    corpus = read_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < EMB_SPLIT
    )
    corpus_keys = engine_cache(
        banded_lsh_keys(corpus, GATE_BANDS, GATE_BITS).select(
            "vec_id", "band", "bucket"
        )
    )
    corpus_vecs = engine_cache(
        vectors_with_norms(corpus).select("vec_id", "v", "norm")
    )
    # materialize the frozen index BEFORE the stream: the first micro-batch
    # must not pay the corpus banding build (offline step in production).
    # The two cache fills are independent jobs — overlap them (guide §2.6).
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        fk, fv = pool.submit(corpus_keys.count), pool.submit(corpus_vecs.count)
        fk.result(), fv.result()

    staging = stage_embedding_batch_source(spark, sf_dir)
    schema = spark.read.parquet(staging).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    out_dir = tempfile.mkdtemp(prefix="csdp_embgate_out_")

    def screen(batch_df: DataFrame, _batch_id: int) -> None:
        verdicts = embedding_vs_corpus(corpus_keys, corpus_vecs, batch_df)
        collect_stream_lint(verdicts)
        verdicts.write.mode("append").parquet(out_dir)

    run_foreach_batch(stream, screen, shuffle_partitions=8)
    return spark.read.parquet(out_dir)

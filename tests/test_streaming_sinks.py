"""Tier-2 tests (SURVEY.md §5.2): streaming convergence vs batch equivalents,
sink round-trips, and the JDBC upsert protocol (no live Postgres — injected
merge executor records the generated statements)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from clinical_search_data_pipeline_spark.operators import marts
from clinical_search_data_pipeline_spark.sinks import jdbc as jdbc_sink
from clinical_search_data_pipeline_spark.sinks import parquet as pq_sink
from clinical_search_data_pipeline_spark.sources.readers import load_events
from clinical_search_data_pipeline_spark.streaming.dedup import (
    silver_writer,
    watermark_dedup,
    watermark_dedup_within,
)
from clinical_search_data_pipeline_spark.streaming.hot_marts import (
    make_hot_mart_processor,
)
from clinical_search_data_pipeline_spark.streaming.runner import run_foreach_batch
from clinical_search_data_pipeline_spark.streaming.stream_queries import events_stream
from tests.conftest import SF_SMOKE


def test_silver_pipeline_converges_to_batch_dedup(spark, tmp_path):
    """Streaming watermark-dedup + partitioned parquet silver lake must hold
    exactly the batch-distinct key set once the bounded stream drains
    (reference D1/K1/K8 end-to-end)."""
    lake = str(tmp_path / "silver")
    stream = events_stream(spark, SF_SMOKE)
    deduped = watermark_dedup(
        stream, keys=["user_id", "event_type", "event_date"]
    ).select("user_id", "event_type", "event_date")
    run_foreach_batch(deduped, silver_writer(lake))

    got = spark.read.parquet(lake)
    batch = (
        load_events(spark, SF_SMOKE)
        .select("user_id", "event_type", "event_date")
        .distinct()
    )
    assert got.count() == batch.count()
    assert got.exceptAll(batch).isEmpty() and batch.exceptAll(got).isEmpty()
    # hive layout: partition dirs present
    assert glob.glob(os.path.join(lake, "event_date=*"))


def test_hot_mart_fanout_matches_batch_builders(spark):
    """foreachBatch fan-out (T9) writes each mart; totals must equal running
    the same builders in plain batch (single implementation, two runtimes)."""
    captured: dict[str, list] = {}

    def sink(df, table):
        captured.setdefault(table, []).append(df.cache())

    stream = events_stream(spark, SF_SMOKE)
    run_foreach_batch(stream, make_hot_mart_processor(sink))

    batch_events = load_events(spark, SF_SMOKE)
    assert set(captured) == {
        "mart_traffic_minute",
        "mart_top_docs",
        "mart_clinical_trend",
        "mart_anomaly_sessions",
    }
    # traffic-by-minute is additive across micro-batches: summing the
    # per-batch counts per minute equals the batch aggregate.
    parts = captured["mart_traffic_minute"]
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    got = merged.groupBy("event_minute").agg(
        F.sum("event_count").alias("event_count")
    )
    want = marts.traffic_by_minute(batch_events).select(
        "event_minute", "event_count"
    )
    assert (
        got.join(want, "event_minute")
        .where(got["event_count"] != want["event_count"])
        .isEmpty()
    )


def test_dedup_within_watermark_converges(spark):
    """dropDuplicatesWithinWatermark over the bounded replay must keep one
    row per key (no late re-delivery in the fixture, so it matches the
    distinct key set exactly)."""
    from clinical_search_data_pipeline_spark.streaming.runner import run_to_memory

    deduped = watermark_dedup_within(
        events_stream(spark, SF_SMOKE),
        keys=["user_id", "event_type"],
    ).select("user_id", "event_type")
    table = run_to_memory(deduped, output_mode="append")
    got = spark.table(table)
    want = load_events(spark, SF_SMOKE).select("user_id", "event_type").distinct()
    assert got.count() == want.count()
    assert got.exceptAll(want).isEmpty()


def test_stateful_sessionize_converges_to_batch(spark):
    """applyInPandasWithState gap sessionization must produce exactly the
    batch sessionizer's sessions once the source drains and the state
    timeout flushes the open tails."""
    import time

    from pyspark.sql import functions as F

    from clinical_search_data_pipeline_spark.operators.sessionize import sessionize
    from clinical_search_data_pipeline_spark.streaming.runner import checkpoint_dir
    from clinical_search_data_pipeline_spark.streaming.stateful import (
        sessionize_stateful,
    )

    sess = sessionize_stateful(
        events_stream(spark, SF_SMOKE).select("user_id", "ts_sec")
    )
    q = (
        sess.writeStream.format("memory")
        .queryName("sess_conv")
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir())
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    prev = -1
    for i in range(60):
        time.sleep(1.5)
        cur = spark.table("sess_conv").count()
        if cur == prev and cur > 0 and i > 4:
            break
        prev = cur
    q.stop()
    got = (
        spark.table("sess_conv")
        .withColumn("duration_sec", F.col("end_sec") - F.col("start_sec"))
        .select("user_id", "n_events", "duration_sec")
    )
    want = sessionize(load_events(spark, SF_SMOKE)).select(
        "user_id", "n_events", "duration_sec"
    )
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def test_write_partitioned_and_compact(spark, tmp_path):
    lake = str(tmp_path / "lake")
    df = spark.range(200).selectExpr("id", "cast(id % 3 as string) as event_date")
    pq_sink.write_partitioned(df, lake, mode="append")
    pq_sink.write_partitioned(df, lake, mode="append")
    before = len(glob.glob(lake + "/event_date=*/*.parquet"))
    pq_sink.compact(spark, lake)
    after = len(glob.glob(lake + "/event_date=*/*.parquet"))
    assert spark.read.parquet(lake).count() == 400
    assert after == 3 < before


def test_frames_reassemble_to_payload(spark):
    """Concatenating a doc's chunks in index order must reproduce the
    original payload bytes exactly — the generic binary chunker's
    contract (DuckDB has no blob slicing, so this stays a pytest pin;
    the registered q_media_frames is the real video frame sampler)."""
    from clinical_search_data_pipeline_spark.operators.multimodal import (
        attach_payload,
        sample_frames,
    )
    from clinical_search_data_pipeline_spark.sources.readers import read_table

    docs = read_table(spark, SF_SMOKE, "documents").limit(20)
    media = attach_payload(docs)
    frames = sample_frames(media)
    # byte-exact reassembly checked driver-side (20 docs only)
    got = {}
    for r in frames.collect():
        got.setdefault(r.doc_id, []).append((r.frame_idx, bytes(r.frame_bytes)))
    want = {r.doc_id: bytes(r.payload) for r in media.collect()}
    assert set(got) == set(want)
    for doc_id, chunks in got.items():
        joined = b"".join(b for _, b in sorted(chunks))
        assert joined == want[doc_id]


def test_decode_image_roundtrip_and_edge_cases():
    """Pure-Python raster codec: PPM comment skipping, BMP row padding
    (width 5 -> 15-byte rows padded to 16), top-down BMP (negative height),
    and a loud error on unknown magic."""
    import numpy as np
    import pytest

    from clinical_search_data_pipeline_spark.operators.multimodal import (
        decode_image,
        encode_bmp,
        encode_ppm,
    )

    pix = bytes((11 + k) % 256 for k in range(5 * 3 * 3))  # 5x3 RGB
    for payload, fmt in ((encode_ppm(5, 3, pix), "ppm"), (encode_bmp(5, 3, pix), "bmp")):
        meta = decode_image(payload)
        assert meta["fmt"] == fmt
        assert (meta["width"], meta["height"], meta["n_pixels"]) == (5, 3, 15)
        # padding bytes must NOT leak into the sum (BMP rows are padded)
        assert meta["pixel_sum"] == sum(pix)

    # top-down BMP: negative height in the header, same raster content
    bmp = bytearray(encode_bmp(5, 3, pix))
    bmp[22:26] = (-3).to_bytes(4, "little", signed=True)
    meta = decode_image(bytes(bmp))
    assert (meta["height"], meta["pixel_sum"]) == (3, sum(pix))

    # width divisible by 4 -> zero padding path
    pix4 = bytes(range(4 * 2 * 3))
    assert decode_image(encode_bmp(4, 2, pix4))["pixel_sum"] == sum(pix4)

    with pytest.raises(ValueError, match="unsupported image magic"):
        decode_image(b"\x89PNG\r\n")
    with pytest.raises(ValueError, match="unsupported BMP"):
        bad = bytearray(encode_bmp(4, 2, pix4))
        bad[28:30] = (8).to_bytes(2, "little")  # 8bpp unsupported
        decode_image(bytes(bad))

    # vectors stay exact under numpy round-trip (uint8 overflow hazard)
    big = (np.arange(3 * 3 * 3) % 256).astype(np.uint8).tobytes()
    assert decode_image(encode_ppm(3, 3, big))["pixel_sum"] == sum(big)


def test_decode_image_roundtrip_property():
    """Property: for ANY dimensions and pixel content, decode(encode(img))
    recovers width/height/pixel-sum exactly for both formats — including
    every BMP padding residue (width % 4 in {0,1,2,3})."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from clinical_search_data_pipeline_spark.operators.multimodal import (
        decode_image,
        encode_bmp,
        encode_ppm,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=37),
        h=st.integers(min_value=1, max_value=23),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(w: int, h: int, seed: int):
        pix = bytes((seed + 7 * k) % 256 for k in range(w * h * 3))
        for enc, fmt in ((encode_ppm, "ppm"), (encode_bmp, "bmp")):
            meta = decode_image(enc(w, h, pix))
            assert meta["fmt"] == fmt
            assert (meta["width"], meta["height"]) == (w, h)
            assert meta["pixel_sum"] == sum(pix)
            assert meta["n_pixels"] == w * h

    check()


def test_upsert_protocol_generates_merge_and_cleanup(spark, tmp_path):
    """K7 contract: stage (distributed JDBC write), merge ON CONFLICT,
    drop staging. JDBC url points at nothing — we stub the stage write by
    asserting on the generated SQL only."""
    sql = jdbc_sink.upsert_merge_sql(
        "mart_top_docs", "mart_top_docs_staging", ["doc_id", "clicks", "rank"], ["doc_id"]
    )
    assert "INSERT INTO mart_top_docs (doc_id, clicks, rank)" in sql
    assert "ON CONFLICT (doc_id) DO UPDATE SET" in sql
    assert "clicks = EXCLUDED.clicks" in sql and "rank = EXCLUDED.rank" in sql
    assert "doc_id = EXCLUDED" not in sql  # keys never self-update


def test_upsert_idempotent_merge_executor(spark):
    """Replaying the same batch through the merge path converges (the
    reference mart.md:56-62 idempotency contract), modeled with DuckDB as
    the DB-API target."""
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE m (k INTEGER PRIMARY KEY, v INTEGER)")
    con.execute("CREATE TABLE m_staging (k INTEGER, v INTEGER)")
    con.execute("INSERT INTO m_staging VALUES (1, 10), (2, 20)")
    sql = jdbc_sink.upsert_merge_sql("m", "m_staging", ["k", "v"], ["k"])
    con.execute(sql)
    con.execute(sql)  # replay
    con.execute("UPDATE m_staging SET v = v + 1")
    con.execute(sql)  # updated replay upserts
    rows = sorted(con.execute("SELECT * FROM m").fetchall())
    assert rows == [(1, 11), (2, 21)]


def test_stream_corpus_filter_equals_batch(spark):
    """The ingest-time quality gate must be bit-identical to the batch
    operator: corpus_filter is narrow, so availableNow replay == one batch
    scan, row for row."""
    from clinical_search_data_pipeline_spark.operators.pipeline import corpus_filter
    from clinical_search_data_pipeline_spark.registry import all_specs
    from clinical_search_data_pipeline_spark.sources.readers import read_table
    from tests.conftest import SF_SMOKE

    streamed = all_specs()["q_stream_corpus_filter"].builder(spark, SF_SMOKE)
    batch = corpus_filter(read_table(spark, SF_SMOKE, "documents"))
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


def test_stream_incremental_dedup_equals_batch_across_microbatches(spark):
    """Ingest-time admission vs the frozen corpus must equal the one-shot
    batch run REGARDLESS of micro-batch boundaries — and the run must
    actually cross more than one micro-batch for that claim to mean
    anything (the staging dir splits the batch side into multiple files,
    maxFilesPerTrigger=1)."""
    from pyspark.sql import functions as F

    from clinical_search_data_pipeline_spark.caching import release_caches
    from clinical_search_data_pipeline_spark.operators.curation import (
        INCREMENT_SPLIT,
        batch_vs_corpus,
        corpus_prefix_index,
    )
    from clinical_search_data_pipeline_spark.registry import all_specs
    from clinical_search_data_pipeline_spark.sources.readers import read_table
    from clinical_search_data_pipeline_spark.streaming.runner import run_foreach_batch
    from clinical_search_data_pipeline_spark.streaming.stream_queries import (
        stage_incremental_batch_source,
    )
    from tests.conftest import SF_SMOKE

    try:
        streamed = all_specs()["q_stream_incremental_dedup"].builder(spark, SF_SMOKE)
        docs = read_table(spark, SF_SMOKE, "documents")
        corpus = docs.filter(F.col("doc_id") < INCREMENT_SPLIT)
        batch = docs.filter(F.col("doc_id") >= INCREMENT_SPLIT)
        oneshot = batch_vs_corpus(corpus_prefix_index(corpus), batch)
        assert streamed.count() == oneshot.count()
        assert streamed.exceptAll(oneshot).count() == 0
        assert oneshot.exceptAll(streamed).count() == 0

        # pin the multi-micro-batch claim: re-run the foreachBatch loop with
        # a counter over the same staging dir (fresh checkpoint each run)
        import os

        staging = stage_incremental_batch_source(spark, SF_SMOKE)
        n_files = len(
            [f for f in os.listdir(staging) if f.endswith(".parquet")]
        )
        assert n_files >= 2
        seen: list[int] = []
        schema = spark.read.parquet(staging).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(staging)
        )
        run_foreach_batch(
            stream,
            lambda bdf, bid: seen.append(bdf.count()),
            shuffle_partitions=4,
        )
        assert len(seen) == n_files and sum(seen) == batch.count()
    finally:
        release_caches()


def test_foreach_batch_resumes_from_checkpoint_exactly_once(spark, tmp_path):
    """T5 hardening (VERDICT r06 #8): run a streaming gate over HALF the
    staged files, then start a NEW query instance from the SAME checkpoint
    after the rest of the files land. The file source must replay nothing
    it already committed, so the accumulated sink equals the one-shot
    batch run — the restart semantics a real deployment hits first."""
    import shutil

    from clinical_search_data_pipeline_spark.operators.classifier import (
        nb_quality_model,
        quality_labels,
        quality_score,
    )
    from clinical_search_data_pipeline_spark.operators.curation import (
        INCREMENT_SPLIT,
    )
    from clinical_search_data_pipeline_spark.sources.readers import read_table

    docs = read_table(spark, SF_SMOKE, "documents")
    corpus = docs.filter(F.col("doc_id") < INCREMENT_SPLIT)
    batch = docs.filter(F.col("doc_id") >= INCREMENT_SPLIT)
    model = nb_quality_model(quality_labels(corpus))

    all_files = str(tmp_path / "allfiles")
    batch.repartition(6).write.parquet(all_files)
    parts = sorted(glob.glob(f"{all_files}/part-*.parquet"))
    assert len(parts) == 6

    staging = tmp_path / "staging"
    staging.mkdir()
    for p in parts[:3]:
        shutil.copy(p, staging)

    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = spark.read.parquet(all_files).schema

    def score(batch_df, _batch_id):
        quality_score(batch_df, model).write.mode("append").parquet(out_dir)

    def mkstream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(staging))
        )

    run_foreach_batch(
        mkstream(), score, shuffle_partitions=4, checkpoint_location=ckpt
    )
    n_half = spark.read.parquet(out_dir).count()
    assert 0 < n_half < batch.count(), "first run should cover only half"

    for p in parts[3:]:
        shutil.copy(p, staging)
    # a NEW query instance resumes from the same checkpoint
    run_foreach_batch(
        mkstream(), score, shuffle_partitions=4, checkpoint_location=ckpt
    )

    got = [
        (r.doc_id, r.n_feats, r.logit, r.prob, r.status)
        for r in spark.read.parquet(out_dir).collect()
    ]
    expect = [
        (r.doc_id, r.n_feats, r.logit, r.prob, r.status)
        for r in quality_score(batch, model).collect()
    ]
    # exactly-once: every doc present exactly once (sorted multiset equal)
    assert sorted(got) == sorted(expect)


def test_enriched_traffic_trigger_count_is_pinned(spark):
    """VERDICT r12 watch item: q_stream_enriched_traffic's bench time
    doubled in r12 with its module untouched — suspected trigger-
    scheduling noise. Nothing in the query pins how much work a run does,
    so pin it here: the staged source is exactly ONE parquet file (the
    fingerprint-keyed staging dir can never accumulate), and a bounded
    run executes exactly one data-carrying micro-batch whose input rows
    equal the full fixture. If a future change makes the run multi-batch
    (more staged files, a smaller maxFilesPerTrigger), this fails and the
    bench delta has a real explanation instead of a shrug."""
    import os

    from pyspark.sql import functions as F

    from clinical_search_data_pipeline_spark.sources.readers import (
        load_events,
    )
    from clinical_search_data_pipeline_spark.streaming.runner import (
        checkpoint_dir,
    )
    from clinical_search_data_pipeline_spark.streaming.stream_queries import (
        events_stream,
        stage_events_source,
    )

    sf_dir = "/root/testdata/sf0.001"
    staged = stage_events_source(sf_dir)
    files = [n for n in os.listdir(staged) if n.endswith(".parquet")]
    assert files == ["events.parquet"], files

    total = load_events(spark, sf_dir).count()
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
    q = (
        agg.writeStream.format("memory")
        .queryName("enriched_pin")
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive
    progress = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(progress) == 1, [
        (p["batchId"], p["numInputRows"]) for p in q.recentProgress
    ]
    assert progress[0]["numInputRows"] == total
    # and the enrichment itself stays correct end to end
    got = spark.table("enriched_pin").agg(F.sum("event_count")).collect()[0][0]
    assert got == total

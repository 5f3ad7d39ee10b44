"""Local replica of the driver's correctness gate.

Runs a registered Spark query and its DuckDB oracle side by side and compares
row count, column names, and order-insensitive values — strictly (exact
equality after each query's own rounding), which is at least as strong as the
driver's value-hash comparison.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
import pandas as pd

from clinical_search_data_pipeline_spark.schemas import ALL_TABLES


def env_fingerprint(sf_dir: str) -> dict:
    """Environment stamp shared by bench and parity artifacts (VERDICT r04
    #8): the round-3 regression was an env change (PySpark minor + parquet
    ts logical type) only inferable from stack traces — stamping both into
    every record makes the next drift visible in the artifacts themselves.
    Guarded: a fingerprint failure must never fail the run that asked."""
    try:
        import pyarrow.parquet as _pq
        import pyspark as _ps

        return {
            "pyspark": _ps.__version__,
            "events_ts_type": str(
                _pq.read_schema(f"{sf_dir}/events.parquet").field("ts").type
            ),
        }
    except Exception as exc:  # noqa: BLE001
        return {"pyspark": "unknown", "events_ts_type": f"unknown ({exc})"}


_CIPHER_ALPHA = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"


def make_scaled_corpus(
    spark, src_sf_dir: str, out_dir: str, factor: int = 10,
    scale_events: bool = False,
) -> str:
    """Self-union + key-shift scale fixture (VERDICT r04 #2): `factor`
    disjoint replicas of documents/embeddings so the heavy dedup/ANN family
    can be measured at N× input with a KNOWN linear answer.

    Replicas must not match each other, or output (and so runtime) grows
    quadratically in `factor` by construction of the data, not the engine:

    * documents: copy i shifts doc_id by i*10_000_000 and applies a copy-
      specific substitution cipher over [a-zA-Z0-9] — a bijection on tokens,
      so every within-copy shingle set (hence every Jaccard/MinHash/SimHash
      relation) is exactly the base corpus's, while cross-copy shingles
      differ everywhere a letter or digit appears.
    * embeddings: copy i shifts vec_id by i*10_000_000 and multiplies dim j
      by a deterministic ±1 (murmur3 of (i, j)) — an orthogonal diagonal
      transform, so within-copy cosines are bit-identical and cross-copy
      inner products decorrelate (no rotation-invariant constant-vector
      trap).

    With scale_events=True, events is ALSO replicated (user_id/event_id
    shifted by i*10_000_000, timestamps unchanged) instead of symlinked:
    each copy is a disjoint user population with identical per-user event
    sequences, so every per-user-window relation (sessions, funnels,
    transitions, cohorts, EWMA series) replicates exactly factor-linearly.
    Every other fixture table is symlinked unchanged. Returns out_dir.
    """
    import os

    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    docs = spark.read.parquet(f"{src_sf_dir}/documents.parquet")
    doc_copies = []
    for i in range(factor):
        rot = (i * 11) % len(_CIPHER_ALPHA)
        ciphered = _CIPHER_ALPHA[rot:] + _CIPHER_ALPHA[:rot]
        copy = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        if i:
            copy = copy.withColumn(
                "text", F.translate("text", _CIPHER_ALPHA, ciphered)
            )
        doc_copies.append(copy)
    scaled_docs = doc_copies[0]
    for c in doc_copies[1:]:
        scaled_docs = scaled_docs.unionByName(c)
    scaled_docs.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    emb = spark.read.parquet(f"{src_sf_dir}/embeddings.parquet")
    emb_copies = []
    for i in range(factor):
        copy = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
        if i:
            copy = copy.withColumn(
                "embedding",
                F.expr(
                    f"transform(embedding, (x, j) -> x * cast(1 - 2 * pmod(hash({i}, j), 2) as float))"
                ),
            )
        emb_copies.append(copy)
    scaled_emb = emb_copies[0]
    for c in emb_copies[1:]:
        scaled_emb = scaled_emb.unionByName(c)
    scaled_emb.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")

    skip = {"documents", "embeddings"}
    if scale_events:
        skip.add("events")
        ev = spark.read.parquet(f"{src_sf_dir}/events.parquet")
        ev_copies = []
        for i in range(factor):
            ev_copies.append(
                ev.withColumn(
                    "user_id", F.col("user_id") + F.lit(i * 10_000_000)
                ).withColumn("event_id", F.col("event_id") + F.lit(i * 10_000_000))
            )
        scaled_ev = ev_copies[0]
        for c in ev_copies[1:]:
            scaled_ev = scaled_ev.unionByName(c)
        scaled_ev.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")

    for t in ALL_TABLES:
        if t in skip:
            continue
        dst = f"{out_dir}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{src_sf_dir}/{t}.parquet", dst)
    return out_dir


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """In-memory DuckDB with the fixture tables registered as views, matching
    the driver's pre-registered view contract (__spark_entry__.py docstring)."""
    con = duckdb.connect()
    for t in ALL_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _canon_cell(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<null>"
        # round-trip repr: exact for doubles that both engines agree on
        return repr(v)
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if pd.isna(v):
        return "<null>"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, int):
        return str(v)
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    errors: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        errors.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        errors.append(f"columns: spark={s_cols} duck={d_cols}")
        return errors
    s_rows, d_rows = canonical_rows(spark_pdf), canonical_rows(duck_pdf)
    if s_rows != d_rows:
        n_bad = 0
        for i, (a, b) in enumerate(zip(s_rows, d_rows)):
            if a != b:
                errors.append(f"row {i} (sorted): spark={a} duck={b} (cols={s_cols})")
                n_bad += 1
                if n_bad >= 5:
                    errors.append("... further mismatches suppressed")
                    break
        if not n_bad and len(s_rows) != len(d_rows):
            pass  # already reported as row count
    return errors


def check_query(spark, sf_dir: str, name: str) -> list[str]:
    """Run query `name` on Spark and DuckDB; return mismatch list."""
    from clinical_search_data_pipeline_spark.caching import release_caches
    from clinical_search_data_pipeline_spark.registry import all_specs

    spec = all_specs()[name]
    try:
        if spec.oracle is None:
            sdf = spec.builder(spark, sf_dir)
            n = sdf.count()
            return [] if n >= 0 else [f"{name}: rows-only check failed"]
        spark_pdf = spec.builder(spark, sf_dir).toPandas()
    finally:
        release_caches()
    con = duck_connection(sf_dir)
    try:
        duck_pdf = con.sql(spec.oracle).df()
    finally:
        con.close()
    return compare_frames(spark_pdf, duck_pdf)

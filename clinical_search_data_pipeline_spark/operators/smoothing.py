"""Per-key EWMA smoothing via grouped `applyInPandas` — the one Arrow
pattern the engine had not yet exercised in batch (mapInPandas: multimodal;
pandas_udf: vectorized cosine; applyInPandasWithState: streaming counters).

An exponentially-weighted moving average is a per-key RECURRENCE
(y_t = (1-a)*y_{t-1} + a*x_t): not expressible as a Spark window function
(the closed form needs (1-a)^t factors that overflow for long series), so
this is a legitimate grouped-map use — per-user series arrive as Arrow
batches, the recurrence runs in the Python worker, results return as
columns.

Oracle strategy: the recurrence is evaluated with EXACTLY the same double
arithmetic on both engines — an explicit `(1-a)*y + a*x` loop here, the
identical expression in a DuckDB RECURSIVE CTE — so the comparison holds
bit-for-bit (rounded to 6 dp for belt and braces). A pytest additionally
pins the loop against pandas' production `ewm(alpha, adjust=False).mean()`
to 1e-12, so swapping the loop for the C-accelerated pandas path (the
100 TB choice) is a measured one-liner, not a leap.

Scale posture: groupBy(user_id).applyInPandas is ONE shuffle on the key;
state per task is a single partial series. Skewed users are the hazard
(one task holds the whole series) — `ewma_per_user_chunked` is the
skew-hardened variant: time-bucketed chunks bound every task, and the
per-user sequential pass runs over metadata-sized chunk summaries only.
The oracled query keeps the unchunked path (its loop is bit-identical to
the recursive-CTE oracle); the chunked twin is pinned output-identical to
it by pytest, so swapping it in for a skewed corpus is a measured change.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from clinical_search_data_pipeline_spark.functions.timeops import duck_epoch_sec
from clinical_search_data_pipeline_spark.registry import register
from clinical_search_data_pipeline_spark.sources.readers import load_events

EWMA_ALPHA = 0.3

_OUT_SCHEMA = "user_id long, event_id long, rn int, ewma double"


def _ewma_series(values, alpha: float):
    out = []
    y = None
    for x in values:
        y = x if y is None else (1.0 - alpha) * y + alpha * x
        out.append(y)
    return out


def ewma_per_user(events: DataFrame, alpha: float = EWMA_ALPHA) -> DataFrame:
    """(user_id, event_id, rn, ewma) — each user's event values smoothed in
    (ts_sec, event_id) order; rn is the 1-based position in that order."""

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_sec", "event_id"]).reset_index(drop=True)
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "rn": range(1, len(pdf) + 1),
                # raw doubles out — the display rounding happens JVM-side
                # (F.round is HALF_UP like DuckDB's round; Python's round
                # is nearest-even and diverges exactly at the .5 boundary)
                "ewma": _ewma_series(pdf["value"], alpha),
            }
        )

    from pyspark.sql import functions as F

    sub = events.select("user_id", "event_id", "ts_sec", "value").filter(
        "value IS NOT NULL"
    )
    # Pin the pre-group partition count: the engine's size-based AQE
    # coalescing (tuned for JVM stages) collapses this byte-tiny shuffle to
    # ONE task, serializing every per-group pandas call through a single
    # Python worker (measured 4.6 s for ~1.5k groups at sf0.1; per-GROUP
    # overhead dominates, not bytes). An explicit keyed repartition holds
    # the worker parallelism; groupBy reuses the partitioning, so this is
    # still exactly one exchange.
    n = max(sub.sparkSession.sparkContext.defaultParallelism, 8)
    out = sub.repartition(n, "user_id").groupBy("user_id").applyInPandas(
        smooth, _OUT_SCHEMA
    )
    return out.withColumn("ewma", F.round("ewma", 6))


EWMA_TARGET_CHUNK_ROWS = 4096  # auto-chunking aims the HOTTEST key at this
#                                many rows per (user, chunk) task


def ewma_per_user_chunked(
    events: DataFrame, alpha: float = EWMA_ALPHA, chunk_sec: int | None = None
) -> DataFrame:
    """Skew-hardened EWMA: same output contract as `ewma_per_user`, but no
    task ever holds more than one time-chunk of one user's series.

    The recurrence y_t = (1-a)y_{t-1} + a·x_t is AFFINE in its carry-in, so
    a chunk is summarized by a handful of doubles: its seeded tail value P
    (the contract's y1 = x1 loop — valid only for a first chunk), its
    zero-initial-state tail Q, and its decay D = (1-a)^len — for carry-in
    y0, y_t = d_t·y0 + q_t. Plan:

      1. grouped map over (user_id, chunk = ts_sec div chunk_sec): the
         bounded-size stage. Emits per-row responses p, q and decay d.
      2. per-user sequential pass over the CHUNK SUMMARIES (count, P, Q,
         D) — metadata-sized (series_len / chunk_rows rows per user), this
         is the only place one task sees a whole user, and it sees only
         summaries.
      3. join carry-ins + rn offsets back on (user_id, chunk); the final
         value (carry NULL -> p, else d·carry + q) and rn = pos + offset
         are JVM-side expressions.

    The chunk key is ts-derived (data-independent), so a hot user's series
    splits across tasks without a per-key sort anywhere; chunk order is
    consistent with the global (ts_sec, event_id) order because the bucket
    is monotone in ts_sec.

    Chunk width: grouped-map cost is per GROUP (one Arrow round-trip
    each), so a fixed width is wrong in both directions — too narrow
    shatters a sparse series into row-sized groups (the 6-hour default
    produced 77k near-singleton groups on the sf0.1 fixture, 14x slower
    than the unchunked path), too wide re-creates the hot-key task. With
    chunk_sec=None the width is derived from the data: chunk_sec =
    ceil(EWMA_TARGET_CHUNK_ROWS * span / max_user_rows), which aims the
    hottest key at ~target rows per task assuming its events spread over
    the observed span. The derivation costs one user-keyed count + two
    driver scalars (the kmeans-round sync class). The bound is heuristic
    for bursty keys — a key that packs its rows into one narrow window
    still concentrates a chunk; pass chunk_sec explicitly to impose a
    hard rate-based bound from an SLA.

    Numerics: rows in a user's FIRST chunk take the seeded loop value
    (bit-identical to the unchunked path); later chunks evaluate
    d·carry + q, which reassociates the same terms — differences are
    ulp-level (0.7^k kills history fast) and vanish under the 6-dp output
    rounding. tests/test_pipeline_ops.py pins byte-identical rounded
    output against the unchunked path on the fixture plus a synthetic
    100x-median hot key that spans >50 chunks.

    Execution (r14, guide §4.1): both sequential passes — the per-chunk
    response recurrence and the per-user stitch over chunk summaries — run
    as SQL `aggregate()` higher-order functions over `collect_list`'d
    groups, entirely inside JVM codegen. The previous form ran them as
    grouped `applyInPandas` maps, paying one Python-worker Arrow round
    trip per GROUP (the measured dominant cost at fixture scale; per-group,
    not per-byte). The fold arithmetic is the same double expression in
    the same order, so first-chunk values stay bit-identical to the
    unchunked path/oracle. The array-append accumulator copies O(len²)
    elements per chunk — bounded by construction (~4096-row chunks →
    ≈130 MB of memcpy traffic per hottest task, amortized across the
    corpus), the price of an exact sequential fold without a Python
    boundary; lower EWMA_TARGET_CHUNK_ROWS if a profile ever shows it.
    """
    from pyspark.sql import functions as F

    one_m_a = 1.0 - alpha
    a, c = repr(float(alpha)), repr(float(one_m_a))

    sub = events.select("user_id", "event_id", "ts_sec", "value").filter(
        "value IS NOT NULL"
    )
    if chunk_sec is None:
        import math

        row = (
            sub.groupBy("user_id")
            .agg(
                F.count("*").alias("c"),
                F.min("ts_sec").alias("lo"),
                F.max("ts_sec").alias("hi"),
            )
            .agg(
                F.max("c").alias("max_rows"),
                (F.max("hi") - F.min("lo") + 1).alias("span"),
            )
            .collect()[0]
        )
        if row.max_rows is None:  # empty input: any width works
            chunk_sec = 1
        else:
            chunk_sec = max(
                1,
                int(math.ceil(EWMA_TARGET_CHUNK_ROWS * row.span / row.max_rows)),
            )
    sub = sub.withColumn("chunk", (F.col("ts_sec") / F.lit(chunk_sec)).cast("long"))

    # 1. per-(user, chunk) responses: sort_array orders the chunk by
    # (ts_sec, event_id) — the struct's leading fields — then ONE exact
    # sequential fold emits per-row p (seeded loop: y1 = x1, valid only
    # for a first chunk) and q (zero-initial-state response; the seeding
    # makes the first step non-linear, so the two genuinely differ).
    resp_expr = f"""
aggregate(
  sort_array(rows),
  named_struct(
    'res', CAST(array() AS array<struct<event_id: bigint, p: double, q: double>>),
    'p', CAST(NULL AS double), 'q', CAST(NULL AS double)),
  (acc, x) -> named_struct(
    'res', concat(acc.res, array(named_struct(
      'event_id', x.event_id,
      'p', IF(acc.p IS NULL, x.value, {c}D * acc.p + {a}D * x.value),
      'q', {c}D * coalesce(acc.q, 0.0D) + {a}D * x.value))),
    'p', IF(acc.p IS NULL, x.value, {c}D * acc.p + {a}D * x.value),
    'q', {c}D * coalesce(acc.q, 0.0D) + {a}D * x.value),
  acc -> acc.res)
"""
    g = (
        sub.groupBy("user_id", "chunk")
        .agg(
            F.collect_list(F.struct("ts_sec", "event_id", "value")).alias("rows")
        )
        .select("user_id", "chunk", F.expr(resp_expr).alias("res"))
    )
    from clinical_search_data_pipeline_spark.caching import engine_cache

    # g feeds two consumers (the chunk summaries and the exploded rows of
    # the final join) across one shuffled groupBy — the r12/r13 cache rule.
    g = engine_cache(g)

    # 2. per-user stitch over CHUNK SUMMARIES (metadata-sized): the same
    # exact fold, over chunks in order — carry-in y (NULL for the first
    # chunk) and the rn offset.
    summaries = g.select(
        "user_id",
        "chunk",
        F.size("res").alias("cnt"),
        F.element_at("res", -1)["p"].alias("p_end"),
        F.element_at("res", -1)["q"].alias("q_end"),
        F.pow(F.lit(one_m_a), F.size("res").cast("double")).alias("d_end"),
    )
    stitch_expr = """
aggregate(
  sort_array(s),
  named_struct(
    'res', CAST(array() AS array<struct<chunk: bigint, carry: double, rn_offset: bigint>>),
    'y', CAST(NULL AS double), 'off', CAST(0 AS bigint)),
  (acc, x) -> named_struct(
    'res', concat(acc.res, array(named_struct(
      'chunk', x.chunk, 'carry', acc.y, 'rn_offset', acc.off))),
    'y', IF(acc.y IS NULL, x.p_end, x.d_end * acc.y + x.q_end),
    'off', acc.off + x.cnt),
  acc -> acc.res)
"""
    bounds = (
        summaries.groupBy("user_id")
        .agg(
            F.collect_list(
                F.struct("chunk", "cnt", "p_end", "q_end", "d_end")
            ).alias("s")
        )
        .select("user_id", F.explode(F.expr(stitch_expr)).alias("b"))
        .select("user_id", "b.chunk", "b.carry", "b.rn_offset")
    )

    # 3. join carry-ins + offsets back on (user_id, chunk); final value and
    # rn are JVM-side expressions, exactly as before.
    staged = g.select(
        "user_id", "chunk", F.posexplode("res").alias("pos0", "r")
    ).select(
        "user_id",
        "chunk",
        F.col("r.event_id").alias("event_id"),
        (F.col("pos0") + 1).cast("int").alias("pos"),
        F.col("r.p").alias("p"),
        F.col("r.q").alias("q"),
        F.pow(F.lit(one_m_a), (F.col("pos0") + 1).cast("double")).alias("d"),
    )
    out = staged.join(bounds, ["user_id", "chunk"]).select(
        "user_id",
        "event_id",
        (F.col("pos") + F.col("rn_offset")).cast("int").alias("rn"),
        F.round(
            F.when(F.col("carry").isNull(), F.col("p")).otherwise(
                F.col("d") * F.col("carry") + F.col("q")
            ),
            6,
        ).alias("ewma"),
    )
    return out


@register(
    "q_ewma_user_values",
    oracle=f"""
WITH RECURSIVE o AS (
  SELECT user_id, event_id, value,
         row_number() OVER (
           PARTITION BY user_id
           ORDER BY {duck_epoch_sec('ts')}, event_id
         ) AS rn
  FROM events WHERE value IS NOT NULL
),
r(user_id, event_id, rn, y) AS (
  SELECT user_id, event_id, rn, value FROM o WHERE rn = 1
  UNION ALL
  SELECT o.user_id, o.event_id, o.rn,
         (1.0 - {EWMA_ALPHA}) * r.y + {EWMA_ALPHA} * o.value
  FROM r JOIN o ON o.user_id = r.user_id AND o.rn = r.rn + 1
)
SELECT user_id, event_id, rn, round(y, 6) AS ewma FROM r
""",
    tags=("smoothing", "udf", "northstar"),
)
def q_ewma_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ewma_per_user(load_events(spark, sf_dir))


@register(
    "q_ewma_user_values_chunked",
    oracle=f"""
WITH RECURSIVE o AS (
  SELECT user_id, event_id, value,
         row_number() OVER (
           PARTITION BY user_id
           ORDER BY {duck_epoch_sec('ts')}, event_id
         ) AS rn
  FROM events WHERE value IS NOT NULL
),
r(user_id, event_id, rn, y) AS (
  SELECT user_id, event_id, rn, value FROM o WHERE rn = 1
  UNION ALL
  SELECT o.user_id, o.event_id, o.rn,
         (1.0 - {EWMA_ALPHA}) * r.y + {EWMA_ALPHA} * o.value
  FROM r JOIN o ON o.user_id = r.user_id AND o.rn = r.rn + 1
)
SELECT user_id, event_id, rn, round(y, 6) AS ewma FROM r
-- skew-hardened chunked twin of q_ewma_user_values: same recurrence
-- contract, task-bounded execution (operators/smoothing.py docstring)
""",
    tags=("smoothing", "udf", "skew", "northstar"),
)
def q_ewma_user_values_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-hardened chunked EWMA under the SAME recurrence oracle as
    q_ewma_user_values: a hard driver row for the path a skewed 100 TB
    corpus would actually run (pytest additionally pins it byte-identical
    to the unchunked path on a synthetic 100x hot key)."""
    return ewma_per_user_chunked(load_events(spark, sf_dir))

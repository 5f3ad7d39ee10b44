"""Sketch aggregates: approximate distinct counts and quantiles.

At 100 TB, exact `countDistinct` is an Expand + full shuffle per distinct
column (visible in q_daily_traffic's plan); sketches give fixed-size state
and one pass. Spark's HLL++ (`approx_count_distinct`) and t-digest
(`percentile_approx`) estimates are implementation-specific, so raw
estimates cannot be value-hashed against another engine; accuracy is
asserted against exact values in tests/test_sketches.py.

Both the registered primaries (since r11) and their `_struct` siblings
are hash-checkable via the structural-oracle shape (the
q_dedup_keys_xxhash_struct pattern): every EXACT value in the row is
oracled, and the sketch estimate enters only as a within-tolerance
boolean the oracle asserts TRUE. Sketch merges are order-independent
(HLL register max / quantile-summary merge), so the booleans are
deterministic for a fixed fixture regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_search_data_pipeline_spark.functions.timeops import duck_event_date
from clinical_search_data_pipeline_spark.registry import register
from clinical_search_data_pipeline_spark.sources.readers import load_events

HLL_RSD = 0.02  # ~2 % relative standard deviation
SKETCH_TOL = 0.05  # structural-oracle acceptance band (2.5 sigma at rsd=0.02)


def approx_daily_traffic(events: DataFrame, rsd: float = HLL_RSD) -> DataFrame:
    """The daily-traffic mart's distinct counts as HLL++ sketches — the
    scale path for A3's two exact countDistincts (one Expand shuffle
    becomes two fixed-size sketch states). Columns mirror the mart:
    `unique_sessions` = distinct user_id, `unique_documents` = distinct
    event_type (document := event_type per the fixture mapping,
    operators/marts.daily_traffic)."""
    return (
        events.groupBy("event_date")
        .agg(
            F.count("*").alias("total_events"),
            F.approx_count_distinct("user_id", rsd).alias("approx_sessions"),
            F.approx_count_distinct("event_type", rsd).alias("approx_documents"),
        )
        .orderBy("event_date")
    )


def value_quantiles(events: DataFrame, accuracy: int = 10_000) -> DataFrame:
    """Per-type p50/p95/p99 of `value` via percentile_approx (t-digest-like
    sketch; single pass, mergeable across partitions)."""
    return events.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.95, 0.99], accuracy).alias("p"),
    ).select(
        "event_type",
        F.round(F.col("p")[0], 4).alias("p50"),
        F.round(F.col("p")[1], 4).alias("p95"),
        F.round(F.col("p")[2], 4).alias("p99"),
    )


def approx_daily_traffic_struct(
    events: DataFrame, rsd: float = HLL_RSD, tol: float = SKETCH_TOL
) -> DataFrame:
    """Structural-oracle twin of `approx_daily_traffic`: exact counts are
    value-checked by DuckDB; the HLL++ estimates appear only as
    within-tolerance booleans (oracle asserts TRUE).

    The exact-distinct and sketch aggregations run SEPARATELY and join on
    the (tiny) date key: fused into one agg, Catalyst's multi-distinct
    rewrite expands the input 3x and keys the FIRST aggregation by
    (date, user_id, event_type, gid) — so every approx_count_distinct
    partial allocates its multi-KB HLL register bank once per ~high-
    cardinality group instead of once per date (measured 2.8 s -> the
    sub-second it should be at sf0.1; at 100 TB that intermediate is
    hundreds of GB of sketch buffers for no information)."""
    exact = events.groupBy("event_date").agg(
        F.count("*").alias("total_events"),
        F.countDistinct("user_id").alias("unique_sessions"),
        F.countDistinct("event_type").alias("unique_documents"),
    )
    approx = events.groupBy("event_date").agg(
        F.approx_count_distinct("user_id", rsd).alias("_approx_sessions"),
        F.approx_count_distinct("event_type", rsd).alias("_approx_documents"),
    )
    agg = exact.join(approx, "event_date")
    return agg.select(
        "event_date",
        "total_events",
        "unique_sessions",
        "unique_documents",
        (
            F.abs(F.col("_approx_sessions") - F.col("unique_sessions"))
            <= tol * F.col("unique_sessions")
        ).alias("sessions_within_tol"),
        (
            F.abs(F.col("_approx_documents") - F.col("unique_documents"))
            <= tol * F.col("unique_documents")
        ).alias("documents_within_tol"),
    )


QUANTILE_RANK_TOL = 0.02  # rank band, in percentile points


def value_quantiles_struct(
    events: DataFrame, accuracy: int = 10_000, rank_tol: float = QUANTILE_RANK_TOL
) -> DataFrame:
    """Structural-oracle twin of `value_quantiles`: exact interpolated
    percentiles (Spark `percentile` == DuckDB `quantile_cont`, rounded to
    absorb last-ulp drift) are value-checked; the sketch estimate enters as
    a boolean asserting it lies between the exact (p - tol) and (p + tol)
    quantiles. The band is RANK-based because that is the guarantee the
    sketch actually makes (rank error <= ~n/accuracy + 1 sample): at a fat
    tail with few samples per group, adjacent order statistics can differ
    by more than any sane value-relative band, while the rank band stays
    sharp at every corpus size."""
    ps = (0.5, 0.95, 0.99)
    bounds = [(max(0.0, p - rank_tol), min(1.0, p + rank_tol)) for p in ps]
    bounds_sql = ", ".join(f"{x}D" for pair in bounds for x in pair)
    agg = events.groupBy("event_type").agg(
        F.expr("percentile(value, array(0.5D, 0.95D, 0.99D))").alias("pe"),
        F.expr(f"percentile(value, array({bounds_sql}))").alias("pb"),
        F.percentile_approx("value", list(ps), accuracy).alias("pa"),
    )
    out_cols = ["event_type"]
    for i, name in enumerate(("p50", "p95", "p99")):
        agg = agg.withColumn(name, F.round(F.col("pe")[i], 4)).withColumn(
            f"{name}_approx_ok",
            (F.col("pa")[i] >= F.col("pb")[2 * i])
            & (F.col("pa")[i] <= F.col("pb")[2 * i + 1]),
        )
        out_cols += [name, f"{name}_approx_ok"]
    return agg.select(*out_cols)


CMS_DEPTH = 4  # independent hash rows; P[all rows overcount] decays per row
CMS_WIDTH = 256  # buckets per row; E[overcount per row] <= N / width
CMS_HEAVY_DEN = 64  # heavy-hitter threshold: est >= total / 64 (integer form)


def cms_user_counts(
    events: DataFrame, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """Count–Min Sketch (Cormode & Muthukrishnan 2005) point estimates for
    per-user event counts, against the exact counts as evidence.

    Unlike HLL++/t-digest above, a CMS built from DETERMINISTIC hash rows
    (md5-derived, functions/hashing.hash64 — the same oracle-checkable
    family the dedup keys use) is bit-reproducible in any engine, so this
    is the sketch family's first FULL value-hash oracle: `est` itself is
    value-checked, not fenced behind a tolerance boolean.

    Scale shape: the sketch build explodes each event to `depth` (row,
    bucket) cells and aggregates — map-side combine caps every partition's
    shuffle contribution at depth*width rows (4*256 here), INDEPENDENT of
    key cardinality; that fixed-size state is the entire point of CMS at
    100 TB. Point queries join the (tiny, broadcast) sketch on (d, bucket)
    and take the min across rows. The exact side (one user_id-keyed agg)
    exists as evidence for the oracle and the overcount columns — a 100 TB
    deployment keeps only the sketch.

    Output per user: exact, est (>= exact always — CMS never undercounts),
    overcount, and `is_heavy` := est * CMS_HEAVY_DEN >= total(events) —
    the phi=1/64 heavy-hitter test in exact integer arithmetic (CMS
    guarantees no false negatives under this test)."""
    ds = F.array(*[F.lit(d) for d in range(depth)])

    def bucket(key: F.Column) -> F.Column:
        from clinical_search_data_pipeline_spark.functions.hashing import hash64

        return hash64(
            F.concat(F.col("d").cast("string"), F.lit(":"), key)
        ) % width

    ins = events.select(F.col("user_id").cast("string").alias("key")).select(
        "key", F.explode(ds).alias("d")
    )
    sketch = ins.select("d", bucket(F.col("key")).alias("bucket")).groupBy(
        "d", "bucket"
    ).agg(F.count("*").alias("c"))
    exact = events.groupBy("user_id").agg(F.count("*").alias("exact"))
    probes = exact.select(
        "user_id",
        "exact",
        F.explode(ds).alias("d"),
    ).withColumn("bucket", bucket(F.col("user_id").cast("string")))
    est = (
        probes.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("user_id", "exact")
        .agg(F.min("c").alias("est"))
    )
    total = events.agg(F.count("*").alias("total")).withColumn("jkey", F.lit(1))
    return (
        est.withColumn("jkey", F.lit(1))
        .join(F.broadcast(total), "jkey")
        .select(
            "user_id",
            "exact",
            "est",
            (F.col("est") - F.col("exact")).alias("overcount"),
            (F.col("est") * CMS_HEAVY_DEN >= F.col("total")).alias("is_heavy"),
        )
        .orderBy("user_id")
    )


_E_SKETCH = f"""
WITH e AS (
  SELECT user_id, event_type, value, {duck_event_date('ts')} AS event_date
  FROM events
)
"""


def approx_daily_traffic_checked(
    events: DataFrame, rsd: float = HLL_RSD, tol: float = SKETCH_TOL
) -> DataFrame:
    """`approx_daily_traffic`'s output folded into the struct-oracle shape
    (VERDICT r10 #7): the SAME sketch mart the user runs feeds the check —
    exact `total_events` is value-hashed, and each HLL++ estimate enters as
    a within-tolerance boolean the oracle asserts TRUE. Differs from the
    `_struct` twin in that the twin recomputes sketches inline and also
    publishes the exact distinct counts; here the published estimates
    themselves are what gets banded."""
    est = approx_daily_traffic(events, rsd)
    exact = events.groupBy("event_date").agg(
        F.countDistinct("user_id").alias("_xs"),
        F.countDistinct("event_type").alias("_xd"),
    )
    return (
        est.join(exact, "event_date")
        .select(
            "event_date",
            "total_events",
            (
                F.abs(F.col("approx_sessions") - F.col("_xs"))
                <= tol * F.col("_xs")
            ).alias("approx_sessions_ok"),
            (
                F.abs(F.col("approx_documents") - F.col("_xd"))
                <= tol * F.col("_xd")
            ).alias("approx_documents_ok"),
        )
        .orderBy("event_date")
    )


def value_quantiles_checked(
    events: DataFrame,
    accuracy: int = 10_000,
    rank_tol: float = QUANTILE_RANK_TOL,
) -> DataFrame:
    """`value_quantiles`' published (4-decimal-rounded) estimates checked
    against the exact rank band [p - tol, p + tol] — the guarantee the
    sketch actually makes. A 1e-3 slack on the band endpoints absorbs the
    estimate's publication rounding. Exact per-type row count `n` carries
    the value-hash; the estimates enter only as booleans."""
    est = value_quantiles(events, accuracy)
    ps = (0.5, 0.95, 0.99)
    bounds = [(max(0.0, p - rank_tol), min(1.0, p + rank_tol)) for p in ps]
    bounds_sql = ", ".join(f"{x}D" for pair in bounds for x in pair)
    ex = events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.expr(f"percentile(value, array({bounds_sql}))").alias("pb"),
    )
    eps = 1e-3
    out = est.join(ex, "event_type")
    cols = ["event_type", "n"]
    for i, name in enumerate(("p50", "p95", "p99")):
        out = out.withColumn(
            f"{name}_ok",
            (F.col(name) >= F.col("pb")[2 * i] - eps)
            & (F.col(name) <= F.col("pb")[2 * i + 1] + eps),
        )
        cols.append(f"{name}_ok")
    return out.select(*cols)


@register(
    "q_approx_daily_traffic",
    oracle=f"""{_E_SKETCH}
SELECT event_date,
       count(*) AS total_events,
       TRUE AS approx_sessions_ok,
       TRUE AS approx_documents_ok
FROM e GROUP BY 1
""",
    tags=("sketch", "northstar", "struct-oracle"),
)
def q_approx_daily_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return approx_daily_traffic_checked(load_events(spark, sf_dir))


@register(
    "q_value_quantiles",
    oracle=f"""{_E_SKETCH}
SELECT event_type,
       count(*) AS n,
       TRUE AS p50_ok,
       TRUE AS p95_ok,
       TRUE AS p99_ok
FROM e GROUP BY 1
""",
    tags=("sketch", "northstar", "struct-oracle"),
)
def q_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return value_quantiles_checked(load_events(spark, sf_dir))


@register(
    "q_approx_daily_traffic_struct",
    oracle=f"""{_E_SKETCH}
SELECT event_date,
       count(*) AS total_events,
       count(DISTINCT user_id) AS unique_sessions,
       count(DISTINCT event_type) AS unique_documents,
       TRUE AS sessions_within_tol,
       TRUE AS documents_within_tol
FROM e GROUP BY 1
""",
    tags=("sketch", "northstar", "struct-oracle"),
)
def q_approx_daily_traffic_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return approx_daily_traffic_struct(load_events(spark, sf_dir))


def _cms_oracle() -> str:
    from clinical_search_data_pipeline_spark.functions.hashing import duck_hash64

    h = duck_hash64("CAST(d AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)")
    ds = ", ".join(f"({d})" for d in range(CMS_DEPTH))
    return f"""
WITH ds(d) AS (VALUES {ds}),
ins AS (
  SELECT d, {h} % {CMS_WIDTH} AS bucket
  FROM events CROSS JOIN ds
),
sketch AS (SELECT d, bucket, count(*) AS c FROM ins GROUP BY 1, 2),
ex AS (SELECT user_id, count(*) AS exact FROM events GROUP BY 1),
probes AS (
  SELECT user_id, exact, d, {h} % {CMS_WIDTH} AS bucket
  FROM ex CROSS JOIN ds
),
est AS (
  SELECT p.user_id, p.exact, min(s.c) AS est
  FROM probes p JOIN sketch s ON s.d = p.d AND s.bucket = p.bucket
  GROUP BY 1, 2
),
t AS (SELECT count(*) AS total FROM events)
SELECT user_id, exact, est, est - exact AS overcount,
       est * {CMS_HEAVY_DEN} >= total AS is_heavy
FROM est CROSS JOIN t
ORDER BY user_id
"""


@register(
    "q_cms_heavy_hitters",
    oracle=_cms_oracle(),
    tags=("sketch", "northstar", "evidence"),
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count–Min Sketch per-user count estimates + phi=1/64 heavy-hitter
    flags, value-hash-oracled end to end (deterministic md5-derived hash
    rows make the estimates themselves engine-reproducible — unlike the
    HLL/t-digest queries above, no tolerance boolean is needed)."""
    return cms_user_counts(load_events(spark, sf_dir))


@register(
    "q_value_quantiles_struct",
    oracle=f"""{_E_SKETCH}
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       TRUE AS p50_approx_ok,
       round(quantile_cont(value, 0.95), 4) AS p95,
       TRUE AS p95_approx_ok,
       round(quantile_cont(value, 0.99), 4) AS p99,
       TRUE AS p99_approx_ok
FROM e GROUP BY 1
""",
    tags=("sketch", "northstar", "struct-oracle"),
)
def q_value_quantiles_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return value_quantiles_struct(load_events(spark, sf_dir))

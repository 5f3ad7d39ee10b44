"""Dataset splitting, hash sampling, pivot, and set-membership operators.

Training-data pipelines need reproducible splits: `random_split` is
partitioning-dependent, so splits here are **hash-based** — a stable
function of the row's identity, reproducible on any engine and stable
under repartitioning, appends, and backfills. The reference does exactly
this to shard its log by session (md5(session_id) % n,
ingestion/sample_data/session_based_splitter.py:37-44); generalized to
train/val/test assignment and k-of-n sampling.

Pivot and intersect/except round out the relational surface (the reference
has no pivots or set ops; `q_union_days` covers union).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_search_data_pipeline_spark.functions.hashing import duck_hash64, hash64
from clinical_search_data_pipeline_spark.functions.timeops import duck_event_date
from clinical_search_data_pipeline_spark.registry import register
from clinical_search_data_pipeline_spark.sources.readers import load_events, read_table

SPLIT_BUCKETS = 100
VAL_PCT = 10
TEST_PCT = 10


def hash_split(
    df: DataFrame,
    id_col: str,
    val_pct: int = VAL_PCT,
    test_pct: int = TEST_PCT,
    buckets: int = SPLIT_BUCKETS,
) -> DataFrame:
    """Deterministic train/val/test assignment by identity hash.

    All rows sharing an id land in the same split (leak-free grouping);
    proportions hold in expectation. One projection — no shuffle, no state.
    """
    bucket = F.pmod(hash64(F.col(id_col).cast("string")), F.lit(buckets))
    return df.withColumn(
        "split",
        F.when(bucket < test_pct, "test")
        .when(bucket < test_pct + val_pct, "val")
        .otherwise("train"),
    )


def hash_sample(df: DataFrame, id_col: str, keep: int, out_of: int = SPLIT_BUCKETS) -> DataFrame:
    """Deterministic keep/out_of sampling by identity hash — reproducible
    across engines/runs (unlike seeded `df.sample`, which depends on
    partitioning)."""
    return df.filter(F.pmod(hash64(F.col(id_col).cast("string")), F.lit(out_of)) < keep)


def _duck_bucket(id_expr: str, buckets: int = SPLIT_BUCKETS) -> str:
    return f"({duck_hash64(id_expr)} % {buckets} + {buckets}) % {buckets}"


@register(
    "q_hash_split",
    oracle=f"""
WITH b AS (
  SELECT doc_id, lang, {_duck_bucket("CAST(doc_id AS VARCHAR)")} AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < {TEST_PCT} THEN 'test'
            WHEN bucket < {TEST_PCT + VAL_PCT} THEN 'val'
            ELSE 'train' END AS split,
       lang,
       count(*) AS n_docs
FROM b GROUP BY 1, 2
""",
    tags=("splits", "northstar"),
)
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test corpus split sizes per language (hash-deterministic —
    identical assignment in any engine, any run)."""
    docs = hash_split(read_table(spark, sf_dir, "documents"), "doc_id")
    return docs.groupBy("split", "lang").agg(F.count("*").alias("n_docs"))


@register(
    "q_hash_sample",
    oracle=f"""
SELECT doc_id, lang FROM documents
WHERE {_duck_bucket("CAST(doc_id AS VARCHAR)")} < 20
""",
    tags=("splits", "northstar"),
)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20% corpus sample."""
    return hash_sample(read_table(spark, sf_dir, "documents"), "doc_id", keep=20).select(
        "doc_id", "lang"
    )


@register(
    "q_pivot_event_types",
    oracle=f"""
SELECT {duck_event_date('ts')} AS event_date,
       CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
       CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase
FROM events GROUP BY 1
""",
    tags=("relational", "pivot"),
)
def q_pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-day event-type counts via pivot (explicit value list — at
    scale never let pivot infer distinct values with an extra pass)."""
    return (
        load_events(spark, sf_dir)
        .groupBy("event_date")
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["click", "view", "purchase"])
    )


@register(
    "q_user_set_ops",
    oracle=f"""
WITH e AS (
  SELECT user_id, {duck_event_date('ts')} AS event_date, event_type FROM events
),
clickers AS (SELECT DISTINCT user_id FROM e WHERE event_type = 'click'),
purchasers AS (SELECT DISTINCT user_id FROM e WHERE event_type = 'purchase'),
both_u AS (SELECT user_id FROM clickers INTERSECT SELECT user_id FROM purchasers),
only_click AS (SELECT user_id FROM clickers EXCEPT SELECT user_id FROM purchasers)
SELECT 'click_and_purchase' AS cohort, count(*) AS n_users FROM both_u
UNION ALL
SELECT 'click_only', count(*) FROM only_click
""",
    tags=("setop", "relational"),
)
def q_user_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT cohorts (distinct-set semantics; Spark plans both
    as hash joins on the key — no materialized distinct needed)."""
    e = load_events(spark, sf_dir)
    clickers = e.filter("event_type = 'click'").select("user_id").distinct()
    purchasers = e.filter("event_type = 'purchase'").select("user_id").distinct()
    both_u = clickers.intersect(purchasers).agg(F.count("*").alias("n_users")).select(
        F.lit("click_and_purchase").alias("cohort"), "n_users"
    )
    only = clickers.exceptAll(purchasers).agg(F.count("*").alias("n_users")).select(
        F.lit("click_only").alias("cohort"), "n_users"
    )
    return both_u.unionByName(only)

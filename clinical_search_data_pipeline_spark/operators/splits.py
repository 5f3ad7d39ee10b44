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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clinical_search_data_pipeline_spark.functions import textfns
from clinical_search_data_pipeline_spark.operators.fragments import (
    _DUCK_SHINGLES_CTE,
    JACCARD_THRESHOLD,
)
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


# ---------------------------------------------------------------------------
# Training-data mixture & stratified sampling
# ---------------------------------------------------------------------------

# Per-source keep-rate out of SPLIT_BUCKETS (a data-mixture recipe: keep all
# of the curated source, down-weight the bulk ones). Sources not listed get
# the default rate.
MIX_RATES: dict[str, int] = {"src0": 100, "src1": 80, "src2": 50, "src3": 25}
MIX_DEFAULT_RATE = 10
STRATUM_K = 8


def mixture_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    rates: dict[str, int] | None = None,
    default_rate: int = MIX_DEFAULT_RATE,
    buckets: int = SPLIT_BUCKETS,
) -> DataFrame:
    """Weighted dataset-mixture sampling: keep ``rates[source]/buckets`` of
    each source, chosen by identity hash (deterministic, engine-independent,
    stable under repartitioning — the property seeded `df.sample` lacks).

    One narrow projection + filter: no shuffle, pushes straight onto the
    scan; the rate lookup is a literal MapType so Catalyst constant-folds it.
    """
    rates = MIX_RATES if rates is None else rates
    rate_map = F.create_map(
        *[F.lit(x) for kv in rates.items() for x in kv]
    )
    rate = F.coalesce(rate_map[F.col(source_col)], F.lit(default_rate))
    bucket = F.pmod(hash64(F.col(id_col).cast("string")), F.lit(buckets))
    return df.filter(bucket < rate)


def stratified_sample(
    df: DataFrame, stratum_col: str, id_col: str, k: int = STRATUM_K
) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample (class-balanced eval sets):
    rank rows inside each stratum by identity hash and keep the first k.

    One shuffle on the stratum key. At 100 TB guard stratum cardinality:
    a single giant stratum serializes into one task — pre-filter with an
    approximate per-stratum hash threshold first, then rank the survivors.
    """
    w = Window.partitionBy(stratum_col).orderBy(
        hash64(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def _duck_rate_case(source_expr: str) -> str:
    arms = " ".join(
        f"WHEN '{s}' THEN {r}" for s, r in MIX_RATES.items()
    )
    return f"CASE {source_expr} {arms} ELSE {MIX_DEFAULT_RATE} END"


@register(
    "q_mixture_sample",
    oracle=f"""
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
WHERE {_duck_bucket("CAST(doc_id AS VARCHAR)")} < {_duck_rate_case("source")}
GROUP BY source
""",
    tags=("splits", "mixture", "northstar"),
)
def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-mixture corpus composition: per-source doc and char counts after
    weighted hash sampling (the recipe keeps 100% of src0 down to 10% of the
    long tail)."""
    docs = mixture_sample(read_table(spark, sf_dir, "documents"), "doc_id", "source")
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars")
    )


MIX_ALPHA = 0.5  # sampling temperature: alpha<1 upweights small sources


def mixture_weights(docs: DataFrame, alpha: float = MIX_ALPHA) -> DataFrame:
    """Temperature-based source mixing weights (the multilingual-LM recipe:
    ``w_i ∝ n_i^alpha`` renormalized, alpha < 1 flattening the source
    distribution so long-tail sources aren't drowned out).

    One groupBy on source (tiny output) + a broadcast one-row normalizer —
    the corpus pays a single map-side-combined aggregation."""
    per = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(textfns.tokens("text"))).alias("n_tokens"),
    )
    z = per.agg(F.sum(F.pow("n_tokens", alpha)).alias("_z"))
    return per.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.pow("n_tokens", alpha) / F.col("_z"), 6).alias("weight"),
    )


@register(
    "q_mixture_weights",
    oracle=f"""
WITH per AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(len({textfns.duck_tokens('text')})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
),
z AS (SELECT sum(n_tokens ** {MIX_ALPHA}) AS z FROM per)
SELECT source, n_docs, n_tokens,
       round((n_tokens ** {MIX_ALPHA}) / z, 6) AS weight
FROM per, z
""",
    tags=("splits", "mixture", "northstar"),
)
def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mixture_weights(read_table(spark, sf_dir, "documents"))


@register(
    "q_stratified_sample",
    oracle=f"""
WITH ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY {_duck_bucket("CAST(doc_id AS VARCHAR)", 2**60)}, doc_id
         ) AS rk
  FROM documents
)
SELECT doc_id, lang FROM ranked WHERE rk <= {STRATUM_K}
""",
    tags=("splits", "northstar"),
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced sample: exactly 8 deterministic docs per language."""
    return stratified_sample(
        read_table(spark, sf_dir, "documents"), "lang", "doc_id"
    ).select("doc_id", "lang")


# ---------------------------------------------------------------------------
# Sequence packing: concatenate-then-chunk token budgeting
# ---------------------------------------------------------------------------

PACK_BUDGET_TOKENS = 4096


def sequence_pack(
    docs: DataFrame, budget: int = PACK_BUDGET_TOKENS, group_col: str = "source"
) -> DataFrame:
    """Concatenate-then-chunk sequence packing — the layout step an LLM
    training pipeline runs before tokenized shards are written: documents
    are laid end-to-end in a deterministic order and the token stream is cut
    every `budget` tokens; each doc records the chunk range it spans.

    Packing is PER GROUP (`group_col`, default source): the running token
    sum is a window partitioned by group and ordered by doc_id, so the
    shuffle key is the group — never a single global ordering (the W2
    unpartitioned-window hazard). At 100 TB the groups are shard keys and
    each group's stream packs independently; chunk ids are (group, chunk)
    pairs.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = docs.select(
        "doc_id",
        group_col,
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    cum = F.sum("n_tokens").over(w)
    return t.withColumn("_cum", cum).select(
        "doc_id",
        group_col,
        "n_tokens",
        (F.col("_cum") - F.col("n_tokens")).alias("start_pos"),
        F.floor((F.col("_cum") - F.col("n_tokens")) / budget).alias("chunk_start"),
        F.floor((F.col("_cum") - 1) / budget).alias("chunk_end"),
    )


@register(
    "q_sequence_pack",
    oracle=f"""
WITH t AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM t
)
SELECT doc_id, source, n_tokens,
       cum - n_tokens AS start_pos,
       (cum - n_tokens) // {PACK_BUDGET_TOKENS} AS chunk_start,
       (cum - 1) // {PACK_BUDGET_TOKENS} AS chunk_end
FROM c
""",
    tags=("pipeline", "packing", "northstar"),
)
def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-stream packing at a {PACK_BUDGET_TOKENS}-token chunk
    budget (whitespace token count as the stand-in tokenizer)."""
    return sequence_pack(read_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Cluster-safe splits: near-dup-aware train/test assignment
# ---------------------------------------------------------------------------


def cluster_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    val_pct: int = VAL_PCT,
    test_pct: int = TEST_PCT,
) -> DataFrame:
    """(doc_id, cluster_rep, split): train/val/test assignment at
    NEAR-DUP-CLUSTER granularity. Lee et al. 2022 show that duplicated
    text straddling a train/test split inflates eval scores (the model
    has memorized the test set's near-copies); a leak-free split must
    therefore assign whole clusters, not documents. Near-dup pairs ->
    connected components; every document takes its component
    representative (min doc_id; untouched docs represent themselves) as
    its SPLIT IDENTITY, and `hash_split` hashes that — so two documents
    sharing any near-dup path can never land on opposite sides.

    Scale shape: the component relation is edge-sized (orders of
    magnitude smaller than the corpus) and joins back doc-keyed; the
    split itself stays a zero-state projection."""
    from clinical_search_data_pipeline_spark.operators.components import (
        connected_components,
    )

    comp = connected_components(pairs, src=src, dst=dst)
    rep = docs.join(comp, docs["doc_id"] == comp["node"], "left").select(
        docs["doc_id"],
        F.coalesce("component", docs["doc_id"]).alias("cluster_rep"),
    )
    return hash_split(rep, "cluster_rep", val_pct=val_pct, test_pct=test_pct)


@register(
    "q_cluster_safe_split",
    oracle=f"""
WITH {_DUCK_SHINGLES_CTE},
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::DOUBLE AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY 1),
pairs AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b
  WHERE i.n_common / (sa.n_shingles + sb.n_shingles - i.n_common)
        >= {JACCARD_THRESHOLD}
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
reach AS (
  WITH RECURSIVE r(node, label) AS (
    SELECT a, a FROM edges
    UNION
    SELECT e.a, r.label FROM r JOIN edges e ON e.b = r.node
  )
  SELECT node, label FROM r
),
comp AS (SELECT node, min(label) AS component FROM reach GROUP BY node),
rep AS (
  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS cluster_rep
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
)
SELECT doc_id, cluster_rep,
       CASE WHEN {_duck_bucket("CAST(cluster_rep AS VARCHAR)")} < {TEST_PCT}
              THEN 'test'
            WHEN {_duck_bucket("CAST(cluster_rep AS VARCHAR)")}
                 < {TEST_PCT + VAL_PCT} THEN 'val'
            ELSE 'train' END AS split
FROM rep
""",
    tags=("splits", "dedup", "graph", "northstar"),
)
def q_cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leak-free train/val/test split: exact Jaccard near-dup pairs ->
    connected components -> whole-cluster hash assignment, so duplicated
    content never straddles the split (the eval-inflation hazard Lee et
    al. 2022 document)."""
    from clinical_search_data_pipeline_spark.operators.dedup import jaccard_pairs

    docs = read_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs).select("doc_a", "doc_b")
    return cluster_safe_split(docs, pairs)


# ---------------------------------------------------------------------------
# PPS (probability-proportional-to-size) systematic sampling
# ---------------------------------------------------------------------------

PPS_SAMPLES = 64  # target sample size k; stride S = floor(total_weight / k)
PPS_SEED = "pps-v1"
_PPS_BUCKET_SHIFT = 54  # 60-bit hash >> 54 -> 64 uniform buckets


def pps_sample(
    docs: DataFrame, k: int = PPS_SAMPLES, seed: str = PPS_SEED
) -> DataFrame:
    """Systematic PPS sample (Madow): ~k documents drawn with probability
    proportional to size (weight = n_chars), in EXACT integer arithmetic.

    Mixture recipes weight shards by bytes/tokens, not document counts;
    uniform hash sampling (q_hash_sample) under-represents long documents
    by exactly the factor PPS corrects. Classic weighted reservoirs
    (Efraimidis–Spirakis) rank by u^(1/w) — float pow whose last-ulp
    behavior is engine-specific, so it can never be value-hash-oracled.
    Systematic PPS needs only integer sums and floor-division: order docs
    by a seeded hash (the random phase), take the running weight sum, and
    pick each doc with multiplicity
        picks = floor((cum_before + w) / S) - floor(cum_before / S),
    S = floor(W / k). The per-doc picks telescope to EXACTLY floor(W / S)
    total (pytest-pinned), any doc with w >= S is picked with certainty,
    and every figure is bit-identical in any engine.

    Distributed shape (the token_budget/train_order scheme): the seeded
    hash's top 6 bits form 64 uniform buckets; per-bucket weight totals (a
    64-row metadata relation — its prefix-sum window is the ONLY
    single-partition step) yield broadcast bucket offsets, and the
    within-bucket running sum rides a bucket-keyed window. Bucket-major +
    within-bucket order IS the total (shuffle_key, doc_id) order, so the
    result equals the naive global window. The 1-row grand total rides a
    broadcast constant-key join (bounded-scalar allowlist).
    """
    keyed = docs.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("long").alias("w"),
        hash64(F.concat_ws(":", F.lit(seed), F.col("doc_id"))).alias("shuffle_key"),
    ).withColumn("bucket", F.shiftright("shuffle_key", _PPS_BUCKET_SHIFT))
    totals = keyed.groupBy("bucket").agg(F.sum("w").alias("t"))
    w_off = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "bucket",
        F.coalesce(F.sum("t").over(w_off), F.lit(0)).alias("offset"),
    )
    # integer div throughout: `/` on longs is DOUBLE division in Spark,
    # exact only below 2^53 — a 100 TB weight total is past that
    grand = totals.agg(F.sum("t").alias("tot")).select(
        F.greatest(F.expr(f"div(tot, {k})"), F.lit(1).cast("long")).alias("stride"),
        F.lit(1).alias("jkey"),
    )
    w_local = Window.partitionBy("bucket").orderBy("shuffle_key", "doc_id")
    cum = (
        keyed.join(F.broadcast(offsets), "bucket")
        .withColumn(
            "cum_before",
            F.col("offset") + F.coalesce(
                F.sum("w").over(w_local.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .withColumn("jkey", F.lit(1))
        .join(F.broadcast(grand), "jkey")
    )
    picks = F.expr("div(cum_before + w, stride) - div(cum_before, stride)")
    return (
        cum.withColumn("picks", picks.cast("long"))
        .filter(F.col("picks") >= 1)
        .select("doc_id", "lang", "w", "cum_before", "stride", "picks")
        .orderBy("doc_id")
    )


@register(
    "q_pps_sample",
    oracle=f"""
WITH k AS (
  SELECT doc_id, lang, n_chars::BIGINT AS w,
         {duck_hash64(f"'{PPS_SEED}' || ':' || CAST(doc_id AS VARCHAR)")}
           AS shuffle_key
  FROM documents
),
c AS (
  SELECT doc_id, lang, w,
         COALESCE(sum(w) OVER (
           ORDER BY shuffle_key, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0)::BIGINT AS cum_before
  FROM k
),
t AS (
  SELECT GREATEST(sum(w) // {PPS_SAMPLES}, 1)::BIGINT AS stride FROM k
)
SELECT doc_id, lang, w, cum_before, stride,
       ((cum_before + w) // stride - cum_before // stride)::BIGINT AS picks
FROM c CROSS JOIN t
WHERE (cum_before + w) // stride - cum_before // stride >= 1
ORDER BY doc_id
""",
    tags=("sampling", "northstar"),
)
def q_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic PPS sample over documents, weight = n_chars: ~64 docs
    drawn proportional-to-size in exact integer arithmetic (see
    pps_sample). Certainty items (w >= stride) carry picks > 1."""
    return pps_sample(read_table(spark, sf_dir, "documents"))

"""Embedding similarity search: brute-force cosine top-k, near-dup pairs,
and random-hyperplane LSH-bucketed ANN.

North-star operators over the `embeddings` fixture (array<float>, dim 64).
All math is higher-order Catalyst expressions (`zip_with`/`aggregate`) — no
UDFs, no Python in the hot loop. FP discipline: floats are cast to double
once, dot products fold sequentially in array order in BOTH engines
(Spark `aggregate` with 0.0 init == DuckDB `list_reduce`, since 0.0+x == x),
so scores are bit-identical and safely rounded for the value hash.

Scale design:
* brute-force: broadcast the (small) query set against the candidate scan —
  one pass over the big side, per-partition top-k via window. This is the
  exact baseline.
* LSH: 8 deterministic random hyperplanes -> 8-bit bucket; candidates meet
  in an equi-join on bucket (IVF-style shuffle-on-key, no cross join). The
  hyperplane weights are derived from md5 (functions/hashing.hash64 formula)
  so Spark, DuckDB — and any future engine — regenerate identical planes.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clinical_search_data_pipeline_spark.registry import register
from clinical_search_data_pipeline_spark.sources.readers import fan_out, read_table

DIM = 64
N_PLANES = 8
N_QUERIES = 8
TOP_K = 5
NEARDUP_THRESHOLD = 0.45  # fixture max pairwise cosine ~0.5


def _plane_weight(plane: int, dim: int) -> float:
    """Deterministic pseudo-random weight in [-1, 1): 60-bit md5 prefix of
    'plane_dim' (same formula as functions/hashing.hash64), scaled."""
    h = int(hashlib.md5(f"{plane}_{dim}".encode()).hexdigest()[:15], 16)
    return (h % 2001 - 1000) / 1000.0


def plane_weights(n_planes: int = N_PLANES, dim: int = DIM) -> list[list[float]]:
    return [[_plane_weight(p, d) for d in range(dim)] for p in range(n_planes)]


# --- shared expression fragments (Spark SQL | DuckDB SQL) -------------------


def _spark_dot(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _duck_dot(a: str, b: str) -> str:
    # operands parenthesized so literal-array arguments (`[..]::DOUBLE[]`)
    # parse when indexed
    return (
        f"list_reduce(list_transform(range(1, len({a}) + 1), i -> ({a})[i] * ({b})[i]), "
        f"(acc, v) -> acc + v)"
    )


_SPARK_V = "transform(embedding, x -> CAST(x AS DOUBLE))"
_DUCK_V = "embedding::DOUBLE[]"


def vectors_with_norms(emb: DataFrame) -> DataFrame:
    """(vec_id, label, v: array<double>, norm) — the canonical vector relation.

    `fan_out` first: every downstream op (cross join probe, broadcast-join
    stream side, LSH bucket projection) is narrow, so without it the whole
    vector pipeline would run at the input-split count — one task for a
    single-file scan (sources/readers.fan_out)."""
    return fan_out(emb).select(
        "vec_id",
        "label",
        F.expr(_SPARK_V).alias("v"),
    ).withColumn("norm", F.expr(f"sqrt({_spark_dot('v', 'v')})"))


_DUCK_BASE_CTE = f"""
base AS (
  SELECT vec_id, label, {_DUCK_V} AS v FROM embeddings
),
n AS (
  SELECT vec_id, label, v, sqrt({_duck_dot('v', 'v')}) AS norm FROM base
)"""


def cosine_topk(
    emb: DataFrame, n_queries: int = N_QUERIES, k: int = TOP_K
) -> DataFrame:
    """Exact brute-force cosine top-k: broadcast queries x one candidate scan.

    The window is partitioned by query_id (n_queries partitions) — fine for a
    bounded query set; for query sets at data scale use the LSH path.
    """
    base = vectors_with_norms(emb)
    queries = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    scored = (
        base.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("score", F.expr(_spark_dot("v", "qv")) / (F.col("norm") * F.col("qnorm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round("score", 4).alias("score"),
        )
    )


def embedding_neardup_pairs(
    emb: DataFrame, threshold: float = NEARDUP_THRESHOLD
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact, all-pairs).

    All-pairs is quadratic — correct as the verification baseline; the LSH
    bucket join below is the scale path. Filter on the *unrounded* score so
    the threshold semantics match the oracle exactly.
    """
    base = vectors_with_norms(emb)
    a = base.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("norm").alias("na")
    )
    b = base.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("norm").alias("nb")
    )
    scored = (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("score", F.expr(_spark_dot("va", "vb")) / (F.col("na") * F.col("nb")))
        .filter(F.col("score") >= threshold)
    )
    return scored.select("vec_a", "vec_b", F.round("score", 4).alias("cosine"))


def lsh_buckets(emb: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """Random-hyperplane bucket id per vector (sign bit per plane)."""
    base = vectors_with_norms(emb)
    planes = plane_weights(n_planes)
    bucket_terms = []
    df = base
    for p, weights in enumerate(planes):
        lit = "array(" + ", ".join(f"CAST({w} AS DOUBLE)" for w in weights) + ")"
        bucket_terms.append(f"(CASE WHEN {_spark_dot('v', lit)} >= 0 THEN {1 << p} ELSE 0 END)")
    return df.withColumn("bucket", F.expr(" + ".join(bucket_terms)))


def ann_lsh_topk(
    emb: DataFrame, n_queries: int = N_QUERIES, k: int = TOP_K, n_planes: int = N_PLANES
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    Plan shape at scale: bucket both sides once (shuffle on bucket), equi-join
    — never a cross join. Recall improves with multi-probe (flip one bucket
    bit); exactness is covered by `cosine_topk`.
    """
    bucketed = lsh_buckets(emb, n_planes)
    queries = bucketed.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
        F.col("bucket").alias("qbucket"),
    )
    cand = bucketed.join(
        F.broadcast(queries),
        (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("query_id")),
    ).withColumn("score", F.expr(_spark_dot("v", "qv")) / (F.col("norm") * F.col("qnorm")))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "bucket",
            "rank",
            F.round("score", 4).alias("score"),
        )
    )


# ---------------------------------------------------------------------------
# Registered queries + oracles
# ---------------------------------------------------------------------------


@register(
    "q_embedding_norms",
    oracle=f"""
WITH {_DUCK_BASE_CTE}
SELECT vec_id, label, round(norm, 4) AS norm FROM n
""",
    tags=("similarity", "northstar"),
)
def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vectors_with_norms(read_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "label", F.round("norm", 4).alias("norm")
    )


@register(
    "q_cosine_topk",
    oracle=f"""
WITH {_DUCK_BASE_CTE},
q AS (
  SELECT vec_id AS query_id, v AS qv, norm AS qnorm FROM n WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.query_id, n.vec_id AS neighbor_id,
         {_duck_dot('n.v', 'q.qv')} / (n.norm * q.qnorm) AS raw_score
  FROM n, q WHERE n.vec_id <> q.query_id
)
SELECT query_id, neighbor_id,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY raw_score DESC, neighbor_id ASC) AS rank,
       round(raw_score, 4) AS score
FROM scored QUALIFY rank <= {TOP_K}
""",
    tags=("similarity", "northstar"),
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_topk(read_table(spark, sf_dir, "embeddings"))


@register(
    "q_embedding_neardup",
    oracle=f"""
WITH {_DUCK_BASE_CTE},
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         {_duck_dot('a.v', 'b.v')} / (a.norm * b.norm) AS raw
  FROM n a JOIN n b ON a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, round(raw, 4) AS cosine
FROM pairs WHERE raw >= {NEARDUP_THRESHOLD}
""",
    tags=("similarity", "dedup", "northstar"),
)
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_neardup_pairs(read_table(spark, sf_dir, "embeddings"))


def _duck_bucket_expr() -> str:
    terms = []
    for p, weights in enumerate(plane_weights()):
        lit = "[" + ", ".join(str(w) for w in weights) + "]::DOUBLE[]"
        terms.append(f"(CASE WHEN {_duck_dot('v', lit)} >= 0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(terms)


@register(
    "q_ann_lsh_topk",
    oracle=f"""
WITH {_DUCK_BASE_CTE},
bucketed AS (
  SELECT vec_id, v, norm, {_duck_bucket_expr()} AS bucket FROM n
),
q AS (
  SELECT vec_id AS query_id, v AS qv, norm AS qnorm, bucket AS qbucket
  FROM bucketed WHERE vec_id < {N_QUERIES}
),
cand AS (
  SELECT q.query_id, b.vec_id AS neighbor_id, b.bucket,
         {_duck_dot('b.v', 'q.qv')} / (b.norm * q.qnorm) AS raw
  FROM bucketed b JOIN q ON b.bucket = q.qbucket AND b.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, bucket,
       row_number() OVER (PARTITION BY query_id ORDER BY raw DESC, neighbor_id ASC) AS rank,
       round(raw, 4) AS score
FROM cand QUALIFY rank <= {TOP_K}
""",
    tags=("similarity", "northstar", "lsh"),
)
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann_lsh_topk(read_table(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# Vectorized (Arrow/numpy) brute-force scorer — the BLAS fast path
# ---------------------------------------------------------------------------


def cosine_topk_vectorized(
    emb: DataFrame, n_queries: int = N_QUERIES, k: int = TOP_K
) -> DataFrame:
    """`cosine_topk` with the scoring done by a scalar `@pandas_udf`:
    each Arrow batch becomes a (batch x dim) numpy matrix and one BLAS
    matvec scores the whole batch — ~10-100x less per-row overhead than
    interpreting higher-order lambdas when dim is large.

    Same plan shape as the exact path (broadcast queries, per-query window
    top-k). numpy's pairwise summation can differ from sequential folding in
    the last float bits, so this op is registered ROWS-ONLY; equality of the
    returned neighbor sets vs the exact path is asserted in
    tests/test_vectorized.py.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def batch_cosine(v: pd.Series, qv: pd.Series) -> pd.Series:
        m = np.asarray(v.tolist(), dtype=np.float64)
        q = np.asarray(qv.tolist(), dtype=np.float64)
        num = np.einsum("ij,ij->i", m, q)
        den = np.linalg.norm(m, axis=1) * np.linalg.norm(q, axis=1)
        return pd.Series(num / den)

    base = fan_out(emb).select("vec_id", F.expr(_SPARK_V).alias("v"))
    queries = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        base.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("score", batch_cosine("v", "qv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round("score", 4).alias("score"),
        )
    )


@register(
    "q_cosine_topk_vectorized",
    tags=("similarity", "northstar", "pandas-udf", "rows-only"),
)
def q_cosine_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_topk_vectorized(read_table(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# IVF-style ANN: coarse quantization cells + within-cell search
# ---------------------------------------------------------------------------

N_CENTROIDS = 8
CENTROID_BASE = 100  # deterministic coarse centroids: vec_ids 100..107


def ivf_assignments(emb: DataFrame, n_centroids: int = N_CENTROIDS) -> DataFrame:
    """(vec_id, v, norm, cell) — each vector assigned to its max-cosine
    coarse centroid (IVF cell).

    Centroids here are a deterministic sample (fixed vec_ids) so the oracle
    reproduces them; production seeds them with k-means|| (pyspark.ml
    KMeans) — the assignment/search plan shape is identical. Assignment is
    a broadcast of K centroids against one scan + an argmax window keyed by
    vec_id (shuffle on vec_id only).
    """
    base = vectors_with_norms(emb)
    cents = base.filter(
        (F.col("vec_id") >= CENTROID_BASE)
        & (F.col("vec_id") < CENTROID_BASE + n_centroids)
    ).select(
        (F.col("vec_id") - CENTROID_BASE).alias("cell"),
        F.col("v").alias("cv"),
        F.col("norm").alias("cnorm"),
    )
    scored = base.crossJoin(F.broadcast(cents)).withColumn(
        "_cscore", F.expr(_spark_dot("v", "cv")) / (F.col("norm") * F.col("cnorm"))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("_cscore").desc(), F.col("cell").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "v", "norm", "cell")
    )


def ann_ivf_topk(
    emb: DataFrame, n_queries: int = N_QUERIES, k: int = TOP_K
) -> DataFrame:
    """Approximate top-k searching only the query's IVF cell (equi-join on
    cell — the candidate set shrinks ~n_centroids-fold; recall grows with
    nprobe>1 by also joining the next-best cells, same plan shape)."""
    assigned = ivf_assignments(emb).cache()
    queries = assigned.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
        F.col("cell").alias("qcell"),
    )
    cand = assigned.join(
        F.broadcast(queries),
        (F.col("cell") == F.col("qcell")) & (F.col("vec_id") != F.col("query_id")),
    ).withColumn("score", F.expr(_spark_dot("v", "qv")) / (F.col("norm") * F.col("qnorm")))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "cell",
            "rank",
            F.round("score", 4).alias("score"),
        )
    )


@register(
    "q_ann_ivf_topk",
    oracle=f"""
WITH {_DUCK_BASE_CTE},
cents AS (
  SELECT vec_id - {CENTROID_BASE} AS cell, v AS cv, norm AS cnorm
  FROM n WHERE vec_id >= {CENTROID_BASE} AND vec_id < {CENTROID_BASE + N_CENTROIDS}
),
assign AS (
  SELECT vec_id, v, norm, cell,
         row_number() OVER (
           PARTITION BY vec_id
           ORDER BY {_duck_dot('v', 'cv')} / (norm * cnorm) DESC, cell ASC
         ) AS rn
  FROM n CROSS JOIN cents
),
cells AS (SELECT vec_id, v, norm, cell FROM assign WHERE rn = 1),
q AS (
  SELECT vec_id AS query_id, v AS qv, norm AS qnorm, cell AS qcell
  FROM cells WHERE vec_id < {N_QUERIES}
),
cand AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, c.cell,
         {_duck_dot('c.v', 'q.qv')} / (c.norm * q.qnorm) AS raw
  FROM cells c JOIN q ON c.cell = q.qcell AND c.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cell,
       row_number() OVER (PARTITION BY query_id ORDER BY raw DESC, neighbor_id ASC) AS rank,
       round(raw, 4) AS score
FROM cand QUALIFY rank <= {TOP_K}
""",
    tags=("similarity", "northstar", "ivf"),
)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann_ivf_topk(read_table(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# Multi-probe LSH: probe the query's bucket plus all 1-bit-flip neighbors
# ---------------------------------------------------------------------------


def ann_lsh_multiprobe_topk(
    emb: DataFrame, n_queries: int = N_QUERIES, k: int = TOP_K, n_planes: int = N_PLANES
) -> DataFrame:
    """`ann_lsh_topk` with Hamming-1 multi-probe: each query probes its own
    bucket and every bucket one sign-flip away (n_planes+1 probes). Recall
    recovers the neighbors lost to hyperplane boundary noise while the plan
    stays an equi-join — probes explode on the SMALL (query) side only, so
    the big side is still scanned once and shuffled on bucket."""
    bucketed = lsh_buckets(emb, n_planes)
    probes = F.array(
        F.col("qbucket"),
        *[F.expr(f"qbucket ^ {1 << p}").cast("int") for p in range(n_planes)],
    )
    queries = (
        bucketed.filter(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("norm").alias("qnorm"),
            F.col("bucket").cast("int").alias("qbucket"),
        )
        .withColumn("probe", F.explode(probes))
    )
    cand = bucketed.join(
        F.broadcast(queries),
        (F.col("bucket") == F.col("probe")) & (F.col("vec_id") != F.col("query_id")),
    ).withColumn("score", F.expr(_spark_dot("v", "qv")) / (F.col("norm") * F.col("qnorm")))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round("score", 4).alias("score"),
        )
    )


_DUCK_PROBES = "[" + ", ".join(
    ["qbucket"] + [f"xor(qbucket, {1 << p})" for p in range(N_PLANES)]
) + "]"


@register(
    "q_ann_lsh_multiprobe",
    oracle=f"""
WITH {_DUCK_BASE_CTE},
bucketed AS (
  SELECT vec_id, v, norm, {_duck_bucket_expr()} AS bucket FROM n
),
q0 AS (
  SELECT vec_id AS query_id, v AS qv, norm AS qnorm, bucket AS qbucket
  FROM bucketed WHERE vec_id < {N_QUERIES}
),
q AS (
  SELECT query_id, qv, qnorm, unnest({_DUCK_PROBES}) AS probe FROM q0
),
cand AS (
  SELECT q.query_id, b.vec_id AS neighbor_id,
         {_duck_dot('b.v', 'q.qv')} / (b.norm * q.qnorm) AS raw
  FROM bucketed b JOIN q ON b.bucket = q.probe AND b.vec_id <> q.query_id
)
SELECT query_id, neighbor_id,
       row_number() OVER (PARTITION BY query_id ORDER BY raw DESC, neighbor_id ASC) AS rank,
       round(raw, 4) AS score
FROM cand QUALIFY rank <= {TOP_K}
""",
    tags=("similarity", "northstar", "lsh", "multiprobe"),
)
def q_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann_lsh_multiprobe_topk(read_table(spark, sf_dir, "embeddings"))

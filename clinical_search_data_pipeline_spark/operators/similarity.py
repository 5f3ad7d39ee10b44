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

from clinical_search_data_pipeline_spark.caching import engine_cache
from clinical_search_data_pipeline_spark.functions.hashing import duck_hash64, hash64
from clinical_search_data_pipeline_spark.registry import register
from clinical_search_data_pipeline_spark.sources.readers import fan_out, read_table

# Constants and oracle fragments live in operators/fragments.py (a
# non-registering module) so that `components` can use them without
# importing this module's 9 registrations into the driver window.
from clinical_search_data_pipeline_spark.operators.fragments import (  # noqa: F401
    DIM,
    N_PLANES,
    N_QUERIES,
    NEARDUP_THRESHOLD,
    TOP_K,
    _DUCK_BASE_CTE,
    _DUCK_V,
    _SPARK_V,
    _duck_dot,
    _spark_dot,
)


def _plane_weight(plane: int, dim: int) -> float:
    """Deterministic pseudo-random weight in [-1, 1): 60-bit md5 prefix of
    'plane_dim' (same formula as functions/hashing.hash64), scaled."""
    h = int(hashlib.md5(f"{plane}_{dim}".encode()).hexdigest()[:15], 16)
    return (h % 2001 - 1000) / 1000.0


def plane_weights(n_planes: int = N_PLANES, dim: int = DIM) -> list[list[float]]:
    return [[_plane_weight(p, d) for d in range(dim)] for p in range(n_planes)]


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


N_BLOCKS = 16  # block-pair join width; at scale pick B ≈ n / rows-per-task


def embedding_neardup_pairs(
    emb: DataFrame, threshold: float = NEARDUP_THRESHOLD, n_blocks: int = N_BLOCKS
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — EXACT, via a block-pair
    equi-join (no CartesianProduct node anywhere in the plan).

    Exact all-pairs *semantics* is inherently Θ(n²) compute; what must not be
    quadratic-fragile is the PLAN. Each vector lands in block
    ``vec_id % n_blocks`` and is replicated to every unordered block-pair key
    containing its block (left role: (blk, j) for j ≥ blk; right role:
    (i, blk) for i ≤ blk — ≤ n_blocks+1 replicas per row, explicit and
    bounded). Pairs then meet in a SHUFFLE HASH/SMJ EQUI-JOIN on the
    block-pair key: B(B+1)/2 keys of (n/B)² work each — uniform by
    construction (no skew, no driver collect), and B is the scale knob
    (B ≈ n/√(target pairs-per-task) at 100 TB). Sub-quadratic needs an
    approximation: see `embedding_neardup_lsh` (banded hyperplane LSH) — on
    this fixture the τ=0.45 pairs sit at θ≈63° against a θ≈90° background,
    too weak a gap for LSH to guarantee recall, which is WHY the exact
    operator keeps exact semantics and the approximate one is a separate
    contract.

    Block assignment never affects the OUTPUT (only the plan), so the
    all-pairs oracle is unchanged. Filter on the *unrounded* score so the
    threshold semantics match the oracle exactly.
    """
    base = vectors_with_norms(emb).withColumn(
        "blk", F.pmod(F.col("vec_id"), F.lit(n_blocks)).cast("int")
    )
    left = base.withColumn(
        "pk",
        F.explode(
            F.expr(f"transform(sequence(blk, {n_blocks - 1}), j -> blk * {n_blocks} + j)")
        ),
    ).select("pk", F.col("blk").alias("blk_l"), F.col("vec_id").alias("vid_l"),
             F.col("v").alias("va"), F.col("norm").alias("na"))
    right = base.withColumn(
        "pk",
        F.explode(
            F.expr(f"transform(sequence(0, blk), i -> i * {n_blocks} + blk)")
        ),
    ).select("pk", F.col("blk").alias("blk_r"), F.col("vec_id").alias("vid_r"),
             F.col("v").alias("vb"), F.col("norm").alias("nb"))
    scored = (
        left.join(
            right,
            (left["pk"] == right["pk"])
            & ((F.col("blk_l") != F.col("blk_r")) | (F.col("vid_l") < F.col("vid_r"))),
        )
        .withColumn("score", F.expr(_spark_dot("va", "vb")) / (F.col("na") * F.col("nb")))
        .filter(F.col("score") >= threshold)
    )
    return scored.select(
        F.least("vid_l", "vid_r").alias("vec_a"),
        F.greatest("vid_l", "vid_r").alias("vec_b"),
        F.round("score", 4).alias("cosine"),
    )


LSH_BANDS = 8   # banded near-dup LSH: bands
LSH_BITS = 8    # hyperplane sign bits per band


def banded_lsh_keys(
    emb: DataFrame, bands: int = LSH_BANDS, bits: int = LSH_BITS
) -> DataFrame:
    """(vec_id, v, norm, band, bucket) — one row per (vector, band); bucket =
    the band's `bits` hyperplane sign bits. One literal plane matrix, dots
    via a single `transform`, bands exploded with `inline` — all JVM-side."""
    base = vectors_with_norms(emb)
    planes = plane_weights(bands * bits)
    # ONE parsed SQL literal for the whole plane matrix — building it from
    # nested F.array(F.lit(...)) costs a py4j round-trip per element (4096
    # calls ≈ 4 s of driver time); one expr string parses JVM-side in ms.
    # str(float) is the shortest round-tripping repr, so the parsed doubles
    # are bit-identical to the Python-side weights the oracle uses.
    pl = F.expr(
        "array("
        + ", ".join(
            "array(" + ", ".join(f"{w!r}D" for w in ws) + ")" for ws in planes
        )
        + ")"
    )
    dots = (
        "transform(_pl, pw -> aggregate(zip_with(v, pw, (x, y) -> x * y), "
        "CAST(0.0 AS DOUBLE), (acc, t) -> acc + t))"
    )
    band_rows = (
        f"inline(transform(sequence(0, {bands - 1}), b -> named_struct("
        f"'band', b, "
        f"'bucket', aggregate(sequence(0, {bits - 1}), 0, "
        f"(acc, r) -> acc + IF(_dots[b * {bits} + r] >= CAST(0.0 AS DOUBLE), shiftleft(1, r), 0)))))"
    )
    return (
        base.withColumn("_pl", pl)
        .withColumn("_dots", F.expr(dots))
        .select("vec_id", "v", "norm", F.expr(band_rows))
    )


def embedding_neardup_lsh(
    emb: DataFrame,
    threshold: float = NEARDUP_THRESHOLD,
    bands: int = LSH_BANDS,
    bits: int = LSH_BITS,
) -> DataFrame:
    """APPROXIMATE embedding near-dup: candidates = pairs agreeing on all
    `bits` hyperplane signs of at least one band (equi-join on (band,
    bucket) — the sub-quadratic scale path), then exact re-scoring of
    candidates only, threshold on the unrounded score.

    The contract is deterministic (fixed md5-seeded planes), so the query is
    FULLY ORACLED — the oracle reproduces the banding, not just the scoring.
    Recall is the standard banded-LSH curve 1-(1-p^bits)^bands with
    p = 1 - θ/π: ~93% at cosine 0.9 with the 8×8 default, while only ~3% of
    random (θ≈90°) pairs become candidates. At this fixture's τ=0.45
    (θ≈63°) the curve is intentionally weak — exact semantics at that
    regime is `embedding_neardup_pairs`' job (see its docstring).
    """
    # the (vec, band, bucket) relation feeds both join sides — materialize
    # the 64-dot banding pass once (released per-query by the harness loops)
    keyed = engine_cache(
        banded_lsh_keys(emb, bands, bits).select("vec_id", "band", "bucket")
    )
    a = keyed.select("band", "bucket", F.col("vec_id").alias("vec_a"))
    b = keyed.select(
        F.col("band").alias("band_b"), F.col("bucket").alias("bucket_b"),
        F.col("vec_id").alias("vec_b"),
    )
    cand = (
        a.join(
            b,
            (F.col("band") == F.col("band_b"))
            & (F.col("bucket") == F.col("bucket_b"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .select("vec_a", "vec_b")
        .distinct()
    )
    base = vectors_with_norms(emb)
    x = base.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("norm").alias("na"))
    y = base.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("norm").alias("nb"))
    scored = (
        cand.join(x, "vec_a")
        .join(y, "vec_b")
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


@register(
    "q_embedding_neardup_lsh",
    oracle=f"""
WITH {_DUCK_BASE_CTE},
planes AS (
  SELECT p, list_transform(range(0, {DIM}), d ->
    ((CAST(('0x' || substring(md5(CAST(p AS VARCHAR) || '_' || CAST(d AS VARCHAR)), 1, 15)) AS BIGINT)
      % 2001) - 1000) / 1000.0) AS pw
  FROM range(0, {LSH_BANDS * LSH_BITS}) t(p)
),
dots AS (
  SELECT n.vec_id, pl.p,
         list_reduce(list_transform(range(1, {DIM} + 1), i -> n.v[i] * pl.pw[i]),
                     (a, b) -> a + b) AS dot
  FROM n, planes pl
),
bk AS (
  SELECT vec_id, p // {LSH_BITS} AS band,
         sum(CASE WHEN dot >= 0 THEN (1 << (p % {LSH_BITS})) ELSE 0 END) AS bucket
  FROM dots GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bk a JOIN bk b
    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
),
scored AS (
  SELECT c.vec_a, c.vec_b, {_duck_dot('x.v', 'y.v')} / (x.norm * y.norm) AS raw
  FROM cand c JOIN n x ON x.vec_id = c.vec_a JOIN n y ON y.vec_id = c.vec_b
)
SELECT vec_a, vec_b, round(raw, 4) AS cosine FROM scored WHERE raw >= {NEARDUP_THRESHOLD}
""",
    tags=("similarity", "dedup", "northstar", "lsh"),
)
def q_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH near-dup (sub-quadratic candidates, exact re-score); the
    oracle reproduces the deterministic md5-seeded banding bit-for-bit."""
    return embedding_neardup_lsh(read_table(spark, sf_dir, "embeddings"))


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
                          ORDER BY raw_score DESC, neighbor_id ASC) AS rank
FROM scored QUALIFY rank <= {TOP_K}
""",
    tags=("similarity", "northstar", "pandas-udf"),
)
def q_cosine_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLAS-scored top-k, oracled on the (query, neighbor, rank) relation:
    numpy's pairwise-summed floats can differ from the sequential fold in
    the last bits, so the float score stays out of the hash — but the
    neighbor SETS and ranks must (and do) agree exactly with the
    sequential-fold oracle; full score equality vs the exact path is
    additionally asserted in tests/test_vectorized.py."""
    return cosine_topk_vectorized(read_table(spark, sf_dir, "embeddings")).drop("score")


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
    emb: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    assignments_fn=None,
) -> DataFrame:
    """Approximate top-k searching only the query's IVF cell (equi-join on
    cell — the candidate set shrinks ~n_centroids-fold; recall grows with
    nprobe>1 by also joining the next-best cells, same plan shape).
    `assignments_fn` swaps the coarse quantizer (default: seed-centroid
    `ivf_assignments`; pass `clustering.kmeans_refined_cells` for the
    Lloyd-refined cells — ann_recall_report.py measures the recall uplift
    that swap buys)."""
    # Deliberately NOT cached: the relation feeds only the (tiny,
    # broadcast) query branch and one full scan; recomputing the assignment
    # is one narrow pass and measured faster than any materialization
    # (cache 1.8s / localCheckpoint 5.4s / recompute 1.2s at sf0.1).
    assigned = (assignments_fn or ivf_assignments)(emb)
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


IVF_NPROBE = 2


def ann_ivf_multiprobe_topk(
    emb: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    nprobe: int = IVF_NPROBE,
    assignments_fn=None,
) -> DataFrame:
    """IVF with nprobe>1: each query searches its `nprobe` best cells (by
    centroid cosine), not just the argmax cell — the standard recall knob.
    Plan shape is unchanged: probes explode on the SMALL (query) side only
    (nprobe rows per query in the broadcast), the big side is still scanned
    once and equi-joined on cell; no duplicate candidates since every vector
    belongs to exactly one cell."""
    assigned = (assignments_fn or ivf_assignments)(emb)
    base = vectors_with_norms(emb)
    cents = base.filter(
        (F.col("vec_id") >= CENTROID_BASE)
        & (F.col("vec_id") < CENTROID_BASE + N_CENTROIDS)
    ).select(
        (F.col("vec_id") - CENTROID_BASE).alias("pcell"),
        F.col("v").alias("cv"),
        F.col("norm").alias("cnorm"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("_cscore").desc(), F.col("pcell").asc()
    )
    probes = (
        base.filter(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("norm").alias("qnorm"),
        )
        .crossJoin(F.broadcast(cents))
        .withColumn(
            "_cscore", F.expr(_spark_dot("qv", "cv")) / (F.col("qnorm") * F.col("cnorm"))
        )
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "qv", "qnorm", F.col("pcell").alias("qcell"))
    )
    cand = assigned.join(
        F.broadcast(probes),
        (F.col("cell") == F.col("qcell")) & (F.col("vec_id") != F.col("query_id")),
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


@register(
    "q_ann_ivf_multiprobe",
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
probes AS (
  SELECT vec_id AS query_id, v AS qv, norm AS qnorm, cell AS qcell
  FROM assign WHERE vec_id < {N_QUERIES} AND rn <= {IVF_NPROBE}
),
cand AS (
  SELECT p.query_id, c.vec_id AS neighbor_id,
         {_duck_dot('c.v', 'p.qv')} / (c.norm * p.qnorm) AS raw
  FROM cells c JOIN probes p ON c.cell = p.qcell AND c.vec_id <> p.query_id
)
SELECT query_id, neighbor_id,
       row_number() OVER (PARTITION BY query_id ORDER BY raw DESC, neighbor_id ASC) AS rank,
       round(raw, 4) AS score
FROM cand QUALIFY rank <= {TOP_K}
""",
    tags=("similarity", "northstar", "ivf", "multiprobe"),
)
def q_ann_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann_ivf_multiprobe_topk(read_table(spark, sf_dir, "embeddings"))


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


# ---------------------------------------------------------------------------
# Product quantization (PQ) with ADC scoring — the memory-compression path
# ---------------------------------------------------------------------------

PQ_M = 32  # subspaces; each vector compresses to M codes
PQ_SUB = DIM // PQ_M  # dims per subspace
PQ_K = 32  # codewords per subspace -> 5 bits/code, 160 bits/vector (25x)
PQ_CODEBOOK_BASE = 200  # deterministic codebooks: unit vecs 200..231, sliced
# (M, K) swept at sf0.001 against the exact top-k: (8,16)->5%, (8,32)->7%,
# (16,16)->17%, (16,32)->32%, (32,16)->50%, (32,32)->62% recall@5 — short
# 2-dim subspaces quantize the fixture's decorrelated dims far better than
# wide ones at equal bit budget. Production trains codebooks with k-means
# (clustering.kmeans_train) instead of slicing fixture rows; plan unchanged.


def _spark_l2sq(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _duck_l2sq(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, len({a}) + 1), "
        f"i -> (({a})[i] - ({b})[i]) * (({a})[i] - ({b})[i])), "
        f"(acc, v) -> acc + v)"
    )


def pq_subvectors(emb: DataFrame) -> DataFrame:
    """(vec_id, m, su) — every vector L2-normalized (so squared-L2 ordering
    == cosine ordering: ||a-b||^2 = 2 - 2cos for unit vectors) and split
    into PQ_M contiguous subvectors. One narrow pass riding the scan."""
    return (
        vectors_with_norms(emb)
        .select("vec_id", F.expr("transform(v, x -> x / norm)").alias("u"))
        .select(
            "vec_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, {PQ_M - 1}), "
                    f"m -> slice(u, m * {PQ_SUB} + 1, {PQ_SUB}))"
                )
            ).alias("m", "su"),
        )
    )


def pq_codebook(subs: DataFrame) -> DataFrame:
    """(m, j, cw) — PQ_K codewords per subspace, sliced from a fixed range
    of unit vectors so any engine regenerates them (the IVF fixed-centroid
    discipline; production trains per-subspace k-means — clustering.
    kmeans_train — and the encode/score plan shape is identical)."""
    return subs.filter(
        (F.col("vec_id") >= PQ_CODEBOOK_BASE)
        & (F.col("vec_id") < PQ_CODEBOOK_BASE + PQ_K)
    ).select((F.col("vec_id") - PQ_CODEBOOK_BASE).alias("j"), "m", F.col("su").alias("cw"))


def pq_codes(subs: DataFrame, cb: DataFrame) -> DataFrame:
    """(vec_id, m, code) — each subvector encoded as its nearest codeword
    (squared L2, ties to the lowest j). This is the compressed index a
    100 TB deployment PERSISTS: M small ints per vector instead of DIM
    floats (64x here). Encode = one scan x broadcast M*K codebook + an
    argmin window keyed (vec_id, m) — shuffle on the composite key only."""
    w = Window.partitionBy("vec_id", "m").orderBy(F.col("_d").asc(), F.col("j").asc())
    return (
        subs.join(F.broadcast(cb), "m")
        .withColumn("_d", F.expr(_spark_l2sq("su", "cw")))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "m", F.col("j").alias("code"))
    )


def ann_pq_adc_topk(
    emb: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    codebook: DataFrame | None = None,
    subs: DataFrame | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes (Jegou, Douze, Schmid,
    "Product Quantization for Nearest Neighbor Search", TPAMI 2011): each
    query precomputes an M x K table of exact query-to-codeword squared
    distances, and a candidate's approximate distance is the sum of M table
    lookups on its codes — the scan touches only the compressed codes,
    never the raw vectors.

    Plan: codes (one row per vec_id x m) equi-join the BROADCAST distance
    table on (m, code), then one (query_id, vec_id)-keyed partial-agg sum.
    Float discipline: each table entry is an order-pinned fold rounded to
    9dp and summed as DECIMAL, so `adist` is exact integer arithmetic in
    both engines — order-free, hash-stable. At production scale the same
    table drives a mapInPandas lookup kernel over code arrays; this
    declarative form is the oracled semantics.

    `codebook` swaps in a trained (m, j, cw) relation (pq_train_codebooks)
    for the default sliced one — encode/score plan shape identical.
    `subs` / `codes` let a multi-variant harness (ann_recall) pass ONE
    shared (and cached) subvector / encode relation instead of rebuilding
    the corpus encode per variant — results are identical by construction
    (`codes` must be the encode of `subs` under `codebook`)."""
    if subs is None:
        subs = pq_subvectors(emb)
    cb = codebook if codebook is not None else pq_codebook(subs)
    dt = (
        subs.filter(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("query_id"), "m", F.col("su").alias("qsu"))
        .join(cb, "m")
        .select(
            "query_id",
            "m",
            F.col("j").alias("code"),
            F.round(F.expr(_spark_l2sq("qsu", "cw")), 9)
            .cast("decimal(18,9)")
            .alias("d"),
        )
    )
    scored = (
        (codes if codes is not None else pq_codes(subs, cb))
        .join(F.broadcast(dt), ["m", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d").alias("adist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adist").asc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round(F.col("adist").cast("double"), 6).alias("adist"),
        )
    )


_DUCK_PQ_CTE = f"""
u AS (SELECT vec_id, list_transform(v, x -> x / norm) AS u FROM n),
subs AS (
  SELECT vec_id, m, list_slice(u, m * {PQ_SUB} + 1, m * {PQ_SUB} + {PQ_SUB}) AS su
  FROM u, unnest(range(0, {PQ_M})) AS t(m)
),
cb AS (
  SELECT vec_id - {PQ_CODEBOOK_BASE} AS j, m, su AS cw FROM subs
  WHERE vec_id >= {PQ_CODEBOOK_BASE} AND vec_id < {PQ_CODEBOOK_BASE + PQ_K}
),
codes AS (
  SELECT vec_id, m, j AS code FROM (
    SELECT s.vec_id, s.m, c.j,
           row_number() OVER (
             PARTITION BY s.vec_id, s.m
             ORDER BY {_duck_l2sq('s.su', 'c.cw')} ASC, c.j ASC
           ) AS rn
    FROM subs s JOIN cb c ON s.m = c.m
  ) WHERE rn = 1
),
dt AS (
  SELECT q.vec_id AS query_id, q.m, c.j AS code,
         CAST(round({_duck_l2sq('q.su', 'c.cw')}, 9) AS DECIMAL(18,9)) AS d
  FROM subs q JOIN cb c ON q.m = c.m
  WHERE q.vec_id < {N_QUERIES}
),
adc AS (
  SELECT t.query_id, s.vec_id, sum(t.d) AS adist
  FROM codes s JOIN dt t ON s.m = t.m AND s.code = t.code
  WHERE s.vec_id <> t.query_id
  GROUP BY 1, 2
)"""


@register(
    "q_ann_pq_topk",
    oracle=f"""
WITH {_DUCK_BASE_CTE},
{_DUCK_PQ_CTE.lstrip()}
SELECT query_id, vec_id AS neighbor_id,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY adist ASC, vec_id ASC) AS rank,
       round(CAST(adist AS DOUBLE), 6) AS adist
FROM adc QUALIFY rank <= {TOP_K}
""",
    tags=("similarity", "northstar", "pq"),
)
def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC approximate top-k: vectors compressed to PQ_M 5-bit codes
    (25x smaller than the raw vector), scored by broadcast lookup tables.
    Recall vs the exact scan is recorded in q_ann_recall / ANN_RECALL.md."""
    return ann_pq_adc_topk(read_table(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# Batch-vs-frozen-corpus semantic screen (the streaming embedding gate's core)
# ---------------------------------------------------------------------------

EMB_SPLIT = 250      # frozen corpus vs increment split for the semantic gate
GATE_BANDS = 16      # gate-tuned banding: recall beats the 8x8 default at the
GATE_BITS = 6        # fixture's hard tau=0.45 regime (16x6 catches 4/4 and
#                      8/11 cross-split true dups at sf0.001/sf0.01 vs 1/3 for
#                      8x8) while verifying ~22% of random pairs — 4.5x under
#                      exact; at a production dup threshold (cosine ~0.9,
#                      p=0.856) the same 16x6 curve gives ~99.96% recall.
#                      This FIXED pair is the oracled fixture regime of
#                      q_stream_embedding_gate; deployments size the pair
#                      from the corpus with gate_banding_for (below) —
#                      VERDICT r8 #4: a fixed bits-per-band saturates like a
#                      fixed bloom m (measured x8.27 screen at x10 corpus).

# Self-sizing defaults: verify work per batch item is bounded by
# GATE_MAX_BANDS * GATE_COLLISIONS_PER_BAND (~512 exact-cosine verifies)
# REGARDLESS of corpus size — the same contract bloom_params_for gives the
# span gate (fp held constant, structure grows as log n).
GATE_COLLISIONS_PER_BAND = 8.0
GATE_MAX_BANDS = 64
GATE_MIN_BITS = 4
GATE_MAX_BITS = 24


def banding_recall(bands: int, bits: int, threshold: float) -> float:
    """Predicted at-threshold recall of (bands x bits) hyperplane banding:
    per-bit collision p = 1 - acos(tau)/pi (Goemans-Williamson / Charikar
    SimHash), per-band p^bits, any-band 1 - (1-p^bits)^bands. True dups
    usually sit ABOVE tau, so this is the floor of the curve."""
    import math

    p = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    return 1.0 - (1.0 - p**bits) ** bands


def gate_banding_for(
    n_corpus: int,
    threshold: float = NEARDUP_THRESHOLD,
    target_recall: float = 0.99,
    collisions_per_band: float = GATE_COLLISIONS_PER_BAND,
    max_bands: int = GATE_MAX_BANDS,
    min_bits: int = GATE_MIN_BITS,
    max_bits: int = GATE_MAX_BITS,
) -> tuple[int, int]:
    """(bands, bits) sized from corpus density + dup threshold — the
    embedding gate's bloom_params_for twin (VERDICT r8 #4).

    bits bounds the expected RANDOM collisions per (item, band): background
    vectors (theta ~ 90 deg) collide per band with prob ~0.5^bits, so
    bits = log2(n / collisions_per_band) keeps the verify-join input at
    ~collisions_per_band rows per item per band no matter how big the
    corpus — the knob whose FIXED fixture value made the screen scale
    x8.27 at x10 corpus. bands then buys recall back at that bits,
    capped at max_bands so per-item work never exceeds
    max_bands * collisions_per_band verifies.

    When the cap binds (the hard low-tau regime at high density), the
    function does NOT trade the scale bound away: it returns the capped
    banding and callers read the honest frontier from
    banding_recall(bands, bits, tau). At tau >= ~0.9 the target recall is
    reachable across the practical density range; at the fixture's
    tau = 0.45 it is reachable up to ~1e3 vectors and degrades beyond —
    the regime where banded hyperplane LSH is simply weak (COVERAGE.md r2
    deviation note), and where the exact block-pair path is the tool."""
    import math

    n = max(int(n_corpus), 1)
    bits = math.ceil(math.log2(max(n / collisions_per_band, 2.0)))
    bits = max(min_bits, min(max_bits, bits))
    p = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    per_band = p**bits
    if per_band >= 1.0:  # tau ~ 1: every band collides, one band suffices
        return 1, bits
    need = math.log(max(1.0 - target_recall, 1e-12)) / math.log(1.0 - per_band)
    return max(1, min(max_bands, math.ceil(need))), bits


GATE_MAX_PROBE_KEYS = 2048  # bands * probe-buckets-per-band cap: bounds the
#                             batch-side key explosion itself, not just the
#                             expected verify joins it produces


def multiprobe_banding_recall(
    bands: int, bits: int, radius: int, threshold: float
) -> float:
    """Predicted at-threshold recall of (bands x bits) banding probing
    every bucket within Hamming distance <= radius per band: a true pair
    (per-bit collision p) lands within radius of the probe bucket when at
    most `radius` of the band's bits disagree — Binomial(bits, 1-p) CDF —
    and any of the `bands` bands suffices (Lv et al., "Multi-Probe LSH",
    VLDB 2007, applied to Charikar hyperplane bands)."""
    import math

    p = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    per_band = sum(
        math.comb(bits, k) * p ** (bits - k) * (1.0 - p) ** k
        for k in range(min(radius, bits) + 1)
    )
    return 1.0 - (1.0 - min(per_band, 1.0)) ** bands


def gate_multiprobe_banding_for(
    n_corpus: int,
    threshold: float = NEARDUP_THRESHOLD,
    target_recall: float = 0.99,
    collisions_per_band: float = GATE_COLLISIONS_PER_BAND,
    max_bands: int = GATE_MAX_BANDS,
    min_bits: int = GATE_MIN_BITS,
    max_bits: int = GATE_MAX_BITS,
    max_radius: int = 4,
    max_probe_keys: int = GATE_MAX_PROBE_KEYS,
) -> tuple[int, int, int]:
    """(bands, bits, probe_radius) — the multiprobe extension of
    `gate_banding_for` for the hard-tau / high-density regime (VERDICT r9
    #5): where single-bucket banding's recall collapses under the verify
    budget, probing Hamming-<=radius neighbor buckets buys back per-band
    match probability at the cost of exploding the BATCH side's keys. The
    search maximizes predicted recall subject to BOTH budgets:

    * expected verifies/item = bands * (n / 2^bits) * V(bits, radius)
      <= max_bands * collisions_per_band (the original ~512 contract;
      V = #buckets within the radius), and
    * probe keys/item = bands * V(bits, radius) <= max_probe_keys (the
      explosion itself must stay broadcast-join sized).

    Radius 0 degrades to exactly `gate_banding_for`'s frontier; the
    smallest radius meeting `target_recall` wins (probes are not free),
    and when no config meets it the best reachable one is returned with
    its HONEST predicted recall readable via `multiprobe_banding_recall`
    — at tau=0.45 and ~5M vectors even radius-4 probing stays <3%
    predicted: past that density the exact block-pair path
    (`embedding_neardup`) is the tool, and no knob here pretends
    otherwise. At the fixture's x10 density (2,500 vectors, tau=0.45)
    radius 1 lifts predicted recall from ~0.73 to ~0.93 under the same
    budgets (tests/test_embedding_gate.py re-pins the frontier)."""
    import math

    n = max(int(n_corpus), 1)
    budget = max_bands * collisions_per_band
    candidates = []
    for bits in range(min_bits, max_bits + 1):
        occupancy = n / 2.0**bits
        for radius in range(0, min(max_radius, bits) + 1):
            v = sum(math.comb(bits, k) for k in range(radius + 1))
            bands = min(
                max_bands,
                int(budget / max(occupancy * v, 1e-9)),
                int(max_probe_keys / v),
            )
            if bands < 1:
                continue
            recall = multiprobe_banding_recall(bands, bits, radius, threshold)
            candidates.append((recall, bands, bits, radius, bands * v))
    if not candidates:
        raise ValueError(
            f"no (bands, bits, radius) admits >= 1 band for n={n} under "
            f"budget {budget:.0f} verifies/item with max_bits={max_bits}; "
            "raise the budget or max_bits, or use the exact block-pair "
            "path (embedding_neardup)"
        )
    meeting = [c for c in candidates if c[0] >= target_recall]
    if meeting:
        # cheapest config that meets target: fewest probes, fewest keys
        _, bands, bits, radius, _ = min(
            meeting, key=lambda c: (c[3], c[4], -c[0])
        )
    else:
        _, bands, bits, radius, _ = max(candidates, key=lambda c: c[0])
    return bands, bits, radius


def embedding_vs_corpus(
    corpus_keys: DataFrame,
    corpus_vecs: DataFrame,
    batch_emb: DataFrame,
    threshold: float = NEARDUP_THRESHOLD,
    bands: int = GATE_BANDS,
    bits: int = GATE_BITS,
    dup_status: str = "dup_embedding",
    probe_radius: int = 0,
) -> DataFrame:
    """(vec_id, n_corpus_matches, status) for each batch vector screened
    against a FROZEN corpus LSH band index — the semantic twin of
    phash.image_vs_corpus / curation.batch_vs_corpus. Candidates come from
    a (band, bucket) equi-join of the batch's banding against the corpus
    index (never batch x corpus); verify is the exact cosine against the
    unrounded threshold; every batch vector gets a row (zero matches ->
    'admitted'). A verdict depends on one vector + the frozen index, so
    micro-batch boundaries cannot change any row.

    `corpus_keys` = banded_lsh_keys(corpus, bands, bits) projected to
    (vec_id, band, bucket); `corpus_vecs` = vectors_with_norms(corpus)
    projected to (vec_id, v, norm) — both built ONCE offline and cached by
    the caller (at 100 TB they are the persisted index).

    `probe_radius` > 0 is the multiprobe recall lever for the hard-tau /
    high-density regime (VERDICT r9 #5): each batch vector additionally
    probes every bucket within that Hamming distance of its own, PER
    band. Only the tiny batch side explodes (x V(bits, radius) keys —
    `gate_multiprobe_banding_for` bounds bands*V); the frozen corpus
    index is still scanned once and the plan stays a (band, bucket)
    equi-join. A true pair within `radius` disagreeing bits of any band
    is caught; verify stays exact, so false positives remain impossible
    and the frozen-index/micro-batch-invariance contract is unchanged."""
    bkeys = banded_lsh_keys(batch_emb, bands, bits).select(
        F.col("vec_id").alias("vec_b"), "band", "bucket"
    )
    if probe_radius > 0:
        from itertools import combinations

        masks = [
            sum(1 << p for p in flips)
            for r in range(probe_radius + 1)
            for flips in combinations(range(bits), r)
        ]
        bkeys = bkeys.select(
            "vec_b",
            "band",
            F.explode(
                F.expr(
                    "transform(array("
                    + ", ".join(str(m) for m in masks)
                    + "), m -> CAST(bucket AS INT) ^ m)"
                )
            ).alias("bucket"),
        )
    cand = (
        bkeys.join(
            corpus_keys.select(
                F.col("vec_id").alias("vec_a"), "band", "bucket"
            ),
            ["band", "bucket"],
        )
        .select("vec_a", "vec_b")
        .distinct()
    )
    cvecs = corpus_vecs.select(
        F.col("vec_id").alias("vec_a"),
        F.col("v").alias("va"),
        F.col("norm").alias("na"),
    )
    bvecs = vectors_with_norms(batch_emb).select(
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("vb"),
        F.col("norm").alias("nb"),
    )
    hits = (
        cand.join(cvecs, "vec_a")
        .join(bvecs, "vec_b")
        .filter(
            F.expr(_spark_dot("va", "vb")) / (F.col("na") * F.col("nb"))
            >= threshold
        )
        .groupBy("vec_b")
        .agg(F.count("*").alias("n"))
    )
    ids = batch_emb.select("vec_id")
    return ids.join(hits, ids["vec_id"] == hits["vec_b"], "left").select(
        "vec_id",
        F.coalesce("n", F.lit(0)).alias("n_corpus_matches"),
        F.when(F.coalesce("n", F.lit(0)) > 0, dup_status)
        .otherwise("admitted")
        .alias("status"),
    )


# ---------------------------------------------------------------------------
# Two-stage retrieval: compressed candidate generation + exact refine
# ---------------------------------------------------------------------------

RERANK_POOL = 30  # stage-1 ADC pool per query; 6x the final k


def ann_pq_rerank_topk(
    emb: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    pool: int = RERANK_POOL,
    subs: DataFrame | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """Two-stage ANN: PQ/ADC proposes `pool` candidates per query from the
    compressed codes, then ONLY those pool rows are re-scored with the exact
    cosine and cut to the final top-k — the FAISS IVF-PQ + refine serving
    pattern (Jegou et al. TPAMI 2011 §V). The scan-side economics at 100 TB:
    stage 1 touches codes (25x smaller than vectors), stage 2 touches
    n_queries * pool raw vectors via a broadcast semi-join on vec_id —
    the full-precision relation is never shuffled, and recall is provably
    >= the PQ-alone top-k (the pool is a superset of PQ's own top-k, and
    any global exact-top-k member present in the pool outranks every other
    pool row under exact scoring).

    Output matches cosine_topk's shape/discipline (order-pinned dot fold,
    round-4 score) so the two are directly comparable in q_ann_recall.
    """
    cand = ann_pq_adc_topk(emb, n_queries, k=pool, subs=subs, codes=codes).select(
        "query_id", F.col("neighbor_id").alias("vec_id")
    )
    base = vectors_with_norms(emb)
    queries = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    rescored = (
        base.join(F.broadcast(cand), "vec_id")
        .join(F.broadcast(queries), "query_id")
        .withColumn(
            "score",
            F.expr(_spark_dot("v", "qv")) / (F.col("norm") * F.col("qnorm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round("score", 4).alias("score"),
        )
    )


@register(
    "q_ann_rerank",
    oracle=f"""
WITH {_DUCK_BASE_CTE},
{_DUCK_PQ_CTE.lstrip()},
pool AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adist ASC, vec_id ASC) AS rn
    FROM adc
  ) WHERE rn <= {RERANK_POOL}
),
q AS (
  SELECT vec_id AS query_id, v AS qv, norm AS qnorm FROM n
  WHERE vec_id < {N_QUERIES}
),
rescored AS (
  SELECT p.query_id, p.vec_id AS neighbor_id,
         {_duck_dot('n.v', 'q.qv')} / (n.norm * q.qnorm) AS raw
  FROM pool p
  JOIN n ON n.vec_id = p.vec_id
  JOIN q ON q.query_id = p.query_id
)
SELECT query_id, neighbor_id,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY raw DESC, neighbor_id ASC) AS rank,
       round(raw, 4) AS score
FROM rescored QUALIFY rank <= {TOP_K}
""",
    tags=("similarity", "northstar", "pq", "rerank"),
)
def q_ann_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC candidates refined by exact cosine — the two-stage serving
    pattern; recall vs both the exact scan and PQ-alone is recorded in
    q_ann_recall / ANN_RECALL.md."""
    return ann_pq_rerank_topk(read_table(spark, sf_dir, "embeddings"))


def pq_train_codebooks(
    emb: DataFrame,
    rounds: int = 2,
    k: int = PQ_K,
    pinned: bool = False,
    subs: DataFrame | None = None,
) -> DataFrame:
    """Per-subspace Lloyd k-means over the subvectors — the production
    codebook trainer the sliced-fixture `pq_codebook` stands in for
    (Jegou et al. TPAMI 2011 §III trains exactly this, independently per
    subspace). One declarative update per round, ALL subspaces at once:
    assignment is the same (vec_id, m)-keyed argmin `pq_codes` runs, the
    centroid update is a (m, j)-keyed mean over PQ_SUB component columns —
    the kmeans_train pattern (operators/clustering.py) with the subspace
    index as an extra key, so the whole M x K codebook trains in ONE pass
    per round, never M sequential jobs. Empty cells keep their previous
    codeword (left join + coalesce). Total distortion is monotone
    non-increasing per Lloyd; tests/test_pq_training.py pins that and the
    recall gain over the sliced init.

    `pinned=True` swaps the native `avg` for the order-pinned left fold
    (the clustering.updated_centroids discipline: members sorted by
    vec_id, folded from an explicit 0.0 seed, per (m, j, component) key)
    so the trained codewords are bit-identical to a DuckDB replay —
    q_ann_pq_trained_topk's hash oracle rides this. The pinned update is
    one (m, j, ci)-keyed shuffle — M x K x PQ_SUB uniform groups, the
    same skew-free shape as the avg path; a float-tolerant production
    run keeps the default."""
    from clinical_search_data_pipeline_spark.caching import engine_cache

    if subs is None:
        subs = engine_cache(pq_subvectors(emb))
    cb = pq_codebook(subs)
    comp_avgs = [
        F.avg(F.expr(f"su[{i}]")).alias(f"_c{i}") for i in range(PQ_SUB)
    ]
    for _ in range(rounds):
        assigned = pq_codes(subs, cb).withColumnRenamed("code", "j")
        joined = subs.join(assigned, ["vec_id", "m"])
        if pinned:
            comp = joined.select(
                "m", "j", "vec_id", F.posexplode("su").alias("ci", "x")
            )
            pinned_mu = F.expr(
                "aggregate(array_sort(collect_list(struct(vec_id, x))), "
                "CAST(0.0 AS DOUBLE), (acc, s) -> acc + s.x)"
            ) / F.count("*")
            means = (
                comp.groupBy("m", "j", "ci")
                .agg(pinned_mu.alias("mu"))
                .groupBy("m", "j")
                .agg(
                    F.expr(
                        "transform(array_sort(collect_list(struct(ci, mu))), "
                        "s -> s.mu)"
                    ).alias("cw_new")
                )
            )
        else:
            means = (
                joined.groupBy("m", "j")
                .agg(*comp_avgs)
                .withColumn(
                    "cw_new", F.array(*[F.col(f"_c{i}") for i in range(PQ_SUB)])
                )
                .select("m", "j", "cw_new")
            )
        cb = engine_cache(
            cb.join(means, ["m", "j"], "left")
            .select(
                "m", "j", F.coalesce("cw_new", "cw").alias("cw")
            )
        )
        cb.count()  # materialize the round (checkpointed-loop discipline)
    return cb


def pq_distortion(subs: DataFrame, cb: DataFrame) -> float:
    """Mean squared quantization error of `subs` under codebook `cb` —
    the Lloyd objective, for monotonicity evidence."""
    codes = pq_codes(subs, cb).withColumnRenamed("code", "j")
    return (
        subs.join(codes, ["vec_id", "m"])
        .join(cb, ["m", "j"])
        .agg(F.avg(F.expr(_spark_l2sq("su", "cw"))).alias("d"))
        .first()["d"]
    )


# Oracle for the TRAINED-codebook ADC query: one pinned Lloyd round over
# the subvectors (cb0 = sliced init -> codes0 assignment -> per
# (m, j, component) order-pinned mean -> cb1, empty cells keeping their
# init codeword), then the identical encode/distance-table/ADC pipeline as
# q_ann_pq_topk but against cb1. The pinned fold mirrors
# clustering._DUCK_KMEANS_CTE's dims CTE, keyed by subspace.
_DUCK_PQ_TRAINED_CTE = f"""
u AS (SELECT vec_id, list_transform(v, x -> x / norm) AS u FROM n),
subs AS (
  SELECT vec_id, m, list_slice(u, m * {PQ_SUB} + 1, m * {PQ_SUB} + {PQ_SUB}) AS su
  FROM u, unnest(range(0, {PQ_M})) AS t(m)
),
cb0 AS (
  SELECT vec_id - {PQ_CODEBOOK_BASE} AS j, m, su AS cw FROM subs
  WHERE vec_id >= {PQ_CODEBOOK_BASE} AND vec_id < {PQ_CODEBOOK_BASE + PQ_K}
),
codes0 AS (
  SELECT vec_id, m, j FROM (
    SELECT s.vec_id, s.m, c.j,
           row_number() OVER (
             PARTITION BY s.vec_id, s.m
             ORDER BY {_duck_l2sq('s.su', 'c.cw')} ASC, c.j ASC
           ) AS rn
    FROM subs s JOIN cb0 c ON s.m = c.m
  ) WHERE rn = 1
),
pcomp AS (
  SELECT s.m, c.j, s.vec_id, unnest(s.su) AS x,
         generate_subscripts(s.su, 1) AS ci
  FROM subs s JOIN codes0 c ON s.vec_id = c.vec_id AND s.m = c.m
),
pmu AS (
  SELECT m, j, ci,
         list_reduce(list_prepend(0.0::DOUBLE, list(x ORDER BY vec_id)),
                     (acc, e) -> acc + e) / count(*) AS mu
  FROM pcomp GROUP BY m, j, ci
),
cwnew AS (SELECT m, j, list(mu ORDER BY ci) AS cw_new FROM pmu GROUP BY m, j),
cb1 AS (
  SELECT c.m, c.j, coalesce(w.cw_new, c.cw) AS cw
  FROM cb0 c LEFT JOIN cwnew w ON c.m = w.m AND c.j = w.j
),
codes1 AS (
  SELECT vec_id, m, j AS code FROM (
    SELECT s.vec_id, s.m, c.j,
           row_number() OVER (
             PARTITION BY s.vec_id, s.m
             ORDER BY {_duck_l2sq('s.su', 'c.cw')} ASC, c.j ASC
           ) AS rn
    FROM subs s JOIN cb1 c ON s.m = c.m
  ) WHERE rn = 1
),
dt1 AS (
  SELECT q.vec_id AS query_id, q.m, c.j AS code,
         CAST(round({_duck_l2sq('q.su', 'c.cw')}, 9) AS DECIMAL(18,9)) AS d
  FROM subs q JOIN cb1 c ON q.m = c.m
  WHERE q.vec_id < {N_QUERIES}
),
adc1 AS (
  SELECT t.query_id, s.vec_id, sum(t.d) AS adist
  FROM codes1 s JOIN dt1 t ON s.m = t.m AND s.code = t.code
  WHERE s.vec_id <> t.query_id
  GROUP BY 1, 2
)"""


@register(
    "q_ann_pq_trained_topk",
    oracle=f"""
WITH {_DUCK_BASE_CTE},
{_DUCK_PQ_TRAINED_CTE.lstrip()}
SELECT query_id, vec_id AS neighbor_id,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY adist ASC, vec_id ASC) AS rank,
       round(CAST(adist AS DOUBLE), 6) AS adist
FROM adc1 QUALIFY rank <= {TOP_K}
""",
    tags=("similarity", "pq", "northstar"),
)
def q_ann_pq_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-k under a TRAINED codebook: one order-pinned Lloyd round
    (pq_train_codebooks(pinned=True)) over the sliced init, then the same
    broadcast-lookup ADC scoring as q_ann_pq_topk — the whole training
    round is replayed bit-exactly by the DuckDB oracle, so codebook
    learning itself is hash-verified, not just pytest-pinned. Recall vs
    exact is the pq_trained row in q_ann_recall / ANN_RECALL.md."""
    emb = read_table(spark, sf_dir, "embeddings")
    return ann_pq_adc_topk(
        emb, codebook=pq_train_codebooks(emb, rounds=1, pinned=True)
    )


# ---------------------------------------------------------------------------
# IVF + PQ composition: prune to the query's cell, score the cell by ADC
# ---------------------------------------------------------------------------


def ann_ivfpq_topk(
    emb: DataFrame, n_queries: int = N_QUERIES, k: int = TOP_K,
    nprobe: int = 1,
    assignments_fn=None,
    subs: DataFrame | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """The full FAISS IVFADC composition (Jegou et al. TPAMI 2011 §V.A):
    the coarse quantizer prunes the search to the query's `nprobe` best
    IVF cells, and the surviving candidates are scored by PQ asymmetric
    distance — the scan touches cell-filtered CODES only, never raw
    vectors. At 100 TB this is the memory-and-compute production shape:
    candidate count ~ nprobe / n_centroids, bytes / 25, and the only
    big-side operations are one cell equi-join and one (m, code)
    broadcast-table lookup join. Recall compounds the two stages' losses
    (see q_ann_recall: the fixture's decorrelated geometry makes the
    coarse stage the binding loss) — nprobe>1 widens the probe set on the
    BROADCAST side only (no duplicate candidates: each vector lives in
    exactly one cell), and the exact-refine stage (ann_pq_rerank_topk)
    buys back the quantization loss.
    """
    assigned = (assignments_fn or ivf_assignments)(emb).select("vec_id", "cell")
    if subs is None:
        subs = pq_subvectors(emb)
    cb = pq_codebook(subs)
    dt = (
        subs.filter(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("query_id"), "m", F.col("su").alias("qsu"))
        .join(cb, "m")
        .select(
            "query_id",
            "m",
            F.col("j").alias("code"),
            F.round(F.expr(_spark_l2sq("qsu", "cw")), 9)
            .cast("decimal(18,9)")
            .alias("d"),
        )
    )
    if nprobe == 1:
        queries = assigned.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"), F.col("cell").alias("qcell")
        )
    else:
        # the ann_ivf_multiprobe_topk probe relation: rank ALL centroids
        # per query by cosine, keep the nprobe best — n_queries x nprobe
        # rows, still broadcast-sized.
        base = vectors_with_norms(emb)
        cents = base.filter(
            (F.col("vec_id") >= CENTROID_BASE)
            & (F.col("vec_id") < CENTROID_BASE + N_CENTROIDS)
        ).select(
            (F.col("vec_id") - CENTROID_BASE).alias("pcell"),
            F.col("v").alias("cv"),
            F.col("norm").alias("cnorm"),
        )
        wq = Window.partitionBy("query_id").orderBy(
            F.col("_cscore").desc(), F.col("pcell").asc()
        )
        queries = (
            base.filter(F.col("vec_id") < n_queries)
            .select(
                F.col("vec_id").alias("query_id"),
                F.col("v").alias("qv"),
                F.col("norm").alias("qnorm"),
            )
            .crossJoin(F.broadcast(cents))
            .withColumn(
                "_cscore",
                F.expr(_spark_dot("qv", "cv")) / (F.col("qnorm") * F.col("cnorm")),
            )
            .withColumn("_rn", F.row_number().over(wq))
            .filter(F.col("_rn") <= nprobe)
            .select("query_id", F.col("pcell").alias("qcell"))
        )
    # cell prune FIRST: only the query-cell members' codes reach the ADC join
    cand_codes = (
        assigned.join(
            F.broadcast(queries),
            (F.col("cell") == F.col("qcell"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "vec_id", "cell")
        .join(codes if codes is not None else pq_codes(subs, cb), "vec_id")
    )
    scored = (
        cand_codes.join(
            F.broadcast(dt),
            (cand_codes["m"] == dt["m"])
            & (cand_codes["code"] == dt["code"])
            & (cand_codes["query_id"] == dt["query_id"]),
        )
        .drop(dt["query_id"])
        .groupBy("query_id", "vec_id", "cell")
        .agg(F.sum("d").alias("adist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "cell",
            "rank",
            F.round(F.col("adist").cast("double"), 6).alias("adist"),
        )
    )


@register(
    "q_ann_ivfpq_topk",
    oracle=f"""
WITH {_DUCK_BASE_CTE},
{_DUCK_PQ_CTE.lstrip()},
cents AS (
  SELECT vec_id - {CENTROID_BASE} AS cell, v AS cv, norm AS cnorm
  FROM n WHERE vec_id >= {CENTROID_BASE} AND vec_id < {CENTROID_BASE + N_CENTROIDS}
),
assign AS (
  SELECT vec_id, cell,
         row_number() OVER (
           PARTITION BY vec_id
           ORDER BY {_duck_dot('v', 'cv')} / (norm * cnorm) DESC, cell ASC
         ) AS rn
  FROM n CROSS JOIN cents
),
cells AS (SELECT vec_id, cell FROM assign WHERE rn = 1),
q AS (SELECT vec_id AS query_id, cell AS qcell FROM cells WHERE vec_id < {N_QUERIES}),
ivf_adc AS (
  SELECT q.query_id, c.vec_id, c.cell, sum(t.d) AS adist
  FROM cells c
  JOIN q ON c.cell = q.qcell AND c.vec_id <> q.query_id
  JOIN codes s ON s.vec_id = c.vec_id
  JOIN dt t ON t.query_id = q.query_id AND t.m = s.m AND t.code = s.code
  GROUP BY 1, 2, 3
)
SELECT query_id, vec_id AS neighbor_id, cell,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY adist ASC, vec_id ASC) AS rank,
       round(CAST(adist AS DOUBLE), 6) AS adist
FROM ivf_adc QUALIFY rank <= {TOP_K}
""",
    tags=("similarity", "northstar", "ivf", "pq"),
)
def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell pruning composed with PQ/ADC scoring — the production
    IVFADC shape; its compounded recall loss is a recorded row in
    q_ann_recall / ANN_RECALL.md."""
    return ann_ivfpq_topk(read_table(spark, sf_dir, "embeddings"))


@register(
    "q_ann_ivfpq_multiprobe",
    oracle=f"""
WITH {_DUCK_BASE_CTE},
{_DUCK_PQ_CTE.lstrip()},
cents AS (
  SELECT vec_id - {CENTROID_BASE} AS cell, v AS cv, norm AS cnorm
  FROM n WHERE vec_id >= {CENTROID_BASE} AND vec_id < {CENTROID_BASE + N_CENTROIDS}
),
assign AS (
  SELECT vec_id, cell,
         row_number() OVER (
           PARTITION BY vec_id
           ORDER BY {_duck_dot('v', 'cv')} / (norm * cnorm) DESC, cell ASC
         ) AS rn
  FROM n CROSS JOIN cents
),
cells AS (SELECT vec_id, cell FROM assign WHERE rn = 1),
q AS (
  SELECT vec_id AS query_id, cell AS qcell
  FROM assign WHERE vec_id < {N_QUERIES} AND rn <= {IVF_NPROBE}
),
ivf_adc AS (
  SELECT q.query_id, c.vec_id, c.cell, sum(t.d) AS adist
  FROM cells c
  JOIN q ON c.cell = q.qcell AND c.vec_id <> q.query_id
  JOIN codes s ON s.vec_id = c.vec_id
  JOIN dt t ON t.query_id = q.query_id AND t.m = s.m AND t.code = s.code
  GROUP BY 1, 2, 3
)
SELECT query_id, vec_id AS neighbor_id, cell,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY adist ASC, vec_id ASC) AS rank,
       round(CAST(adist AS DOUBLE), 6) AS adist
FROM ivf_adc QUALIFY rank <= {TOP_K}
""",
    tags=("similarity", "ivf", "pq"),
)
def q_ann_ivfpq_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC with nprobe=2: the coarse stage probes the
    query's two best cells (the recall knob FAISS tunes first), ADC scores
    the widened candidate set — the `ivfpq_p2` recall row quantifies what
    one extra probe buys back of the compounded loss."""
    return ann_ivfpq_topk(
        read_table(spark, sf_dir, "embeddings"), nprobe=IVF_NPROBE
    )


# ---------------------------------------------------------------------------
# ANN recall evidence: every approximate variant scored against the exact path
# ---------------------------------------------------------------------------

ANN_RECALL_POSSIBLE = N_QUERIES * TOP_K

# (variant label, Spark builder, registered oracle name, probes-per-query).
# `probes` is the tuner-facing knob: IVF searches that many cells
# (nprobe), LSH probes that many buckets (own bucket + Hamming-1 flips).
# The labels sort so each family's curve reads probes-ascending.
ANN_RECALL_VARIANTS = (
    ("ivf_p1", ann_ivf_topk, "q_ann_ivf_topk", 1),
    ("ivf_p2", ann_ivf_multiprobe_topk, "q_ann_ivf_multiprobe", IVF_NPROBE),
    ("lsh_p1", ann_lsh_topk, "q_ann_lsh_topk", 1),
    ("lsh_p9", ann_lsh_multiprobe_topk, "q_ann_lsh_multiprobe", N_PLANES + 1),
    # PQ scans ALL codes (compression, not candidate pruning), so its
    # "probes" knob is the full codebook width per subspace.
    ("pq_m32k32", ann_pq_adc_topk, "q_ann_pq_topk", PQ_K),
    # Two-stage refine: the tuner knob is the stage-1 pool width; recall is
    # provably >= pq_m32k32's at equal final k (pool superset argument).
    ("pq_rerank", ann_pq_rerank_topk, "q_ann_rerank", RERANK_POOL),
    # Full IVFADC composition: coarse prune x quantized scoring — the
    # compounded-loss row a tuner reads against its single-stage parents,
    # plus the first knob FAISS turns (nprobe=2) to buy the loss back.
    ("ivfpq_p1", ann_ivfpq_topk, "q_ann_ivfpq_topk", 1),
    (
        "ivfpq_p2",
        lambda emb, **kw: ann_ivfpq_topk(emb, nprobe=IVF_NPROBE, **kw),
        "q_ann_ivfpq_multiprobe",
        IVF_NPROBE,
    ),
    # Trained codebook (one pinned Lloyd round over the sliced init): the
    # quantization-quality payoff of pq_train_codebooks, at pq_m32k32's
    # exact scan shape and bit budget.
    (
        "pq_trained",
        lambda emb, subs=None: ann_pq_adc_topk(
            emb,
            codebook=pq_train_codebooks(emb, rounds=1, pinned=True, subs=subs),
            subs=subs,
        ),
        "q_ann_pq_trained_topk",
        PQ_K,
    ),
)


def ann_recall(emb: DataFrame) -> DataFrame:
    """recall@k of every ANN variant against the exact brute-force top-k —
    the quality curve a 100 TB tuner reads before picking nprobe/n_planes.

    One row per (variant, probes): hits = |approx ∩ exact| over all queries,
    possible = N_QUERIES * TOP_K, recall_bp = floor(hits * 10000 / possible)
    (integer basis points — exact integer arithmetic in both engines, so the
    value hash can never drift on float rounding).

    Plan: the exact result is N_QUERIES*TOP_K rows — broadcast it against
    the union of variant outputs (each already a top-k, equally tiny); the
    cost of this query is the variant pipelines themselves, each of which
    scans the big side once and equi-joins on bucket/cell. A tiny
    variant-count-sized literal dim left-joins the hit counts so one with ZERO
    overlap still reports recall 0 instead of vanishing.

    Shared index relations (r14, guide §3.3/§5): the 10 variants previously
    each re-embedded the corpus — the PQ encode (`pq_codes`, a corpus-wide
    argmin window) appeared 4x in the union's static plan and the IVF
    assignment 4x, and Catalyst re-analyzed every copy (the minhash-recall
    fan-out lesson). The subvector, encode, and coarse-assignment relations
    are now built ONCE, engine_cached, and passed into every variant; the
    trained-codebook variant shares the cached subvectors but keeps its own
    cb1 encode (different codebook — different codes by definition). Results
    identical by construction; oracle unchanged.
    """
    from clinical_search_data_pipeline_spark.caching import engine_cache

    spark = emb.sparkSession
    subs = engine_cache(pq_subvectors(emb))
    cb = pq_codebook(subs)
    codes = engine_cache(pq_codes(subs, cb))
    assigned = engine_cache(ivf_assignments(emb))
    shared_kw = {
        "ivf_p1": dict(assignments_fn=lambda e: assigned),
        "ivf_p2": dict(assignments_fn=lambda e: assigned),
        "pq_m32k32": dict(subs=subs, codes=codes),
        "pq_rerank": dict(subs=subs, codes=codes),
        "ivfpq_p1": dict(
            assignments_fn=lambda e: assigned, subs=subs, codes=codes
        ),
        "ivfpq_p2": dict(
            assignments_fn=lambda e: assigned, subs=subs, codes=codes
        ),
        "pq_trained": dict(subs=subs),
    }
    exact = cosine_topk(emb).select("query_id", "neighbor_id")
    approx = None
    for label, fn, _oracle_name, probes in ANN_RECALL_VARIANTS:
        kw = shared_kw.get(label)
        part = (fn(emb, **kw) if kw else fn(emb)).select(
            F.lit(label).alias("variant"),
            F.lit(probes).cast("long").alias("probes"),
            "query_id",
            "neighbor_id",
        )
        approx = part if approx is None else approx.unionByName(part)
    hits = (
        approx.join(F.broadcast(exact), ["query_id", "neighbor_id"])
        .groupBy("variant", "probes")
        .agg(F.count("*").alias("hits"))
    )
    dim = spark.createDataFrame(
        [(label, probes) for label, _f, _o, probes in ANN_RECALL_VARIANTS],
        "variant string, probes long",
    )
    return (
        dim.join(hits, ["variant", "probes"], "left")
        .select(
            "variant",
            "probes",
            F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
            F.lit(ANN_RECALL_POSSIBLE).cast("long").alias("possible"),
            F.expr(
                f"div(coalesce(hits, 0) * 10000, {ANN_RECALL_POSSIBLE})"
            ).alias("recall_bp"),
        )
        .orderBy("variant")
    )


def _ann_recall_oracle() -> str:
    """Compose the recall oracle FROM the registered variant oracles (via
    registry.oracle_of), so the SQL the driver verifies for each variant is
    byte-identical to the SQL this query embeds — no copy to drift."""
    from clinical_search_data_pipeline_spark.registry import oracle_of

    union = "\nUNION ALL\n".join(
        f"SELECT '{label}' AS variant, CAST({probes} AS BIGINT) AS probes,"
        f" query_id, neighbor_id FROM (\n{oracle_of(oracle_name)}\n)"
        for label, _f, oracle_name, probes in ANN_RECALL_VARIANTS
    )
    values = ", ".join(
        f"('{label}', CAST({probes} AS BIGINT))"
        for label, _f, _o, probes in ANN_RECALL_VARIANTS
    )
    return f"""
WITH exact AS (
  SELECT query_id, neighbor_id FROM (
{oracle_of("q_cosine_topk")}
  )
),
approx AS (
{union}
),
h AS (
  SELECT a.variant, a.probes, count(*) AS hits
  FROM approx a JOIN exact e
    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
  GROUP BY 1, 2
)
SELECT v.variant, v.probes,
       COALESCE(h.hits, 0) AS hits,
       CAST({ANN_RECALL_POSSIBLE} AS BIGINT) AS possible,
       COALESCE(h.hits, 0) * 10000 // {ANN_RECALL_POSSIBLE} AS recall_bp
FROM (VALUES {values}) v(variant, probes)
LEFT JOIN h ON h.variant = v.variant AND h.probes = v.probes
ORDER BY v.variant
"""


@register(
    "q_ann_recall",
    oracle=_ann_recall_oracle(),
    tags=("similarity", "northstar", "evidence"),
)
def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k evidence table for the ANN family (VERDICT r7 item 5):
    rows (variant, probes, hits, possible, recall_bp) vs exact
    q_cosine_topk. ANN_RECALL.md records the measured curve per SF."""
    return ann_recall(read_table(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# Contrastive training-pair mining (DPR-style positives / hard / random negs)
# ---------------------------------------------------------------------------

CONTRASTIVE_SEED = "cntr-v1"


def contrastive_pairs(
    emb: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    seed: str = CONTRASTIVE_SEED,
) -> DataFrame:
    """Training pairs for a retrieval model (Karpukhin et al. 2020, DPR):
    per query — `positive` = exact top-k, `hard_negative` = ranks
    (k, 2k] (the mining band that carries most of the contrastive
    gradient), `random_negative` = k hash-ranked picks from OUTSIDE the
    top-2k (reproducible across engines and epochs via the seed; swap the
    seed to re-draw).

    Plan: ONE broadcast-queries scan + rank window (exactly cosine_topk's
    shape); the random tier adds a second window over the rank>2k subset
    ordered by the seeded hash — both windows partition by query_id (the
    bounded query set, same documented hazard class as cosine_topk). No
    new shuffle classes, no second corpus scan.
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
        .withColumn(
            "score",
            F.expr(_spark_dot("v", "qv")) / (F.col("norm") * F.col("qnorm")),
        )
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "score")
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    ranked = scored.withColumn("rank", F.row_number().over(w_rank))
    pos = ranked.filter(F.col("rank") <= k).withColumn(
        "tier", F.lit("positive")
    )
    hard = ranked.filter(
        (F.col("rank") > k) & (F.col("rank") <= 2 * k)
    ).withColumn("tier", F.lit("hard_negative"))
    w_hash = Window.partitionBy("query_id").orderBy(
        hash64(
            F.concat_ws(
                ":", F.lit(seed), F.col("query_id"), F.col("neighbor_id")
            )
        ).asc(),
        F.col("neighbor_id").asc(),
    )
    rand = (
        ranked.filter(F.col("rank") > 2 * k)
        .withColumn("hrank", F.row_number().over(w_hash))
        .filter(F.col("hrank") <= k)
        .drop("hrank")
        .withColumn("tier", F.lit("random_negative"))
    )
    out_cols = [
        "query_id",
        "neighbor_id",
        "tier",
        F.col("rank").cast("long").alias("rank"),
        F.round("score", 4).alias("score"),
    ]
    return (
        pos.select(*out_cols)
        .unionByName(hard.select(*out_cols))
        .unionByName(rand.select(*out_cols))
        .orderBy("query_id", "tier", "rank")
    )


@register(
    "q_contrastive_pairs",
    oracle=f"""
WITH {_DUCK_BASE_CTE},
q AS (
  SELECT vec_id AS query_id, v AS qv, norm AS qnorm FROM n
  WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.query_id, n.vec_id AS neighbor_id,
         {_duck_dot('n.v', 'q.qv')} / (n.norm * q.qnorm) AS raw_score
  FROM n, q WHERE n.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, raw_score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY raw_score DESC, neighbor_id ASC) AS rank
  FROM scored
),
rand AS (
  SELECT query_id, neighbor_id, raw_score, rank,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY {duck_hash64(
               f"'{CONTRASTIVE_SEED}:' || CAST(query_id AS VARCHAR)"
               " || ':' || CAST(neighbor_id AS VARCHAR)")} ASC,
                    neighbor_id ASC
         ) AS hrank
  FROM ranked WHERE rank > 2 * {TOP_K}
)
SELECT * FROM (
  SELECT query_id, neighbor_id, 'positive' AS tier,
         rank::BIGINT AS rank, round(raw_score, 4) AS score
  FROM ranked WHERE rank <= {TOP_K}
  UNION ALL
  SELECT query_id, neighbor_id, 'hard_negative', rank::BIGINT,
         round(raw_score, 4)
  FROM ranked WHERE rank > {TOP_K} AND rank <= 2 * {TOP_K}
  UNION ALL
  SELECT query_id, neighbor_id, 'random_negative', rank::BIGINT,
         round(raw_score, 4)
  FROM rand WHERE hrank <= {TOP_K}
)
ORDER BY query_id, tier, rank
""",
    tags=("similarity", "training", "northstar"),
)
def q_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPR-style contrastive training pairs per fixed query: exact top-k
    positives, the (k, 2k] hard-negative band, and k seeded-hash random
    negatives from outside it (see contrastive_pairs)."""
    return contrastive_pairs(read_table(spark, sf_dir, "embeddings"))

"""Training-data curation extensions: passage-level dedup, SemDeDup,
reproducible global training order.

North-star operators beyond the reference (BASELINE.json) — the reference
pipeline (processing/spark/jobs/*) stops at key-based dedup; a 100 TB
training-data pipeline additionally needs sub-document dedup and
corpus-shuffle primitives:

* passage dedup  — CCNet / RefinedWeb-style: chunk each document into
                   fixed word-count passages, keep only the globally first
                   occurrence of each duplicated passage, rebuild the
                   document text (Wenzek et al. 2020, CCNet; Penedo et al.
                   2023, RefinedWeb).
* SemDeDup       — semantic dedup over embeddings: coarse k-cell
                   assignment (shared with the IVF index), within-cell
                   pairwise cosine, drop the higher id of any pair above
                   tau (Abbas et al. 2023, SemDeDup).
* train order    — reproducible global shuffle rank from a seeded content
                   hash, computed DISTRIBUTED: bucket-prefix partial ranks
                   plus broadcast bucket offsets — no single-partition
                   global window anywhere.

All Catalyst expressions (no UDFs); every query has a bit-exact DuckDB
oracle (hashes are the md5-derived 60-bit ints from functions/hashing).

Scale posture: passage dedup is two keyed shuffles (passage text, then
doc_id for reassembly); SemDeDup's quadratic term is bounded per cell and
the cell count grows with the corpus (sqrt(N) cells in production, seeded
by k-means|| — same argument as the IVF index, similarity.py); train order
replaces the W2 single-partition rank hazard with a 64-way uniform bucket
shuffle whose only global step is a 64-row offsets relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clinical_search_data_pipeline_spark.functions.hashing import duck_hash64, hash64
from clinical_search_data_pipeline_spark.operators.fragments import (
    _DUCK_BASE_CTE,
    _duck_dot,
    _spark_dot,
)
from clinical_search_data_pipeline_spark.operators.similarity import (
    CENTROID_BASE,
    N_CENTROIDS,
    ivf_assignments,
)
from clinical_search_data_pipeline_spark.registry import register
from clinical_search_data_pipeline_spark.sources.readers import fan_out, read_table

# ---------------------------------------------------------------------------
# Passage-level (sub-document) dedup
# ---------------------------------------------------------------------------

PASSAGE_WORDS = 10  # fixed word-count chunking; CCNet dedups at paragraph
#                     granularity — the fixture corpus has no newlines, so
#                     the passage boundary is a word-count chunk instead.


def passages(docs: DataFrame, p: int = PASSAGE_WORDS) -> DataFrame:
    """(doc_id, pos, passage) — each doc chunked into p-word passages.

    Chunking is a narrow higher-order-function projection (split ->
    transform/slice -> posexplode): ZERO shuffles, and `fan_out` first so
    the HOF-heavy stage never rides a single input split. The tail chunk
    keeps whatever words remain (slice clamps), matching DuckDB
    list_slice semantics in the oracle.
    """
    w = fan_out(docs).select("doc_id", F.split(F.col("text"), " ").alias("w"))
    chunks = F.expr(
        f"transform(sequence(1, CAST(ceil(size(w) / {p}.0) AS INT)), "
        f"i -> array_join(slice(w, (i - 1) * {p} + 1, {p}), ' '))"
    )
    return w.select("doc_id", F.posexplode(chunks).alias("pos", "passage"))


def passage_dup_stats(docs: DataFrame, p: int = PASSAGE_WORDS) -> DataFrame:
    """(passage_hash, n_docs, n_occurrences) for passages appearing in >= 2
    distinct documents — the corpus-duplication profile that motivates
    sub-document dedup. One shuffle on passage text."""
    return (
        passages(docs, p)
        .groupBy("passage")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 2)
        .select(F.md5("passage").alias("passage_hash"), "n_docs", "n_occurrences")
    )


def passage_dedup(docs: DataFrame, p: int = PASSAGE_WORDS) -> DataFrame:
    """(doc_id, clean_text, n_passages, n_dropped) — every document rebuilt
    with only the globally FIRST occurrence (min (doc_id, pos)) of each
    passage retained.

    Plan: chunk (narrow) -> first-occurrence rank (one shuffle keyed on the
    passage text) -> reassemble (one shuffle keyed on doc_id; collect_list
    of kept (pos, passage) structs, array_sort restores document order).
    Both shuffles are on high-cardinality keys; nothing is corpus-global.
    """
    w_first = Window.partitionBy("passage").orderBy("doc_id", "pos")
    flagged = passages(docs, p).withColumn(
        "kept", F.row_number().over(w_first) == F.lit(1)
    )
    kept_struct = F.when(F.col("kept"), F.struct("pos", "passage"))
    return flagged.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda s: s["passage"]
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").alias("n_passages"),
        F.count(F.when(~F.col("kept"), 1)).alias("n_dropped"),
    )


_DUCK_PASSAGES_CTE = f"""
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
ch AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(
           list_slice(w, (i - 1) * {PASSAGE_WORDS} + 1, i * {PASSAGE_WORDS}), ' '
         ) AS passage
  FROM w, unnest(range(1, CAST(ceil(len(w) / {PASSAGE_WORDS}.0) AS BIGINT) + 1)) AS t(i)
)"""


@register(
    "q_passage_dup_stats",
    oracle=f"""
WITH {_DUCK_PASSAGES_CTE}
SELECT md5(passage) AS passage_hash,
       count(DISTINCT doc_id) AS n_docs,
       count(*) AS n_occurrences
FROM ch GROUP BY passage HAVING count(DISTINCT doc_id) >= 2
""",
    tags=("curation", "northstar", "dedup"),
)
def q_passage_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return passage_dup_stats(read_table(spark, sf_dir, "documents"))


@register(
    "q_passage_dedup",
    oracle=f"""
WITH {_DUCK_PASSAGES_CTE},
k AS (
  SELECT doc_id, pos, passage,
         row_number() OVER (PARTITION BY passage ORDER BY doc_id, pos) = 1 AS kept
  FROM ch
)
SELECT doc_id,
       coalesce(string_agg(passage, ' ' ORDER BY pos) FILTER (WHERE kept), '')
         AS clean_text,
       count(*) AS n_passages,
       count(*) FILTER (WHERE NOT kept) AS n_dropped
FROM k GROUP BY doc_id
""",
    tags=("curation", "northstar", "dedup"),
)
def q_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return passage_dedup(read_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# SemDeDup: semantic dedup over embedding clusters
# ---------------------------------------------------------------------------

SEMDEDUP_TAU = 0.45  # same cosine threshold regime as embedding_neardup


def semdedup(emb: DataFrame, tau: float = SEMDEDUP_TAU) -> DataFrame:
    """(vec_id, cell, kept) — SemDeDup: assign every vector to its coarse
    cell (shared with the IVF index: deterministic centroids here so the
    oracle reproduces them; k-means|| in production), then within each cell
    drop any vector having a LOWER-id neighbor with cosine >= tau.

    The quadratic term is confined to a cell (equi-join on cell, never a
    cross join); production sizes the centroid count ~sqrt(N) so cells stay
    bounded as the corpus grows. The dropped set is a tiny relation and is
    broadcast back against the assignment — the corpus is scanned, never
    re-shuffled, for the final flag.
    """
    cells = ivf_assignments(emb)
    a = cells.select(
        F.col("vec_id").alias("va"),
        F.col("v").alias("av"),
        F.col("norm").alias("an"),
        "cell",
    )
    b = cells.select(
        F.col("vec_id").alias("vb"),
        F.col("v").alias("bv"),
        F.col("norm").alias("bn"),
        F.col("cell").alias("cellb"),
    )
    dropped = (
        a.join(b, (F.col("cell") == F.col("cellb")) & (F.col("va") < F.col("vb")))
        .withColumn(
            "_cos", F.expr(_spark_dot("av", "bv")) / (F.col("an") * F.col("bn"))
        )
        .filter(F.col("_cos") >= F.lit(tau))
        .select(F.col("vb").alias("vec_id"))
        .distinct()
        .withColumn("_dropped", F.lit(True))
    )
    return cells.join(F.broadcast(dropped), "vec_id", "left").select(
        "vec_id", "cell", F.col("_dropped").isNull().alias("kept")
    )


_DUCK_CELLS_CTE = f"""
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
cells AS (SELECT vec_id, v, norm, cell FROM assign WHERE rn = 1)"""


@register(
    "q_semdedup",
    oracle=f"""
WITH {_DUCK_BASE_CTE},
{_DUCK_CELLS_CTE},
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE {_duck_dot('a.v', 'b.v')} / (a.norm * b.norm) >= {SEMDEDUP_TAU}
)
SELECT c.vec_id, c.cell, d.vec_id IS NULL AS kept
FROM cells c LEFT JOIN dropped d ON c.vec_id = d.vec_id
""",
    tags=("curation", "northstar", "similarity"),
)
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return semdedup(read_table(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# Reproducible global training order (distributed rank, no global window)
# ---------------------------------------------------------------------------

TRAIN_ORDER_SEED = "epoch0"
_RANK_BUCKET_SHIFT = 54  # 60-bit hash >> 54 -> 64 uniform buckets


def train_order(docs: DataFrame, seed: str = TRAIN_ORDER_SEED) -> DataFrame:
    """(doc_id, shuffle_key, order_idx) — a reproducible global shuffle of
    the corpus: order_idx is the dense 1..N rank of the seeded content hash.

    The rank is computed DISTRIBUTED, avoiding the W2 single-partition
    global-window hazard: the hash's top 6 bits form 64 uniform buckets;
    per-bucket row_number ranks locally (shuffle keyed on bucket), and the
    global offset of each bucket comes from a 64-row count relation
    (metadata-sized — its prefix-sum window is the ONLY single-partition
    step) broadcast back. Because buckets are the key's most-significant
    bits, bucket-major + within-bucket order IS the total (shuffle_key,
    doc_id) order, so the result is identical to a global rank.
    """
    keyed = docs.select(
        "doc_id",
        hash64(F.concat_ws(":", F.lit(seed), F.col("doc_id"))).alias("shuffle_key"),
    ).withColumn("bucket", F.shiftright("shuffle_key", _RANK_BUCKET_SHIFT))
    counts = keyed.groupBy("bucket").agg(F.count("*").alias("n"))
    w_off = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "bucket", F.coalesce(F.sum("n").over(w_off), F.lit(0)).alias("offset")
    )
    w_local = Window.partitionBy("bucket").orderBy("shuffle_key", "doc_id")
    return (
        keyed.join(F.broadcast(offsets), "bucket")
        .withColumn("order_idx", F.col("offset") + F.row_number().over(w_local))
        .select("doc_id", "shuffle_key", "order_idx")
    )


@register(
    "q_train_order",
    oracle=f"""
WITH k AS (
  SELECT doc_id,
         {duck_hash64(f"'{TRAIN_ORDER_SEED}' || ':' || CAST(doc_id AS VARCHAR)")}
           AS shuffle_key
  FROM documents
)
SELECT doc_id, shuffle_key,
       row_number() OVER (ORDER BY shuffle_key, doc_id) AS order_idx
FROM k
""",
    tags=("curation", "northstar"),
)
def q_train_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    return train_order(read_table(spark, sf_dir, "documents"))

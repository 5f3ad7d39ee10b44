"""Data-selection importance weights (DSIR-style hashed n-gram features).

Xie et al. 2023 ("Data Selection for Language Models via Importance
Resampling", DSIR) select pretraining data by scoring every raw document
with log(p_target(x) / p_raw(x)) under bag-of-hashed-n-gram unigram
models fit on a target corpus and the raw corpus, then sampling
proportionally. The scoring core is SQL-expressible and runs here fully
declaratively:

  1. feature relation — word unigrams + bigrams per document, hashed into
     `N_BUCKETS` buckets (hash collisions are part of the method: DSIR's
     features are hashed counts, not an exact vocabulary),
  2. bucket models   — one aggregation over the feature relation counts
     every bucket under the raw corpus and under the target slice
     (`lang = 'en'` stands in for DSIR's target corpus — any predicate or
     a second table works the same) with add-one smoothing,
  3. doc scores      — the bucket log-ratio table is `N_BUCKETS` rows, so
     it is BROADCAST back onto the feature relation; per-document log
     weights are an ORDER-PINNED left fold (features re-collected in
     (position, kind) order, folded with an explicit 0.0 seed) so the
     float sum is bit-identical on both engines — same determinism device
     as curation.unigram_nll.

Scale posture (100 TB): the corpus is exploded once into features (narrow
after `fan_out`), shuffled once on the hash bucket (64 well-spread keys —
partial aggregation collapses this to at most 64 rows per input partition
map-side, so the shuffle payload is KB-sized regardless of corpus size)
and once on doc_id for the ordered re-collection. The model itself never
exceeds N_BUCKETS rows. No UDFs, no cross join except the broadcast
1-row totals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_search_data_pipeline_spark.functions.hashing import duck_hash64, hash64
from clinical_search_data_pipeline_spark.operators.fragments import (
    _DUCK_FEATS_CTE,
    DSIR_GATE,
    N_BUCKETS,
    TARGET_LANG,
)
from clinical_search_data_pipeline_spark.registry import register
from clinical_search_data_pipeline_spark.sources.readers import fan_out, read_table

__all__ = [
    "DSIR_GATE",
    "N_BUCKETS",
    "RESAMPLE_K",
    "TARGET_LANG",
    "dsir_model",
    "dsir_resample",
    "dsir_score",
    "dsir_weights",
    "hashed_features",
]


def hashed_features(
    docs: DataFrame,
    n_buckets: int = N_BUCKETS,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, lang, *carry, pos, kind, bucket): word unigrams (kind 0)
    and bigrams (kind 1) with 1-based positions, hashed into `n_buckets`
    (default N_BUCKETS; DSIR uses ~10k on web corpora). `carry` columns
    (e.g. a training label) ride the projection untouched.
    Narrow HOF projection after fan_out — zero shuffles.

    The bigram transform is guarded for size(w) < 2: Spark's
    sequence(1, 0) counts DOWN to [1, 0] instead of yielding the empty
    array, so an unguarded transform calls element_at(w, 0) and throws on
    any one-word document — an ingest gate must score arbitrary input
    (same gotcha spans.word_grams guards)."""
    w = fan_out(docs).select(
        "doc_id", "lang", *carry, F.split(F.col("text"), " ").alias("w")
    )
    uni = "transform(w, (x, i) -> struct(i + 1 AS pos, 0 AS kind, x AS feat))"
    bi = (
        "CASE WHEN size(w) >= 2 THEN transform(sequence(1, size(w) - 1), "
        "i -> struct(i AS pos, 1 AS kind, "
        "concat(element_at(w, i), ' ', element_at(w, i + 1)) AS feat)) "
        "ELSE array() END"
    )
    return w.select(
        "doc_id",
        "lang",
        *carry,
        F.explode(F.expr(f"concat({uni}, {bi})")).alias("f"),
    ).select(
        "doc_id",
        "lang",
        *carry,
        F.col("f.pos").alias("pos"),
        F.col("f.kind").alias("kind"),
        F.pmod(hash64(F.col("f.feat")), F.lit(n_buckets)).alias("bucket"),
    )


def bucket_log_ratios(
    feats: DataFrame,
    target_lang: str = TARGET_LANG,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """(bucket, lr): add-one-smoothed ln(p_target / p_raw) per hash bucket.
    One n_buckets-key shuffle; the result is model-sized (<= n_buckets
    rows). `n_buckets` must match the value the features were hashed with."""
    cnt = feats.groupBy("bucket").agg(
        F.count("*").alias("n_raw"),
        F.count(F.when(F.col("lang") == target_lang, 1)).alias("n_t"),
    )
    # coalesce: sum() over ZERO buckets (an empty corpus at cold start) is
    # NULL, which would silently null every ratio; 0 yields the NEUTRAL
    # smoothed model (lr = 0 everywhere) instead
    tot = cnt.agg(
        F.coalesce(F.sum("n_raw"), F.lit(0)).alias("t_r"),
        F.coalesce(F.sum("n_t"), F.lit(0)).alias("t_t"),
    )
    return cnt.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            F.log((F.col("n_t") + 1) / (F.col("t_t") + F.lit(float(n_buckets))))
            - F.log((F.col("n_raw") + 1) / (F.col("t_r") + F.lit(float(n_buckets))))
        ).alias("lr"),
    )


def dsir_model(
    corpus: DataFrame,
    target_lang: str = TARGET_LANG,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Fit the frozen model on a standing corpus: (bucket, lr) DENSE over
    the whole bucket domain [0, n_buckets) — zero-count buckets carry the
    add-one-smoothed ratio by construction, so any later scoring join is a
    plain inner broadcast equi-join with no out-of-vocabulary special
    case. Model-sized (exactly n_buckets rows; the plan shape is
    N-independent, so a 100 TB caller can match DSIR's ~10k web-corpus
    buckets per call — the module constant is only the fixture default)."""
    feats = hashed_features(corpus, n_buckets)
    cnt = feats.groupBy("bucket").agg(
        F.count("*").alias("n_raw"),
        F.count(F.when(F.col("lang") == target_lang, 1)).alias("n_t"),
    )
    # empty-corpus cold start: sum() over zero buckets is NULL -> every
    # ratio NULL -> every score NULL -> silent wholesale rejection at the
    # gate; coalescing to 0 gives the NEUTRAL model (lr = 0, logw = 0 ->
    # the >= 0 gate ADMITS, which is the right no-evidence behavior)
    tot = cnt.agg(
        F.coalesce(F.sum("n_raw"), F.lit(0)).alias("t_r"),
        F.coalesce(F.sum("n_t"), F.lit(0)).alias("t_t"),
    )
    domain = (
        corpus.sparkSession.range(n_buckets).select(F.col("id").alias("bucket"))
    )
    dense = domain.join(F.broadcast(cnt), "bucket", "left").fillna(
        0, ["n_raw", "n_t"]
    )
    return dense.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            F.log((F.col("n_t") + 1) / (F.col("t_t") + F.lit(float(n_buckets))))
            - F.log((F.col("n_raw") + 1) / (F.col("t_r") + F.lit(float(n_buckets))))
        ).alias("lr"),
    )


def dsir_score(
    docs: DataFrame, lr: DataFrame, n_buckets: int = N_BUCKETS
) -> DataFrame:
    """(doc_id, lang, n_feats, logw): score documents under a FROZEN dense
    model — one broadcast equi-join on bucket + a doc_id-keyed ordered
    fold. Total over any input (the model covers the full bucket domain),
    which is the ingest-gate requirement. `n_buckets` must match the
    model's domain."""
    feats = hashed_features(docs, n_buckets)
    scored = (
        feats.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").alias("n_feats"),
            F.array_sort(F.collect_list(F.struct("pos", "kind", "lr"))).alias("lrs"),
        )
    )
    fold = (
        "aggregate(transform(lrs, s -> s.lr), CAST(0.0 AS DOUBLE), "
        "(acc, x) -> acc + x)"
    )
    return scored.select(
        "doc_id", "lang", "n_feats", F.round(F.expr(fold), 4).alias("logw")
    )


def dsir_weights(
    docs: DataFrame,
    target_lang: str = TARGET_LANG,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """(doc_id, lang, n_feats, logw): per-document DSIR log importance
    weight — the ordered left fold of its features' bucket log-ratios,
    self-scored (model and scored corpus are the same relation)."""
    return dsir_score(docs, dsir_model(docs, target_lang, n_buckets), n_buckets)


@register(
    "q_dsir_weights",
    oracle=f"""
WITH {_DUCK_FEATS_CTE},
cnt AS (
  SELECT bucket, count(*) AS n_raw,
         count(*) FILTER (WHERE lang = '{TARGET_LANG}') AS n_t
  FROM feats GROUP BY bucket
),
tot AS (SELECT sum(n_raw) AS t_r, sum(n_t) AS t_t FROM cnt),
lr AS (
  SELECT bucket,
         ln((n_t + 1) / (t_t + {N_BUCKETS}.0))
           - ln((n_raw + 1) / (t_r + {N_BUCKETS}.0)) AS lr
  FROM cnt CROSS JOIN tot
),
scored AS (
  SELECT doc_id, lang, count(*) AS n_feats,
         list(lr ORDER BY pos, kind) AS lrs
  FROM feats JOIN lr USING (bucket)
  GROUP BY doc_id, lang
)
SELECT doc_id, lang, n_feats,
       round(list_reduce(list_prepend(0.0::DOUBLE, lrs),
                         (acc, x) -> acc + x), 4) AS logw
FROM scored
""",
    tags=("curation", "text", "northstar"),
)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights: ln(p_target/p_raw) per document under
    hashed unigram+bigram bucket models (Xie et al. 2023)."""
    return dsir_weights(read_table(spark, sf_dir, "documents"))


# --- importance RESAMPLING: the "R" in DSIR ---------------------------------

RESAMPLE_K = 100  # fixture default; a 100 TB caller passes its budget
_U_BUCKETS = 1_000_000  # hash-derived uniform resolution


def dsir_resample(
    weights: DataFrame, k: int = RESAMPLE_K, salt: str = "epoch0"
) -> DataFrame:
    """(doc_id, lang, logw, gkey): the top-`k` documents under Gumbel
    top-k weighted sampling WITHOUT replacement — DSIR's final step
    (sample ∝ exp(logw)), via the Efraimidis-Spirakis / Gumbel-max
    equivalence: adding an independent Gumbel draw to each log-weight and
    taking the k largest keys IS a weighted sample without replacement.

    Determinism device: the per-document uniform is hash-derived —
    u = (hash64(salt || doc_id) mod M + 0.5) / M — so the draw is
    reproducible across engines and runs (a new `salt` is a fresh
    epoch's draw); g = -ln(-ln(u)); key = round(logw + g, 4), ranked
    with doc_id as the deterministic tie-break.

    Scale shape: one narrow projection over the doc-count-sized weight
    relation, then a global top-k — TakeOrderedAndProject, never a full
    sort (the same plan class as q_top_revenue_orders)."""
    u = (
        F.pmod(
            hash64(F.concat(F.lit(salt), F.lit("|"), F.col("doc_id").cast("string"))),
            F.lit(_U_BUCKETS),
        )
        + F.lit(0.5)
    ) / F.lit(float(_U_BUCKETS))
    key = F.round(F.col("logw") + (-F.log(-F.log(u))), 4)
    return (
        weights.select("doc_id", "lang", "logw", key.alias("gkey"))
        .orderBy(F.col("gkey").desc(), F.col("doc_id"))
        .limit(k)
    )


@register(
    "q_dsir_resample",
    oracle=f"""
WITH {_DUCK_FEATS_CTE},
cnt AS (
  SELECT bucket, count(*) AS n_raw,
         count(*) FILTER (WHERE lang = '{TARGET_LANG}') AS n_t
  FROM feats GROUP BY bucket
),
tot AS (SELECT sum(n_raw) AS t_r, sum(n_t) AS t_t FROM cnt),
lr AS (
  SELECT bucket,
         ln((n_t + 1) / (t_t + {N_BUCKETS}.0))
           - ln((n_raw + 1) / (t_r + {N_BUCKETS}.0)) AS lr
  FROM cnt CROSS JOIN tot
),
scored AS (
  SELECT doc_id, lang, count(*) AS n_feats,
         list(lr ORDER BY pos, kind) AS lrs
  FROM feats JOIN lr USING (bucket)
  GROUP BY doc_id, lang
),
wts AS (
  SELECT doc_id, lang,
         round(list_reduce(list_prepend(0.0::DOUBLE, lrs),
                           (acc, x) -> acc + x), 4) AS logw
  FROM scored
),
keyed AS (
  SELECT doc_id, lang, logw,
         round(logw + (-ln(-ln(
           ({duck_hash64("'epoch0|' || CAST(doc_id AS VARCHAR)")}
              % {_U_BUCKETS} + 0.5) / {_U_BUCKETS}.0
         ))), 4) AS gkey
  FROM wts
)
SELECT doc_id, lang, logw, gkey FROM keyed
ORDER BY gkey DESC, doc_id LIMIT {RESAMPLE_K}
""",
    tags=("curation", "text", "northstar"),
)
def q_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR end-to-end: importance weights -> Gumbel top-k weighted
    resampling without replacement (Xie et al. 2023 select their
    pretraining subset exactly this way; Efraimidis-Spirakis 2006 /
    Gumbel-max give the one-pass distributed form). Hash-derived
    uniforms make the draw reproducible — and oracle-checkable."""
    docs = read_table(spark, sf_dir, "documents")
    return dsir_resample(dsir_weights(docs).drop("n_feats"))

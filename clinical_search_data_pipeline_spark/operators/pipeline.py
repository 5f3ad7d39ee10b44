"""End-to-end corpus-pipeline compositions: quality filtering and applied
near-dup deduplication.

The individual signals (tokens, quality bands, Gopher repetition rules,
Jaccard pairs, connected components) are each their own oracled operator;
these queries compose them the way an actual training-data pipeline does —
one keep/drop decision per document with an auditable reason, and a corpus
with near-duplicate clusters collapsed to one survivor. Both remain fully
oracled end to end.

Scale shape: corpus_filter is a single narrow projection (all signals are
per-row array expressions — zero shuffles, same posture as
textanalysis.repetition_stats); doc_dedup_apply chains the prefix-filtered
exact pair join (operators/dedup.jaccard_pairs) into min-label-propagation
components (operators/components.connected_components) and applies the
survivor rule with one left join back to the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_search_data_pipeline_spark.functions import textfns
from clinical_search_data_pipeline_spark.operators.components import (
    connected_components,
)

# Oracle fragments come from the non-registering fragments module; the dedup
# *builder* is imported lazily inside `q_doc_dedup_apply` so this module can
# register in the driver window without dragging dedup's 5 registrations in
# front of it (registry.py ordering contract).
from clinical_search_data_pipeline_spark.operators.fragments import (
    _DUCK_SHINGLES_CTE,
    JACCARD_THRESHOLD,
)
from clinical_search_data_pipeline_spark.registry import register
from clinical_search_data_pipeline_spark.sources.readers import read_table

# Filter thresholds (fixture-calibrated so both outcomes are exercised:
# ~12% of fixture docs drop, the rest keep).
MIN_TOKENS = 20
MIN_QUALITY = 0.7
MAX_DUP_BIGRAM = 0.08


def corpus_filter(
    docs: DataFrame,
    min_tokens: int = MIN_TOKENS,
    min_quality: float = MIN_QUALITY,
    max_dup_bigram: float = MAX_DUP_BIGRAM,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document keep/drop with the FIRST failing rule as the reason —
    the decision layer of an LLM-corpus cleaning pipeline (length gate,
    composite quality score, Gopher bigram-repetition rule). One narrow
    projection: every signal is a per-row array expression. `carry`
    columns (e.g. text/lang when the verdict feeds a downstream trainer)
    ride the projection untouched."""
    t = docs.withColumn("_w", textfns.tokens("text"))
    n_tokens = F.size("_w")
    stop_ratio = textfns.stopword_count("_w").cast("double") / n_tokens
    mean_len = textfns.token_length_sum("_w").cast("double") / n_tokens
    quality = (
        F.when((n_tokens >= 20) & (n_tokens <= 400), 0.4).otherwise(0.0)
        + F.when((stop_ratio >= 0.02) & (stop_ratio <= 0.5), 0.3).otherwise(0.0)
        + F.when((mean_len >= 3.0) & (mean_len <= 10.0), 0.3).otherwise(0.0)
    )
    bigrams = F.expr(
        "transform(slice(_w, 1, size(_w) - 1), (x, i) -> concat(x, ' ', _w[i + 1]))"
    )
    dup_bigram = F.when(n_tokens <= 1, F.lit(0.0)).otherwise(
        1 - F.size(F.array_distinct(bigrams)) / F.expr("CAST(size(_w) - 1 AS DOUBLE)")
    )
    staged = t.select(
        "doc_id",
        *carry,
        n_tokens.alias("n_tokens"),
        F.round(quality, 2).alias("quality_score"),
        F.round(dup_bigram, 6).alias("dup_bigram_frac"),
        F.when(n_tokens < min_tokens, "too_short")
        .when(F.round(quality, 2) < min_quality, "low_quality")
        .when(F.round(dup_bigram, 6) > max_dup_bigram, "repetitive_bigrams")
        .otherwise("keep")
        .alias("reason"),
    )
    return staged.withColumn("keep", F.col("reason") == "keep")


# Shared by q_corpus_filter and its streaming twin q_stream_corpus_filter
# (same output contract; the twin's oracle carries a marker line so the
# duplicate-oracle hygiene guard sees a deliberate twin, not a mislabel).
CORPUS_FILTER_ORACLE = f"""
WITH t AS (SELECT doc_id, {textfns.duck_tokens('text')} AS w FROM documents),
m AS (
  SELECT doc_id,
         len(w) AS n_tokens,
         {textfns.duck_stopword_count('w')}::DOUBLE / len(w) AS stop_ratio,
         {textfns.duck_token_length_sum('w')}::DOUBLE / len(w) AS mean_len,
         CASE WHEN len(w) <= 1 THEN 0.0
              ELSE 1 - len(list_distinct(
                     list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])
                   ))::DOUBLE / (len(w) - 1)
         END AS dup_bigram
  FROM t
),
s AS (
  SELECT doc_id, n_tokens,
         round(CASE WHEN n_tokens BETWEEN 20 AND 400 THEN 0.4 ELSE 0.0 END
             + CASE WHEN stop_ratio BETWEEN 0.02 AND 0.5 THEN 0.3 ELSE 0.0 END
             + CASE WHEN mean_len BETWEEN 3.0 AND 10.0 THEN 0.3 ELSE 0.0 END, 2)
           AS quality_score,
         round(dup_bigram, 6) AS dup_bigram_frac
  FROM m
),
r AS (
  SELECT doc_id, n_tokens, quality_score, dup_bigram_frac,
         CASE WHEN n_tokens < {MIN_TOKENS} THEN 'too_short'
              WHEN quality_score < {MIN_QUALITY} THEN 'low_quality'
              WHEN dup_bigram_frac > {MAX_DUP_BIGRAM} THEN 'repetitive_bigrams'
              ELSE 'keep' END AS reason
  FROM s
)
SELECT doc_id, n_tokens, quality_score, dup_bigram_frac, reason,
       reason = 'keep' AS keep
FROM r
"""


@register(
    "q_corpus_filter",
    oracle=CORPUS_FILTER_ORACLE,
    tags=("pipeline", "quality", "northstar"),
)
def q_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_filter(read_table(spark, sf_dir, "documents"))


@register(
    "q_doc_dedup_apply",
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
comp AS (SELECT node, min(label) AS component FROM reach GROUP BY node)
SELECT d.doc_id,
       CASE WHEN c.node IS NULL THEN 'unique' ELSE 'dup_survivor' END AS status
FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
WHERE c.node IS NULL OR c.node = c.component
""",
    tags=("pipeline", "dedup", "graph", "northstar"),
)
def q_doc_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Applied near-dup dedup over the document corpus: exact
    (prefix-filtered) Jaccard pairs at t={JACCARD_THRESHOLD} -> connected
    components -> keep one survivor (min doc_id) per cluster plus all
    untouched docs. The corpus a downstream tokenizer would actually
    consume."""
    from clinical_search_data_pipeline_spark.operators.dedup import jaccard_pairs

    docs = read_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs).select("doc_a", "doc_b")
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    status = F.when(F.col("node").isNull(), "unique").otherwise("dup_survivor")
    return (
        docs.join(comp, docs["doc_id"] == comp["node"], "left")
        .filter(F.col("node").isNull() | (F.col("node") == F.col("component")))
        .select("doc_id", status.alias("status"))
    )


# "Eval set" stand-in: a deterministic ~1% slice of the corpus plays the
# held-out benchmark whose n-grams must not leak into training data.
BENCH_MOD = 97
# Decontamination uses LONGER shingles than near-dup detection (the GPT-3 /
# Pile method uses 13-grams): a 3-gram collides on common phrasing (~half
# the fixture flags); 5 words is the fixture-scaled span that only copied
# text shares, leaving both outcomes represented at every fixture SF.
DECON_K = 5


def decontaminate(
    docs: DataFrame, bench_mod: int = BENCH_MOD, k: int = DECON_K
) -> DataFrame:
    """Benchmark decontamination (the GPT-3 / Pile n-gram collision method,
    k scaled to the fixture's document length): flag every training document
    that shares ANY k-word shingle with the held-out benchmark slice.

    Scale shape: the benchmark side is tiny relative to the corpus (eval
    sets are fixed-size; the corpus is 100 TB), so its distinct shingle set
    is BROADCAST and the corpus pays one narrow shingle explode plus a
    broadcast equi-join — no shuffle of the training corpus at all. The
    per-doc hit count then aggregates on doc_id, proportional only to the
    contaminated subset."""
    from clinical_search_data_pipeline_spark.caching import engine_cache
    from clinical_search_data_pipeline_spark.operators.dedup import shingle_relation

    # Cached: the benchmark branch and the train branch both read the
    # shingle relation, so the tokenize+shingle narrow stage would execute
    # once per branch uncached. (Measured ~neutral at fixture scale — the
    # one-time shingle string build dominates — but at 100 TB the second
    # corpus scan is the cost that matters.)
    sh = engine_cache(shingle_relation(docs, k))
    is_bench = F.col("doc_id") % bench_mod == 0
    bench_shingles = sh.filter(is_bench).select("shingle").distinct()
    hits = (
        sh.filter(~is_bench)
        .join(F.broadcast(bench_shingles), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_shingles"))
    )
    train = docs.filter(~is_bench).select("doc_id")
    shared = F.coalesce("n_shared_shingles", F.lit(0))
    return train.join(hits, "doc_id", "left").select(
        "doc_id",
        shared.alias("n_shared_shingles"),
        (shared > 0).alias("contaminated"),
    )


_DUCK_DECON_SHINGLES = f"""
tok AS (SELECT doc_id, {textfns.duck_tokens('text')} AS w FROM documents),
dsh AS (
  SELECT DISTINCT doc_id,
         unnest({textfns.duck_shingles('w', DECON_K)}) AS shingle
  FROM tok WHERE len(w) >= {DECON_K}
)"""


@register(
    "q_decontaminate",
    oracle=f"""
WITH {_DUCK_DECON_SHINGLES},
bench AS (SELECT DISTINCT shingle FROM dsh WHERE doc_id % {BENCH_MOD} = 0),
hits AS (
  SELECT t.doc_id, count(*) AS n_shared
  FROM dsh t JOIN bench USING (shingle)
  WHERE t.doc_id % {BENCH_MOD} <> 0
  GROUP BY 1
)
SELECT d.doc_id,
       coalesce(h.n_shared, 0) AS n_shared_shingles,
       coalesce(h.n_shared, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % {BENCH_MOD} <> 0) d
LEFT JOIN hits h USING (doc_id)
""",
    tags=("pipeline", "decontamination", "northstar"),
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decontaminate(read_table(spark, sf_dir, "documents"))

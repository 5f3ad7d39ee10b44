"""Text canonicalization queries: normalization + normalized near-dup.

Closes the one production-grade gap in the dedup story (VERDICT r7 §gaps
item 1): `jaccard_pairs` / `minhash_lsh_pairs` shingled RAW text, so a
trivially re-cased, re-punctuated, or re-accented copy shared zero shingles
with its source and was invisible to every shingle-based detector. The
queries here plant exactly such copies and prove the normalized variants
catch them; tests/test_canonical.py additionally pins that the RAW
variants miss them (the failure mode being closed).

Fixture note (same pattern as operators/redaction.py): the synthetic
corpus is lowercase word-soup, on which normalization is vacuous — so the
queries AUGMENT the corpus with deterministic doc_id-derived mutant copies
(upper-cased / comma-punctuated / accent-swapped), built identically in the
Spark builders and the DuckDB oracles. The augmentation is harness, not
operator: `dedup.canonicalize` takes any text column.

Scale posture: normalization is a narrow projection riding the scan; the
pair queries inherit the prefix-filter / banded-LSH shapes of their raw
twins unchanged (operators/dedup.py) — no new shuffle, no new join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_search_data_pipeline_spark.functions.normalize import (
    duck_normalize,
    normalize_text,
)
from clinical_search_data_pipeline_spark.operators.dedup import (
    _BAND_SELECTS,
    _DUCK_JACCARD_TAIL,
    _SIG_MINS,
    jaccard_pairs,
    minhash_lsh_pairs,
)
from clinical_search_data_pipeline_spark.operators.fragments import SHINGLE_K
from clinical_search_data_pipeline_spark.functions import textfns
from clinical_search_data_pipeline_spark.registry import register
from clinical_search_data_pipeline_spark.sources.readers import read_table

# Every 17th document gets a mutant copy at doc_id + MUTANT_OFFSET; the
# mutation style cycles by doc_id so all three normalization axes (case,
# punctuation, accents) are exercised in the oracled path.
MUTANT_OFFSET = 1_000_000
MUTANT_MOD = 17

_MUTATE_SQL = (
    "CASE WHEN doc_id % 3 = 0 THEN upper(text) "
    "WHEN doc_id % 3 = 1 THEN replace(text, ' ', ', ') "
    "ELSE translate(text, 'ae', 'áé') END"
)

_DUCK_CORPUS_CTE = f"""
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {MUTANT_OFFSET} AS doc_id, {_MUTATE_SQL} AS text
  FROM documents WHERE doc_id % {MUTANT_MOD} = 0
)"""


def mutated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """originals ∪ deterministic mutant copies (case/punct/accent)."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    mutants = docs.filter(F.col("doc_id") % MUTANT_MOD == 0).select(
        (F.col("doc_id") + MUTANT_OFFSET).alias("doc_id"),
        F.expr(_MUTATE_SQL).alias("text"),
    )
    return docs.unionByName(mutants)


_NORM_SHINGLES_CTE = f"""
tok AS (SELECT doc_id, {textfns.duck_tokens(duck_normalize('text'))} AS w FROM corpus),
sh AS (
  SELECT DISTINCT doc_id,
         unnest({textfns.duck_shingles('w', SHINGLE_K)}) AS shingle
  FROM tok WHERE len(w) >= {SHINGLE_K}
)"""


@register(
    "q_normalize_text",
    oracle=f"""
WITH {_DUCK_CORPUS_CTE}
SELECT c.doc_id,
       md5({duck_normalize('c.text')}) AS norm_md5,
       length({duck_normalize('c.text')}) AS n_chars_norm,
       (c.text = o.text) AS raw_equal,
       ({duck_normalize('c.text')} = {duck_normalize('o.text')}) AS norm_equal
FROM corpus c
LEFT JOIN documents o ON o.doc_id = c.doc_id - {MUTANT_OFFSET}
""",
    tags=("canonical", "text", "northstar"),
)
def q_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization digest over the mutated corpus. For each mutant row
    the join back to its source pins the contract in the oracled output:
    `raw_equal` false (the copy differs byte-wise), `norm_equal` true (the
    canonical forms coincide). Original rows carry nulls."""
    corpus = mutated_corpus(spark, sf_dir).alias("c")
    orig = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .alias("o")
    )
    return (
        # orig is the FULL documents projection — corpus-sized, so no
        # broadcast hint: the shifted-key equi-join shuffles both sides on
        # doc_id at scale (the r11 hint lint caught this one)
        corpus.join(
            orig,
            F.col("o.doc_id") == F.col("c.doc_id") - MUTANT_OFFSET,
            "left",
        )
        .select(
            F.col("c.doc_id").alias("doc_id"),
            F.md5(normalize_text(F.col("c.text"))).alias("norm_md5"),
            F.length(normalize_text(F.col("c.text"))).alias("n_chars_norm"),
            (F.col("c.text") == F.col("o.text")).alias("raw_equal"),
            (normalize_text(F.col("c.text")) == normalize_text(F.col("o.text"))).alias(
                "norm_equal"
            ),
        )
    )


@register(
    "q_jaccard_pairs_normalized",
    oracle=f"""
WITH {_DUCK_CORPUS_CTE},
{_NORM_SHINGLES_CTE},
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::DOUBLE AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
{_DUCK_JACCARD_TAIL}
""",
    tags=("canonical", "dedup", "northstar"),
)
def q_jaccard_pairs_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact prefix-filtered Jaccard pairs over CANONICALIZED text. The
    planted mutants surface as jaccard=1.0 pairs (doc, doc+offset); the raw
    twin q_jaccard_pairs finds none of them (pinned in
    tests/test_canonical.py)."""
    return jaccard_pairs(mutated_corpus(spark, sf_dir), normalize=True)


@register(
    "q_minhash_lsh_normalized",
    oracle=f"""
WITH {_DUCK_CORPUS_CTE},
{_NORM_SHINGLES_CTE},
sig AS (
  SELECT doc_id,
         {_SIG_MINS}
  FROM sh GROUP BY doc_id
),
bands AS (
  {_BAND_SELECTS}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*)::DOUBLE AS n_common
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2
),
{_DUCK_JACCARD_TAIL}
""",
    tags=("canonical", "dedup", "northstar", "lsh"),
)
def q_minhash_lsh_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded MinHash-LSH near-dup pairs over CANONICALIZED text — the
    probabilistic scale path with the same normalization pre-step. An
    identical copy agrees on every band, so planted mutants are guaranteed
    candidates and verify at jaccard=1.0."""
    return minhash_lsh_pairs(mutated_corpus(spark, sf_dir), normalize=True)

"""Duplicated-substring span detection and removal (ExactSubstr-style).

Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better") show that *substring-level* exact dedup — removing any span that
appears verbatim elsewhere in the corpus — beats document-level dedup for
LM training. Their implementation builds a corpus-wide suffix array; a
suffix array is a single global ordered structure and does not shard
naturally. The distributed re-expression here uses the standard
equivalence: a maximal duplicated span of length >= k is exactly a maximal
run of overlapping duplicated k-grams, so

  1. k-gram relation  — narrow HOF projection per document (zero shuffle),
  2. duplicated grams — one shuffle keyed on the gram text (count distinct
     docs >= 2, i.e. the gram occurs verbatim in another document),
  3. span merge       — gaps-and-islands per document: a window over
     (doc_id ORDER BY start) merges overlapping/adjacent gram intervals
     into maximal spans. Per-document-sized windows; nothing global.

Two consumers:

* `dup_spans`       — the span *profile*: (doc_id, span_start, span_end,
                      span_len, n_grams, span_md5) for every maximal
                      duplicated span. This is the audit/reporting surface.
* `strip_dup_spans` — the Lee et al. *removal* semantic: every duplicated
                      gram occurrence EXCEPT the globally first one (min
                      (doc_id, start) per gram) marks its k word positions
                      covered; covered words are dropped and the document
                      re-assembled. Exactly one copy of every duplicated
                      region survives corpus-wide.

Unlike `curation.passage_dedup` (fixed word-count boundaries — a chunk is
only deduplicated if it duplicates *at the same chunk alignment*), the
k-gram run formulation is alignment-free: a copied region found at any
offset in another document is detected.

Scale posture (100 TB): the gram relation is ~L grams per L-word document —
linear blow-up bounded by k overlap; the duplicated-gram aggregation and
the occurrence join both shuffle on the gram text, a high-cardinality
well-spread key (same shape as dedup.py's shingle pipeline). The
first-occurrence rank rides the same gram-keyed shuffle. Island merge and
reassembly shuffle on doc_id. No corpus-global window, no cross join.

All Catalyst expressions — no UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clinical_search_data_pipeline_spark.operators.fragments import (
    SPAN_GATE_FRAC,
    SPAN_GRAM_K,
)
from clinical_search_data_pipeline_spark.registry import register
from clinical_search_data_pipeline_spark.sources.readers import fan_out, read_table


def word_grams(docs: DataFrame, k: int = SPAN_GRAM_K) -> DataFrame:
    """(doc_id, s, e, gram): every word k-gram with its 1-based inclusive
    word-position interval. Narrow HOF projection (split -> slice ->
    posexplode) after `fan_out`; zero shuffles. Documents shorter than k
    words produce no grams — guarded with an explicit CASE because Spark's
    sequence(1, 0) counts DOWN to [1, 0] instead of yielding empty."""
    w = fan_out(docs).select("doc_id", F.split(F.col("text"), " ").alias("w"))
    grams = F.expr(
        f"CASE WHEN size(w) >= {k} THEN transform(sequence(1, size(w) - {k} + 1), "
        f"i -> array_join(slice(w, i, {k}), ' ')) ELSE array() END"
    )
    return (
        w.select("doc_id", F.posexplode(grams).alias("p0", "gram"))
        .select(
            "doc_id",
            (F.col("p0") + 1).alias("s"),
            (F.col("p0") + F.lit(k)).alias("e"),
            "gram",
        )
    )


def duplicated_gram_occurrences(
    docs: DataFrame, k: int = SPAN_GRAM_K
) -> DataFrame:
    """(doc_id, s, e, first_doc, first_s): every occurrence of a k-gram
    that appears in >= 2 distinct documents, annotated with the globally
    first occurrence of that gram (lexicographic (doc_id, s) minimum).

    One shuffle keyed on the gram text for the distinct-doc count +
    first-occurrence struct-min; the occurrence join shares the key.
    """
    grams = word_grams(docs, k)
    dup = (
        grams.groupBy("gram")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.min(F.struct("doc_id", "s")).alias("first"),
        )
        .filter(F.col("n_docs") >= 2)
        .select(
            "gram",
            F.col("first.doc_id").alias("first_doc"),
            F.col("first.s").alias("first_s"),
        )
    )
    return grams.join(dup, "gram").select("doc_id", "s", "e", "first_doc", "first_s")


def dup_spans(docs: DataFrame, k: int = SPAN_GRAM_K) -> DataFrame:
    """(doc_id, span_start, span_end, span_len, n_grams, span_md5): maximal
    duplicated spans — overlapping/adjacent duplicated-gram intervals
    merged per document by a gaps-and-islands window, then the span text
    recovered by re-slicing the document's word array.

    The island break test compares each interval's start against the
    running max end of all PRECEDING intervals (not lag(e): a long interval
    can swallow several following ones)."""
    occ = duplicated_gram_occurrences(docs, k)
    by_start = Window.partitionBy("doc_id").orderBy("s")
    prev_max_e = F.max("e").over(
        by_start.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = occ.withColumn(
        "brk",
        F.when(F.col("s") > F.coalesce(prev_max_e, F.lit(-1)) + 1, 1).otherwise(0),
    ).withColumn(
        "island",
        F.sum("brk").over(by_start.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = flagged.groupBy("doc_id", "island").agg(
        F.min("s").alias("span_start"),
        F.max("e").alias("span_end"),
        F.count("*").alias("n_grams"),
    )
    words = docs.select("doc_id", F.split(F.col("text"), " ").alias("w"))
    return (
        spans.join(words, "doc_id")
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_len"),
            "n_grams",
            F.md5(
                F.array_join(
                    F.expr("slice(w, span_start, span_end - span_start + 1)"), " "
                )
            ).alias("span_md5"),
        )
    )


def strip_dup_spans(docs: DataFrame, k: int = SPAN_GRAM_K) -> DataFrame:
    """(doc_id, clean_text, n_words, n_removed): Lee et al. removal — every
    word position covered by a NON-first duplicated-gram occurrence is
    dropped; the first occurrence (and all never-duplicated text) is kept,
    so exactly one copy of each duplicated region survives corpus-wide.

    Covered positions come from exploding each marked interval into its k
    positions (bounded k-times fan-out of the duplicated slice only, never
    the whole corpus) and the rebuild is a doc_id-keyed left anti join +
    ordered re-collection."""
    marked = duplicated_gram_occurrences(docs, k).filter(
        ~((F.col("doc_id") == F.col("first_doc")) & (F.col("s") == F.col("first_s")))
    )
    covered = marked.select(
        "doc_id", F.explode(F.expr("sequence(s, e)")).alias("pos")
    ).distinct()
    toks = fan_out(docs).select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("p0", "word")
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), "word")
    kept = toks.join(covered, ["doc_id", "pos"], "left_anti")
    # word totals are a NARROW projection of the source (size of the split
    # array) — no second explode+aggregate over the corpus
    total = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_words")
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "word"))),
                lambda s: s["word"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    return (
        total.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_words",
            (F.col("n_words") - F.coalesce("n_kept", F.lit(0))).alias("n_removed"),
        )
    )


_DUCK_DUP_OCC_CTE = f"""
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
g AS (
  SELECT doc_id, i AS s, i + {SPAN_GRAM_K} - 1 AS e,
         array_to_string(list_slice(w, i, i + {SPAN_GRAM_K} - 1), ' ') AS gram
  FROM w, unnest(range(1, greatest(len(w) - {SPAN_GRAM_K} + 1, 0) + 1)) AS t(i)
),
dup AS (
  SELECT gram, min(struct_pack(doc_id := doc_id, s := s)) AS first
  FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
),
occ AS (
  SELECT g.doc_id, g.s, g.e,
         dup.first.doc_id AS first_doc, dup.first.s AS first_s
  FROM g JOIN dup USING (gram)
)"""


@register(
    "q_dup_spans",
    oracle=f"""
WITH {_DUCK_DUP_OCC_CTE},
isl AS (
  SELECT doc_id, s, e,
         CASE WHEN s > coalesce(max(e) OVER (
                PARTITION BY doc_id ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
              THEN 1 ELSE 0 END AS brk
  FROM occ
),
isl2 AS (
  SELECT doc_id, s, e,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY s) AS island
  FROM isl
),
sp AS (
  SELECT doc_id, island, min(s) AS span_start, max(e) AS span_end,
         count(*) AS n_grams
  FROM isl2 GROUP BY doc_id, island
)
SELECT sp.doc_id, span_start, span_end,
       span_end - span_start + 1 AS span_len, n_grams,
       md5(array_to_string(
         list_slice(w.w, span_start, span_end), ' ')) AS span_md5
FROM sp JOIN w ON sp.doc_id = w.doc_id
""",
    tags=("dedup", "text", "northstar"),
)
def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated-substring spans across the corpus — the
    alignment-free substring-dedup audit relation (Lee et al. 2022)."""
    return dup_spans(read_table(spark, sf_dir, "documents"))


@register(
    "q_strip_dup_spans",
    oracle=f"""
WITH {_DUCK_DUP_OCC_CTE},
cov AS (
  SELECT DISTINCT doc_id, s + i AS pos
  FROM occ, unnest(range(0, e - s + 1)) AS t(i)
  WHERE NOT (doc_id = first_doc AND s = first_s)
),
tok AS (
  SELECT doc_id, generate_subscripts(w, 1) AS pos, unnest(w) AS word FROM w
),
kept AS (
  SELECT tok.doc_id, tok.pos, tok.word
  FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.pos = cov.pos
  WHERE cov.pos IS NULL
),
total AS (SELECT doc_id, count(*) AS n_words FROM tok GROUP BY doc_id),
rebuilt AS (
  SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT total.doc_id,
       coalesce(clean_text, '') AS clean_text,
       n_words,
       n_words - coalesce(n_kept, 0) AS n_removed
FROM total LEFT JOIN rebuilt ON total.doc_id = rebuilt.doc_id
""",
    tags=("dedup", "text", "northstar"),
)
def q_strip_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dedup: drop every duplicated region except its
    globally first occurrence, rebuild each document (Lee et al. 2022)."""
    return strip_dup_spans(read_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Ingest-time substring contamination: batch docs vs a frozen corpus
# gram index
# ---------------------------------------------------------------------------

def corpus_gram_index(corpus: DataFrame, k: int = SPAN_GRAM_K) -> DataFrame:
    """(gram) — the DISTINCT k-gram set of a standing corpus: the frozen
    side of ingest-time substring screening. One shuffle (distinct on the
    gram text). At production scale a Bloom filter backs this relation —
    build it with `corpus_gram_bloom` and pass it to `span_contamination`;
    the exact join below is unchanged (the Bloom side only pre-shrinks its
    probe input, never its output)."""
    return word_grams(corpus, k).select("gram").distinct()


def corpus_gram_bloom(gram_index: DataFrame) -> DataFrame:
    """(word_idx, bits): the broadcastable Bloom bitset of the corpus gram
    index — the approximate-membership screen probed BEFORE the exact gram
    join. Self-sized to the index cardinality (~16 bits/gram, m clamped to
    [2^20, 2^27] — at most ~2M packed-word rows, always broadcastable); the
    chosen domain rides in the relation's column metadata so the probe
    hashes into the same bits (operators/bloom.py)."""
    from clinical_search_data_pipeline_spark.operators.bloom import bloom_build

    return bloom_build(gram_index, "gram")


def span_contamination(
    batch: DataFrame,
    gram_index: DataFrame,
    k: int = SPAN_GRAM_K,
    frac: float = SPAN_GATE_FRAC,
    bloom: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, n_words, n_dup_grams, covered_words, longest_run, status):
    screen incoming documents against the frozen corpus gram index.

    Per document: how many of its k-grams exist verbatim in the corpus,
    how many of its word positions those grams cover, and the longest
    contiguous covered run (the gaps-and-islands merge from `dup_spans`,
    here per batch document). `status` gates on covered fraction.

    Each row depends only on its own document and the frozen index, so
    the operator is micro-batch invariant — the streaming-twin property.
    Joins are gram-keyed equi-joins; windows are per-document.

    When `bloom` (the `corpus_gram_bloom` bitset) is given, batch grams
    are screened through the broadcast Bloom filter FIRST: definitely-
    absent grams — the overwhelming majority of a mostly-novel batch —
    never reach the gram-keyed shuffle against the corpus index. Output
    is bit-identical with or without it (no false negatives; the exact
    join verifies every Bloom survivor)."""
    grams = word_grams(batch, k)
    if bloom is not None:
        from clinical_search_data_pipeline_spark.operators.bloom import bloom_probe

        grams = bloom_probe(grams, "gram", bloom)
    hits = grams.join(gram_index, "gram").select("doc_id", "s", "e")
    by_start = Window.partitionBy("doc_id").orderBy("s")
    prev_max_e = F.max("e").over(by_start.rowsBetween(Window.unboundedPreceding, -1))
    islands = (
        hits.withColumn(
            "brk",
            F.when(F.col("s") > F.coalesce(prev_max_e, F.lit(-1)) + 1, 1).otherwise(0),
        )
        .withColumn(
            "island",
            F.sum("brk").over(by_start.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("doc_id", "island")
        .agg(
            (F.max("e") - F.min("s") + 1).alias("run_len"),
            F.count("*").alias("n_grams"),
        )
    )
    per_doc = islands.groupBy("doc_id").agg(
        F.sum("n_grams").alias("n_dup_grams"),
        F.sum("run_len").alias("covered_words"),
        F.max("run_len").alias("longest_run"),
    )
    totals = batch.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_words")
    )
    return totals.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_words",
        F.coalesce("n_dup_grams", F.lit(0)).alias("n_dup_grams"),
        F.coalesce("covered_words", F.lit(0)).alias("covered_words"),
        F.coalesce("longest_run", F.lit(0)).alias("longest_run"),
        F.when(
            F.coalesce("covered_words", F.lit(0)) > F.col("n_words") * F.lit(frac),
            "contaminated",
        )
        .otherwise("clean")
        .alias("status"),
    )

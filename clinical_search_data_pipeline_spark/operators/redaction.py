"""PII redaction: pattern-based scrubbing of emails / phone numbers / IPv4
addresses from a text corpus, with per-document match accounting.

North-star operator beyond the reference (the reference pipeline,
processing/spark/jobs/*, ships raw click-log text untouched) — any corpus
destined for LLM training needs a redaction pass, and the standard
first-line tool is regex scrubbing with typed placeholders (the approach
used by CCNet/Dolma-style curation stacks before ML-based PII models).

Engine-portability contract: Spark compiles patterns with java.util.regex,
DuckDB with RE2. The patterns below are written in the common subset —
character classes, bounded repetition, grouping — and avoid lookaround,
backreferences, and word boundaries, so both engines produce identical
matches; tests/test_redaction.py proves the agreement on adversarial
strings (overlaps, adjacency, multiplicity) by running BOTH engines over
the same literals.

Fixture note: the synthetic corpus (`documents.text`) is word-soup with no
PII, which would make a redaction query a vacuous no-op. `q_pii_redact`
therefore AUGMENTS each document with deterministic doc_id-derived PII
tokens (email + phone + two IPs) inside the query itself — identically in
the Spark builder and the DuckDB oracle — so the hash check exercises every
pattern on every row. The augmentation is part of the test harness, not the
operator: `redact_pii` itself takes any text column.

Scale posture: a narrow projection — zero shuffles, no UDFs, whole-stage
codegen end to end. Regex evaluation is JVM-side and embarrassingly
parallel; at 100 TB this runs at scan speed and the only cost knob is
pattern count x text length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_search_data_pipeline_spark.registry import register
from clinical_search_data_pipeline_spark.sources.readers import read_table

# Patterns in the java.util.regex / RE2 common subset (see module docstring).
# Order matters and is part of the contract: EMAIL strips first (its local
# part may contain digits that IP would otherwise nibble), then PHONE (its
# groups are dash-joined, so the dotted IP pattern cannot overlap), then IP.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    ("ip", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
)


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds `n_<kind>` match counts per PII class and a `redacted` column
    with every match replaced by its typed placeholder.

    Counts are taken BEFORE any replacement (on the original text) so each
    class reports its own matches even when patterns would collide after
    substitution; replacements then apply in PII_PATTERNS order.
    """
    out = df
    for kind, pat, _ in PII_PATTERNS:
        out = out.withColumn(f"n_{kind}", F.regexp_count(F.col(text_col), F.lit(pat)))
    red: Column = F.col(text_col)
    for _, pat, placeholder in PII_PATTERNS:
        red = F.regexp_replace(red, pat, placeholder)
    return out.withColumn("redacted", red)


def _duck_redact(expr: str) -> str:
    """DuckDB fragment equal to the `redacted` column for the same input."""
    red = expr
    for _, pat, placeholder in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{placeholder}', 'g')"
    return red


def _duck_count(expr: str, pat: str) -> str:
    return f"len(regexp_extract_all({expr}, '{pat}'))"


# Deterministic doc_id-derived augmentation (see module docstring): one
# email, one phone, two IPv4s appended to every document — identical
# expressions on both engines.
_SPARK_AUG = (
    "concat(text, ' contact u', CAST(doc_id AS STRING), '@ex', "
    "CAST(doc_id % 7 AS STRING), '.org tel +1-555-', "
    "lpad(CAST(doc_id % 1000 AS STRING), 3, '0'), '-', "
    "lpad(CAST((doc_id * 31) % 10000 AS STRING), 4, '0'), "
    "' via 10.', CAST(doc_id % 256 AS STRING), '.0.', "
    "CAST((doc_id * 7) % 256 AS STRING), "
    "' and 192.168.', CAST(doc_id % 64 AS STRING), '.1')"
)
_DUCK_AUG = (
    "text || ' contact u' || doc_id || '@ex' || (doc_id % 7) || "
    "'.org tel +1-555-' || lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-' || "
    "lpad(((doc_id * 31) % 10000)::VARCHAR, 4, '0') || "
    "' via 10.' || (doc_id % 256) || '.0.' || ((doc_id * 7) % 256) || "
    "' and 192.168.' || (doc_id % 64) || '.1'"
)


@register(
    "q_pii_redact",
    oracle=f"""
WITH aug AS (SELECT doc_id, {_DUCK_AUG} AS text FROM documents)
SELECT doc_id,
       {_duck_count('text', PII_PATTERNS[0][1])}::INT AS n_email,
       {_duck_count('text', PII_PATTERNS[1][1])}::INT AS n_phone,
       {_duck_count('text', PII_PATTERNS[2][1])}::INT AS n_ip,
       length(text) - length({_duck_redact('text')}) AS n_chars_delta,
       md5({_duck_redact('text')}) AS redacted_md5
FROM aug
""",
    tags=("redaction", "text", "northstar"),
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII accounting + a bit-exact digest of the scrubbed
    text, over the deterministically PII-augmented fixture corpus.

    `n_chars_delta` is the SIGNED length change (original - redacted): a
    placeholder longer than its match (e.g. 'a@b.io' -> '<EMAIL>') yields a
    negative delta, which is why the metric is not named "removed"."""
    aug = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", F.expr(_SPARK_AUG).alias("text"))
    )
    out = redact_pii(aug)
    return out.select(
        "doc_id",
        "n_email",
        "n_phone",
        "n_ip",
        (F.length("text") - F.length("redacted")).cast("long").alias("n_chars_delta"),
        F.md5("redacted").alias("redacted_md5"),
    )

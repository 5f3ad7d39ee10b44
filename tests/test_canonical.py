"""Text canonicalization: Java-regex/translate vs RE2/translate agreement
on adversarial literals, idempotence, and the planted-copy property the
feature exists for — raw shingles MISS re-cased/re-punctuated/re-accented
copies, normalized shingles CATCH them at jaccard=1.0. Full-corpus hash
parity of the registered queries runs in test_oracle_parity."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from clinical_search_data_pipeline_spark.functions.normalize import (
    duck_normalize,
    normalize_text,
)
from clinical_search_data_pipeline_spark.operators.canonical import (
    MUTANT_MOD,
    MUTANT_OFFSET,
    mutated_corpus,
)
from clinical_search_data_pipeline_spark.operators.dedup import (
    jaccard_pairs,
    minhash_lsh_pairs,
)
from tests.conftest import SF_SMOKE

# Adversarial literals: mixed case, every accent in the fold table, digit
# runs, punctuation runs, leading/trailing/multiple spaces, non-latin
# residue, and already-canonical text (idempotence anchor).
CASES = [
    "plain lower words",
    "MiXeD CaSe WORDS",
    "àáâäãå èéêë ìíîï òóôõö ùúûü çñ",
    "phone +1-555-123-4567 and v1.2.3 release 2024",
    "punct!!! runs??? ... --- (parens) [brackets] {braces}",
    "  leading and   multiple    spaces trailing   ",
    "tabs\tand\nnewlines stay punct-class",
    "mixed Áccénts ÀND CASE tögether",
    "digits 0123456789 fold to zeros",
    "κυριλλικά and 中文 residue strips",
    "already canonical 0 text a b c",
    "",
]


def test_spark_and_duckdb_normalize_agree(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(CASES)], "id long, text string"
    )
    got = {
        r["id"]: r["norm"]
        for r in df.select("id", normalize_text("text").alias("norm")).collect()
    }
    con = duckdb.connect()
    try:
        rows = con.execute(
            f"SELECT id, {duck_normalize('text')} AS norm "
            "FROM (SELECT unnest(range(len($1::VARCHAR[]))) AS id, "
            "unnest($1::VARCHAR[]) AS text)",
            [CASES],
        ).fetchall()
    finally:
        con.close()
    for rid, norm in rows:
        assert got[rid] == norm, (CASES[rid], got[rid], norm)


def test_normalize_is_idempotent(spark):
    df = spark.createDataFrame([(s,) for s in CASES], "text string")
    twice = df.select(
        normalize_text("text").alias("once"),
    ).select(
        "once", normalize_text("once").alias("twice")
    )
    bad = twice.filter(F.col("once") != F.col("twice")).collect()
    assert not bad, bad


def _planted_pairs(spark):
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .filter(F.col("doc_id") % MUTANT_MOD == 0)
    )
    return {(r["doc_id"], r["doc_id"] + MUTANT_OFFSET) for r in docs.collect()}


def test_raw_shingles_miss_planted_copies(spark):
    """The failure mode being closed: every mutant copy is invisible to the
    RAW prefix-filtered Jaccard detector (case/punct/accent changes rewrite
    every shingle)."""
    planted = _planted_pairs(spark)
    assert planted  # fixture must plant something
    raw = {
        (r["doc_a"], r["doc_b"])
        for r in jaccard_pairs(mutated_corpus(spark, SF_SMOKE)).collect()
    }
    assert not (raw & planted), raw & planted


def test_normalized_jaccard_catches_every_planted_copy(spark):
    planted = _planted_pairs(spark)
    rows = jaccard_pairs(mutated_corpus(spark, SF_SMOKE), normalize=True).collect()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in rows}
    missing = planted - set(got)
    assert not missing, missing
    assert all(got[p] == 1.0 for p in planted), {p: got[p] for p in planted}


def test_normalized_minhash_catches_every_planted_copy(spark):
    """An identical canonical copy agrees on every band, so LSH recall on
    planted mutants is exactly 1 — not probabilistic."""
    planted = _planted_pairs(spark)
    rows = minhash_lsh_pairs(mutated_corpus(spark, SF_SMOKE), normalize=True).collect()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in rows}
    missing = planted - set(got)
    assert not missing, missing
    assert all(got[p] == 1.0 for p in planted), {p: got[p] for p in planted}

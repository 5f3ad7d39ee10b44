"""Empirical scale posture (VERDICT r04 #2): plan-shape guards say the heavy
family SHOULD scale; this proves it on a 10x disjoint self-union corpus.

The scaled fixture (testing.make_scaled_corpus) guarantees document-family
output is exactly factor-linear, so both the row count and the runtime bound
here are sharp assertions, not smoke."""

from __future__ import annotations

import time

from clinical_search_data_pipeline_spark.caching import release_caches
from clinical_search_data_pipeline_spark.operators.dedup import jaccard_pairs
from clinical_search_data_pipeline_spark.testing import make_scaled_corpus
from tests.conftest import SF_SMOKE

SF_MID = "/root/testdata/sf0.01"
FACTOR = 10


def _timed_count(df) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = df.count()
    sec = time.perf_counter() - t0
    release_caches()
    return sec, n


def test_jaccard_pairs_scales_linearly(spark, tmp_path):
    docs_base = spark.read.parquet(f"{SF_MID}/documents.parquet")
    scaled_dir = make_scaled_corpus(spark, SF_MID, str(tmp_path / "scaled"), FACTOR)
    docs_scaled = spark.read.parquet(f"{scaled_dir}/documents.parquet")

    # warm pass: JVM codegen/Arrow/file-index costs must not bias base
    _timed_count(jaccard_pairs(docs_base))
    base_sec, base_rows = _timed_count(jaccard_pairs(docs_base))
    scaled_sec, scaled_rows = _timed_count(jaccard_pairs(docs_scaled))

    # replicas are pairwise disjoint by construction -> EXACTLY linear output
    assert base_rows > 0
    assert scaled_rows == FACTOR * base_rows
    # runtime must grow sub-quadratically: < 15x for 10x input. The 0.5 s
    # floor keeps fixed per-query overhead (planning, task launch) from
    # dominating the ratio at the tiny base scale.
    assert scaled_sec < 15 * max(base_sec, 0.5), (
        f"superlinear blowup: base {base_sec:.2f}s -> scaled {scaled_sec:.2f}s"
    )


def test_passage_dedup_scales_linearly(spark, tmp_path):
    """Passage dedup on the ciphered 10x corpus: the substitution cipher is
    a bijection on characters, so within-copy duplicated passages replicate
    exactly and cross-copy passages never collide — output rows AND total
    dropped passages are exactly factor-linear."""
    from pyspark.sql import functions as F

    from clinical_search_data_pipeline_spark.operators.curation import passage_dedup

    docs_base = spark.read.parquet(f"{SF_MID}/documents.parquet")
    scaled_dir = make_scaled_corpus(spark, SF_MID, str(tmp_path / "scaledp"), FACTOR)
    docs_scaled = spark.read.parquet(f"{scaled_dir}/documents.parquet")

    _timed_count(passage_dedup(docs_base))  # warm
    base_sec, base_rows = _timed_count(passage_dedup(docs_base))
    scaled_sec, scaled_rows = _timed_count(passage_dedup(docs_scaled))
    assert base_rows > 0 and scaled_rows == FACTOR * base_rows

    base_dropped = passage_dedup(docs_base).agg(F.sum("n_dropped")).collect()[0][0]
    scaled_dropped = passage_dedup(docs_scaled).agg(F.sum("n_dropped")).collect()[0][0]
    assert base_dropped > 0 and scaled_dropped == FACTOR * base_dropped
    assert scaled_sec < 15 * max(base_sec, 0.5), (
        f"superlinear blowup: base {base_sec:.2f}s -> scaled {scaled_sec:.2f}s"
    )


def test_scaled_corpus_preserves_untouched_tables(spark, tmp_path):
    """Non-scaled tables ride through as symlinks — same rows, same schema —
    so a registered query mixing documents with dimension tables still runs
    against the scaled dir."""
    out = make_scaled_corpus(spark, SF_SMOKE, str(tmp_path / "scaled2"), 2)
    for t in ("events", "nation", "region"):
        a = spark.read.parquet(f"{SF_SMOKE}/{t}.parquet")
        b = spark.read.parquet(f"{out}/{t}.parquet")
        assert a.schema == b.schema and a.count() == b.count()
    docs = spark.read.parquet(f"{out}/documents.parquet")
    base = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    assert docs.count() == 2 * base.count()
    emb = spark.read.parquet(f"{out}/embeddings.parquet")
    base_e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    assert emb.count() == 2 * base_e.count()
    assert emb.schema == base_e.schema


def test_token_budget_output_stays_budget_sized_at_10x(spark, tmp_path):
    """The pre-shuffle budget pruning claim, pinned: at 10x corpus with a
    FIXED budget, the kept token total per language is still <= budget and
    the kept-doc count stays in the same regime (bounded by budget /
    min-doc-length, NOT growing 10x), while the corpus underneath grew
    exactly 10x."""
    from pyspark.sql import functions as F

    from clinical_search_data_pipeline_spark.operators.curation import (
        TOKEN_BUDGET,
        token_budget_sample,
    )

    docs_base = spark.read.parquet(f"{SF_MID}/documents.parquet")
    scaled_dir = make_scaled_corpus(spark, SF_MID, str(tmp_path / "scaledtb"), FACTOR)
    docs_scaled = spark.read.parquet(f"{scaled_dir}/documents.parquet")
    assert docs_scaled.count() == FACTOR * docs_base.count()

    base = token_budget_sample(docs_base)
    scaled = token_budget_sample(docs_scaled)
    for df in (base, scaled):
        for r in df.groupBy("lang").agg(F.max("cum_tokens").alias("t")).collect():
            assert r["t"] <= TOKEN_BUDGET
    n_base, n_scaled = base.count(), scaled.count()
    assert n_base > 0
    # budget-bound, not corpus-bound: nowhere near 10x growth
    assert n_scaled < 3 * n_base, (n_base, n_scaled)

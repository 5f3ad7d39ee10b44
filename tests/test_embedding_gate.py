"""Streaming embedding (semantic) admission gate: the accumulated streaming
sink must equal one-shot batch screening under the same frozen LSH index,
and the fixture's natural cross-split near-dups must be flagged. Full hash
parity vs the DuckDB banding oracle runs in test_oracle_parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from clinical_search_data_pipeline_spark.registry import all_specs
from tests.conftest import SF_SMOKE


def _batch_screen(spark):
    from clinical_search_data_pipeline_spark.operators.similarity import (
        EMB_SPLIT,
        GATE_BANDS,
        GATE_BITS,
        banded_lsh_keys,
        embedding_vs_corpus,
        vectors_with_norms,
    )
    from clinical_search_data_pipeline_spark.sources.readers import read_table

    emb = read_table(spark, SF_SMOKE, "embeddings")
    corpus = emb.filter(F.col("vec_id") < EMB_SPLIT)
    batch = emb.filter(F.col("vec_id") >= EMB_SPLIT)
    return embedding_vs_corpus(
        banded_lsh_keys(corpus, GATE_BANDS, GATE_BITS).select(
            "vec_id", "band", "bucket"
        ),
        vectors_with_norms(corpus).select("vec_id", "v", "norm"),
        batch,
    )


def test_stream_embedding_gate_equals_batch_screen(spark):
    """Micro-batch invariance made concrete: the 4-file availableNow stream
    (multiple genuine micro-batches) accumulates exactly the one-shot
    batch screen's verdict relation."""
    got = {
        r.vec_id: (r.n_corpus_matches, r.status)
        for r in all_specs()["q_stream_embedding_gate"]
        .builder(spark, SF_SMOKE)
        .collect()
    }
    expect = {
        r.vec_id: (r.n_corpus_matches, r.status)
        for r in _batch_screen(spark).collect()
    }
    assert got == expect and got


def test_embedding_gate_catches_cross_split_dups(spark):
    """The fixture has 4 true cross-split near-dup pairs at sf0.001
    (cosine >= 0.45 straddling EMB_SPLIT) and the 16x6 gate banding
    catches all of them — every flagged vector must be a true near-dup
    (the verify step is exact, so no false positives by construction)."""
    verdicts = _batch_screen(spark).collect()
    flagged = {r.vec_id for r in verdicts if r.status == "dup_embedding"}
    assert len(verdicts) > 0
    assert flagged == {319, 358, 454, 477}, flagged

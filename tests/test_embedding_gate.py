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


def test_auto_banding_analytic_frontier():
    """gate_banding_for (VERDICT r8 #4): the bits knob tracks corpus
    density (like bloom_params_for's m), the band count buys recall back
    under a hard per-item verify budget, and the predicted frontier is
    honest — tau=0.9 holds the target across the practical density range;
    tau=0.45 meets it only at low density (the regime where hyperplane
    LSH is simply weak — COVERAGE.md r2 deviation note)."""
    from clinical_search_data_pipeline_spark.operators.similarity import (
        GATE_COLLISIONS_PER_BAND,
        GATE_MAX_BANDS,
        banding_recall,
        gate_banding_for,
    )

    prev_bits = 0
    for n in (100, 1_000, 10_000, 100_000, 500_000):
        bands, bits = gate_banding_for(n, 0.9)
        assert bits >= prev_bits, "bits must grow with density"
        prev_bits = bits
        assert bands <= GATE_MAX_BANDS
        assert banding_recall(bands, bits, 0.9) >= 0.99
        # the scale contract: expected verifies per item bounded by the
        # budget regardless of n
        assert bands * GATE_COLLISIONS_PER_BAND <= 512
    b45, i45 = gate_banding_for(250, 0.45)
    assert banding_recall(b45, i45, 0.45) >= 0.99
    # high density + hard tau: the cap binds and the frontier is REPORTED,
    # not silently traded for unbounded candidates
    b_hd, i_hd = gate_banding_for(5_000_000, 0.45)
    assert b_hd == GATE_MAX_BANDS and i_hd >= 18
    assert banding_recall(b_hd, i_hd, 0.45) < 0.5


def test_auto_banding_bounds_candidate_growth(spark):
    """The measured half of VERDICT r8 #4: candidates per batch item under
    the AUTO banding stay flat when the corpus grows x10 (sf0.001 corpus
    -> sf0.01 corpus, same generator), while the fixed fixture banding's
    grow ~2x on the same data — the bits-per-band knob, now self-sizing,
    was the corpus sensitivity."""
    from clinical_search_data_pipeline_spark.operators.similarity import (
        EMB_SPLIT,
        GATE_BANDS,
        GATE_BITS,
        banded_lsh_keys,
        gate_banding_for,
    )

    e1 = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    e10 = spark.read.parquet(
        f"{SF_SMOKE.replace('sf0.001', 'sf0.01')}/embeddings.parquet"
    )
    corpora = {
        1: (e1.filter(F.col("vec_id") < EMB_SPLIT), EMB_SPLIT),
        10: (e10.filter(F.col("vec_id") < EMB_SPLIT * 10), EMB_SPLIT * 10),
    }
    batch = e1.filter(F.col("vec_id") >= EMB_SPLIT)
    n_batch = batch.count()

    def per_item(corpus, bands, bits):
        ck = banded_lsh_keys(corpus, bands, bits).select(
            F.col("vec_id").alias("vec_a"), "band", "bucket"
        )
        bk = banded_lsh_keys(batch, bands, bits).select(
            F.col("vec_id").alias("vec_b"), "band", "bucket"
        )
        pairs = bk.join(ck, ["band", "bucket"]).select("vec_a", "vec_b")
        return pairs.distinct().count() / n_batch

    for tau in (0.45, 0.9):
        auto = {
            f: per_item(c, *gate_banding_for(n, tau))
            for f, (c, n) in corpora.items()
        }
        assert auto[10] / auto[1] <= 1.5, (tau, auto)
    fixed = {
        f: per_item(c, GATE_BANDS, GATE_BITS) for f, (c, n) in corpora.items()
    }
    assert fixed[10] / fixed[1] >= 1.8, fixed


def test_auto_banding_catches_cross_split_dups(spark):
    """Recall floor re-pinned for the AUTO config: at sf0.001 / tau=0.45
    the self-sized banding (38x5, predicted 0.99 at-threshold) catches the
    same 4 true cross-split near-dups as the hand-tuned fixture 16x6 —
    and no false positives exist by construction (exact verify)."""
    from clinical_search_data_pipeline_spark.operators.similarity import (
        EMB_SPLIT,
        banded_lsh_keys,
        embedding_vs_corpus,
        gate_banding_for,
        vectors_with_norms,
    )
    from clinical_search_data_pipeline_spark.sources.readers import read_table

    emb = read_table(spark, SF_SMOKE, "embeddings")
    corpus = emb.filter(F.col("vec_id") < EMB_SPLIT)
    batch = emb.filter(F.col("vec_id") >= EMB_SPLIT)
    bands, bits = gate_banding_for(EMB_SPLIT, 0.45)
    assert (bands, bits) == (38, 5)
    verdicts = embedding_vs_corpus(
        banded_lsh_keys(corpus, bands, bits).select("vec_id", "band", "bucket"),
        vectors_with_norms(corpus).select("vec_id", "v", "norm"),
        batch,
        bands=bands,
        bits=bits,
    ).collect()
    flagged = {r.vec_id for r in verdicts if r.status == "dup_embedding"}
    assert flagged == {319, 358, 454, 477}, flagged

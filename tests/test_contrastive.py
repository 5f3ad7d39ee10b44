"""Contrastive training-pair mining (similarity.contrastive_pairs):
tier contracts recomputed against the exact top-k."""

from __future__ import annotations

from clinical_search_data_pipeline_spark.operators.similarity import (
    N_QUERIES,
    TOP_K,
    contrastive_pairs,
    cosine_topk,
)
from clinical_search_data_pipeline_spark.sources.readers import read_table
from tests.conftest import SF_SMOKE


def _rows(spark, **kw):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    return contrastive_pairs(emb, **kw).collect()


def test_tier_sizes_and_band_contracts(spark):
    rows = _rows(spark)
    by_tier: dict[str, list] = {}
    for r in rows:
        by_tier.setdefault(r.tier, []).append(r)
    assert set(by_tier) == {"positive", "hard_negative", "random_negative"}
    for tier, members in by_tier.items():
        assert len(members) == N_QUERIES * TOP_K, tier
    assert all(r.rank <= TOP_K for r in by_tier["positive"])
    assert all(TOP_K < r.rank <= 2 * TOP_K for r in by_tier["hard_negative"])
    assert all(r.rank > 2 * TOP_K for r in by_tier["random_negative"])


def test_positives_equal_exact_topk(spark):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    want = {
        (r.query_id, r.neighbor_id, r.rank, r.score)
        for r in cosine_topk(emb).collect()
    }
    got = {
        (r.query_id, r.neighbor_id, r.rank, r.score)
        for r in contrastive_pairs(emb).collect()
        if r.tier == "positive"
    }
    assert got == want


def test_random_tier_is_seeded(spark):
    """A different seed re-draws the random negatives (and only them):
    the epoch knob is real, and positives/hard bands are seed-independent."""
    a = _rows(spark)
    b = _rows(spark, seed="cntr-v2")
    key = lambda rs, t: {(r.query_id, r.neighbor_id) for r in rs if r.tier == t}  # noqa: E731
    assert key(a, "positive") == key(b, "positive")
    assert key(a, "hard_negative") == key(b, "hard_negative")
    assert key(a, "random_negative") != key(b, "random_negative")
    # re-running the SAME seed reproduces the draw bit-for-bit
    c = _rows(spark)
    assert sorted(map(tuple, a)) == sorted(map(tuple, c))

"""The pandas_udf cosine path must agree with the exact Catalyst-expression
path on neighbor sets and (to 4 dp) scores."""

from __future__ import annotations

from clinical_search_data_pipeline_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_vectorized,
)
from clinical_search_data_pipeline_spark.sources.readers import read_table
from tests.conftest import SF_SMOKE


def test_vectorized_matches_exact(spark):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    exact = cosine_topk(emb).select("query_id", "neighbor_id", "rank", "score")
    fast = cosine_topk_vectorized(emb).select(
        "query_id", "neighbor_id", "rank", "score"
    )
    assert exact.exceptAll(fast).isEmpty() and fast.exceptAll(exact).isEmpty()


def test_ann_recall_ordering(spark):
    """recall@5 vs the exact scan must not degrade as probes widen:
    multiprobe >= single-probe LSH; both approximations return valid
    (query, neighbor) pairs only."""
    from clinical_search_data_pipeline_spark.operators.similarity import (
        ann_lsh_multiprobe_topk,
        ann_lsh_topk,
    )

    emb = read_table(spark, SF_SMOKE, "embeddings")

    def pairs(df):
        return {(r.query_id, r.neighbor_id) for r in df.collect()}

    exact = pairs(cosine_topk(emb))
    single = pairs(ann_lsh_topk(emb))
    multi = pairs(ann_lsh_multiprobe_topk(emb))
    r_single = len(single & exact) / len(exact)
    r_multi = len(multi & exact) / len(exact)
    # the fixture embeddings are near-uniform (no planted cluster structure),
    # so absolute recall is low; the invariant is that widening probes only
    # adds candidates: multiprobe strictly dominates single-probe.
    # (a true top-k neighbor can only be displaced by a higher-scored vector,
    # which is itself a true top-k neighbor -> recall is monotone in probes)
    assert 0 <= r_single <= r_multi <= 1.0
    assert r_multi > 0

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

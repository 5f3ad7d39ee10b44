"""Partition-count invariance: the engine's float outputs are ORDER-PINNED
(position-ordered left folds), so changing the shuffle width must not move
a single value. This is the determinism claim a 1000-executor cluster
rests on — a groupBy-sum of doubles would pass the oracle at one width
and drift at another."""

from __future__ import annotations

import pytest

from clinical_search_data_pipeline_spark.caching import release_caches
from clinical_search_data_pipeline_spark.registry import all_specs
from tests.conftest import SF_SMOKE

FLOAT_FOLD_QUERIES = [
    "q_unigram_nll",
    "q_bigram_nll",
    "q_dsir_weights",
    "q_word_entropy",
    "q_ewma_user_values",
    # integer, not float — but its distributed prefix sum rides bucket
    # windows whose equality with the global order is the whole claim
    "q_pps_sample",
]


@pytest.mark.parametrize("name", FLOAT_FOLD_QUERIES)
def test_float_outputs_invariant_to_shuffle_width(spark, name):
    spec = all_specs()[name]
    original = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(map(tuple, spec.builder(spark, SF_SMOKE).collect()))
        release_caches()
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = sorted(map(tuple, spec.builder(spark, SF_SMOKE).collect()))
        release_caches()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", original)
    assert a == b and len(a) > 0

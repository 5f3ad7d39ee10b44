"""Systematic PPS sampling (splits.pps_sample): exact integer invariants
and equality with the naive single-window form."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from clinical_search_data_pipeline_spark.functions.hashing import hash64
from clinical_search_data_pipeline_spark.operators.splits import (
    PPS_SAMPLES,
    PPS_SEED,
    pps_sample,
)
from clinical_search_data_pipeline_spark.sources.readers import read_table
from tests.conftest import SF_SMOKE


def _docs(spark):
    return read_table(spark, SF_SMOKE, "documents")


def test_total_picks_telescopes_exactly(spark):
    """sum(picks) telescopes to floor(W / S) EXACTLY — the property float
    pow-based weighted reservoirs cannot pin."""
    docs = _docs(spark)
    out = pps_sample(docs).collect()
    w_total = docs.agg(F.sum("n_chars")).first()[0]
    stride = max(w_total // PPS_SAMPLES, 1)
    assert all(r.stride == stride for r in out)
    assert sum(r.picks for r in out) == w_total // stride


def test_certainty_items_and_multiplicity_bounds(spark):
    """Any document with w >= stride is picked with certainty (its weight
    interval must cross a stride boundary), and multiplicity is within
    floor(w/S) <= picks <= floor(w/S) + 1."""
    docs = _docs(spark)
    out = {r.doc_id: r for r in pps_sample(docs).collect()}
    for r in docs.select("doc_id", "n_chars").collect():
        stride = next(iter(out.values())).stride
        lo, hi = r.n_chars // stride, r.n_chars // stride + 1
        if r.doc_id in out:
            assert lo <= out[r.doc_id].picks <= hi
        else:
            assert lo == 0  # only sub-stride docs may be skipped


def test_equals_naive_global_window(spark):
    """The bucket-offset distributed form equals the single-partition
    global window (bucket = top bits of shuffle_key, so bucket-major +
    within-bucket order IS the total order)."""
    docs = _docs(spark)
    got = [
        (r.doc_id, r.w, r.cum_before, r.picks)
        for r in pps_sample(docs).collect()
    ]
    keyed = docs.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("w"),
        hash64(
            F.concat_ws(":", F.lit(PPS_SEED), F.col("doc_id"))
        ).alias("shuffle_key"),
    )
    w_total = docs.agg(F.sum("n_chars")).first()[0]
    stride = max(w_total // PPS_SAMPLES, 1)
    w_glob = Window.orderBy("shuffle_key", "doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    naive = (
        keyed.withColumn(
            "cum_before", F.coalesce(F.sum("w").over(w_glob), F.lit(0))
        )
        .withColumn(
            "picks",
            F.expr(f"div(cum_before + w, {stride}) - div(cum_before, {stride})"),
        )
        .filter("picks >= 1")
        .orderBy("doc_id")
    )
    want = [(r.doc_id, r.w, r.cum_before, r.picks) for r in naive.collect()]
    assert got == want


def test_sample_size_near_target(spark):
    """Distinct sampled docs <= floor(W/S) <= k, and for the fixture's
    weight spread the sample lands within a couple of certainty
    multiplicities of k."""
    out = pps_sample(_docs(spark)).collect()
    total_picks = sum(r.picks for r in out)
    assert len(out) <= total_picks <= PPS_SAMPLES + 1
    assert total_picks >= PPS_SAMPLES - 1

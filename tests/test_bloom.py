"""Bloom pre-filter for the substring admission gate (operators/bloom.py):
no false negatives (completeness — the exactness guarantee), measured
false-positive rate within the analytic bound, output transparency through
span_contamination, bounded relation size, and the broadcast plan shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clinical_search_data_pipeline_spark.operators.bloom import (
    BLOOM_HASHES,
    BLOOM_M_BITS,
    bloom_build,
    bloom_fp_rate,
    bloom_params_for,
    bloom_probe,
)
from clinical_search_data_pipeline_spark.operators.spans import (
    corpus_gram_bloom,
    corpus_gram_index,
    span_contamination,
    word_grams,
)


def _strings(spark, values):
    return spark.createDataFrame([(v,) for v in values], ["gram"])


def test_bloom_no_false_negatives(spark):
    # every inserted value MUST pass the probe — this is what makes the
    # pre-filter exactness-preserving in front of the exact gram join.
    members = [f"member gram number {i}" for i in range(2000)]
    bloom = bloom_build(_strings(spark, members), "gram")
    survivors = bloom_probe(_strings(spark, members), "gram", bloom)
    assert survivors.count() == len(members)


def test_bloom_fp_rate_within_analytic_bound(spark):
    # disjoint probe set: survivors are pure false positives. The measured
    # rate should sit near (1 - e^{-kn/m})^k; 3x + small absolute slack
    # absorbs hash-family variance on a finite sample.
    n = 5000
    members = [f"inserted value {i}" for i in range(n)]
    absent = [f"never inserted {i}" for i in range(n)]
    bloom = bloom_build(_strings(spark, members), "gram")
    fp = bloom_probe(_strings(spark, absent), "gram", bloom).count() / n
    predicted = bloom_fp_rate(n)
    assert fp <= 3 * predicted + 0.002, (fp, predicted)


def test_bloom_relation_bounded_and_broadcastable(spark):
    # the packed-word relation never exceeds m/64 rows no matter how many
    # values are inserted — the corpus-size-independence claim.
    members = [f"value {i}" for i in range(20000)]
    bloom = bloom_build(_strings(spark, members), "gram")
    assert bloom.count() <= BLOOM_M_BITS // 64
    assert bloom.schema.simpleString() == "struct<word_idx:bigint,bits:bigint>"


def test_bloom_self_sizes_past_floor_capacity(spark):
    # a corpus whose distinct-gram count would saturate the 2^20 floor
    # (n * 16 bits > 2^20) must get a bigger domain automatically — the
    # x10-scale saturation regression (fp -> 1, pre-filter useless).
    n = 90_000  # 90k * 16 = 1.44M bits > 2^20
    members = [f"corpus gram {i}" for i in range(n)]
    bloom = bloom_build(_strings(spark, members), "gram")
    meta = dict(bloom.schema["bits"].metadata)
    assert meta["m_bits"] == bloom_params_for(n)
    assert meta["m_bits"] > BLOOM_M_BITS
    absent = [f"novel gram {i}" for i in range(5000)]
    fp = bloom_probe(_strings(spark, absent), "gram", bloom).count() / 5000
    assert fp <= 0.05, fp  # analytic ~0.5% at 16 bits/item; wide slack


def test_bloom_params_survive_lake_round_trip(spark, tmp_path):
    # the production shape persists the bloom relation next to the gram
    # index; the self-sized (m, k) must ride the parquet schema so a later
    # session probes into the same bit domain.
    members = [f"corpus gram {i}" for i in range(90_000)]
    bloom = bloom_build(_strings(spark, members), "gram")
    path = str(tmp_path / "bloom")
    bloom.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    assert dict(back.schema["bits"].metadata) == dict(bloom.schema["bits"].metadata)
    # no false negatives through the round-tripped relation
    assert bloom_probe(_strings(spark, members[:500]), "gram", back).count() == 500


def test_probe_refuses_to_guess_domain_when_metadata_stripped(spark):
    """ADVICE r8: probing a self-sized filter under a guessed (m, k)
    yields false NEGATIVES — the probe must raise when the bits column
    metadata is gone and no explicit parameters were passed, and accept
    explicit parameters as the override for hand-built relations."""
    import pytest

    members = [f"corpus gram {i}" for i in range(1000)]
    bloom = bloom_build(_strings(spark, members), "gram")
    meta = dict(bloom.schema["bits"].metadata)
    # re-select without the alias metadata: a metadata-stripping transform
    stripped = bloom.selectExpr("word_idx", "bits + 0 AS bits")
    assert not dict(stripped.schema["bits"].metadata or {})
    with pytest.raises(ValueError, match="false NEGATIVES"):
        bloom_probe(_strings(spark, members), "gram", stripped)
    # explicit parameters restore the exact domain: zero false negatives
    kept = bloom_probe(
        _strings(spark, members), "gram", stripped,
        m_bits=meta["m_bits"], n_hashes=meta["n_hashes"],
    )
    assert kept.count() == len(members)


def _gate_fixture(spark):
    corpus = spark.createDataFrame(
        [
            (0, "the corpus holds this exact protected passage of many words "
                "plus unrelated filler text one"),
            (1, "another corpus document with completely different body two"),
        ],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [
            # copies the protected passage verbatim (contaminated) ...
            (10, "intro words then the corpus holds this exact protected "
                 "passage of many words and an outro"),
            # ... and an entirely novel document (clean)
            (11, "fresh novel content sharing not a single eight gram with "
                 "the standing corpus at all whatsoever today"),
        ],
        ["doc_id", "text"],
    )
    return corpus, batch


def test_span_contamination_bloom_transparent(spark):
    # bloom on vs off: bit-identical output rows.
    corpus, batch = _gate_fixture(spark)
    index = corpus_gram_index(corpus)
    plain = span_contamination(batch, index)
    bloomed = span_contamination(batch, index, bloom=corpus_gram_bloom(index))
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, bloomed.collect())
    )
    by_id = {r.doc_id: r.status for r in bloomed.collect()}
    assert by_id[10] == "contaminated" and by_id[11] == "clean"


def test_bloom_shrinks_exact_join_input(spark):
    # the point of the filter: a mostly-novel batch's grams mostly never
    # reach the exact corpus join.
    corpus, batch = _gate_fixture(spark)
    novel = batch.filter(F.col("doc_id") == 11)
    bloom = corpus_gram_bloom(corpus_gram_index(corpus))
    total = word_grams(novel).count()
    survived = bloom_probe(word_grams(novel), "gram", bloom).count()
    assert total > 0
    assert survived < total * 0.5, (survived, total)


def test_bloom_probe_plan_is_broadcast_only(spark):
    # the probe must be BLOOM_HASHES broadcast joins — no shuffle of the
    # batch grams, no cartesian anything.
    corpus, batch = _gate_fixture(spark)
    bloom = corpus_gram_bloom(corpus_gram_index(corpus))
    plan = (
        bloom_probe(word_grams(batch), "gram", bloom)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") >= BLOOM_HASHES, plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_bloom_union_and_incremental_add(spark):
    """Union of the bitsets IS the filter of the union of the sets: every
    member of either side survives the merged probe (zero false
    negatives), bloom_add folds an increment in one pass over the
    increment only, and mismatched domains refuse."""
    import pytest

    from clinical_search_data_pipeline_spark.operators.bloom import (
        bloom_add,
        bloom_union,
    )

    a_vals = [f"corpus gram {i}" for i in range(3000)]
    b_vals = [f"novel gram {i}" for i in range(500)]
    # build B in A's domain (bloom_add does this internally too)
    a = bloom_build(_strings(spark, a_vals), "gram")
    meta = dict(a.schema["bits"].metadata)
    merged = bloom_add(a, _strings(spark, b_vals), "gram")
    assert dict(merged.schema["bits"].metadata) == meta
    both = _strings(spark, a_vals + b_vals)
    assert bloom_probe(both, "gram", merged).count() == len(a_vals) + len(b_vals)
    # still a useful filter: absent grams mostly rejected
    absent = _strings(spark, [f"absent gram {i}" for i in range(4000)])
    fp = bloom_probe(absent, "gram", merged).count() / 4000
    assert fp < 0.05, fp
    # mismatched domains refuse
    small = bloom_build(_strings(spark, b_vals), "gram", m_bits=1 << 20)
    big = bloom_build(_strings(spark, b_vals), "gram", m_bits=1 << 21)
    with pytest.raises(ValueError, match="domains differ"):
        bloom_union(small, big)
    stripped = a.selectExpr("word_idx", "bits + 0 AS bits")
    with pytest.raises(ValueError, match="metadata"):
        bloom_union(a, stripped)

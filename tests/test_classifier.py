"""Naive-Bayes quality classifier: Python cross-check, separation,
dense-model invariants, totality on degenerate docs, stream==batch, plan
shape."""

from __future__ import annotations

import hashlib
import math

import pytest

from pyspark.sql import functions as F

from clinical_search_data_pipeline_spark.operators.classifier import (
    QUALITY_GATE,
    nb_quality_model,
    quality_labels,
    quality_score,
)
from clinical_search_data_pipeline_spark.operators.fragments import N_BUCKETS
from clinical_search_data_pipeline_spark.registry import all_specs
from tests.conftest import SF_SMOKE


def _mklabeled(spark, rows):
    # rows: (doc_id, text, lang, lab)
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "lab"])


def _py_hash64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_feats(text: str) -> list[str]:
    w = text.split(" ")
    return w + [f"{a} {b}" for a, b in zip(w, w[1:])]


def _ref_model(rows):
    n_p: dict[int, int] = {}
    n_n: dict[int, int] = {}
    d_p = d_n = 0
    for _doc, text, _lang, lab in rows:
        if lab:
            d_p += 1
        else:
            d_n += 1
        for f in _py_feats(text):
            b = _py_hash64(f) % N_BUCKETS
            (n_p if lab else n_n)[b] = (n_p if lab else n_n).get(b, 0) + 1
    t_p, t_n = sum(n_p.values()), sum(n_n.values())
    w = {
        b: math.log((n_p.get(b, 0) + 1) / (t_p + N_BUCKETS))
        - math.log((n_n.get(b, 0) + 1) / (t_n + N_BUCKETS))
        for b in range(N_BUCKETS)
    }
    bias = math.log((d_p + 1) / (d_n + 1))
    return w, bias


def test_classifier_matches_python_reference(spark):
    rows = [
        (0, "alpha beta gamma delta alpha", "en", True),
        (1, "alpha gamma beta beta delta", "en", True),
        (2, "spam spam spam spam spam spam", "en", False),
        (3, "buy buy spam buy spam", "en", False),
        (4, "alpha delta gamma", "en", True),
    ]
    labeled = _mklabeled(spark, rows)
    model = nb_quality_model(labeled)
    w, bias = _ref_model(rows)
    got_model = {r.bucket: (r.w, r.bias) for r in model.collect()}
    assert len(got_model) == N_BUCKETS
    for b in range(N_BUCKETS):
        assert abs(got_model[b][0] - w[b]) < 1e-9
        assert abs(got_model[b][1] - bias) < 1e-9

    scored = {
        r.doc_id: r
        for r in quality_score(labeled.drop("lab"), model).collect()
    }
    for doc_id, text, _lang, lab in rows:
        expect = bias + sum(
            w[_py_hash64(f) % N_BUCKETS] for f in _py_feats(text)
        )
        assert abs(scored[doc_id].logit - expect) < 5e-5
        assert scored[doc_id].n_feats == len(_py_feats(text))
        # on this cleanly-separated fixture the NB model must classify
        # its own training rows correctly
        assert (scored[doc_id].status == "admitted") == lab
        prob = 1.0 / (1.0 + math.exp(-scored[doc_id].logit))
        assert abs(scored[doc_id].prob - prob) < 5e-4


def test_classifier_separates_rule_labeled_slices(spark):
    """Trained on the rule-filter labels, kept docs must outscore dropped
    docs on average — the classifier learned the quality signal, not
    noise."""
    from clinical_search_data_pipeline_spark.sources.readers import read_table

    docs = read_table(spark, SF_SMOKE, "documents")
    labeled = quality_labels(docs)
    scored = quality_score(docs, nb_quality_model(labeled))
    joined = scored.join(labeled.select("doc_id", "lab"), "doc_id")
    rows = joined.groupBy("lab").agg(F.avg("logit").alias("m")).collect()
    means = {r.lab: r.m for r in rows}
    assert len(means) == 2, "fixture produced only one label class"
    assert means[True] > means[False]


def test_classifier_scores_one_word_and_empty_docs(spark):
    """The gate must be total over arbitrary ingest input — same guard
    contract as the DSIR gate."""
    corpus = _mklabeled(
        spark,
        [(0, "alpha beta gamma", "en", True), (1, "spam spam spam", "en", False)],
    )
    model = nb_quality_model(corpus)
    short = spark.createDataFrame(
        [(10, "alpha", "en"), (11, "", "en")], ["doc_id", "text", "lang"]
    )
    rows = {r.doc_id: r for r in quality_score(short, model).collect()}
    assert rows[10].n_feats == 1 and rows[11].n_feats == 1
    for r in rows.values():
        assert r.status in ("admitted", "rejected")
        assert (r.logit >= QUALITY_GATE) == (r.status == "admitted")
        assert (r.logit >= QUALITY_GATE) == (r.prob >= 0.5)


def test_stream_quality_gate_equals_batch_scoring(spark):
    """The accumulated streaming sink must equal one-shot batch scoring
    under the same frozen model — the micro-batch invariance the oracle
    relies on."""
    from clinical_search_data_pipeline_spark.operators.curation import (
        INCREMENT_SPLIT,
    )
    from clinical_search_data_pipeline_spark.sources.readers import read_table

    got = {
        r.doc_id: (r.n_feats, r.logit, r.prob, r.status)
        for r in all_specs()["q_stream_quality_gate"]
        .builder(spark, SF_SMOKE)
        .collect()
    }
    docs = read_table(spark, SF_SMOKE, "documents")
    corpus = docs.filter(F.col("doc_id") < INCREMENT_SPLIT)
    batch = docs.filter(F.col("doc_id") >= INCREMENT_SPLIT)
    model = nb_quality_model(quality_labels(corpus))
    expect = {
        r.doc_id: (r.n_feats, r.logit, r.prob, r.status)
        for r in quality_score(batch, model).collect()
    }
    assert got == expect and got


def test_classifier_plan_broadcasts_model(spark):
    """The dense model must come back via broadcast; the corpus is never
    reshuffled for scoring. The only single-partition stages are the
    1-row class-total and prior aggregates."""
    from clinical_search_data_pipeline_spark.plans import introspect as pl

    plan = pl.physical_plan(
        all_specs()["q_quality_classifier"].builder(spark, SF_SMOKE), "simple"
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("Exchange SinglePartition") <= 2, plan


def test_logistic_refine_improves_training_likelihood(spark):
    """One lr/N gradient step from the NB init must raise the mean training
    log-likelihood — the 'trained linear classifier' claim, pinned.
    Computed from the logit (not the 4-dp-rounded prob, whose 0/1 endpoints
    would blow up ln)."""
    from clinical_search_data_pipeline_spark.operators.classifier import (
        logistic_refine,
    )
    from clinical_search_data_pipeline_spark.sources.readers import read_table

    docs = read_table(spark, SF_SMOKE, "documents")
    labeled = quality_labels(docs)
    m0 = nb_quality_model(labeled)
    m1 = logistic_refine(labeled, m0)

    def mean_ll(model) -> float:
        scored = quality_score(docs, model).join(
            labeled.select("doc_id", "lab"), "doc_id"
        )
        lls = [
            -math.log1p(math.exp(-r.logit))
            if r.lab
            else -math.log1p(math.exp(r.logit))
            for r in scored.select("logit", "lab").collect()
        ]
        return sum(lls) / len(lls)

    ll0, ll1 = mean_ll(m0), mean_ll(m1)
    assert ll1 > ll0, (ll0, ll1)


def test_refined_keeps_schema_and_gate_semantics(spark):
    """The refined query is a drop-in for the base classifier: identical
    schema, and the logit-0 / prob-0.5 gate equivalence holds row-wise."""
    base = all_specs()["q_quality_classifier"].builder(spark, SF_SMOKE)
    refined = all_specs()["q_quality_classifier_refined"].builder(spark, SF_SMOKE)
    assert refined.schema == base.schema
    for r in refined.collect():
        assert (r.logit >= QUALITY_GATE) == (r.status == "admitted")
        assert (r.logit >= QUALITY_GATE) == (r.prob >= 0.5)

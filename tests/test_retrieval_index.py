"""BM25 persisted-index path: a lake round-trip of build_postings' output
must reproduce the on-the-fly bm25_topk exactly — the index is a physical
artifact, not a different scoring function."""

from __future__ import annotations

from clinical_search_data_pipeline_spark.caching import release_caches
from clinical_search_data_pipeline_spark.operators.retrieval import (
    bm25_topk,
    bm25_topk_from_postings,
    build_postings,
    corpus_queries,
)
from clinical_search_data_pipeline_spark.sources.readers import read_table
from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted(
        (r["query_id"], r["doc_id"], r["rank"], r["score"]) for r in df.collect()
    )


def test_persisted_index_reproduces_on_the_fly_bm25(spark, tmp_path):
    docs = read_table(spark, SF_SMOKE, "documents")
    expect = _rows(bm25_topk(docs))
    release_caches()

    postings, stats = build_postings(docs)
    # the lake round-trip: what a 100 TB deployment would persist once
    postings.write.mode("overwrite").parquet(str(tmp_path / "postings"))
    stats.write.mode("overwrite").parquet(str(tmp_path / "stats"))
    got = _rows(
        bm25_topk_from_postings(
            spark.read.parquet(str(tmp_path / "postings")),
            spark.read.parquet(str(tmp_path / "stats")),
            corpus_queries(docs),
        )
    )
    release_caches()
    assert got == expect and got


def test_index_probe_is_posting_list_sized(spark):
    """The probe touches EXACTLY the query terms' posting lists: the
    probed slice equals the sum of those terms' list lengths (nothing
    else is read), and the probed vocabulary is the query-term set — a
    small fraction of the index vocabulary. (Row-count pruning depends on
    the terms' document frequency — the synthetic fixture's query terms
    are corpus-common, so the honest fixture-free invariant is term-level
    pruning, which is what word-bucketed file pruning gives at scale.)"""
    docs = read_table(spark, SF_SMOKE, "documents")
    postings, _stats = build_postings(docs)
    vocab = postings.select("word").distinct().count()
    q = corpus_queries(docs)
    qterms = q.select("word").distinct()
    probed = postings.join(qterms, "word")
    # exactness: the probe is the union of the terms' posting lists
    by_term = {
        r["word"]: r["n"]
        for r in postings.groupBy("word").count().withColumnRenamed("count", "n")
        .join(qterms, "word").collect()
    }
    assert probed.count() == sum(by_term.values())
    # the probe's vocabulary is the query-term set, never the index's
    n_probed_terms = probed.select("word").distinct().count()
    release_caches()
    assert n_probed_terms == len(by_term) <= vocab


def test_index_probe_prunes_vocabulary(spark):
    """Term-level pruning with a CONTROLLED vocabulary (the synthetic
    documents table has only ~31 distinct words, so the ratio is only
    meaningful on a corpus built for it): 400-word vocabulary, queries
    probing 10 terms -> the probed slice is those 10 posting lists."""
    docs = spark.createDataFrame(
        [
            (i, " ".join(f"w{(i * 7 + j) % 400}" for j in range(30)))
            for i in range(80)
        ],
        ["doc_id", "text"],
    )
    postings, _stats = build_postings(docs)
    vocab = postings.select("word").distinct().count()
    q = corpus_queries(docs, n_queries=2, query_len=5)
    qterms = q.select("word").distinct()
    n_qterms = qterms.count()
    probed = postings.join(qterms, "word")
    n_probed_terms = probed.select("word").distinct().count()
    release_caches()
    assert n_probed_terms == n_qterms
    assert n_probed_terms < vocab / 4, (n_probed_terms, vocab)

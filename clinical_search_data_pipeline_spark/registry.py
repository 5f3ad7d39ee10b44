"""Query registry: the engine's public query surface.

Each operator module registers its queries here: a name, a Spark builder
``(spark, sf_dir) -> DataFrame``, and (when SQL-expressible) the equivalent
DuckDB oracle SQL. ``__spark_entry__.py`` exposes this registry to the
verification driver; tests iterate it for local parity checks.

Column-name contract: the driver's compare sorts columns by name before
value-hashing, so the Spark result and the oracle SQL must agree on every
output column name (SURVEY.md §5.2).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: QueryFn
    oracle: str | None  # DuckDB SQL, or None -> driver does a rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a query builder under a stable public name."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, (fn.__doc__ or "").strip(), tags)
        return fn

    return deco


# The round driver hash-checks `queries()` in dict order under an exactly-
# 50-entry budget (every CORRECTNESS_r* artifact has 50 rows). Rotation is
# therefore a first-class, per-round decision: the 50 names below lead the
# surfaced order; every other query follows in module-registration order.
# Being listed is NOT a correctness statement — it is this round's claim on
# the driver's budget.
#
# Round-8 window: (a) the r7 backlog (r5 rows) leads, exactly as the
# hygiene guard demands — rotating them in brings every registered query's
# staleness within the mechanical bound
# (test_no_query_row_older_than_max_staleness); (b) the remaining slots
# hold this round's NEW registrations (text canonicalization + normalized
# near-dup, audio/video/embedding streaming admission gates, the
# bloom-backed span-gate gram index, the logistic-refined quality
# classifier, the n-merge declarative BPE trainer, ANN recall evidence,
# PQ/ADC + IVFADC (p1 and nprobe=2) + trained-codebook + two-stage rerank
# ANN, BM25 retrieval, and the z-order
# layout key) — never-checked queries must hold slots, so each query that
# landed after the initial rotation displaced one r5-row name into
# ROUND_BACKLOG (those six are at the staleness bound this round, NOT past
# it, and MUST lead the r9 window). Everything with an r6 row is also
# recorded in ROUND_BACKLOG and must lead the r9 window (r9 may split the
# backlog across r9/r10 as long as the leftover names hold r10 slots,
# which the staleness guard's in-window exemption permits). All
# rotated-out names keep valid driver rows at their current, unchanged
# behavior.
ROUND_PRIORITY: tuple[str, ...] = (
    # (a) the r7 backlog (r5 rows), oldest coverage in the repo — complete
    # except q_user_set_ops, displaced mid-round by q_ann_pq_topk (see (b))
    "q_ann_ivf_multiprobe",
    "q_ann_ivf_topk",
    "q_ann_lsh_multiprobe",
    "q_ann_lsh_topk",
    "q_approx_daily_traffic_struct",
    "q_bpe_merge_step",
    "q_cosine_topk_vectorized",
    "q_dedup_keys_xxhash_struct",
    "q_doc_exact_dedup",
    "q_kmeans_refine",
    "q_lang_id",
    "q_media_decode",
    "q_mixture_weights",
    "q_neardup_clusters",
    "q_passage_dup_stats",
    "q_repetition_quality",
    "q_semdedup_refined",
    "q_sequence_pack",
    "q_simhash_buckets",
    "q_simhash_fingerprints",
    "q_stream_corpus_filter",
    "q_tfidf_top_terms",
    "q_token_budget",
    "q_train_order",
    "q_value_quantiles_struct",
    "q_winnow_pairs",
    # (b) new this round — never driver-checked, must hold slots.
    # (Names below are swapped in one commit at a time as each new query
    # lands; interim fillers are r7-fresh rows so the window is always 50
    # valid names.)
    "q_normalize_text",
    "q_jaccard_pairs_normalized",
    "q_minhash_lsh_normalized",
    "q_stream_audio_gate",
    "q_stream_video_gate",
    "q_span_gate_bloom",
    "q_quality_classifier_refined",
    "q_bpe_train4",
    "q_ann_recall",
    # PQ/ADC landed mid-r8: never checked, claims the slot q_user_set_ops
    # held (r5 row — at the staleness bound this round, NOT past it; it
    # MUST lead the r9 window, recorded in ROUND_BACKLOG below).
    "q_ann_pq_topk",
    # BM25 retrieval and the normalized z-order layout key landed late-r8:
    # never checked, each claims the slot of an r5-row name displaced into
    # ROUND_BACKLOG (q_pivot_event_types, q_sql_nation_revenue — at the
    # staleness bound this round, NOT past it; both MUST lead the r9
    # window, recorded below).
    "q_bm25_topk",
    "q_zorder_keys",
    # Two-stage PQ->exact rerank, and its row in the recall evidence table:
    # claims q_embedding_norms' slot (r5 row, displaced to mandatory r9).
    "q_ann_rerank",
    # Streaming semantic (embedding) admission gate — the eighth screen:
    # claims q_hash_sample's slot (r5 row, displaced to mandatory r9).
    "q_stream_embedding_gate",
    # Full IVFADC composition (coarse prune x ADC scoring) + its recall
    # row: claims q_doc_fingerprints' slot (r5 row, displaced to
    # mandatory r9).
    "q_ann_ivfpq_topk",
    # Trained-codebook ADC (one pinned Lloyd round, hash-oracled end to
    # end) + its pq_trained recall row: claims the r7-fresh filler slot
    # q_curation_funnel held (row age 1 — no staleness debt created).
    "q_ann_pq_trained_topk",
    # IVFADC at nprobe=2 (the first FAISS recall knob) + its ivfpq_p2
    # recall row: claims the r7-fresh filler slot q_dsir_resample held
    # (row age 1 — no staleness debt created).
    "q_ann_ivfpq_multiprobe",
    # Bucketed-table co-located join (write_bucketed: zero-exchange
    # orderkey join, plan pinned in tests/test_bucketed.py): claims the
    # r7-fresh filler slot q_cluster_safe_split held (row age 1 — no
    # staleness debt created).
    "q_bucketed_join",
    # BM25 over the persisted inverted index (index built AND probed in
    # the oracle): claims q_hash_split's slot (r5 row, displaced to
    # mandatory r9, recorded in ROUND_BACKLOG below).
    "q_bm25_index_topk",
    # MinHash-LSH recall/cost evidence table (the dedup twin of
    # q_ann_recall): claims q_bpe_token_counts' slot (r5 row, displaced to
    # mandatory r9, recorded in ROUND_BACKLOG below).
    "q_minhash_recall",
    # Count-Min-Sketch heavy hitters — the sketch family's first FULL
    # value-hash oracle (deterministic md5-derived hash rows): claims
    # q_mixture_sample's slot (r5 row, displaced to mandatory r9,
    # recorded in ROUND_BACKLOG below).
    "q_cms_heavy_hitters",
    # Systematic PPS sampling (exact-integer weighted sampling over the
    # bucket-offset distributed prefix sum): claims q_stratified_sample's
    # slot (r5 row, displaced to mandatory r9, recorded below).
    "q_pps_sample",
    # DBSCAN over the cosine eps-graph (core/border/noise + min-id
    # clusters via the two-phase components machinery): claims
    # q_winnow_fingerprints' slot (r5 row, displaced to mandatory r9,
    # recorded below; its sibling q_winnow_pairs keeps its slot).
    "q_dbscan_clusters",
    # DPR-style contrastive pair mining (positives / hard band / seeded
    # random negatives): claims q_decontaminate's slot (r5 row, displaced
    # to mandatory r9, recorded below).
    "q_contrastive_pairs",
)

# Queries whose latest driver row is r6 and which did NOT fit the round-8
# window (the full 50-name r6 cohort — r8's window is consumed by the 38
# r5-row names plus the round's new registrations). They MUST lead the
# round-9 window; with them checked at r9, no registered query's row will
# be older than 3 rounds. `ROUND_BACKLOG_DEFERRED_IN` lets the hygiene
# guard bound how long a deferral may stand (see
# tests/test_registry_hygiene.py::test_round_backlog_not_neglected).
ROUND_BACKLOG: tuple[str, ...] = (
    # displaced mid-r8 by q_ann_pq_topk / q_bm25_topk / q_zorder_keys /
    # q_stream_embedding_gate / q_ann_rerank / q_ann_ivfpq_topk /
    # q_bm25_index_topk / q_minhash_recall / q_cms_heavy_hitters /
    # q_pps_sample / q_dbscan_clusters / q_contrastive_pairs; their rows
    # are r5, so the staleness guard makes r9 slots MANDATORY (9 - 5 > 3),
    # not merely backlog. (13 mandatory + the 49-name r6 cohort = 62
    # claims on r9's 50 slots — the spill holds r10 slots under the
    # in-window exemption, exactly as the split-permission note above
    # records.)
    "q_user_set_ops",
    "q_pivot_event_types",
    "q_sql_nation_revenue",
    "q_embedding_norms",
    "q_hash_sample",
    "q_doc_fingerprints",
    "q_hash_split",
    "q_bpe_token_counts",
    "q_mixture_sample",
    "q_stratified_sample",
    "q_winnow_fingerprints",
    "q_decontaminate",
    "q_anomaly_sessions",
    "q_bigram_nll",
    "q_bpe_tokenize2",
    "q_bpe_train2",
    "q_bronze_archive",
    "q_clinical_areas",
    "q_clinical_trend",
    "q_corpus_filter",
    "q_daily_traffic",
    "q_dedup_events",
    "q_dedup_keys",
    "q_doc_chunks",
    "q_dsir_weights",
    "q_dup_spans",
    "q_event_transitions",
    "q_events_orders_asof",
    "q_ewma_user_values",
    "q_ewma_user_values_chunked",
    "q_incremental_dedup",
    "q_lang_profile",
    "q_length_outliers",
    "q_media_audio",
    "q_media_features",
    "q_media_frames",
    "q_media_meta",
    "q_media_resize",
    "q_media_video",
    "q_pii_redact",
    "q_popular_documents",
    "q_pricing_cube",
    "q_session_analysis",
    "q_session_funnel",
    "q_sessionize",
    "q_source_dup_profile",
    "q_source_overlap",
    "q_stream_anomaly",
    "q_stream_dedup_keys",
    "q_stream_dsir_gate",
    "q_stream_incremental_dedup",
    "q_stream_span_gate",
    "q_stream_traffic_minute",
    "q_strip_dup_spans",
    "q_text_quality",
    "q_time_remap",
    "q_top_revenue_orders",
    "q_traffic_minute",
    "q_unpivot_order_stats",
    "q_user_cohorts",
    "q_word_entropy",
    "q_zipf_profile",
)
ROUND_BACKLOG_DEFERRED_IN = 8  # the round whose window displaced them


def _load_modules() -> None:
    # Imported for their registration side effects; surfaced order is
    # ROUND_PRIORITY first (see above), then registration order.
    from clinical_search_data_pipeline_spark.operators import (  # noqa: F401
        dedup,
        similarity,
        splits,
        multimodal,
    )
    from clinical_search_data_pipeline_spark import api  # noqa: F401
    from clinical_search_data_pipeline_spark.operators import (  # noqa: F401
        textanalysis,
        components,
        pipeline,
        sketches,
        marts,
        quality,
        rangejoin,
        sessionize,
        skew,
        ingest,
        relational,
    )
    from clinical_search_data_pipeline_spark.streaming import (  # noqa: F401
        stream_queries,
    )

    from clinical_search_data_pipeline_spark.operators import (  # noqa: F401
        audiofp,
        bpe,
        canonical,
        videofp,
        classifier,
        clustering,
        curation,
        importance,
        layout,
        phash,
        redaction,
        retrieval,
        smoothing,
        spans,
    )


def all_specs() -> dict[str, QuerySpec]:
    """Full registry, ROUND_PRIORITY names first then registration order.

    Raises if a priority name doesn't resolve — a silently-dropped window
    claim would waste a driver slot without anyone noticing.
    """
    _load_modules()
    missing = [n for n in ROUND_PRIORITY if n not in _REGISTRY]
    if missing:
        raise KeyError(f"ROUND_PRIORITY names not registered: {missing}")
    prioritized = {n: _REGISTRY[n] for n in ROUND_PRIORITY}
    prioritized.update((n, s) for n, s in _REGISTRY.items() if n not in prioritized)
    return prioritized


def oracle_of(name: str) -> str:
    """Oracle SQL of an already-registered query, for composition: a query
    whose own oracle embeds another query's oracle as a derived table (e.g.
    q_ann_recall re-scores each ANN variant against the exact oracle).
    Composing from the registry — not a copied string — guarantees the
    embedded SQL can never drift from the one the driver actually verifies.
    """
    spec = _REGISTRY[name]
    if spec.oracle is None:
        raise KeyError(f"{name} has no oracle to compose with")
    return spec.oracle


def all_queries() -> dict[str, QueryFn]:
    return {n: s.builder for n, s in all_specs().items()}


def all_oracles() -> dict[str, str]:
    return {n: s.oracle for n, s in all_specs().items() if s.oracle is not None}

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
# Round-7 window: (a) the FULL 28-name r6 backlog leads, exactly as the
# hygiene guard demands — these are the oldest driver rows (r4) and
# rotating them in brings every registered query's staleness within the
# mechanical bound (test_no_query_row_older_than_max_staleness); (b) the
# round's 12 NEW registrations (the image/audio/video perceptual near-dup
# families + applied image dedup + streaming image gate, the naive-Bayes
# quality classifier + its streaming gate, the cluster-safe split, and the
# DSIR Gumbel resample) —
# never-checked queries must hold slots; (c) the remaining 10 slots
# refresh r5-row
# queries, most-load-bearing dedup/curation families first. Everything
# else with an r5 row is recorded in ROUND_BACKLOG below and must lead
# the r8 window. All rotated-out names keep valid driver rows at their
# current, unchanged behavior.
ROUND_PRIORITY: tuple[str, ...] = (
    # (a) the complete r6 backlog (r4 rows), oldest coverage in the repo
    "q_value_stats",
    "q_traffic_rollup",
    "q_range_join_windows",
    "q_salted_counts",
    "q_column_audit",
    "q_token_stats",
    "q_props_extract",
    "q_top_docs",
    "q_stream_stream_join",
    "q_stream_enriched_traffic",
    "q_stream_running_counts",
    "q_stream_session_window",
    "q_stream_stream_left_outer",
    "q_pricing_rollup",
    "q_customer_running_spend",
    "q_approx_daily_traffic",
    "q_value_quantiles",
    "q_dedup_keys_xxhash",
    "q_pricing_summary",
    "q_order_priority_counts",
    "q_segment_stats",
    "q_customers_without_orders",
    "q_region_customer_stats",
    "q_supplier_part_volume",
    "q_union_days",
    "q_daily_events",
    "q_session_clicks",
    "q_parse_msdate",
    # (b) new this round — never driver-checked, must hold slots
    "q_image_hashes",
    "q_image_neardup",
    "q_image_dedup_apply",
    "q_stream_image_gate",
    "q_audio_fingerprints",
    "q_audio_neardup",
    "q_video_fingerprints",
    "q_video_neardup",
    "q_quality_classifier",
    "q_stream_quality_gate",
    "q_cluster_safe_split",
    "q_dsir_resample",
    # (c) r5-row refresh: the dedup/curation core a 100 TB user leans on
    "q_jaccard_pairs",
    "q_minhash_lsh_pairs",
    "q_embedding_neardup",
    "q_embedding_neardup_lsh",
    "q_cosine_topk",
    "q_semdedup",
    "q_unigram_nll",
    "q_passage_dedup",
    "q_doc_dedup_apply",
    "q_curation_funnel",
)

# Queries whose latest driver row is r5 and which did NOT fit the round-7
# window (the 48-name r5 cohort minus the 10 refreshed above). They MUST
# lead the round-8 window; with them checked at r8, no registered query's
# row will be older than 3 rounds. `ROUND_BACKLOG_DEFERRED_IN` lets the
# hygiene guard bound how long a deferral may stand (see
# tests/test_registry_hygiene.py::test_round_backlog_not_neglected).
ROUND_BACKLOG: tuple[str, ...] = (
    "q_ann_ivf_multiprobe",
    "q_ann_ivf_topk",
    "q_ann_lsh_multiprobe",
    "q_ann_lsh_topk",
    "q_approx_daily_traffic_struct",
    "q_bpe_merge_step",
    "q_bpe_token_counts",
    "q_cosine_topk_vectorized",
    "q_decontaminate",
    "q_dedup_keys_xxhash_struct",
    "q_doc_exact_dedup",
    "q_doc_fingerprints",
    "q_embedding_norms",
    "q_hash_sample",
    "q_hash_split",
    "q_kmeans_refine",
    "q_lang_id",
    "q_media_decode",
    "q_mixture_sample",
    "q_mixture_weights",
    "q_neardup_clusters",
    "q_passage_dup_stats",
    "q_pivot_event_types",
    "q_repetition_quality",
    "q_semdedup_refined",
    "q_sequence_pack",
    "q_simhash_buckets",
    "q_simhash_fingerprints",
    "q_sql_nation_revenue",
    "q_stratified_sample",
    "q_stream_corpus_filter",
    "q_tfidf_top_terms",
    "q_token_budget",
    "q_train_order",
    "q_user_set_ops",
    "q_value_quantiles_struct",
    "q_winnow_fingerprints",
    "q_winnow_pairs",
)
ROUND_BACKLOG_DEFERRED_IN = 7  # the round whose window displaced them


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
        videofp,
        classifier,
        clustering,
        curation,
        importance,
        phash,
        redaction,
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


def all_queries() -> dict[str, QueryFn]:
    return {n: s.builder for n, s in all_specs().items()}


def all_oracles() -> dict[str, str]:
    return {n: s.oracle for n, s in all_specs().items() if s.oracle is not None}

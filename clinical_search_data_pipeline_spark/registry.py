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
# Round-6 window: (a) the 14-name r5 backlog — 8 queries registered after
# the r5 window was claimed (never driver-checked), the 4 media queries
# whose shared decode plumbing changed in r5 after their r03 rows, and the
# two window-displaced explode canaries; (b) queries whose behavior or
# module changed THIS round (q_pii_redact column rename,
# q_incremental_dedup corpus-index refactor) plus the round's NEW
# registrations (streaming incremental dedup, chunking, chunked EWMA,
# substring spans, DSIR, source overlap — never-checked queries must hold
# slots); (c) the remaining slots refresh r4-row queries, oldest coverage
# first. Everything rotated out is recorded in ROUND_BACKLOG below and
# must lead the r7 window (tests/test_registry_hygiene.py enforces both
# directions). All rotated-out names keep valid driver rows at their
# current, unchanged behavior.
ROUND_PRIORITY: tuple[str, ...] = (
    # (a) never driver-checked (registered late in r5)
    "q_bpe_train2",
    "q_bpe_tokenize2",
    "q_ewma_user_values",
    "q_length_outliers",
    "q_pricing_cube",
    "q_unpivot_order_stats",
    "q_word_entropy",
    "q_zipf_profile",
    # (a) media family — shared mapInPandas/decode plumbing changed in r5
    "q_media_meta",
    "q_media_frames",
    "q_media_resize",
    "q_media_features",
    # (a) displaced explode-path canaries (last row r4)
    "q_clinical_areas",
    "q_clinical_trend",
    # (b) changed or new this round
    "q_pii_redact",
    "q_incremental_dedup",
    "q_stream_incremental_dedup",
    "q_doc_chunks",
    "q_ewma_user_values_chunked",
    # (c) r4-row rotation: marts + ingest core
    "q_session_analysis",
    "q_daily_traffic",
    "q_popular_documents",
    "q_traffic_minute",
    "q_anomaly_sessions",
    "q_dedup_events",
    "q_dedup_keys",
    "q_bronze_archive",
    "q_time_remap",
    "q_sessionize",
    # (c) r4-row rotation: text/quality family
    "q_text_quality",
    "q_lang_profile",
    "q_corpus_filter",
    # (c) r4-row rotation: relational family
    "q_top_revenue_orders",
    "q_events_orders_asof",
    # (c) r4-row rotation: the full streaming family
    "q_stream_dedup_keys",
    "q_stream_traffic_minute",
    "q_stream_anomaly",
    # (b) new in the second half of round 6 — never driver-checked, so they
    # MUST hold slots (test_never_checked_queries_claim_window_slots); the
    # eight queries displaced to make room are all r4-green at unchanged
    # behavior and lead the r7 backlog below.
    "q_dup_spans",
    "q_strip_dup_spans",
    "q_dsir_weights",
    "q_stream_dsir_gate",
    "q_source_overlap",
    "q_source_dup_profile",
    "q_bigram_nll",
    "q_stream_span_gate",
    "q_media_audio",
    "q_media_video",
    "q_session_funnel",
    "q_user_cohorts",
    "q_event_transitions",
)

# Queries rotated OUT of the round-6 window to make room (all r4-green at
# their current behavior; the three rows-only sketch/xxhash originals are
# additionally shadowed by their r5-green `*_struct` twins). They MUST lead
# the round-7 window. `deferred_in_round` lets the hygiene guard bound how
# long a deferral may stand without failing pytest (see
# tests/test_registry_hygiene.py::test_round_backlog_not_neglected).
ROUND_BACKLOG: tuple[str, ...] = (
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
)
ROUND_BACKLOG_DEFERRED_IN = 6  # the round whose window displaced them


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
        bpe,
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

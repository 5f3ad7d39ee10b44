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
# Round-10 window: 63 claims on 50 slots again. The 13 names deferred in
# r9 (recorded in r9's ROUND_BACKLOG) carry r6 driver rows — age 4 at r10,
# so the staleness guard makes their slots MANDATORY — and the 50-name r7
# cohort is at age 3 (refresh now or they're mandatory at r11). The window
# is filled with the 13 mandatory names plus 37 of the r7 cohort; the 13
# leftover r7 names are deferred to r11 under the staleness guard's
# in-window exemption (recorded in ROUND_BACKLOG below with
# ROUND_BACKLOG_DEFERRED_IN = 10, which the backlog-neglect test turns
# into a hard failure if r11 forgets). No new query registrations this
# round — the slot budget is spent on rotation; the round's work is
# non-query engineering (incremental refresh, CDF, schema evolution).
ROUND_PRIORITY: tuple[str, ...] = (
    # (a) the 13 MANDATORY names: deferred in r9, latest driver row r6,
    # at the staleness bound exactly this round.
    "q_strip_dup_spans",
    "q_stream_dsir_gate",
    "q_stream_incremental_dedup",
    "q_stream_span_gate",
    "q_stream_traffic_minute",
    "q_text_quality",
    "q_time_remap",
    "q_top_revenue_orders",
    "q_traffic_minute",
    "q_unpivot_order_stats",
    "q_user_cohorts",
    "q_word_entropy",
    "q_zipf_profile",
    # (b) 37 of the 50-name r7 cohort (rows r7, age 3 — refreshed here so
    # they never cross the bound).
    "q_audio_fingerprints",
    "q_cluster_safe_split",
    "q_column_audit",
    "q_cosine_topk",
    "q_curation_funnel",
    "q_customer_running_spend",
    "q_customers_without_orders",
    "q_daily_events",
    "q_doc_dedup_apply",
    "q_dsir_resample",
    "q_embedding_neardup",
    "q_embedding_neardup_lsh",
    "q_image_dedup_apply",
    "q_image_hashes",
    "q_jaccard_pairs",
    "q_minhash_lsh_pairs",
    "q_order_priority_counts",
    "q_parse_msdate",
    "q_passage_dedup",
    "q_pricing_rollup",
    "q_pricing_summary",
    "q_props_extract",
    "q_quality_classifier",
    "q_range_join_windows",
    "q_region_customer_stats",
    "q_salted_counts",
    "q_segment_stats",
    "q_semdedup",
    "q_session_clicks",
    "q_supplier_part_volume",
    "q_token_stats",
    "q_top_docs",
    "q_traffic_rollup",
    "q_unigram_nll",
    "q_union_days",
    "q_value_stats",
    "q_video_fingerprints",
)

# The 13 r7-cohort names deferred to r11 (rows r7 — age 4 at r11, so the
# staleness guard makes their r11 slots MANDATORY; the backlog-neglect
# test below enforces the same thing one round after DEFERRED_IN). The
# split moves the seven slowest streaming twins, the documented rows-only
# sketch/xxhash trio (each fenced by a hash-green *_struct twin with an r8
# row), and the three heavy media near-dup pair queries out of the r10
# driver budget. All 13 are unchanged code with green r7 rows.
ROUND_BACKLOG: tuple[str, ...] = (
    "q_approx_daily_traffic",
    "q_audio_neardup",
    "q_dedup_keys_xxhash",
    "q_image_neardup",
    "q_stream_enriched_traffic",
    "q_stream_image_gate",
    "q_stream_quality_gate",
    "q_stream_running_counts",
    "q_stream_session_window",
    "q_stream_stream_join",
    "q_stream_stream_left_outer",
    "q_value_quantiles",
    "q_video_neardup",
)
ROUND_BACKLOG_DEFERRED_IN = 10  # the round whose window displaced them


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
        ann_index,
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

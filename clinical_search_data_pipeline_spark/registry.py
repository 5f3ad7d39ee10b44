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
# Round-9 window: the backlog arithmetic left essentially no free slots —
# 12 names displaced during r8 carry r5 driver rows (the K=3 staleness
# guard binds at 9-5, so their slots are MANDATORY), and the 50-name r6
# cohort was recorded in r8's ROUND_BACKLOG. 12 + 50 = 62 claims on 50
# slots, so the window is filled with the 12 mandatory names plus 38 of
# the cohort; the 12 leftover cohort names are deferred to r10 under the
# staleness guard's in-window exemption (they hold r10 slots — recorded
# in ROUND_BACKLOG below with ROUND_BACKLOG_DEFERRED_IN = 9, which the
# backlog-neglect test turns into a hard failure if r10 forgets). Any NEW
# query registered this round must itself claim a slot (never-checked
# guard), displacing one more cohort name into the deferred set. All
# rotated-out r8/r7-row names keep valid driver rows at their current,
# unchanged behavior (ages 1-2, no staleness debt).
ROUND_PRIORITY: tuple[str, ...] = (
    # (a) the 12 MANDATORY names: displaced mid-r8, latest driver row r5,
    # at the staleness bound exactly this round.
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
    # (b) 38 of the 50-name r6 cohort (rows r6, age 3 — refreshed here so
    # they never cross the bound).
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
    # (c) NEW this round — never driver-checked, must hold a slot: the
    # persisted IVFADC index probe (VERDICT r8 #3). Claims the slot
    # q_strip_dup_spans held; that r6-row name moves to the r10 deferred
    # set below.
    "q_ann_index_topk",
)

# The 13 r6-cohort names deferred to r10 (rows r6 — age 4 at r10, so the
# staleness guard makes their r10 slots MANDATORY; the backlog-neglect
# test below enforces the same thing one round after DEFERRED_IN). The
# split moves the four slowest streaming twins plus cheap batch tails out
# of the r9 driver budget; q_strip_dup_spans joined the deferred set when
# the round's one new query (q_ann_index_topk) claimed its slot. All 13
# are unchanged code with green r6 rows.
ROUND_BACKLOG: tuple[str, ...] = (
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
)
ROUND_BACKLOG_DEFERRED_IN = 9  # the round whose window displaced them


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

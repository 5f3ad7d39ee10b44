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
# Round-13 window: 63 claims on 50 slots, the same arithmetic as r9-r12.
# The 13 names deferred in r12 (r12's ROUND_BACKLOG) carry r9 driver rows
# — age 4 at r13, so the staleness guard makes their slots MANDATORY —
# and the 50-name r10 cohort is at age 3 (refresh now or they're
# mandatory at r14). The window is the 13 mandatory names, q_media_decode
# (row r12 but its RESULT changes this round: the decode fixture mix
# gains real PNG rows, VERDICT r12 #5 — a fresh driver row must cover
# the new behavior), the round's TWO new registrations (the persisted
# index's probe-only and rerank twins, VERDICT r12 #4/#6 — never-checked
# queries must claim slots), and 34 of the r10 cohort. The 16 leftover
# r10 names are deferred to r14 under the in-window exemption
# (ROUND_BACKLOG below, DEFERRED_IN = 13). The round's other new surface
# (CommitStore backends, CDC evolution continuation, PNG decode,
# watermark carry-forward) lands under pytest pins and existing queries.
ROUND_PRIORITY: tuple[str, ...] = (
    # (a) the 13 MANDATORY names: deferred in r12, latest driver row r9,
    # at the staleness bound exactly this round.
    "q_bpe_token_counts",
    "q_bpe_tokenize2",
    "q_bpe_train2",
    "q_ewma_user_values_chunked",
    "q_media_audio",
    "q_media_features",
    "q_media_frames",
    "q_media_meta",
    "q_media_resize",
    "q_media_video",
    "q_source_overlap",
    "q_stream_anomaly",
    "q_stream_dedup_keys",
    # (b) the one non-cohort name whose observable result changes this
    # round (PNG rows join the decode fixture mix, VERDICT r12 #5).
    "q_media_decode",
    # (c) 34 of the 50-name r10 cohort (rows r10, age 3 — refreshed here
    # so they never cross the bound).
    # (c') the round's TWO new registrations (never-checked guard: a new
    # query claims a slot in the commit that registers it): the persisted
    # index's probe-only serving twin and its FAISS-refine rerank twin
    # (VERDICT r12 #4/#6).
    "q_ann_index_probe",
    "q_ann_index_rerank",
    "q_cluster_safe_split",
    "q_column_audit",
    "q_curation_funnel",
    "q_customer_running_spend",
    "q_customers_without_orders",
    "q_daily_events",
    "q_doc_dedup_apply",
    "q_dsir_resample",
    "q_embedding_neardup_lsh",
    "q_minhash_lsh_pairs",
    "q_parse_msdate",
    "q_passage_dedup",
    "q_pricing_rollup",
    "q_props_extract",
    "q_quality_classifier",
    "q_range_join_windows",
    "q_region_customer_stats",
    "q_semdedup",
    "q_session_clicks",
    "q_stream_incremental_dedup",
    "q_stream_traffic_minute",
    "q_strip_dup_spans",
    "q_text_quality",
    "q_time_remap",
    "q_token_stats",
    "q_top_docs",
    "q_top_revenue_orders",
    "q_traffic_minute",
    "q_traffic_rollup",
    "q_unigram_nll",
    "q_union_days",
    "q_user_cohorts",
    "q_value_stats",
    "q_zipf_profile",
)

# The 16 r10-cohort names deferred to r14 (rows r10 — age 4 at r14, so
# the staleness guard makes their r14 slots MANDATORY; the
# backlog-neglect test below enforces the same one round after
# DEFERRED_IN). The split moves out names whose value evidence has an
# in-window or fresher sibling: the three perceptual-fingerprint
# queries (their banded near-dup twins q_audio/image/video_neardup are
# r11-green and the hash families are property-tested against fixed
# vectors), q_image_dedup_apply (q_doc_dedup_apply stays in-window),
# q_embedding_neardup (its LSH twin stays in-window), q_cosine_topk
# (its vectorized twin is r11-green and the exact path is embedded as
# the ground truth inside q_ann_recall's composed oracle, r12-green),
# q_jaccard_pairs (normalized twin r11-green; embedded in
# q_minhash_recall's oracle, r12-green), q_stream_dsir_gate /
# q_stream_span_gate (batch twins q_dsir_resample in-window,
# q_span_gate_bloom r11), q_pricing_summary (siblings q_pricing_rollup
# in-window + q_pricing_cube r12), q_word_entropy (siblings
# q_zipf_profile in-window, q_repetition_quality r11), and five
# single-purpose relational queries unchanged since registration
# (q_order_priority_counts, q_salted_counts, q_segment_stats,
# q_supplier_part_volume, q_unpivot_order_stats). All 16 are unchanged
# code with green r10 rows and J12 full-contract confirmation on the
# r12 final tree.
ROUND_BACKLOG: tuple[str, ...] = (
    "q_audio_fingerprints",
    "q_cosine_topk",
    "q_embedding_neardup",
    "q_image_dedup_apply",
    "q_image_hashes",
    "q_jaccard_pairs",
    "q_order_priority_counts",
    "q_pricing_summary",
    "q_salted_counts",
    "q_segment_stats",
    "q_stream_dsir_gate",
    "q_stream_span_gate",
    "q_supplier_part_volume",
    "q_unpivot_order_stats",
    "q_video_fingerprints",
    "q_word_entropy",
)
ROUND_BACKLOG_DEFERRED_IN = 13  # the round whose window displaced them

# Permanently retired from window rotation (VERDICT r11 #8): checks that
# can never tighten past rows-only, whose hash evidence lives in an
# in-rotation twin. q_dedup_keys_xxhash is rows-only forever — DuckDB has
# no xxhash64, so its driver row can only ever say "10,000 rows came
# back"; the md5 path and the hash-green q_dedup_keys_xxhash_struct twin
# carry the value check, and tests/test_hashing.py pins xxhash64 against
# fixed vectors. Spending a rotating slot on it buys nothing, so the
# staleness guard exempts these names instead of forcing the spend.
ROTATION_RETIRED: tuple[str, ...] = ("q_dedup_keys_xxhash",)


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

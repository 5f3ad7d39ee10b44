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
# Round-12 window: 63 claims on 50 slots, the same arithmetic as r9-r11.
# The 13 names deferred in r11 (r11's ROUND_BACKLOG) carry r8 driver rows
# — age 4 at r12, so the staleness guard makes their slots MANDATORY —
# and the 50-name r9 cohort is at age 3 (refresh now or they're mandatory
# at r13). The window is the 13 mandatory names plus 37 of the r9 cohort,
# chosen to include every r9-cohort query whose plan changes this round
# (q_ann_index_topk — the persisted index now trains converged centroids)
# and to keep the batch twins of the deferred streaming queries in-window
# (q_anomaly_sessions / q_dedup_events / q_dedup_keys / q_ewma_user_values
# stay; their chained/streamed twins defer). The 13 leftover r9 names are
# deferred to r13 under the in-window exemption (ROUND_BACKLOG below,
# DEFERRED_IN = 12; the backlog-neglect test hard-fails r13 if it
# forgets). ZERO new query registrations this round — the round's new
# surface (delta-log manifests, trained index, mart pin, expectations,
# CDC handoff) lands under existing queries and pytest pins, so the
# full slot budget went to rotation.
ROUND_PRIORITY: tuple[str, ...] = (
    # (a) the 13 MANDATORY names: deferred in r11, latest driver row r8,
    # at the staleness bound exactly this round.
    "q_ann_recall",
    "q_approx_daily_traffic_struct",
    "q_bpe_merge_step",
    "q_bpe_train4",
    "q_dedup_keys_xxhash_struct",
    "q_media_decode",
    "q_minhash_recall",
    "q_stream_audio_gate",
    "q_stream_corpus_filter",
    "q_stream_embedding_gate",
    "q_stream_video_gate",
    "q_value_quantiles_struct",
    "q_winnow_pairs",
    # (b) 37 of the 50-name r9 cohort (rows r9, age 3 — refreshed here so
    # they never cross the bound). q_ann_index_topk is the one whose plan
    # changes this round (converged-centroid index build, VERDICT r11 #3).
    "q_ann_index_topk",
    "q_anomaly_sessions",
    "q_bigram_nll",
    "q_bronze_archive",
    "q_clinical_areas",
    "q_clinical_trend",
    "q_corpus_filter",
    "q_daily_traffic",
    "q_decontaminate",
    "q_dedup_events",
    "q_dedup_keys",
    "q_doc_chunks",
    "q_doc_fingerprints",
    "q_dsir_weights",
    "q_dup_spans",
    "q_embedding_norms",
    "q_event_transitions",
    "q_events_orders_asof",
    "q_ewma_user_values",
    "q_hash_sample",
    "q_hash_split",
    "q_incremental_dedup",
    "q_lang_profile",
    "q_length_outliers",
    "q_mixture_sample",
    "q_pii_redact",
    "q_pivot_event_types",
    "q_popular_documents",
    "q_pricing_cube",
    "q_session_analysis",
    "q_session_funnel",
    "q_sessionize",
    "q_source_dup_profile",
    "q_sql_nation_revenue",
    "q_stratified_sample",
    "q_user_set_ops",
    "q_winnow_fingerprints",
)

# The 13 r9-cohort names deferred to r13 (rows r9 — age 4 at r13, so the
# staleness guard makes their r13 slots MANDATORY; the backlog-neglect
# test below enforces the same one round after DEFERRED_IN). The split
# moves out the six media-decode queries (unchanged since r9, fenced by
# property tests over real codec bytes), the three BPE trainer/tokenizer
# steps (unchanged; the merge-step and train4 primaries are IN this
# window from the mandatory backlog), the chained EWMA twin (its primary
# q_ewma_user_values stays in-window), the two streaming twins whose
# batch twins stay in-window (q_stream_anomaly / q_anomaly_sessions,
# q_stream_dedup_keys / q_dedup_keys), and q_source_overlap (its sibling
# q_source_dup_profile stays in). All 13 are unchanged code with green r9
# rows and J11 full-contract confirmation.
ROUND_BACKLOG: tuple[str, ...] = (
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
)
ROUND_BACKLOG_DEFERRED_IN = 12  # the round whose window displaced them

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

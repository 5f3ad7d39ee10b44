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
# Round-5 window = (a) the 31 queries whose last driver row is r02/r03
# (VERDICT r04 "Next round" #1: all of dedup/similarity/splits/multimodal/
# api + the textanalysis tail), (b) every query NEW this round
# (mixture_weights, media_decode, winnow pair, decontaminate, the curation
# family, the three structural oracle twins), (c) queries whose behavior
# changed this round (q_neardup_clusters: two-phase components default;
# q_doc_dedup_apply consumes it), and (d) two explode-path canaries
# (q_clinical_areas/q_clinical_trend) re-verified after the
# InferFiltersFromGenerate optimizer-rule exclusion (session.py).
ROUND_PRIORITY: tuple[str, ...] = (
    # (a) stale since r02/r03 — dedup
    "q_doc_exact_dedup",
    "q_jaccard_pairs",
    "q_minhash_lsh_pairs",
    "q_simhash_fingerprints",
    "q_simhash_buckets",
    # (a) similarity (incl. the 4 ANN queries)
    "q_embedding_norms",
    "q_cosine_topk",
    "q_embedding_neardup",
    "q_embedding_neardup_lsh",
    "q_ann_lsh_topk",
    "q_cosine_topk_vectorized",
    "q_ann_ivf_topk",
    "q_ann_ivf_multiprobe",
    "q_ann_lsh_multiprobe",
    # (a) splits + (b) new mixture weights
    "q_hash_split",
    "q_hash_sample",
    "q_pivot_event_types",
    "q_user_set_ops",
    "q_mixture_sample",
    "q_stratified_sample",
    "q_sequence_pack",
    "q_mixture_weights",
    # (a) multimodal + (b) new real decoder (frames/resize/meta/features
    # yield their r5 slots to the late-round additions below; q_media_decode
    # keeps a fresh row on the module — it drives the same mapInPandas
    # plumbing — and all four displaced queries are pytest-parity green)
    "q_media_decode",
    # (a) api
    "q_sql_nation_revenue",
    # (a) textanalysis tail + (b) new winnowing pair
    "q_lang_id",
    "q_doc_fingerprints",
    "q_bpe_token_counts",
    "q_repetition_quality",
    "q_tfidf_top_terms",
    "q_winnow_fingerprints",
    "q_winnow_pairs",
    # (b) new decontamination + (c) components default change + consumer
    "q_decontaminate",
    "q_neardup_clusters",
    "q_doc_dedup_apply",
    # (b) the curation family (registered too late for the r5-start window;
    # pulled forward here so each lands its first driver row this round)
    "q_passage_dup_stats",
    "q_passage_dedup",
    "q_semdedup",
    "q_unigram_nll",
    "q_incremental_dedup",
    "q_curation_funnel",
    "q_train_order",
    # (b) structural oracle twins for the rows-only sketch/xxhash queries
    "q_approx_daily_traffic_struct",
    "q_value_quantiles_struct",
    "q_dedup_keys_xxhash_struct",
    # (b) late-round additions — every query NEW this round claims a slot
    # (the former explode-path canaries q_clinical_areas/q_clinical_trend
    # yielded theirs: r4-green, and the optimizer-rule exclusion is already
    # exercised by the many explode-based queries above)
    "q_pii_redact",
    "q_token_budget",
    "q_kmeans_refine",
    "q_bpe_merge_step",
    "q_stream_corpus_filter",
    "q_semdedup_refined",
)

# Round-6 rotation backlog — registered late in r5 with green local parity
# but NO driver row yet (the 50-slot window was already claimed); they
# should lead the r6 window, followed by whatever r6 changes:
#   q_bpe_train2, q_bpe_tokenize2, q_length_outliers, q_word_entropy,
#   q_zipf_profile, q_pricing_cube, q_unpivot_order_stats,
#   q_ewma_user_values (plus the four r5-window-displaced multimodal/
#   canary queries: q_media_frames, q_media_resize, q_media_features,
#   q_media_meta, q_clinical_areas, q_clinical_trend).


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
        redaction,
        smoothing,
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

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


def _load_modules() -> None:
    # Imported for their registration side effects. ORDER MATTERS to the
    # round driver: it checks queries in registration order under a ~50-entry
    # budget, so each round the modules whose queries went unchecked last
    # round register FIRST, followed by modules whose builders/oracles
    # changed this round (a changed query must land a fresh driver row).
    #
    # Round-5 order (VERDICT r04 "Next round" #1): the 31 queries whose last
    # driver row is r02/r03 go first — dedup(5, jaccard_pairs behaviorally
    # changed in r4) slots 0-4; similarity(9, incl. the 4 ANN queries) 5-13;
    # splits(7) 14-20; multimodal(4 + new q_media_decode) 21-25; api(1) 26;
    # textanalysis(10; last 5 were outside the r4 window) 28-37. Then this
    # round's changes: components(1, two-phase default) 38; pipeline(3, incl.
    # NEW q_decontaminate) 39-41; sketches(4, incl. NEW *_struct oracle
    # twins) 42-45; marts 46+ with NEW q_dedup_keys_xxhash_struct first
    # within the module (slot 46) then the marts head through slot 49.
    # (NEW q_mixture_weights rides splits at slot 19.) The marts tail and
    # quality/rangejoin/sessionize/skew/ingest/relational/stream_queries
    # (all green r04, unchanged) fall outside the window.
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

    # NEW this round (passage dedup / SemDeDup / train order): registered
    # last — outside the driver's ~50-slot window, which this round belongs
    # to the stale r02/r03 queries per VERDICT r04 #1. Local oracle parity
    # (tests/test_oracle_parity.py) covers them now; they rotate into the
    # driver window next round.
    from clinical_search_data_pipeline_spark.operators import curation  # noqa: F401


def all_specs() -> dict[str, QuerySpec]:
    _load_modules()
    return dict(_REGISTRY)


def all_queries() -> dict[str, QueryFn]:
    return {n: s.builder for n, s in all_specs().items()}


def all_oracles() -> dict[str, str]:
    return {n: s.oracle for n, s in all_specs().items() if s.oracle is not None}

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
    # Round-4 order (VERDICT r03 "Next round" #3): everything the ts
    # regression broke or that changed without a green row goes first —
    # marts(14) quality(2) rangejoin(1) sessionize(1) sketches(2) skew(1)
    # ingest(3) = slots 0-23; stream_queries(8, events_stream rewritten this
    # round) 24-31; components(1) + pipeline(2) (r3-changed, never verified)
    # 32-34; relational(10, incl. the broken asof at 44) 35-44; textanalysis
    # 45+ with its two events-based queries (q_props_extract, q_value_stats —
    # FAIL r3) registered first within the module. Multimodal/similarity
    # (green r03) and dedup/splits/api (green r02 + local pytest) follow
    # outside the window.
    from clinical_search_data_pipeline_spark.operators import (  # noqa: F401
        marts,
        quality,
        rangejoin,
        sessionize,
        sketches,
        skew,
        ingest,
    )
    from clinical_search_data_pipeline_spark.streaming import (  # noqa: F401
        stream_queries,
    )
    from clinical_search_data_pipeline_spark.operators import (  # noqa: F401
        components,
        pipeline,
        relational,
        textanalysis,
    )
    from clinical_search_data_pipeline_spark import api  # noqa: F401
    from clinical_search_data_pipeline_spark.operators import (  # noqa: F401
        dedup,
        multimodal,
        similarity,
        splits,
    )


def all_specs() -> dict[str, QuerySpec]:
    _load_modules()
    return dict(_REGISTRY)


def all_queries() -> dict[str, QueryFn]:
    return {n: s.builder for n, s in all_specs().items()}


def all_oracles() -> dict[str, str]:
    return {n: s.oracle for n, s in all_specs().items() if s.oracle is not None}

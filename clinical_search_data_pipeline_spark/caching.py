"""Engine-managed DataFrame caching with explicit release.

Operators that feed one materialized intermediate into several branches
(shingle relations, IVF assignments) mark it with `engine_cache`. Plain
`.cache()` pins the plan in Spark's CacheManager for the session lifetime —
a registry-wide run (bench.py, the driver's correctness sweep,
tests/test_oracle_parity.py) would accumulate every query's intermediates.
`release_caches()` unpersists everything marked since the last release;
harness loops call it once per query after the action completes.

(`localCheckpoint` was evaluated as a self-releasing alternative — its
blocks are freed when the RDD is GC'd — but the RDD conversion forfeits
whole-stage codegen over the materialization boundary and measured ~3x
slower on the IVF assignment relation, so explicit release wins.)

Storage level is Spark SQL's default MEMORY_AND_DISK: an oversized
intermediate spills instead of evicting or OOMing. At 100 TB, stage such
intermediates to parquet instead (one write, many scans, no executor-memory
footprint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def engine_cache(df: DataFrame) -> DataFrame:
    """Cache `df` and track it for the next `release_caches()`."""
    df.cache()
    _LIVE.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked intermediate; returns how many were released.
    Safe to call at any time (blocking=False, ignores already-released)."""
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n

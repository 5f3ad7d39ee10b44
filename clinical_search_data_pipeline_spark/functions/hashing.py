"""Hash-key functions (dedup keys, fingerprints, MinHash primitives).

The reference stamps a producer-side dedup key `xxhash64(session|doc|ts)`
with an md5 fallback (reference ingestion/producer/producer_base.py:42-53).
In this engine keys are computed as Catalyst columns — no producer dependency.

Two families:
* `xxhash64` — the production path (fast, JVM-side, 64-bit).
* md5-derived 64-bit ints — the *oracle-checkable* path: DuckDB has no
  xxhash64, but both engines agree on md5, and a 60-bit prefix of the digest
  cast to int64 is a perfectly good hash (SURVEY.md §7.3 risk 2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dedup_key_xxhash(*cols: Column | str, sep: str = "|") -> Column:
    """Production dedup key: xxhash64 over a separator-joined tuple."""
    return F.xxhash64(F.concat_ws(sep, *cols))


def dedup_key_md5(*cols: Column | str, sep: str = "|") -> Column:
    """Oracle-checkable dedup key: md5 hex digest over the joined tuple."""
    return F.md5(F.concat_ws(sep, *cols))


def hash64(col: Column | str) -> Column:
    """Deterministic 60-bit positive int64 from md5 (oracle-checkable).

    `conv` parses the 15-hex-char digest prefix as base-16 (60 bits, always
    positive, no overflow).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def duck_hash64(expr: str) -> str:
    """DuckDB fragment equal to `hash64` for the same input expression."""
    return f"CAST(('0x' || substring(md5({expr}), 1, 15)) AS BIGINT)"

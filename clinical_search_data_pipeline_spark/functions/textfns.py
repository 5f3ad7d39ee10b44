"""Text primitives: tokenization, shingling, quality signals.

All built-in Catalyst expressions (split / transform / aggregate / filter
higher-order functions) — no UDFs, so the hot path stays inside whole-stage
codegen. Every Spark helper has a DuckDB twin used by the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_STOPWORDS = ("a", "the", "of", "and", "to", "in")

# ---------------------------------------------------------------------------
# Spark side
# ---------------------------------------------------------------------------


def tokens(col: str = "text") -> Column:
    """Whitespace tokenization (fixture corpus is single-space separated)."""
    return F.split(F.col(col), " ")


def shingles(words_col: str = "w", k: int = 3) -> Column:
    """k-word shingles via higher-order functions (1-indexed element_at).

    Callers must pre-filter `size(w) >= k`: Spark's `sequence(1, n)` infers a
    *negative* step when n < 1, which would fabricate bogus indices.
    """
    parts = " , ' ', ".join(f"element_at({words_col}, i + {j})" for j in range(k))
    return F.expr(
        f"transform(sequence(1, size({words_col}) - {k - 1}), i -> concat({parts}))"
    )


def token_length_sum(words_col: str = "w") -> Column:
    return F.expr(
        f"aggregate(transform({words_col}, x -> length(x)), 0L, (acc, x) -> acc + x)"
    )


def stopword_count(words_col: str = "w", stopwords=DEFAULT_STOPWORDS) -> Column:
    quoted = ", ".join(f"'{s}'" for s in stopwords)
    return F.expr(f"size(filter({words_col}, x -> x IN ({quoted})))")


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------


def duck_tokens(col: str = "text") -> str:
    return f"string_split({col}, ' ')"


def duck_shingles(words_col: str = "w", k: int = 3) -> str:
    parts = " || ' ' || ".join(f"{words_col}[i + {j}]" for j in range(k))
    # DuckDB range(1, n) is exclusive of n: yields 1 .. len - k + 1 shingle starts
    return f"list_transform(range(1, len({words_col}) - {k - 2}), i -> {parts})"


def duck_token_length_sum(words_col: str = "w") -> str:
    return f"list_sum(list_transform({words_col}, x -> length(x)))"


def duck_stopword_count(words_col: str = "w", stopwords=DEFAULT_STOPWORDS) -> str:
    quoted = ", ".join(f"'{s}'" for s in stopwords)
    return f"len(list_filter({words_col}, x -> x IN ({quoted})))"

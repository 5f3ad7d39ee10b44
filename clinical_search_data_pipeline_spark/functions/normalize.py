"""Text canonicalization for near-dup detection.

Production near-dedup stacks (CCNet, RefinedWeb, Dolma) normalize text
BEFORE shingling: lowercase, strip accents, fold digits, drop punctuation,
collapse whitespace. Without it, a trivially re-cased or re-punctuated copy
shares zero raw shingles with its source and every shingle-based detector
(Jaccard, MinHash-LSH, SimHash) misses it. The reference pipeline
(processing/spark/jobs/*) has no content-level dedup at all, so this is
extension surface; the semantics follow the published recipes.

Engine-portability contract (same as operators/redaction.py): the regex
steps use only the java.util.regex / RE2 common subset — character classes
and nothing else — and the accent fold is a fixed `translate` table, which
both engines implement character-for-character. tests/test_canonical.py
pins Spark == DuckDB on adversarial literals.

Scale posture: a narrow projection — zero shuffles, no UDFs, whole-stage
codegen end to end; at 100 TB this rides the scan like any other
projection. The normalized column is computed once per document, not per
shingle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Fixed accent-fold table (Latin-1 supplement vowels + c/n). `translate`
# maps characters positionally on both engines; the two strings must stay
# the same length.
ACCENT_FROM = "àáâäãåèéêëìíîïòóôöõùúûüçñ"
ACCENT_TO = "aaaaaaeeeeiiiiooooouuuucn"
assert len(ACCENT_FROM) == len(ACCENT_TO)

# Normalization steps, applied in order (each is (java/RE2-common pattern,
# replacement)); digits fold to a single '0' BEFORE the punctuation class
# so numeric tokens survive as the canonical token "0...0" -> "0".
_STEPS: tuple[tuple[str, str], ...] = (
    ("[0-9]", "0"),  # digit fold (CCNet-style)
    ("[^a-z0-9 ]", " "),  # punctuation / residual non-ascii -> space
    ("  *", " "),  # collapse runs of spaces
)


def normalize_text(col: str | Column) -> Column:
    """lower -> accent-fold -> digit-fold -> punct-strip -> collapse -> trim.

    Idempotent by construction: the output alphabet is [a-z0-9 ] with
    single spaces, on which every step is the identity.
    """
    out: Column = F.translate(F.lower(F.col(col) if isinstance(col, str) else col),
                              ACCENT_FROM, ACCENT_TO)
    for pat, repl in _STEPS:
        out = F.regexp_replace(out, pat, repl)
    return F.trim(out)


def duck_normalize(expr: str) -> str:
    """DuckDB fragment computing exactly `normalize_text` for the same input."""
    out = f"translate(lower({expr}), '{ACCENT_FROM}', '{ACCENT_TO}')"
    for pat, repl in _STEPS:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return f"trim({out})"

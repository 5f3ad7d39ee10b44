"""Registry/documentation hygiene: every registered query must be
documented, and every documented query must still exist."""

from __future__ import annotations

import pathlib
import re

from clinical_search_data_pipeline_spark.registry import all_specs

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_every_registered_query_is_documented_in_coverage():
    text = (REPO / "COVERAGE.md").read_text()
    missing = [n for n in all_specs() if n not in text]
    assert not missing, f"queries absent from COVERAGE.md: {missing}"


def test_every_documented_query_exists():
    text = (REPO / "COVERAGE.md").read_text()
    documented = set(re.findall(r"`(q_[a-z0-9_]+)`", text))
    registered = set(all_specs())
    ghosts = sorted(documented - registered)
    assert not ghosts, f"COVERAGE.md names unregistered queries: {ghosts}"


def test_oracled_queries_have_distinct_oracle_sql():
    """Copy-paste guard: no two oracled queries may share the exact same
    SQL text (a duplicated oracle means a mislabeled registration)."""
    seen: dict[str, str] = {}
    dups = []
    for name, spec in all_specs().items():
        if spec.oracle is None:
            continue
        key = " ".join(spec.oracle.split())
        if key in seen:
            dups.append((seen[key], name))
        seen[key] = name
    assert not dups, f"identical oracle SQL: {dups}"

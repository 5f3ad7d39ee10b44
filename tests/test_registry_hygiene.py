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


def test_round_priority_leads_surfaced_order():
    """The driver checks exactly 50 queries in `queries()` order; the
    explicit ROUND_PRIORITY list must (a) resolve completely — all_specs
    raises on a stale name — and (b) actually lead the surfaced order."""
    from clinical_search_data_pipeline_spark.registry import ROUND_PRIORITY

    names = list(all_specs())
    assert len(ROUND_PRIORITY) == 50
    assert len(set(ROUND_PRIORITY)) == 50, "duplicate names in ROUND_PRIORITY"
    assert tuple(names[: len(ROUND_PRIORITY)]) == ROUND_PRIORITY

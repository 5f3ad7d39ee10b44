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


def _driver_checked_rounds() -> dict[str, int]:
    """name -> latest round with a CORRECTNESS_r*.json row (any status)."""
    import json

    latest: dict[str, int] = {}
    rounds = []
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", f.name).group(1))
        rounds.append(rnd)
        try:
            data = json.loads(f.read_text())
        except Exception:
            continue
        names = data.get("queries", data) if isinstance(data, dict) else {}
        for n in names:
            latest[n] = max(latest.get(n, 0), rnd)
    latest["__max_round__"] = max(rounds) if rounds else 0
    return latest


def test_never_checked_queries_claim_window_slots():
    """Window automation (VERDICT r05 #8, the mechanical half): a query
    that has NEVER had a driver row must hold a slot in ROUND_PRIORITY —
    the r5 situation (8 late registrations silently outside the window)
    cannot recur. Timing-safe: once the round's CORRECTNESS file lands,
    those queries are checked and drop out of this set."""
    from clinical_search_data_pipeline_spark.registry import ROUND_PRIORITY

    checked = _driver_checked_rounds()
    never = [n for n in all_specs() if n not in checked]
    outside = sorted(set(never) - set(ROUND_PRIORITY))
    assert not outside, (
        f"never-driver-checked queries without a window slot: {outside}"
    )


MAX_ROW_STALENESS = 3  # rounds a query may go without a fresh driver row


def test_no_query_row_older_than_max_staleness():
    """Mechanical bound on rotation debt (VERDICT r06 #5): with 126+
    queries and a 50-slot window, per-query driver-row age is bounded only
    by rotation discipline — so make the bound a failing test, not an
    editorial judgment. Every registered query must have a CORRECTNESS row
    no older than MAX_ROW_STALENESS rounds behind the newest artifact.
    Never-checked queries are covered by the window-slot guard above.
    ROTATION_RETIRED names are exempt: their driver check is rows-only by
    design (no DuckDB oracle can exist) so a fresh row can never tighten
    anything — their value evidence lives in an in-rotation twin
    (see registry.ROTATION_RETIRED)."""
    from clinical_search_data_pipeline_spark.registry import (
        ROTATION_RETIRED,
        ROUND_PRIORITY,
    )

    checked = _driver_checked_rounds()
    max_round = checked["__max_round__"]
    stale = sorted(
        (n, rnd)
        for n, rnd in checked.items()
        if n in all_specs()
        and max_round - rnd > MAX_ROW_STALENESS
        # a stale name already holding a window slot is about to be
        # refreshed — the debt is being paid this round
        and n not in ROUND_PRIORITY
        and n not in ROTATION_RETIRED
    )
    assert not stale, (
        f"driver rows older than {MAX_ROW_STALENESS} rounds "
        f"(newest artifact r{max_round}) without a window slot: {stale}"
    )


def test_rotation_retired_names_are_legitimately_retired():
    """The staleness exemption is only for checks that cannot tighten: a
    retired name must be registered, must be rows-only (no oracle — a
    hash-checkable query must keep rotating), and must not also claim a
    window slot (retired means retired)."""
    from clinical_search_data_pipeline_spark.registry import (
        ROTATION_RETIRED,
        ROUND_PRIORITY,
    )

    specs = all_specs()
    for n in ROTATION_RETIRED:
        assert n in specs, f"retired name not registered: {n}"
        assert specs[n].oracle is None, (
            f"{n} has an oracle — hash-checkable queries must keep rotating"
        )
        assert n not in ROUND_PRIORITY, f"{n} is retired AND in the window"


def test_round_backlog_not_neglected():
    """The other half: names rotated OUT of a window are recorded in
    ROUND_BACKLOG with the round that displaced them, and a deferral may
    stand for AT MOST one completed round beyond that. If the next window
    isn't rotated (backlog folded into ROUND_PRIORITY, constants updated),
    this fails as soon as a second round's CORRECTNESS artifact lands —
    one round of grace so the current round's own artifact (written after
    the build, before the judge's pytest re-run) never trips it."""
    from clinical_search_data_pipeline_spark.registry import (
        ROUND_BACKLOG,
        ROUND_BACKLOG_DEFERRED_IN,
        ROUND_PRIORITY,
    )

    specs = set(all_specs())
    stale = sorted(set(ROUND_BACKLOG) - specs)
    assert not stale, f"ROUND_BACKLOG names not registered: {stale}"
    checked = _driver_checked_rounds()
    overdue = checked["__max_round__"] - ROUND_BACKLOG_DEFERRED_IN
    if overdue > 1:
        missing = sorted(set(ROUND_BACKLOG) - set(ROUND_PRIORITY))
        assert not missing, (
            f"backlog deferred in r{ROUND_BACKLOG_DEFERRED_IN} still "
            f"without window slots at r{checked['__max_round__']}: {missing}"
        )

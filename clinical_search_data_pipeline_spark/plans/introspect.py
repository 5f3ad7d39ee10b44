"""Physical-plan introspection: assert the plan shape we designed for.

Correctness is the oracle's job (tests/test_oracle_parity.py); this module
guards the *scale* contract — a query that silently regresses from a
broadcast join to a cartesian product, or loses parquet filter pushdown,
still returns the right rows at sf0.01 but dies at 100 TB. The bench
catches gross regressions; these assertions catch them at unit speed and
name the exact plan property that broke (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The plan string `.explain(mode)` would print."""
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def assert_in_plan(df: DataFrame, *fragments: str) -> None:
    plan = physical_plan(df)
    missing = [f for f in fragments if f not in plan]
    assert not missing, f"plan lacks {missing}:\n{plan}"


def assert_not_in_plan(df: DataFrame, *fragments: str) -> None:
    plan = physical_plan(df)
    present = [f for f in fragments if f in plan]
    assert not present, f"plan unexpectedly contains {present}:\n{plan}"


def assert_broadcast_join(df: DataFrame) -> None:
    """Small-dim joins must broadcast — no shuffle of the big side."""
    assert_in_plan(df, "BroadcastHashJoin")


def assert_no_cartesian(df: DataFrame) -> None:
    """Candidate generation must be an equi-join (LSH/band/bucket key),
    never an all-pairs product."""
    assert_not_in_plan(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def assert_partial_aggregation(df: DataFrame) -> None:
    """Aggregations must map-side combine: HashAggregate above and below the
    exchange (Spark always plans partial+final for hash aggs — this guards
    against accidental sort-based fallback on high-cardinality string keys)."""
    plan = physical_plan(df, "simple")
    assert plan.count("HashAggregate") >= 2, f"no partial aggregation:\n{plan}"


def assert_pushed_filters(df: DataFrame) -> None:
    """At least one parquet scan carries a pushed filter."""
    plan = physical_plan(df)
    assert "PushedFilters: [" in plan, f"no scan in plan:\n{plan}"
    pushed = [
        line.split("PushedFilters:", 1)[1].strip()
        for line in plan.splitlines()
        if "PushedFilters:" in line
    ]
    assert any(p != "[]" for p in pushed), f"no pushed filters:\n{plan}"


def lint_plan_text(plan: str, detailed: str | None = None) -> list[str]:
    """The scale_lint hazard checks over plan TEXT — shared by the live
    DataFrame path (scale_lint) and the streaming captures (a terminated
    query's last-executed micro-batch plan has no DataFrame to hand)."""
    findings: list[str] = []
    if "CartesianProduct" in plan:
        findings.append(
            "CartesianProduct: all-pairs shuffle join — rewrite candidate "
            "generation as an equi-join on a bucket/band/block key"
        )
    if "BroadcastNestedLoopJoin" in plan:
        findings.append(
            "BroadcastNestedLoopJoin: every row meets the whole broadcast "
            "side — fine for a bounded scalar/query set, a scale bug "
            "otherwise; add an equi-join key if the side grows with data"
        )
    if "SortMergeJoin" in plan and "BroadcastHashJoin" not in plan:
        findings.append(
            "SortMergeJoin with no broadcast anywhere: if one side is a "
            "small dim, hint broadcast() to drop its shuffle+sort"
        )
    # a global (un-partitioned) window or global sort serializes the data
    # through one task
    if "Exchange SinglePartition" in plan:
        findings.append(
            "Exchange SinglePartition: a global window/limit/sort funnels "
            "everything through one task — partition the window by a key "
            "or use the bucket-offset prefix-sum pattern "
            "(operators/curation.token_budget_sample)"
        )
    if detailed is not None:
        pushed = [
            line.split("PushedFilters:", 1)[1].strip()
            for line in detailed.splitlines()
            if "PushedFilters:" in line
        ]
        if pushed and all(p == "[]" for p in pushed) and "Filter" in plan:
            findings.append(
                "Filter present but no PushedFilters on any scan: the "
                "predicate runs after a full read — filter on source "
                "columns before derived ones, or check the column isn't "
                "wrapped in an expression at the scan"
            )
    return findings


def scale_lint(df: DataFrame) -> list[str]:
    """Pre-flight scale diagnostics for a USER plan: the same hazards the
    repo's plan tests pin for registered queries, surfaced as warnings a
    notebook user can act on before submitting a 100 TB run. Returns one
    human-readable string per finding (empty list = no findings).

    Heuristics, not proofs — a BroadcastNestedLoopJoin over a bounded
    scalar side is a designed plan in several registered queries (see
    tests/test_plans.py BOUNDED_BROADCAST_NLJ_OK), so findings name the
    hazard and the usual fix rather than failing."""
    return scale_lint_texts(
        physical_plan(df, "simple"),
        physical_plan(df),
        df._jdf.queryExecution().analyzed().treeString(),
    )


def scale_lint_texts(
    simple: str, formatted: str, analyzed_tree: str
) -> list[str]:
    """scale_lint over pre-rendered plan strings — the SAME rules, exposed
    so a sweep that already holds every query's plans (the repo's
    registry-wide tests share one rendering pass across modules) does not
    re-run Catalyst explain per consumer."""
    findings = lint_plan_text(simple, formatted)
    findings += lint_broadcast_hints(analyzed_tree)
    return findings


# Fact-scale fixture tables a forced broadcast must never be fed from
# un-bounded (identified by signature columns in the analyzed plan's
# Relation leaves — treeString does not carry the file path). Dimension
# tables (region/nation/supplier/part/customer) are deliberately absent:
# broadcasting a dim is the designed plan.
_FACT_TABLE_MARKERS: tuple[tuple[str, frozenset[str]], ...] = (
    ("documents", frozenset({"doc_id", "text"})),
    ("embeddings", frozenset({"vec_id"})),
    ("events", frozenset({"user_id", "event_type"})),
    ("lineitem", frozenset({"l_orderkey"})),
    ("orders", frozenset({"o_orderkey"})),
)

# Analyzed-plan nodes that provably bound a subtree's cardinality
# regardless of input size. Grouped Aggregate / Deduplicate are NOT here
# on purpose: group-by cardinality grows with the data (a vocabulary, a
# corpus id set) — exactly the class of build side that kills a forced
# broadcast at 100x.
_BOUNDING_NODES = ("GlobalLimit", "LocalLimit", "LocalRelation")


def _tree_depth(line: str) -> int:
    return len(line) - len(line.lstrip(":+- "))


# Columns whose literal selection provably bounds cardinality: window
# ranks (`_rn <= k` is per-group top-k) and id-space windows (`vec_id <
# 40` is a fixed query set). Deliberately NOT any numeric comparison:
# `n_tokens > 0` or `score >= 0.5` select a corpus-proportional slice and
# must not silence the lint (ADVICE r11).
_RANKISH = ("_rn", "rn", "rank", "_rank")

# Largest upper-bound literal a bounding filter may accept: an id/rank
# window above this is "bounded" only in theory — at 100 TB a forced
# broadcast of a 10^9-id window is exactly the failure the lint exists
# to catch, so large-literal windows stay flagged (ADVICE r12).
_MAX_BOUNDED_LITERAL = 65_536


def _bounding_filter(node: str) -> bool:
    """Does this analyzed-plan Filter line provably bound the subtree's
    cardinality? True only for (a) an upper bound / equality against a
    literal on an id- or rank-shaped column (`_rn <= 4`, `vec_id <
    cast(40 ...)`, `doc_id = 7`, `40 >= vec_id`), or (b) a literal
    IN-list on such a column — and only when the comparison is not
    inside a NOT / OR context (NOT inverts the bound — `doc_id != 0` is
    the corpus minus one row — and an OR-ed bound guarantees nothing
    about the other branch), where this rule conservatively declines and
    the lint flags. "Id-shaped" means the `id`/`idx`/`rn`/`rank` suffix
    as a TOKEN (`vec_id`, `id`, `_rn`), never a mere letter suffix —
    `valid`, `paid`, `centroid` must not silence the lint (ADVICE r12).
    An upper-bound literal additionally has to be small enough that the
    window is actually broadcastable (`_MAX_BOUNDED_LITERAL`): `user_id
    < 10**9` bounds the subtree in theory and kills the broadcast in
    practice, so it stays flagged. Residual false negative: a rank
    column aliased to a non-rank-shaped name escapes the pattern; that
    class stays on the reviewer, as does anything the allowlists in
    tests/test_scale_lint.py name explicitly."""
    import re

    # conservative: a negated or disjunctive predicate never proves a
    # bound (false-positive direction is safe — the lint flags and the
    # reviewer decides; code review r12 on ADVICE r11's tightening)
    if "NOT " in node or " OR " in node:
        return False

    def _idish(col: str) -> bool:
        low = col.lower()
        return (
            low in _RANKISH
            or low in ("id", "idx")
            or low.endswith(("_rn", "_rank", "_id", "_idx"))
        )

    def _small(lit: str) -> bool:
        try:
            return abs(int(lit)) <= _MAX_BOUNDED_LITERAL
        except ValueError:
            return False

    # col OP literal  (OP an upper bound or equality; literal may be cast)
    for col, op, lit in re.findall(
        r"(\w+)#\d+L? (<=?|=) (?:cast\()?(-?\d+)", node
    ):
        if _idish(col) and (op == "=" or _small(lit)):
            return True
    # literal OP col  (reversed: 40 >= vec_id)
    for lit, op, col in re.findall(
        r"(-?\d+)(?:\.\d+)?\)? (>=?|=) (\w+)#\d+", node
    ):
        if _idish(col) and (op == "=" or _small(lit)):
            return True
    # col IN (literal list) — a fixed enumeration, magnitude-irrelevant
    for col in re.findall(r"(\w+)#\d+L? IN \(", node):
        if _idish(col):
            return True
    return False


def lint_broadcast_hints(analyzed_tree: str) -> list[str]:
    """Flag `broadcast()` HINTS whose build side is not provably bounded
    (VERDICT r10 #8). A hint *forces* the build side to the driver at any
    size — at 100x such plans don't get slow, they die at the broadcast
    ceiling — and it buys nothing AQE doesn't already do for genuinely
    small sides. Heuristic: a hint subtree that reaches a fact-scale
    Relation leaf without a scalar aggregate / limit / literal relation
    on the way is presumed corpus-proportional. Scans of dimension
    tables and 1-row totals stay silent; the few sanctioned fact-derived
    hints (fixed-size eval sets, cadence-bounded tombstones) are named
    per query in tests/test_scale_lint.py, with reasons."""
    import re

    findings: list[str] = []
    lines = analyzed_tree.splitlines()
    for i, line in enumerate(lines):
        if "ResolvedHint" not in line or "broadcast" not in line:
            continue
        depth = _tree_depth(line)
        subtree = []
        for sub in lines[i + 1:]:
            if sub.strip() and _tree_depth(sub) <= depth:
                break
            subtree.append(sub.lstrip(":+- "))
        bounded = False
        facts: list[str] = []
        for node in subtree:
            if node.startswith(_BOUNDING_NODES):
                bounded = True
                break
            if node.startswith("Aggregate [") and "], [" not in node:
                bounded = True  # scalar aggregate: 1 row
                break
            if node.startswith("Filter ") and _bounding_filter(node):
                # a literal UPPER-bound / equality / IN-list on an
                # id-or-rank-shaped column is how this codebase derives
                # its bounded relations (centroid/query id windows,
                # per-group top-k via `_rn <= k`); see _bounding_filter
                # for the exact rule and its residual false negatives
                bounded = True
                break
            if "pmod(" in node or "shiftright(" in node or re.search(
                r"% (cast\()?\d", node
            ):
                # hash-bucketed to a literal domain — pmod / % modulus /
                # high-bit shift: the downstream key space is the bucket
                # count, not the corpus (classifier / DSIR buckets, CMS
                # cells, the 1024-bucket prefix-sum offsets)
                bounded = True
                break
            if node.startswith("Relation ["):
                cols = set(re.findall(r"(\w+)#\d+", node))
                for table, sig in _FACT_TABLE_MARKERS:
                    if sig <= cols:
                        facts.append(table)
                        break
        if facts and not bounded:
            findings.append(
                "broadcast() hint on an unbounded build side (derived "
                f"from a full {'/'.join(sorted(set(facts)))} scan with no "
                "scalar-aggregate/limit bound): the hint forces the side "
                "to every executor at ANY size — drop it (AQE broadcasts "
                "genuinely small sides on its own) or bound the relation "
                "first"
            )
    return findings


# ---------------------------------------------------------------------------
# Streaming lint capture (VERDICT r8 #7)
#
# The foreachBatch gates compose their probe joins INSIDE the micro-batch
# function, where no external caller can reach the plan; and a pure
# streaming query's executed plan only exists on the (terminated) query
# handle. Both channels report here when a collector is active:
#  * each gate calls `collect_stream_lint(df)` on its composed batch-side
#    frame right before writing it (zero drift — the linted plan IS the
#    executed plan);
#  * the bounded runners capture `explainInternal` of the last executed
#    micro-batch after termination via `collect_stream_plan_text`.
# tests/test_scale_lint.py sweeps every q_stream_* through this hook.
# ---------------------------------------------------------------------------

_STREAM_LINT_SINK: list[str] | None = None


def begin_stream_lint() -> None:
    global _STREAM_LINT_SINK
    _STREAM_LINT_SINK = []


def end_stream_lint() -> list[str]:
    global _STREAM_LINT_SINK
    out, _STREAM_LINT_SINK = _STREAM_LINT_SINK or [], None
    return out


def collect_stream_lint(df: DataFrame) -> None:
    """No-op unless a collector is active (the hot path pays one `is None`
    check per micro-batch)."""
    if _STREAM_LINT_SINK is not None:
        _STREAM_LINT_SINK.extend(scale_lint(df))


def collect_stream_plan_text(plan: str) -> None:
    if _STREAM_LINT_SINK is not None:
        # no detailed/pushdown channel for an executed streaming plan —
        # the join/partition hazards are the 100 TB killers here
        _STREAM_LINT_SINK.extend(lint_plan_text(plan))

"""Connected components over the near-duplicate pair graph.

Pair detection (similarity/dedup operators) yields edges; actual
deduplication needs *clusters* — if A~B and B~C, then {A,B,C} keep one
survivor even though A~C may be below threshold. Two interchangeable
fixpoint algorithms, both shuffle-on-key join + aggregation per round:

* alternating large-star/small-star (default) — O(log^2 n) rounds on any
  graph shape (Kiveris et al.)
* min-label propagation — ``label(v) <- min(label(v), min over neighbors)``,
  <= diameter rounds; cheap when clusters are cliques-ish

`localCheckpoint()` cuts lineage each round so the plan stays
constant-size; at 100 TB use `checkpoint()` to reliable storage.

The result (min member id per component) is deterministic, so the query is
fully oracled — DuckDB computes the same fixpoint with a recursive CTE.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

# Oracle fragments come from the non-registering fragments module; the
# similarity *builder* is imported lazily inside `neardup_clusters` so this
# module can register in the driver window without dragging similarity's 9
# registrations in front of it (registry.py ordering contract).
from clinical_search_data_pipeline_spark.operators.fragments import (
    _DUCK_BASE_CTE,
    _duck_dot,
    NEARDUP_THRESHOLD,
)
from clinical_search_data_pipeline_spark.registry import register
from clinical_search_data_pipeline_spark.sources.readers import read_table

MAX_ITER = 15

# Below this many DIRECTED edges the fixpoint LOOP is pure overhead: every
# large-star/small-star round is 2-3 jobs (join+agg+distinct, materialize,
# stability count), and a near-dup graph small enough to fit one shuffle
# block converges in one single-task union-find pass instead. 2^19 edges
# is ~8 MB of (a, b) longs — the same order as a broadcast-eligible
# relation, far under one task's working set. At production dup rates the
# pair graph is corpus-proportional and blows through this cap, so the
# distributed loop remains the scale path; the cap is env-overridable for
# clusters whose single-task budget differs.
SMALL_GRAPH_MAX_EDGES = int(
    os.environ.get("CSDP_COMPONENTS_SMALL_MAX_EDGES", str(1 << 19))
)


def connected_components(
    edges: DataFrame,
    src: str = "vec_a",
    dst: str = "vec_b",
    max_iter: int = MAX_ITER,
    algorithm: str = "auto",
    _stats: dict | None = None,
    small_graph_max_edges: int | None = None,
) -> DataFrame:
    """(node, component) — component = min node id reachable.

    Three strategies, same fixpoint:

    * ``auto`` (default): measure the edge relation (one count over the
      checkpointed edges — the loop paths paid the same count for their
      width sizing); at or below ``small_graph_max_edges`` directed edges
      run a SINGLE-TASK union-find (`mapInPandas` on one executor task —
      no driver data work), else fall through to ``two-phase``. The loop
      pays 2-3 jobs per round times O(log^2 n) rounds, all of it fixed
      scheduling cost on a graph this small; one task resolves it in one
      job. Requires integral id columns (falls back to the loop
      otherwise).
    * ``two-phase``: alternating large-star/small-star (Kiveris et al.,
      "Connected Components in MapReduce and Beyond") — O(log^2 n) rounds
      on ANY graph shape. The scale path: the round bound must not depend
      on the data — the 10x scale corpus produced a near-dup graph of
      diameter >30 that exhausted label-prop's cap (BENCH_scale), while
      two-phase converged in 7 rounds at comparable per-round cost.
    * ``label-prop``: min-label propagation, one join+agg per round,
      converges in <= diameter rounds — fine when the graph is known
      cliquish (diameter 2-3).

    Raises if the round cap is hit without convergence (a silent partial
    result would be a wrong dedup). When ``_stats`` is passed, records the
    executed round count under ``_stats['rounds']`` (diagnostics/tests;
    the single-task path records 1 and ``_stats['algorithm']``).
    """
    # Checkpoint the DIRECTED edges first, then mirror them narrowly: the
    # union-of-two-selects form would materialize the (possibly expensive)
    # upstream pair-generation plan TWICE — once per union branch.
    edges_c = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).localCheckpoint()
    n_directed = edges_c.count()
    if algorithm == "auto":
        cap = (
            SMALL_GRAPH_MAX_EDGES
            if small_graph_max_edges is None
            else small_graph_max_edges
        )
        integral = all(
            isinstance(f.dataType, (LongType, IntegerType, ShortType, ByteType))
            for f in edges_c.schema.fields
        )
        if integral and n_directed <= cap:
            if _stats is not None:
                _stats["rounds"] = 1
                _stats["algorithm"] = "single-task"
            return _single_task_components(edges_c)
        algorithm = "two-phase"
        if _stats is not None:
            _stats["algorithm"] = algorithm
    both = edges_c.unionByName(
        edges_c.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    # Size the ITERATION to the GRAPH, not to the corpus that produced it:
    # the near-dup edge relation is orders of magnitude smaller than its
    # source, and label propagation pays per-partition task overhead times
    # per-round scans times iterations. The first localCheckpoint pins the
    # (possibly very wide) upstream partitioning, so after the cheap count
    # the edges are RE-materialized at ~200k edges/partition (floor 4), and
    # the shuffle conf is pinned to the same width for the loop (restored
    # after — the loop is fully eager, nothing lazy escapes it).
    spark = edges.sparkSession
    n_edges = 2 * n_directed
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions", None)
    target = max(4, min(int(prev_parts or 200), n_edges // 200_000 + 4))
    if both.rdd.getNumPartitions() > 2 * target:
        both = both.repartition(target).localCheckpoint()
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(target))
        if algorithm == "label-prop":
            return _label_prop_loop(both, max_iter, _stats)
        if algorithm == "two-phase":
            return _two_phase_loop(both, max_iter, _stats)
        raise ValueError(f"unknown components algorithm: {algorithm!r}")
    finally:
        # Restore UNCONDITIONALLY: if the conf was unset before the loop,
        # leaving the graph-sized width set would leak it into every
        # subsequent query on this (session-global) conf.
        if prev_parts is None:
            spark.conf.unset("spark.sql.shuffle.partitions")
        else:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def _single_task_components(edges_c: DataFrame) -> DataFrame:
    """One-job components for a size-capped edge relation: shuffle the
    (a, b) pairs to a single executor task, run min-root union-find there,
    emit (node, component). Executor-side, not driver-side — the edges
    never cross `collect()`, and the result is localCheckpoint-ed so
    downstream consumers see the same materialized `Scan ExistingRDD` the
    loop paths produce (a lazy fast path would re-run the union-find once
    per consuming branch).

    Semantics match `_two_phase_loop`: self-loops dropped, every node with
    at least one real edge labeled with its component's minimum id (union
    by min root keeps each tree's root = its minimum member, so the final
    find(x) IS min-reachable-id)."""
    from collections.abc import Iterator

    import pandas as pd

    def _uf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != r:
                parent[x], x = r, parent[x]
            return r

        nodes: set = set()
        for pdf in batches:
            for a, b in zip(pdf["a"].tolist(), pdf["b"].tolist()):
                if a == b:
                    continue
                nodes.add(a)
                nodes.add(b)
                ra, rb = find(a), find(b)
                if ra == rb:
                    continue
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        out = sorted(nodes)
        yield pd.DataFrame(
            {
                "node": pd.Series(out, dtype="int64"),
                "component": pd.Series([find(n) for n in out], dtype="int64"),
            }
        )

    return (
        edges_c.repartition(1)
        .mapInPandas(_uf, schema="node bigint, component bigint")
        .localCheckpoint()
    )


def _label_prop_loop(
    both: DataFrame, max_iter: int, _stats: dict | None
) -> DataFrame:
    # Fused round 1: with identity labels, the first propagation round
    # reduces to component = min(node, min(neighbors)) — one aggregation
    # over the edge relation, replacing the distinct-node build PLUS the
    # first join+materialize round of the loop (one fewer full shuffle
    # over the edges; at 100 TB that round is the expensive one).
    labels = (
        both.groupBy("a")
        .agg(F.min("b").alias("_nb"))
        .select(
            F.col("a").alias("node"),
            F.least("a", "_nb").alias("component"),
        )
        .localCheckpoint()
    )
    for rounds in range(1, max_iter + 1):
        neighbor_min = (
            both.join(labels, both["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("component").alias("neighbor_component"))
        )
        updated = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["a"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce("neighbor_component", "component"),
                ).alias("component"),
                (
                    F.coalesce("neighbor_component", "component")
                    < F.col("component")
                ).alias("_changed"),
            )
        ).localCheckpoint()  # eager: cuts lineage AND materializes the round
        changed = updated.filter("_changed").limit(1).count()
        labels = updated.drop("_changed")
        if changed == 0:
            if _stats is not None:
                _stats["rounds"] = rounds
            return labels
    raise RuntimeError(f"components did not converge in {max_iter} iterations")


def _two_phase_loop(both: DataFrame, max_iter: int, _stats: dict | None) -> DataFrame:
    """Alternating large-star / small-star until the edge relation is a
    fixpoint of stars centered at component minima.

    large-star(u): m = min(N(u) ∪ {u}); rewire every GREATER neighbor v > u
    to m. small-star(u): over the big→small directed view, m = min(smaller
    neighbors ∪ {u}); rewire u and its smaller neighbors to m. Both halves
    are a groupBy(node) + equi-join on the edge relation — shuffle width
    stays graph-sized, and each round strictly flattens trees, giving
    O(log^2 n) rounds on chains where label-prop needs O(n)."""
    # canonical big→small directed edges, self-loops dropped
    edges_d = (
        both.where(F.col("a") != F.col("b"))
        .select(F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b"))
        .distinct()
        .localCheckpoint()
    )
    n_prev = edges_d.count()
    for rounds in range(1, max_iter + 1):
        # large-star over the undirected view
        undirected = edges_d.unionByName(
            edges_d.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        mins = undirected.groupBy("a").agg(
            F.least(F.min("b"), F.col("a")).alias("m")
        )
        large = (
            undirected.join(mins, "a")
            .where(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
        # small-star over the big→small directed view of large's output
        small_mins = large.groupBy("a").agg(F.min("b").alias("m"))
        nxt = (
            large.join(small_mins, "a")
            .select(F.col("b").alias("v"), F.col("m"))
            .unionByName(small_mins.select(F.col("a").alias("v"), F.col("m")))
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .distinct()
            .localCheckpoint()  # eager: materializes the round, cuts lineage
        )
        # fixpoint when the (canonical, directed) edge sets are identical;
        # n_prev carries the previous round's count so stability costs one
        # count + (only on count-equality) one exceptAll probe
        n_nxt = nxt.count()
        stable = (
            n_nxt == n_prev
            and nxt.exceptAll(edges_d).limit(1).count() == 0
        )
        edges_d, n_prev = nxt, n_nxt
        if stable:
            if _stats is not None:
                _stats["rounds"] = rounds
            # star fixpoint: every non-center points at its component min
            centers = (
                edges_d.select(F.col("b").alias("node"))
                .distinct()
                .select("node", F.col("node").alias("component"))
            )
            return (
                edges_d.select(F.col("a").alias("node"), F.col("b").alias("component"))
                .unionByName(centers)
                .groupBy("node")
                .agg(F.min("component").alias("component"))
            )
    raise RuntimeError(f"components did not converge in {max_iter} iterations")


def neardup_clusters(emb: DataFrame, threshold: float = NEARDUP_THRESHOLD) -> DataFrame:
    """Cluster assignment for every vector participating in a near-dup pair:
    (node, component, is_survivor) — survivor = the component's min id."""
    from clinical_search_data_pipeline_spark.operators.similarity import (
        embedding_neardup_pairs,
    )

    pairs = embedding_neardup_pairs(emb, threshold).select("vec_a", "vec_b")
    comp = connected_components(pairs)
    return comp.select(
        "node",
        "component",
        (F.col("node") == F.col("component")).alias("is_survivor"),
    )


@register(
    "q_neardup_clusters",
    oracle=f"""
WITH {_DUCK_BASE_CTE},
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM n a JOIN n b ON a.vec_id < b.vec_id
  WHERE {_duck_dot('a.v', 'b.v')} / (a.norm * b.norm) >= {NEARDUP_THRESHOLD}
),
edges AS (
  SELECT vec_a AS a, vec_b AS b FROM pairs
  UNION ALL SELECT vec_b, vec_a FROM pairs
),
reach AS (
  WITH RECURSIVE r(node, label) AS (
    SELECT a, a FROM edges
    UNION
    SELECT e.a, r.label FROM r JOIN edges e ON e.b = r.node
  )
  SELECT node, label FROM r
)
SELECT node,
       min(label) AS component,
       (node = min(label)) AS is_survivor
FROM reach GROUP BY node
""",
    tags=("dedup", "graph", "northstar"),
)
def q_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs -> connected components -> survivor marking (the
    cluster step a content-dedup pipeline runs after pair detection)."""
    return neardup_clusters(read_table(spark, sf_dir, "embeddings"))

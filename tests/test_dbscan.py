"""DBSCAN over the cosine eps-graph (clustering.dbscan_clusters): role
invariants recomputed from first principles on the smoke fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from clinical_search_data_pipeline_spark.operators.clustering import (
    DBSCAN_EPS_SIM,
    DBSCAN_MINPTS,
    dbscan_clusters,
)
from clinical_search_data_pipeline_spark.operators.similarity import (
    embedding_neardup_pairs,
)
from clinical_search_data_pipeline_spark.sources.readers import read_table
from tests.conftest import SF_SMOKE


def _graph(spark):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    pairs = [
        (r.vec_a, r.vec_b)
        for r in embedding_neardup_pairs(emb, DBSCAN_EPS_SIM)
        .select("vec_a", "vec_b")
        .collect()
    ]
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return emb, adj


def test_roles_match_first_principles(spark):
    emb, adj = _graph(spark)
    out = {r.vec_id: r for r in dbscan_clusters(emb).collect()}
    assert len(out) == emb.count()  # every corpus vector labeled
    cores = {n for n, nb in adj.items() if len(nb) >= DBSCAN_MINPTS}
    for vid, r in out.items():
        nb = adj.get(vid, set())
        if vid in cores:
            assert r.role == "core"
        elif nb & cores:
            assert r.role == "border"
        else:
            assert r.role == "noise" and r.cluster == -1
    # the fixture exercises all three roles
    assert {r.role for r in out.values()} == {"core", "border", "noise"}


def test_clusters_are_core_components_with_min_id_labels(spark):
    """Core clusters = connected components of the core-core subgraph,
    labeled by min id; a border joins the MIN cluster among its core
    neighbors (the deterministic tie-break)."""
    emb, adj = _graph(spark)
    out = {r.vec_id: r for r in dbscan_clusters(emb).collect()}
    cores = {n for n, nb in adj.items() if len(nb) >= DBSCAN_MINPTS}
    # reference components by BFS over core-core edges
    label = {}
    for start in sorted(cores):
        if start in label:
            continue
        stack, seen = [start], {start}
        while stack:
            u = stack.pop()
            for v in adj[u] & cores:
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        for u in seen:
            label[u] = min(seen)
    for c in cores:
        assert out[c].cluster == label[c]
    for vid, r in out.items():
        if r.role == "border":
            want = min(label[c] for c in adj[vid] & cores)
            assert r.cluster == want

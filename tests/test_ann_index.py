"""Persisted ANN index (operators/ann_index.py): artifact round-trip
equal to the on-the-fly IVFADC path, no raw-vector scan at query time,
and versioned re-index with a pinnable history."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from clinical_search_data_pipeline_spark.operators import ann_index as ai
from clinical_search_data_pipeline_spark.operators.similarity import (
    ann_ivfpq_topk,
)
from clinical_search_data_pipeline_spark.sinks import manifest as m
from clinical_search_data_pipeline_spark.sources.readers import read_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def persisted(spark, tmp_path_factory):
    # train_rounds=0: this fixture backs the frozen-SEED equivalence pins
    # (persisted path == on-the-fly ann_ivfpq_topk, which quantizes with
    # the seed slice). The TRAINED default is pinned separately by
    # test_trained_add_equals_trained_rebuild and driver-verified via
    # q_ann_index_topk's unrolled-Lloyd oracle.
    root = str(tmp_path_factory.mktemp("ann") / "index")
    emb = read_table(spark, SF, "embeddings")
    ai.write_ann_index(ai.build_ann_index(emb, train_rounds=0), root)
    return root, emb


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_index_probe_equals_on_the_fly_ivfadc(spark, persisted):
    """The core pin: searching the persisted artifacts returns the exact
    rows (values, ranks, DECIMAL-derived adist) of the on-the-fly plan, at
    nprobe=1 and at the multiprobe recall knob."""
    root, emb = persisted
    index = ai.read_ann_index(spark, root)
    queries = emb.filter(F.col("vec_id") < 8)
    assert _rows(ai.ann_index_topk(index, queries)) == _rows(
        ann_ivfpq_topk(emb)
    )
    assert _rows(ai.ann_index_topk(index, queries, nprobe=2)) == _rows(
        ann_ivfpq_topk(emb, nprobe=2)
    )


def test_probe_plan_never_scans_raw_vectors(spark, persisted):
    """The reason the index exists at 100 TB: query-time file accesses are
    the index tables ONLY (codes/cells/centroids/codebook under the index
    root) — never the embeddings parquet. Queries arrive as an in-memory
    relation, exactly the serving shape."""
    root, emb = persisted
    index = ai.read_ann_index(spark, root)
    qrows = emb.filter(F.col("vec_id") < 8).collect()
    queries = spark.createDataFrame(qrows, emb.schema)
    out = ai.ann_index_topk(index, queries)
    assert out.count() > 0
    opened = out.inputFiles()
    assert opened and all("/index/" in f for f in opened)
    assert not any("embeddings" in f for f in opened)


def test_reindex_is_versioned_and_pinnable(spark, persisted):
    """A re-index (e.g. after a corpus refresh) publishes new versions
    atomically; a searcher pinning the previous versions still reads the
    complete old index — the rollback story is a version map."""
    root, emb = persisted
    v1 = {t: m.snapshots(f"{root}/{t}")[-1]["version"] for t in ai.INDEX_TABLES}
    smaller = emb.filter(F.col("vec_id") < 400)
    v2 = ai.write_ann_index(ai.build_ann_index(smaller), root)
    assert all(v2[t] == v1[t] + 1 for t in ai.INDEX_TABLES)
    old = ai.read_ann_index(spark, root, versions=v1)
    new = ai.read_ann_index(spark, root)
    assert old["codes"].count() > new["codes"].count()
    # the pinned old index still answers searches identically
    queries = emb.filter(F.col("vec_id") < 8)
    assert _rows(ai.ann_index_topk(old, queries)) == _rows(
        ann_ivfpq_topk(emb)
    )


def test_mid_reindex_reader_gets_consistent_quadruple(spark, persisted):
    """Multi-table consistency: a re-index commits the four relations in
    sequence and the meta pin LAST. A reader resolving mid-re-index (new
    codes committed, meta not yet bumped) must get the previous complete
    quadruple — never new codes paired with old centroids."""
    root, emb = persisted
    before = ai.read_ann_index(spark, root)
    before_codes = before["codes"].count()
    # simulate a torn re-index: ONLY the codes table moves forward
    tiny = emb.filter(F.col("vec_id") < 50)
    m.write_snapshot(
        ai.build_ann_index(tiny)["codes"], f"{root}/codes", mode="overwrite"
    )
    latest_codes = m.read_snapshot(spark, f"{root}/codes").count()
    assert latest_codes < before_codes  # the torn write really landed
    # default (meta-resolved) read still serves the old consistent view
    after = ai.read_ann_index(spark, root)
    assert after["codes"].count() == before_codes


def test_incremental_add_equals_full_rebuild(spark, tmp_path):
    """FAISS add(): vectors folded in under the FROZEN quantizers. Because
    the training rows (centroids 100..107, codebook 200..231) are in the
    initial build, add-then-search must equal a full rebuild BIT FOR BIT —
    and the append reuses every pre-add file by reference (only the
    increment is written). Duplicate adds and racing meta pins refuse."""
    emb = read_table(spark, SF, "embeddings")
    root = str(tmp_path / "index")
    initial = emb.filter(F.col("vec_id") < 300)  # includes all training rows
    # train_rounds=0: this pin compares against the seed-quantizer
    # on-the-fly path; the trained twin is pinned separately below
    ai.write_ann_index(ai.build_ann_index(initial, train_rounds=0), root)
    pre_cells = {
        e["path"]
        for e in m._entries(
            m._read_manifest(f"{root}/cells", m._versions(f"{root}/cells")[-1])
        )
    }
    v = ai.add_to_ann_index(spark, root, emb.filter(F.col("vec_id") >= 300))
    assert v["cells"] >= 2 and v["codes"] >= 2 and v["meta"] >= 2
    post = m._entries(m._read_manifest(f"{root}/cells", v["cells"]))
    assert pre_cells < {e["path"] for e in post}  # old files referenced, not rewritten
    idx = ai.read_ann_index(spark, root)
    queries = emb.filter(F.col("vec_id") < 8)
    assert _rows(ai.ann_index_topk(idx, queries)) == _rows(
        ann_ivfpq_topk(emb)
    )
    assert _rows(ai.ann_index_topk(idx, queries, nprobe=2)) == _rows(
        ann_ivfpq_topk(emb, nprobe=2)
    )
    # duplicate vectors refuse
    with pytest.raises(ValueError, match="already present"):
        ai.add_to_ann_index(spark, root, emb.filter(F.col("vec_id") < 10))


def test_remove_masks_then_compact_applies(spark, tmp_path):
    """FAISS remove_ids(): a tombstoned vector disappears from every
    search immediately (broadcast anti-join mask), the tombstone-masked
    results equal the post-compaction physical results EXACTLY, and after
    compaction the cells/codes tables no longer contain the vector at
    all. Unknown ids and re-adds of tombstoned ids refuse."""
    emb = read_table(spark, SF, "embeddings")
    root = str(tmp_path / "index")
    ai.write_ann_index(ai.build_ann_index(emb, train_rounds=0), root)
    queries = emb.filter(F.col("vec_id") < 8)
    baseline = ai.ann_index_topk(ai.read_ann_index(spark, root), queries)
    victim = int(baseline.collect()[0].neighbor_id)

    with pytest.raises(ValueError, match="not present"):
        ai.remove_from_ann_index(spark, root, [10_000_000])
    v = ai.remove_from_ann_index(spark, root, [victim])
    assert ai.TOMBSTONE_TABLE in v
    masked = ai.ann_index_topk(ai.read_ann_index(spark, root), queries)
    assert victim not in {r.neighbor_id for r in masked.collect()}
    # re-adding a tombstoned id refuses until compaction drops the rows
    with pytest.raises(ValueError, match="already present"):
        ai.add_to_ann_index(
            spark, root, emb.filter(F.col("vec_id") == victim)
        )

    ai.compact_ann_index(spark, root, target_files=2)
    idx = ai.read_ann_index(spark, root)
    assert idx["cells"].filter(F.col("vec_id") == victim).count() == 0
    assert idx["codes"].filter(F.col("vec_id") == victim).count() == 0
    assert idx[ai.TOMBSTONE_TABLE].count() == 0
    physical = ai.ann_index_topk(idx, queries)
    assert _rows(masked) == _rows(physical)


def test_add_then_compact_equals_fresh_rebuild(spark, tmp_path):
    """Maintenance cadence: repeated adds accrue one stage dir each;
    compact_ann_index collapses cells/codes to target_files and the
    result is pinned equal to a from-scratch build of the union corpus —
    relation contents AND search rows."""
    emb = read_table(spark, SF, "embeddings")
    root = str(tmp_path / "index")
    ai.write_ann_index(
        ai.build_ann_index(
            emb.filter(F.col("vec_id") < 300), train_rounds=0
        ), root
    )
    ai.add_to_ann_index(
        spark, root,
        emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400)),
    )
    ai.add_to_ann_index(spark, root, emb.filter(F.col("vec_id") >= 400))
    v = ai.compact_ann_index(spark, root, target_files=2)
    man = m._read_manifest(f"{root}/cells", v["cells"])
    assert man["num_files"] <= 2  # small files collapsed
    idx = ai.read_ann_index(spark, root)
    fresh = ai.build_ann_index(emb, train_rounds=0)
    assert _rows(idx["cells"]) == _rows(fresh["cells"])
    assert _rows(idx["codes"]) == _rows(fresh["codes"])
    queries = emb.filter(F.col("vec_id") < 8)
    assert _rows(ai.ann_index_topk(idx, queries)) == _rows(
        ann_ivfpq_topk(emb)
    )


def test_crashed_add_orphan_never_duplicates(spark, tmp_path):
    """ADVICE r9 #2 regression: an add that appended cells/codes but died
    before its meta pin leaves orphaned rows at the table tips. The next
    add of the same increment must succeed (the pinned index lacks it)
    and fold in ONLY the pinned files — no duplicate vec_ids ever reach a
    search."""
    emb = read_table(spark, SF, "embeddings")
    root = str(tmp_path / "index")
    ai.write_ann_index(
        ai.build_ann_index(
            emb.filter(F.col("vec_id") < 300), train_rounds=0
        ), root
    )
    increment = emb.filter(F.col("vec_id") >= 300)
    # simulate the crash: stage the increment's cells/codes appends on the
    # tips exactly as add_to_ann_index would, but never pin meta
    idx = ai.read_ann_index(spark, root)
    crashed = ai.build_ann_index(emb, train_rounds=0)  # same frozen quantizers
    m.write_snapshot(
        crashed["cells"].join(idx["cells"], "vec_id", "left_anti"),
        f"{root}/cells", mode="append", collect_stats=False,
    )
    m.write_snapshot(
        crashed["codes"].join(idx["codes"].select("vec_id").distinct(),
                              "vec_id", "left_anti"),
        f"{root}/codes", mode="append", collect_stats=False,
    )
    # the retry (same increment) succeeds and duplicates nothing
    v = ai.add_to_ann_index(spark, root, increment)
    cells = m.read_snapshot(spark, f"{root}/cells", version=v["cells"])
    dup = (
        cells.groupBy("vec_id").count().filter(F.col("count") > 1).count()
    )
    assert dup == 0
    queries = emb.filter(F.col("vec_id") < 8)
    assert _rows(
        ai.ann_index_topk(ai.read_ann_index(spark, root), queries)
    ) == _rows(ann_ivfpq_topk(emb))


def test_trained_add_equals_trained_rebuild(spark, tmp_path):
    """The r12 default: build_ann_index TRAINS the coarse quantizer
    (ANN_TRAIN_ROUNDS fixed Lloyd rounds). FAISS's train/add contract
    still holds — freeze the quantizer on a training set, add increments,
    and the result is bit-equal to a fresh build whose quantizer trained
    on the SAME set (train_on=): trained cells change WHERE vectors live,
    never the frozen-quantizer add semantics."""
    emb = read_table(spark, SF, "embeddings")
    root = str(tmp_path / "index")
    initial = emb.filter(F.col("vec_id") < 300)  # includes training rows
    ai.write_ann_index(ai.build_ann_index(initial), root)  # trained default
    ai.add_to_ann_index(spark, root, emb.filter(F.col("vec_id") >= 300))
    idx = ai.read_ann_index(spark, root)
    fresh = ai.build_ann_index(emb, train_on=initial)  # same frozen quantizer
    assert _rows(idx["centroids"]) == _rows(fresh["centroids"])
    assert _rows(idx["codebook"]) == _rows(fresh["codebook"])  # trained PQ too
    assert _rows(idx["cells"]) == _rows(fresh["cells"])
    queries = emb.filter(F.col("vec_id") < 8)
    fresh_root = str(tmp_path / "fresh")
    ai.write_ann_index(fresh, fresh_root)
    assert _rows(ai.ann_index_topk(idx, queries)) == _rows(
        ai.ann_index_topk(ai.read_ann_index(spark, fresh_root), queries)
    )


def test_rerank_recall_geq_probe_only_at_same_nprobe(spark, tmp_path):
    """VERDICT r12 #4: FAISS refine over the persisted index. The exact
    claim the docstring makes, measured: recall@k of the reranked result
    is >= the probe-only ADC top-k at the SAME nprobe (the pool is a
    superset of ADC's own top-k, and any exact-top-k member in the pool
    outranks every other pool row under exact scoring). Also pins the
    refine output discipline (rank by exact cosine desc / vec_id asc,
    round-4 score) against similarity.ann_pq_rerank_topk's shape."""
    from clinical_search_data_pipeline_spark.operators.similarity import (
        IVF_NPROBE,
        RERANK_POOL,
        cosine_topk,
    )

    emb = read_table(spark, SF, "embeddings")
    root = str(tmp_path / "index")
    ai.write_ann_index(ai.build_ann_index(emb), root)
    idx = ai.read_ann_index(spark, root)
    queries = emb.filter(F.col("vec_id") < 8)

    exact = set(
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb).select("query_id", "neighbor_id").collect()
    )
    probe = set(
        (r.query_id, r.neighbor_id)
        for r in ai.ann_index_topk(idx, queries, nprobe=IVF_NPROBE).collect()
    )
    rerank_rows = ai.ann_index_topk(
        idx, queries, nprobe=IVF_NPROBE, rerank=RERANK_POOL, vectors=emb
    ).collect()
    rerank = set((r.query_id, r.neighbor_id) for r in rerank_rows)
    assert len(rerank & exact) >= len(probe & exact)
    assert [c for c in ai.ann_index_topk(
        idx, queries, nprobe=IVF_NPROBE, rerank=RERANK_POOL, vectors=emb
    ).columns] == ["query_id", "neighbor_id", "rank", "score"]
    # per query: exactly k rows, ranks dense from 1, scores non-increasing
    by_q: dict[int, list] = {}
    for r in rerank_rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1)), q
        scores = [r.score for r in rows]
        assert scores == sorted(scores, reverse=True), q


def test_rerank_requires_vectors(spark, tmp_path):
    emb = read_table(spark, SF, "embeddings")
    root = str(tmp_path / "index")
    ai.write_ann_index(ai.build_ann_index(emb, train_rounds=0), root)
    idx = ai.read_ann_index(spark, root)
    with pytest.raises(ValueError, match="vectors"):
        ai.ann_index_topk(idx, emb.filter(F.col("vec_id") < 8), rerank=10)


def test_serve_index_builds_once_per_source_content(spark, monkeypatch):
    """VERDICT r12 #6: the serving path amortizes the build. First call
    trains + commits; the second call for the SAME source content must
    resolve the committed artifacts WITHOUT building (build_ann_index
    monkeypatched to explode), and its probe results equal the first's."""
    import shutil

    shutil.rmtree("/tmp/csdp_ann_index_serve", ignore_errors=True)
    emb = read_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    idx1 = ai.serve_index(spark, SF)
    first = _rows(ai.ann_index_topk(idx1, queries))

    def boom(*a, **k):  # pragma: no cover - called means a rebuild
        raise AssertionError("serve_index rebuilt an already-served source")

    monkeypatch.setattr(ai, "build_ann_index", boom)
    idx2 = ai.serve_index(spark, SF)
    assert _rows(ai.ann_index_topk(idx2, queries)) == first

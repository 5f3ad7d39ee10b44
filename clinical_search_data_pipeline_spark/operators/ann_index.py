"""Persisted ANN index: the FAISS IVFADC index as committed lake artifacts.

VERDICT r8 #3: BM25 got the index-as-artifact treatment
(operators/retrieval.py build_postings -> lake -> bm25_topk_from_postings);
every ANN query, by contrast, re-derived codebooks / IVF cells from the raw
vectors per run. This module materializes the trained index once and makes
every subsequent search a probe of the persisted artifacts — the FAISS
production deployment shape (Jegou et al. TPAMI 2011; Johnson, Douze,
Jegou, "Billion-scale similarity search with GPUs", 2017: train/add once,
search many):

* ``build_ann_index`` derives the four index relations from the corpus —
  `centroids` (cell, cv, cnorm: the coarse quantizer, K rows),
  `codebook`  (m, j, cw: the PQ codewords, M x K rows),
  `cells`     (vec_id, cell: the inverted-file assignment),
  `codes`     (vec_id, m, code: the PQ-compressed corpus, M ints/vector —
  the ONLY per-vector state a search ever scans; 25x smaller than raw);
* ``write_ann_index`` publishes each relation through the snapshot-
  committed sink (sinks/manifest.py) — an atomic, versioned index: a
  re-index publishes new versions while a racing search keeps reading the
  previous complete ones, and an index rollback is a version pin;
* ``read_ann_index`` resolves the committed artifacts (latest or pinned);
* ``remove_from_ann_index`` / ``compact_ann_index`` are the maintenance
  half of FAISS remove_ids(): removes are O(removed) tombstones masked at
  search time by a broadcast anti-join; compaction physically applies
  them and collapses the small files repeated ``add_to_ann_index``
  increments accrue — add+compact is pinned bit-equal to a fresh rebuild;
* ``ann_index_topk`` searches FROM THE INDEX ALONE: the query vectors (a
  tiny relation) compute their ADC lookup tables against the broadcast
  persisted codebook and pick nprobe cells against the broadcast persisted
  centroids; candidates are cell-pruned `cells` joined to `codes` — no raw
  corpus vector is read at query time (tests/test_ann_index.py pins
  `inputFiles()` of the probe plan to the index tables only).

At 100 TB: `codes`/`cells` are the big sides — both partition by vec_id
and meet in an equi-join; everything query-sided (queries, centroids,
codebook, distance tables) is broadcast. Search cost per query is
~ nprobe / n_centroids of the codes, exactly the on-the-fly
`similarity.ann_ivfpq_topk` plan with the derivation scans amortized to
zero. BOTH quantizers are TRAINED by default (FAISS's train() step,
VERDICT r11 #3): the coarse quantizer with ANN_TRAIN_ROUNDS fixed Lloyd
rounds and the PQ codebook with one order-pinned Lloyd round
(similarity.pq_train_codebooks(pinned=True)) — at sf0.1 the trained
index returns 12/40 true top-5 neighbors vs the all-seed index's 7/40.
The driver hash-verifies the trained index against an oracle composing
the same training in SQL (clustering.duck_lloyd_ctes +
similarity._DUCK_PQ_TRAINED_CTE), so index and oracle cannot drift.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clinical_search_data_pipeline_spark.operators.fragments import (
    _DUCK_BASE_CTE,
    N_QUERIES,
    TOP_K,
    _spark_dot,
)
from clinical_search_data_pipeline_spark.operators.similarity import (
    CENTROID_BASE,
    N_CENTROIDS,
    _spark_l2sq,
    ivf_assignments,
    pq_codebook,
    pq_codes,
    pq_subvectors,
    vectors_with_norms,
)
from clinical_search_data_pipeline_spark.registry import register
from clinical_search_data_pipeline_spark.sinks import manifest
from clinical_search_data_pipeline_spark.sources.readers import read_table

INDEX_TABLES = ("centroids", "codebook", "cells", "codes")
META_TABLE = "meta"  # (table, version) pin rows — committed LAST
TOMBSTONE_TABLE = "tombstones"  # (vec_id) rows pending physical removal


# Lloyd rounds the persisted index trains its coarse quantizer with
# (VERDICT r11 #3). Measured at sf0.1: seed cells put 7/40 true top-5
# neighbors in the probed cell, 2 rounds put 12/40, full convergence
# (8 rounds) 13/40. End to end — coarse training (2 rounds) PLUS the
# one-round trained PQ codebook, with the ADC loss compounded — the
# persisted index scores 12/40 vs the all-seed index's 7/40 at sf0.1
# and 10/40 vs 6/40 at sf0.01 (ANN_RECALL.md ivfadc_trained_index row;
# the sf0.001 row sits at its seed baseline — 250 vectors over 8 cells
# is too small for Lloyd means to help, the same quirk ivf_p1_lloyd1
# shows). Two coarse rounds buy most of the converged uplift while
# keeping the cross-engine oracle two unrolled CTEs deep. Fixed rounds,
# not early-stopped: see clustering.trained_quantizer.
ANN_TRAIN_ROUNDS = 2


def build_ann_index(
    emb: DataFrame,
    train_rounds: int = ANN_TRAIN_ROUNDS,
    train_on: DataFrame | None = None,
    train_pq: bool | None = None,
) -> dict[str, DataFrame]:
    """Derive the four IVFADC index relations from the corpus vectors.

    One-time cost, the 'train + add' phase: the coarse quantizer is
    TRAINED — `train_rounds` fixed Lloyd alternations from the
    deterministic seed (clustering.trained_quantizer) over `train_on`
    (default: the corpus itself; pass a fixed sample at 100 TB, FAISS's
    own train/add split) — then every corpus vector is assigned to its
    nearest trained centroid. `train_rounds=0` keeps the raw seed-slice
    quantizer (the pre-r12 behavior; the add/compact bit-equality
    fixtures use it so 'fresh rebuild' has a frozen quantizer to agree
    with). The assignment is a broadcast-K-centroids scan + per-vec_id
    argmax, the encode a broadcast-codebook scan + per-(vec_id, m)
    argmin — both shuffle only on vec_id-keyed windows, never
    vector x vector; each training round is one (cell, dim)-keyed
    shuffle with no driver sync."""
    from clinical_search_data_pipeline_spark.operators.clustering import (
        _assign,
        trained_quantizer,
    )
    from clinical_search_data_pipeline_spark.operators.similarity import (
        pq_train_codebooks,
    )

    if train_pq is None:
        # by default both quantizers train together (FAISS trains the
        # coarse quantizer AND the PQ codebooks in one train() call) and
        # the seed path keeps both frozen for the equivalence fixtures
        train_pq = train_rounds > 0
    subs = pq_subvectors(emb)

    def _train_pq_cb() -> DataFrame:
        # one order-pinned Lloyd round per subspace over the sliced init
        # (pq_train_codebooks(pinned=True)) — the exact training round
        # q_ann_pq_trained_topk's oracle replays bit-exactly in SQL.
        # localCheckpoint: the codebook is MODEL-sized (M x K rows) but its
        # lineage is the whole training pass, and it feeds BOTH the
        # published `codebook` relation and the corpus encode (`codes`) —
        # without the cut the publish path executes PQ training twice.
        return pq_train_codebooks(
            train_on or emb, rounds=1, pinned=True
        ).localCheckpoint()

    def _train_coarse() -> DataFrame:
        # Same cut for the coarse quantizer: `trained_quantizer` is a lazy
        # unroll of the Lloyd rounds, referenced by the published
        # `centroids` relation AND the corpus assignment (`cells`) — the
        # checkpoint makes coarse training execute once per build.
        cents, _ = trained_quantizer(train_on or emb, train_rounds)
        return cents.localCheckpoint()

    base = vectors_with_norms(emb)
    if train_pq and train_rounds > 0:
        # The two training materializations are independent jobs on one
        # session; running them from a 2-thread pool lets the scheduler
        # back-fill each job's straggler tail with the other's tasks
        # instead of idling the cluster between sequential actions
        # (guide §2.6). Determinism is untouched — each plan is the same
        # fixed-seed unroll either way.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            cb_fut = pool.submit(_train_pq_cb)
            cents_fut = pool.submit(_train_coarse)
            cb = cb_fut.result()
            centroids = cents_fut.result()
        cells = _assign(base, centroids, "cell").select("vec_id", "cell")
        return {
            "centroids": centroids,
            "codebook": cb,
            "cells": cells,
            "codes": pq_codes(subs, cb),
        }
    if train_pq:
        cb = _train_pq_cb()
    else:
        cb = pq_codebook(subs)
    if train_rounds > 0:
        centroids = _train_coarse()
        cells = _assign(base, centroids, "cell").select("vec_id", "cell")
    else:
        centroids = base.filter(
            (F.col("vec_id") >= CENTROID_BASE)
            & (F.col("vec_id") < CENTROID_BASE + N_CENTROIDS)
        ).select(
            (F.col("vec_id") - CENTROID_BASE).alias("cell"),
            F.col("v").alias("cv"),
            F.col("norm").alias("cnorm"),
        )
        cells = ivf_assignments(emb).select("vec_id", "cell")
    return {
        "centroids": centroids,
        "codebook": cb,
        "cells": cells,
        "codes": pq_codes(subs, cb),
    }


def write_ann_index(index: dict[str, DataFrame], root: str) -> dict[str, int]:
    """Publish the index relations as snapshot tables under `root`; returns
    {table: committed version} (including the meta pin's own version).

    Multi-table consistency: each of the four relations commits atomically
    on its own, but a re-index writes them in sequence — a reader
    resolving "latest of each" mid-re-index could pair new codes with old
    centroids. So the LAST commit is a 4-row `meta` table pinning the
    exact (table, version) quadruple, and `read_ann_index` resolves
    through it: until the meta pin lands, every reader keeps getting the
    previous complete quadruple (the same resolve-the-manifest-first
    discipline the snapshot sink applies per table, lifted one level)."""
    # The four table publishes are independent write actions on disjoint
    # paths; a thread pool overlaps them so the big `codes`/`cells` writes
    # back-fill the tiny `centroids`/`codebook` commits' scheduling gaps
    # (guide §2.6). Readers stay consistent regardless of landing order:
    # nothing is visible until the meta pin — still committed LAST, after
    # every table write returned — publishes the complete quadruple.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(INDEX_TABLES)) as pool:
        futs = {
            name: pool.submit(
                manifest.write_snapshot,
                index[name],
                f"{root}/{name}",
                mode="overwrite",
                # collect_stats=False: these relations are probed by
                # equi-join, never range-pruned — per-file footer stats
                # would be dead weight collected on the publish path
                collect_stats=False,
            )
            for name in INDEX_TABLES
        }
        versions = {name: fut.result() for name, fut in futs.items()}
    spark = next(iter(index.values())).sparkSession
    pins = spark.createDataFrame(
        [(t, versions[t]) for t in INDEX_TABLES], "table string, version int"
    )
    versions[META_TABLE] = manifest.write_snapshot(
        pins, f"{root}/{META_TABLE}", mode="overwrite"
    )
    return versions


def read_ann_index(
    spark: SparkSession, root: str, versions: dict[str, int] | None = None
) -> dict[str, DataFrame]:
    """Resolve the committed index: by explicit {table: version} pins, or
    (default) through the latest `meta` quadruple — a CONSISTENT view even
    while a re-index is mid-flight (its meta pin is the last thing to
    land). The meta read is a few bounded rows on the driver. When the
    pin carries a `tombstones` row (a remove happened since the last
    compaction), the pending-removal relation rides along and
    `ann_index_topk` masks it out."""
    if versions is None:
        pins = manifest.read_snapshot(spark, f"{root}/{META_TABLE}")
        versions = {r.table: r.version for r in pins.collect()}
    names = list(INDEX_TABLES)
    if TOMBSTONE_TABLE in versions:
        names.append(TOMBSTONE_TABLE)
    return {
        name: manifest.read_snapshot(
            spark, f"{root}/{name}", version=versions.get(name)
        )
        for name in names
    }


def add_to_ann_index(
    spark: SparkSession, root: str, new_emb: DataFrame
) -> dict[str, int]:
    """FAISS `add()`: fold NEW vectors into the persisted index without
    retraining — encode them under the FROZEN coarse quantizer and PQ
    codebook (both broadcast from the committed artifacts), append the
    resulting (vec_id, cell) and (vec_id, m, code) rows to the `cells` /
    `codes` snapshot tables (append mode reuses every existing file by
    reference — the increment is the only data written), and publish a
    fresh meta pin. Because the quantizers are frozen, add-then-search is
    EXACTLY equal to a full rebuild whenever the training vectors
    (centroid + codebook rows) were already in the index — the property
    tests/test_ann_index.py pins bit-for-bit.

    Concurrency: the meta pin commits with ``expected_parent`` — two
    racing adds cannot silently drop each other; the loser gets
    `SnapshotConflict` and re-runs. The cells/codes appends fold in the
    META-PINNED version's files (``base_version=``), not the table tip:
    rows appended by a racer or crashed add whose meta pin never landed
    are orphaned at the tip and NEVER folded forward — a re-run starts
    from the pinned state and cannot duplicate vec_ids (vacuum reclaims
    the orphan stage dirs). Duplicate vec_ids in the pinned index are
    refused outright (a doubled vector would surface twice in every
    candidate list).

    Returns the new {table: version} map (centroids/codebook unchanged)."""
    # resolve the pin version ONCE and read the pins AT that version —
    # two unpinned reads could straddle a concurrent commit, CAS-ing
    # against a tip whose pins were never read (ADVICE r10)
    meta_version = manifest.latest_version(f"{root}/{META_TABLE}")
    pins = manifest.read_snapshot(
        spark, f"{root}/{META_TABLE}", version=meta_version
    )
    versions = {r.table: r.version for r in pins.collect()}
    index = {
        name: manifest.read_snapshot(
            spark, f"{root}/{name}", version=versions[name]
        )
        for name in INDEX_TABLES
    }
    dup = (
        index["cells"]
        .join(F.broadcast(new_emb.select("vec_id")), "vec_id", "left_semi")
        .count()
    )
    if dup:
        raise ValueError(
            f"{dup} vec_ids already present in the index at {root}; "
            "adds must be novel vectors (re-index to replace)"
        )
    wq = Window.partitionBy("vec_id").orderBy(
        F.col("_cscore").desc(), F.col("cell").asc()
    )
    new_cells = (
        vectors_with_norms(new_emb)
        .crossJoin(F.broadcast(index["centroids"]))
        .withColumn(
            "_cscore",
            F.expr(_spark_dot("v", "cv")) / (F.col("norm") * F.col("cnorm")),
        )
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "cell")
    )
    new_codes = pq_codes(pq_subvectors(new_emb), index["codebook"])
    versions["cells"] = manifest.write_snapshot(
        new_cells, f"{root}/cells", mode="append", collect_stats=False,
        base_version=versions["cells"],
    )
    versions["codes"] = manifest.write_snapshot(
        new_codes, f"{root}/codes", mode="append", collect_stats=False,
        base_version=versions["codes"],
    )
    pins_df = spark.createDataFrame(
        # carry EVERY pinned relation forward (tombstones included when a
        # remove happened since the last compaction)
        sorted(versions.items()),
        "table string, version int",
    )
    versions[META_TABLE] = manifest.write_snapshot(
        pins_df,
        f"{root}/{META_TABLE}",
        mode="overwrite",
        expected_parent=meta_version,
    )
    return versions


def remove_from_ann_index(
    spark: SparkSession, root: str, vec_ids
) -> dict[str, int]:
    """FAISS `remove_ids()`: mark vectors deleted via a TOMBSTONE relation
    instead of rewriting the corpus-sided cells/codes tables — a remove is
    O(removed), search masks the tombstones with a broadcast anti-join
    (their count is bounded between compactions), and
    `compact_ann_index` later applies them physically. `vec_ids` is a
    one-column DataFrame or an iterable of ids. Unknown ids raise (a
    silent no-op remove hides caller bugs); re-adding a tombstoned id is
    refused by `add_to_ann_index`'s dup-check until a compaction
    physically drops the old rows. Meta-pin CAS as in add."""
    if not isinstance(vec_ids, DataFrame):
        vec_ids = spark.createDataFrame(
            [(int(v),) for v in vec_ids], "vec_id long"
        )
    vec_ids = vec_ids.select("vec_id").distinct()
    # resolve the pin version ONCE and read the pins AT that version —
    # two unpinned reads could straddle a concurrent commit, CAS-ing
    # against a tip whose pins were never read (ADVICE r10)
    meta_version = manifest.latest_version(f"{root}/{META_TABLE}")
    pins = manifest.read_snapshot(
        spark, f"{root}/{META_TABLE}", version=meta_version
    )
    versions = {r.table: r.version for r in pins.collect()}
    cells = manifest.read_snapshot(
        spark, f"{root}/cells", version=versions["cells"]
    )
    missing = (
        vec_ids.join(cells.select("vec_id"), "vec_id", "left_anti").count()
    )
    if missing:
        raise ValueError(
            f"{missing} vec_ids not present in the index at {root}; "
            "removes must name indexed vectors"
        )
    tomb_table = f"{root}/{TOMBSTONE_TABLE}"
    if TOMBSTONE_TABLE in versions:
        already = manifest.read_snapshot(
            spark, tomb_table, version=versions[TOMBSTONE_TABLE]
        )
        increment = vec_ids.join(already, "vec_id", "left_anti")
        versions[TOMBSTONE_TABLE] = manifest.write_snapshot(
            increment, tomb_table, mode="append", collect_stats=False,
            base_version=versions[TOMBSTONE_TABLE],
        )
    else:
        versions[TOMBSTONE_TABLE] = manifest.write_snapshot(
            vec_ids, tomb_table, mode="overwrite", collect_stats=False
        )
    pins_df = spark.createDataFrame(
        sorted(versions.items()), "table string, version int"
    )
    versions[META_TABLE] = manifest.write_snapshot(
        pins_df,
        f"{root}/{META_TABLE}",
        mode="overwrite",
        expected_parent=meta_version,
    )
    return versions


def compact_ann_index(
    spark: SparkSession, root: str, target_files: int = 4
) -> dict[str, int]:
    """Index maintenance: physically apply the pending tombstones to the
    cells/codes relations and collapse the small files that repeated
    `add_to_ann_index` increments accrue (each add appends its own stage
    directory) into `target_files` per relation. Publishes fresh
    overwrite versions + an empty tombstone set + a meta pin (CAS), so a
    racing search keeps reading the previous complete quadruple. The
    rewrite is O(index), which is the amortized bargain: removes and adds
    stay O(increment) between compactions. With no removes in the window
    this is exactly `compact_snapshot` semantics — values unchanged,
    layout collapsed — so add+compact stays bit-equal to a fresh rebuild
    (tests/test_ann_index.py pins it)."""
    # resolve the pin version ONCE and read the pins AT that version —
    # two unpinned reads could straddle a concurrent commit, CAS-ing
    # against a tip whose pins were never read (ADVICE r10)
    meta_version = manifest.latest_version(f"{root}/{META_TABLE}")
    pins = manifest.read_snapshot(
        spark, f"{root}/{META_TABLE}", version=meta_version
    )
    versions = {r.table: r.version for r in pins.collect()}
    index = {
        name: manifest.read_snapshot(
            spark, f"{root}/{name}", version=versions[name]
        )
        for name in versions
    }
    tombs = index.get(TOMBSTONE_TABLE)
    for name in ("cells", "codes"):
        df = index[name]
        if tombs is not None:
            df = df.join(F.broadcast(tombs), "vec_id", "left_anti")
        versions[name] = manifest.write_snapshot(
            df.repartition(target_files),
            f"{root}/{name}",
            mode="overwrite",
            collect_stats=False,
        )
    if tombs is not None:
        versions[TOMBSTONE_TABLE] = manifest.write_snapshot(
            tombs.limit(0),
            f"{root}/{TOMBSTONE_TABLE}",
            mode="overwrite",
            collect_stats=False,
        )
    pins_df = spark.createDataFrame(
        sorted(versions.items()), "table string, version int"
    )
    versions[META_TABLE] = manifest.write_snapshot(
        pins_df,
        f"{root}/{META_TABLE}",
        mode="overwrite",
        expected_parent=meta_version,
    )
    return versions


def ann_index_topk(
    index: dict[str, DataFrame],
    queries: DataFrame,
    k: int = TOP_K,
    nprobe: int = 1,
    rerank: int | None = None,
    vectors: DataFrame | None = None,
) -> DataFrame:
    """IVFADC top-k over the PERSISTED index: `queries` is a raw vector
    relation (vec_id, ..., embedding) — typically tiny — and everything
    corpus-sided comes from `index`. Zero raw corpus-vector scans.

    Output schema and values match `similarity.ann_ivfpq_topk` exactly
    (query_id, neighbor_id, cell, rank, adist): the ADC table entries are
    the same order-pinned 9dp-rounded DECIMAL folds, the cell choice the
    same max-cosine/lowest-cell rule, so the persisted path is
    hash-interchangeable with the on-the-fly one.

    ``rerank=R`` adds FAISS's refine step (IndexRefineFlat; VERDICT r12
    #4): the ADC stage proposes its top-R pool per query, then ONLY those
    R rows are re-scored with the exact cosine against ``vectors`` (the
    full-precision relation) and cut to the final top-k — output then
    matches `similarity.ann_pq_rerank_topk`'s shape (query_id,
    neighbor_id, rank, score). Recall@k is provably >= the ADC-alone
    top-k at the same nprobe: the pool is a superset of ADC's own top-k,
    and any exact-top-k member in the pool outranks every other pool row
    under exact scoring. Scale shape: the candidate pairs (n_queries x R
    rows) BROADCAST into the join against `vectors`, so the
    full-precision relation is never shuffled and never scanned beyond
    the candidate probe — on a snapshot-committed corpus sorted by
    vec_id, footer-stats pruning makes that probe sub-scan too."""
    if rerank is not None and vectors is None:
        raise ValueError("rerank needs the full-precision `vectors` relation")
    qsubs = pq_subvectors(queries).select(
        F.col("vec_id").alias("query_id"), "m", F.col("su").alias("qsu")
    )
    dt = qsubs.join(index["codebook"], "m").select(
        "query_id",
        "m",
        F.col("j").alias("code"),
        F.round(F.expr(_spark_l2sq("qsu", "cw")), 9)
        .cast("decimal(18,9)")
        .alias("d"),
    )
    qvecs = vectors_with_norms(queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("_cscore").desc(), F.col("cell").asc()
    )
    qcells = (
        qvecs.crossJoin(F.broadcast(index["centroids"]))
        .withColumn(
            "_cscore",
            F.expr(_spark_dot("qv", "cv")) / (F.col("qnorm") * F.col("cnorm")),
        )
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", F.col("cell").alias("qcell"))
    )
    cells = index["cells"]
    tombs = index.get(TOMBSTONE_TABLE)
    if tombs is not None:
        # pending removals: masked at the candidate source — tombstone
        # count is bounded between compactions, so the anti-join side
        # broadcasts
        cells = cells.join(F.broadcast(tombs), "vec_id", "left_anti")
    cand = (
        cells
        .join(
            F.broadcast(qcells),
            (F.col("cell") == F.col("qcell"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "vec_id", "cell")
        .join(index["codes"], "vec_id")
    )
    scored = (
        cand.join(
            F.broadcast(dt),
            (cand["m"] == dt["m"])
            & (cand["code"] == dt["code"])
            & (cand["query_id"] == dt["query_id"]),
        )
        .drop(dt["query_id"])
        .groupBy("query_id", "vec_id", "cell")
        .agg(F.sum("d").alias("adist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("vec_id").asc()
    )
    if rerank is None:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                "cell",
                "rank",
                F.round(F.col("adist").cast("double"), 6).alias("adist"),
            )
        )
    pool = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= rerank)
        .select("query_id", "vec_id")
    )
    base = vectors_with_norms(vectors)
    rescored = (
        base.join(F.broadcast(pool), "vec_id")
        .join(
            F.broadcast(
                qvecs  # the same (query_id, qv, qnorm) stage-1 used
            ),
            "query_id",
        )
        .withColumn(
            "score",
            F.expr(_spark_dot("v", "qv")) / (F.col("norm") * F.col("qnorm")),
        )
    )
    wx = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(wx))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round("score", 4).alias("score"),
        )
    )


def _q_ann_index_oracle() -> str:
    """IVFADC under the FULLY trained index: the coarse cells come from
    ANN_TRAIN_ROUNDS unrolled Lloyd rounds (clustering.duck_lloyd_ctes —
    the bit-exact order-pinned folds q_kmeans_refine already verifies)
    and the PQ codes/distance tables from the trained codebook chain
    (similarity._DUCK_PQ_TRAINED_CTE — the round q_ann_pq_trained_topk
    already hash-verifies), so the oracle trains exactly what
    build_ann_index trains, both quantizers."""
    from clinical_search_data_pipeline_spark.operators.clustering import (
        duck_lloyd_ctes,
    )
    from clinical_search_data_pipeline_spark.operators.similarity import (
        _DUCK_PQ_TRAINED_CTE,
    )

    r = ANN_TRAIN_ROUNDS
    return f"""
WITH {_DUCK_BASE_CTE},
{_DUCK_PQ_TRAINED_CTE.lstrip()},
{duck_lloyd_ctes(r)},
q AS (SELECT vec_id AS query_id, cell AS qcell
      FROM cells_r{r} WHERE vec_id < {N_QUERIES}),
ivf_adc AS (
  SELECT q.query_id, c.vec_id, c.cell, sum(t.d) AS adist
  FROM cells_r{r} c
  JOIN q ON c.cell = q.qcell AND c.vec_id <> q.query_id
  JOIN codes1 s ON s.vec_id = c.vec_id
  JOIN dt1 t ON t.query_id = q.query_id AND t.m = s.m AND t.code = s.code
  GROUP BY 1, 2, 3
)
SELECT query_id, vec_id AS neighbor_id, cell,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY adist ASC, vec_id ASC) AS rank,
       round(CAST(adist AS DOUBLE), 6) AS adist
FROM ivf_adc QUALIFY rank <= {TOP_K}
"""


@register(
    "q_ann_index_topk",
    oracle=_q_ann_index_oracle(),
    tags=("similarity", "northstar", "ivf", "pq", "index"),
)
def q_ann_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC search over the PERSISTED index, coarse quantizer TRAINED
    with ANN_TRAIN_ROUNDS Lloyd rounds (VERDICT r11 #3): build_ann_index's
    four relations are committed through the snapshot sink and read back
    before scoring — no raw corpus vector is scanned at query time. The
    oracle unrolls the same fixed training rounds in SQL, so the driver
    hash-verifies the trained index end to end."""
    import hashlib

    emb = read_table(spark, sf_dir, "embeddings")
    suffix = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"/tmp/csdp_ann_index/{suffix}"
    write_ann_index(build_ann_index(emb), root)
    for name in (*INDEX_TABLES, META_TABLE):  # bound /tmp growth per run
        manifest.vacuum(f"{root}/{name}", keep_last=1, retention_seconds=0)
    index = read_ann_index(spark, root)
    return ann_index_topk(index, emb.filter(F.col("vec_id") < N_QUERIES))


def _builder_fingerprint() -> str:
    """Content hash of the modules whose code determines what
    build_ann_index produces for a given input: a code change (new
    training rounds, a different PQ layout) must invalidate the serve
    cache even when the source fixture is byte-identical — otherwise a
    driver run would compare a stale index against the NEW composed
    oracle (code review r13)."""
    import hashlib

    from clinical_search_data_pipeline_spark.operators import (
        clustering,
        fragments,
        similarity,
    )

    h = hashlib.md5()
    for mod in (similarity, clustering, fragments):
        with open(mod.__file__, "rb") as f:
            h.update(f.read())
    with open(__file__, "rb") as f:
        h.update(f.read())
    return h.hexdigest()[:10]


def _source_fingerprint(sf_dir: str) -> str:
    """Cache key of the serve-path index: source content (file names +
    sizes + mtimes — a regenerated fixture can never be served a stale
    index) x builder code (`_builder_fingerprint`). Prefixed with a
    per-SOURCE tag so different sources' caches coexist and reclamation
    never touches another source's live index."""
    import hashlib

    src = os.path.join(sf_dir, "embeddings.parquet")
    parts = []
    if os.path.isdir(src):
        for root_, _dirs, names in sorted(os.walk(src)):
            for name in sorted(names):
                full = os.path.join(root_, name)
                st = os.stat(full)
                parts.append(f"{os.path.relpath(full, src)}:{st.st_size}:{st.st_mtime_ns}")
    else:
        st = os.stat(src)
        parts.append(f"{src}:{st.st_size}:{st.st_mtime_ns}")
    src_tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    content = hashlib.md5(
        "|".join([sf_dir, _builder_fingerprint(), *parts]).encode()
    ).hexdigest()[:12]
    return f"{src_tag}-{content}"


def serve_index(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Build-IF-ABSENT persisted index for the serving path (VERDICT r12
    #6): the first caller per (source content, builder code) trains,
    commits, and reads back; every later caller — the probe/rerank
    queries below, and every bench iteration — resolves the committed
    artifacts and pays probe cost only. That is the FAISS deployment
    split the end-to-end `q_ann_index_topk` deliberately does NOT make
    (it rebuilds every run so the driver hash-verifies training itself).
    The cache key fingerprints the source AND the builder modules, so a
    regenerated fixture or a code change rebuilds instead of serving
    stale artifacts; concurrent first-callers for the same source race
    safely through the snapshot sink (both publish, the pin resolves one
    complete set). Reclamation only ever removes SUPERSEDED entries of
    the same source (same src_tag, different content hash) — other
    sources' live indexes are never touched (code review r13)."""
    import shutil

    cache_root = "/tmp/csdp_ann_index_serve"
    fp = _source_fingerprint(sf_dir)
    root = f"{cache_root}/{fp}"
    try:
        return read_ann_index(spark, root)
    except FileNotFoundError:
        pass
    # reclaim only THIS source's superseded entries before building
    src_tag = fp.split("-", 1)[0]
    if os.path.isdir(cache_root):
        for name in os.listdir(cache_root):
            if name.startswith(f"{src_tag}-") and name != fp:
                shutil.rmtree(os.path.join(cache_root, name), ignore_errors=True)
    emb = read_table(spark, sf_dir, "embeddings")
    write_ann_index(build_ann_index(emb), root)
    return read_ann_index(spark, root)


def _q_ann_index_probe_oracle() -> str:
    """Trained-index IVFADC at nprobe=2: query cells are the TWO best
    trained centroids (assign_r{r}'s rank — the same max-cosine /
    lowest-cell rule ann_index_topk's window applies), candidates the
    union of both probed cells, scoring the trained-codebook ADC chain."""
    from clinical_search_data_pipeline_spark.operators.clustering import (
        duck_lloyd_ctes,
    )
    from clinical_search_data_pipeline_spark.operators.similarity import (
        IVF_NPROBE,
        _DUCK_PQ_TRAINED_CTE,
    )

    r = ANN_TRAIN_ROUNDS
    return f"""
WITH {_DUCK_BASE_CTE},
{_DUCK_PQ_TRAINED_CTE.lstrip()},
{duck_lloyd_ctes(r)},
q AS (SELECT vec_id AS query_id, cell AS qcell
      FROM assign_r{r} WHERE vec_id < {N_QUERIES} AND rn <= {IVF_NPROBE}),
ivf_adc AS (
  SELECT q.query_id, c.vec_id, c.cell, sum(t.d) AS adist
  FROM cells_r{r} c
  JOIN q ON c.cell = q.qcell AND c.vec_id <> q.query_id
  JOIN codes1 s ON s.vec_id = c.vec_id
  JOIN dt1 t ON t.query_id = q.query_id AND t.m = s.m AND t.code = s.code
  GROUP BY 1, 2, 3
)
SELECT query_id, vec_id AS neighbor_id, cell,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY adist ASC, vec_id ASC) AS rank,
       round(CAST(adist AS DOUBLE), 6) AS adist
FROM ivf_adc QUALIFY rank <= {TOP_K}
"""


def _q_ann_index_rerank_oracle() -> str:
    """Trained-index IVFADC (nprobe=2) pool refined by exact cosine —
    the composed FAISS IndexRefineFlat oracle: the ADC stage is the probe
    oracle's chain widened to the RERANK_POOL, the refine stage the exact
    order-pinned dot q_ann_rerank already hash-verifies."""
    from clinical_search_data_pipeline_spark.operators.clustering import (
        duck_lloyd_ctes,
    )
    from clinical_search_data_pipeline_spark.operators.fragments import (
        _duck_dot,
    )
    from clinical_search_data_pipeline_spark.operators.similarity import (
        IVF_NPROBE,
        RERANK_POOL,
        _DUCK_PQ_TRAINED_CTE,
    )

    r = ANN_TRAIN_ROUNDS
    return f"""
WITH {_DUCK_BASE_CTE},
{_DUCK_PQ_TRAINED_CTE.lstrip()},
{duck_lloyd_ctes(r)},
q AS (SELECT vec_id AS query_id, cell AS qcell
      FROM assign_r{r} WHERE vec_id < {N_QUERIES} AND rn <= {IVF_NPROBE}),
ivf_adc AS (
  SELECT q.query_id, c.vec_id, sum(t.d) AS adist
  FROM cells_r{r} c
  JOIN q ON c.cell = q.qcell AND c.vec_id <> q.query_id
  JOIN codes1 s ON s.vec_id = c.vec_id
  JOIN dt1 t ON t.query_id = q.query_id AND t.m = s.m AND t.code = s.code
  GROUP BY 1, 2
),
pool AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adist ASC, vec_id ASC) AS rn
    FROM ivf_adc
  ) WHERE rn <= {RERANK_POOL}
),
qv AS (
  SELECT vec_id AS query_id, v AS qv, norm AS qnorm FROM n
  WHERE vec_id < {N_QUERIES}
),
rescored AS (
  SELECT p.query_id, p.vec_id AS neighbor_id,
         {_duck_dot('n.v', 'qv.qv')} / (n.norm * qv.qnorm) AS raw
  FROM pool p
  JOIN n ON n.vec_id = p.vec_id
  JOIN qv ON qv.query_id = p.query_id
)
SELECT query_id, neighbor_id,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY raw DESC, neighbor_id ASC) AS rank,
       round(raw, 4) AS score
FROM rescored QUALIFY rank <= {TOP_K}
"""


@register(
    "q_ann_index_probe",
    oracle=_q_ann_index_probe_oracle(),
    tags=("similarity", "northstar", "ivf", "pq", "index", "serve"),
)
def q_ann_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe-ONLY search of the persisted trained index at nprobe=2
    (VERDICT r12 #6): `serve_index` resolves the committed artifacts —
    building them only if this source has never been indexed — so the
    timed work is what a deployment's query path actually pays: broadcast
    centroids/codebook/distance tables against the cell-pruned
    cells ⋈ codes equi-join. The end-to-end build+train+search twin is
    `q_ann_index_topk`; this row is the serving latency the bench tracks
    round over round."""
    index = serve_index(spark, sf_dir)
    emb = read_table(spark, sf_dir, "embeddings")
    from clinical_search_data_pipeline_spark.operators.similarity import (
        IVF_NPROBE,
    )

    return ann_index_topk(
        index, emb.filter(F.col("vec_id") < N_QUERIES), nprobe=IVF_NPROBE
    )


@register(
    "q_ann_index_rerank",
    oracle=_q_ann_index_rerank_oracle(),
    tags=("similarity", "northstar", "ivf", "pq", "index", "rerank", "serve"),
)
def q_ann_index_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FAISS refine over the persisted index (VERDICT r12 #4): the
    trained-index ADC stage proposes RERANK_POOL candidates per query at
    nprobe=2, then exact cosine re-scores ONLY those (candidate pairs
    broadcast into the full-precision join — no corpus scan) and cuts to
    the final top-k. Recall@k is provably >= the probe-only top-k at the
    same nprobe (pool-superset argument, see ann_index_topk), measured in
    ANN_RECALL.md's ivfadc_index_rerank_p2 row against ivfpq_p2."""
    from clinical_search_data_pipeline_spark.operators.similarity import (
        IVF_NPROBE,
        RERANK_POOL,
    )

    index = serve_index(spark, sf_dir)
    emb = read_table(spark, sf_dir, "embeddings")
    return ann_index_topk(
        index,
        emb.filter(F.col("vec_id") < N_QUERIES),
        nprobe=IVF_NPROBE,
        rerank=RERANK_POOL,
        vectors=emb,
    )

"""Invariant tests for the pipeline compositions and approximate operators
(complementing their oracles with cross-operator properties the driver's
per-query check cannot see)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clinical_search_data_pipeline_spark.caching import release_caches
from clinical_search_data_pipeline_spark.operators.dedup import jaccard_pairs
from clinical_search_data_pipeline_spark.operators.pipeline import corpus_filter
from clinical_search_data_pipeline_spark.operators.similarity import (
    ann_ivf_multiprobe_topk,
    ann_ivf_topk,
    embedding_neardup_lsh,
    embedding_neardup_pairs,
)
from clinical_search_data_pipeline_spark.operators.splits import sequence_pack
from clinical_search_data_pipeline_spark.registry import all_specs
from clinical_search_data_pipeline_spark.sources.readers import read_table
from tests.conftest import SF_CORRECTNESS, SF_SMOKE


def test_lsh_neardup_is_subset_of_exact(spark):
    """Candidates are exact-rescored, so every LSH pair must also be an
    exact pair (identical threshold) — LSH only loses recall, never adds
    false positives."""
    emb = read_table(spark, SF_CORRECTNESS, "embeddings")
    exact = {(r.vec_a, r.vec_b) for r in embedding_neardup_pairs(emb).collect()}
    lsh = {(r.vec_a, r.vec_b) for r in embedding_neardup_lsh(emb).collect()}
    assert lsh <= exact
    release_caches()


def test_ivf_multiprobe_recall_not_worse(spark):
    """nprobe=2 must retrieve, per query, a superset of the candidate set —
    so summed retrieved-neighbor cosine (recall proxy) can only improve."""
    emb = read_table(spark, SF_CORRECTNESS, "embeddings")
    one = {(r.query_id, r.neighbor_id) for r in ann_ivf_topk(emb).collect()}
    two = {(r.query_id, r.neighbor_id) for r in ann_ivf_multiprobe_topk(emb).collect()}
    # top-k per query from a superset of candidates: at least as many rows,
    # and every query present in nprobe=1 is present in nprobe=2
    assert {q for q, _ in one} <= {q for q, _ in two}
    assert len(two) >= len(one)
    release_caches()


def test_doc_dedup_apply_drops_exactly_nonsurvivors(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    n_docs = docs.count()
    pairs = jaccard_pairs(docs).select("doc_a", "doc_b")
    n_members = (
        pairs.select(F.col("doc_a").alias("d"))
        .unionByName(pairs.select(F.col("doc_b").alias("d")))
        .distinct()
        .count()
    )
    kept = all_specs()["q_doc_dedup_apply"].builder(spark, SF_SMOKE)
    rows = kept.collect()
    # every doc_id appears at most once; statuses are only the two allowed
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))
    assert {r.status for r in rows} <= {"unique", "dup_survivor"}
    n_survivors = sum(1 for r in rows if r.status == "dup_survivor")
    # kept = all docs - cluster members + one survivor per cluster
    assert len(rows) == n_docs - n_members + n_survivors
    release_caches()


def test_corpus_filter_reasons_consistent(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    rows = corpus_filter(docs).collect()
    assert rows
    for r in rows:
        if r.reason == "too_short":
            assert r.n_tokens < 20
        elif r.reason == "low_quality":
            assert r.n_tokens >= 20 and r.quality_score < 0.7
        elif r.reason == "repetitive_bigrams":
            assert r.quality_score >= 0.7 and r.dup_bigram_frac > 0.08
        else:
            assert r.reason == "keep" and r.keep
    assert any(r.keep for r in rows) and any(not r.keep for r in rows)


def test_sequence_pack_is_contiguous_per_group(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    rows = sequence_pack(docs).collect()
    by_group: dict[str, list] = {}
    for r in rows:
        by_group.setdefault(r.source, []).append(r)
    for grp in by_group.values():
        grp.sort(key=lambda r: r.doc_id)
        pos = 0
        for r in grp:
            assert r.start_pos == pos, "token stream must be gap-free"
            assert r.chunk_start == pos // 4096
            assert r.chunk_end == (pos + r.n_tokens - 1) // 4096
            assert r.chunk_start <= r.chunk_end
            pos += r.n_tokens


def test_two_phase_components_fewer_rounds_on_chain(spark):
    """Min-label propagation converges in O(diameter) rounds — a 33-node
    chain needs ~31 — while alternating large-star/small-star flattens trees
    geometrically (VERDICT r04 #5). Both must yield the identical fixpoint;
    two-phase must do it in a fraction of the rounds."""
    from clinical_search_data_pipeline_spark.operators.components import (
        connected_components,
    )

    n = 33
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["vec_a", "vec_b"]
    )
    lp_stats, tp_stats = {}, {}
    lp = connected_components(
        chain, max_iter=64, algorithm="label-prop", _stats=lp_stats
    ).collect()
    tp = connected_components(
        chain, max_iter=64, algorithm="two-phase", _stats=tp_stats
    ).collect()
    want = {i: 0 for i in range(n)}  # one chain -> everything labels to 0
    assert {r.node: r.component for r in lp} == want
    assert {r.node: r.component for r in tp} == want
    assert lp_stats["rounds"] >= n - 3  # label-prop pays the diameter
    assert tp_stats["rounds"] <= 8, tp_stats  # two-phase collapses it
    # cliquish graph (the near-dup shape): label-prop stays the cheap path
    clique_edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    two_cliques = clique_edges + [(a + 10, b + 10) for a, b in clique_edges]
    cl = spark.createDataFrame(two_cliques, ["vec_a", "vec_b"])
    got = connected_components(cl, algorithm="two-phase").collect()
    assert {r.node: r.component for r in got} == {
        **{i: 0 for i in range(5)},
        **{i + 10: 10 for i in range(5)},
    }


def test_components_auto_single_task_matches_loop(spark):
    """The size-capped `auto` fast path (single-task union-find) must
    compute the IDENTICAL (node -> min-reachable-id) fixpoint as the
    distributed two-phase loop, on random graphs, both below the cap
    (fast path taken) and when forced over it (loop taken); the `_stats`
    record says which path executed."""
    import random

    from clinical_search_data_pipeline_spark.operators.components import (
        connected_components,
    )

    rng = random.Random(13)
    for trial in range(3):
        n = rng.randint(4, 20)
        edges = sorted(
            {
                (a, b)
                for _ in range(rng.randint(3, 30))
                for a, b in [sorted(rng.sample(range(n), 2))]
            }
        )
        df = spark.createDataFrame(edges, ["vec_a", "vec_b"])
        want = {
            r.node: r.component
            for r in connected_components(
                df, max_iter=64, algorithm="two-phase"
            ).collect()
        }
        fast_stats: dict = {}
        fast = {
            r.node: r.component
            for r in connected_components(df, _stats=fast_stats).collect()
        }
        assert fast_stats.get("algorithm") == "single-task"
        assert fast == want, f"fast path wrong on {edges}"
        # cap forced BELOW the edge count -> auto must fall back to the loop
        loop_stats: dict = {}
        loop = {
            r.node: r.component
            for r in connected_components(
                df, max_iter=64, _stats=loop_stats, small_graph_max_edges=0
            ).collect()
        }
        assert loop_stats.get("algorithm") == "two-phase"
        assert loop == want


def test_components_algorithms_agree_on_random_graphs(spark):
    """Property: on arbitrary graphs, label propagation and the two-phase
    large/small-star variant compute the IDENTICAL (node -> min-reachable-id)
    fixpoint — checked against a driver-side union-find ground truth."""
    import random

    from clinical_search_data_pipeline_spark.operators.components import (
        connected_components,
    )

    rng = random.Random(7)
    for _ in range(4):
        n = rng.randint(4, 18)
        edges = sorted(
            {
                (a, b)
                for _ in range(rng.randint(3, 25))
                for a, b in [sorted(rng.sample(range(n), 2))]
            }
        )
        # ground truth union-find
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        touched = {v for e in edges for v in e}
        want = {}
        for v in touched:
            root = find(v)
            want[v] = min(u for u in touched if find(u) == root)

        df = spark.createDataFrame(edges, ["vec_a", "vec_b"])
        lp = {
            r.node: r.component
            for r in connected_components(df, max_iter=64, algorithm="label-prop").collect()
        }
        tp = {
            r.node: r.component
            for r in connected_components(df, max_iter=64, algorithm="two-phase").collect()
        }
        assert lp == want, f"label-prop wrong on {edges}"
        assert tp == want, f"two-phase wrong on {edges}"


def test_components_restores_shuffle_conf(spark):
    """connected_components overrides spark.sql.shuffle.partitions for its
    iteration loop; the override must be restored on BOTH the set and the
    unset prior state (ADVICE r02/r03: a leaked graph-sized width would
    apply session-wide to every later query)."""
    from clinical_search_data_pipeline_spark.operators.components import (
        neardup_clusters,
    )

    emb = read_table(spark, SF_SMOKE, "embeddings")
    key = "spark.sql.shuffle.partitions"

    # case 1: conf set beforehand -> restored to that exact value
    spark.conf.set(key, "4")
    neardup_clusters(emb).count()
    assert spark.conf.get(key) == "4"

    # case 2: conf unset beforehand -> unset again afterwards (get falls
    # back to the cluster default, and an explicit get-with-None is None)
    spark.conf.unset(key)
    try:
        neardup_clusters(emb).count()
        assert spark.conf.get(key, None) is None
    finally:
        spark.conf.set(key, "4")


def test_run_to_memory_restores_shuffle_conf(spark):
    """Same contract for the streaming runner's per-query override."""
    from clinical_search_data_pipeline_spark.streaming.runner import run_to_memory
    from clinical_search_data_pipeline_spark.streaming.stream_queries import (
        events_stream,
    )

    key = "spark.sql.shuffle.partitions"
    spark.conf.set(key, "4")
    agg = events_stream(spark, SF_SMOKE).groupBy("event_type").count()
    run_to_memory(agg, output_mode="complete", shuffle_partitions=2)
    assert spark.conf.get(key) == "4"

    # unset-prior case (ADVICE r04): the runner must unset, not pin, a conf
    # that was never set — mirroring the components contract above.
    spark.conf.unset(key)
    try:
        agg2 = events_stream(spark, SF_SMOKE).groupBy("event_type").count()
        run_to_memory(agg2, output_mode="complete", shuffle_partitions=2)
        assert spark.conf.get(key, None) is None
    finally:
        spark.conf.set(key, "4")


def test_winnow_guarantee_and_edit_locality(spark):
    """Winnowing contract (Schleimer et al. 2003): (a) identical docs yield
    identical fingerprint sets, so every fingerprint of a duplicated doc is
    shared; (b) a single-token edit disturbs only the O(k + w) windows it
    overlaps, so a long doc keeps most of its fingerprints; (c) any shared
    token run of length >= k + w - 1 yields >= 1 shared fingerprint."""
    from clinical_search_data_pipeline_spark.operators.textanalysis import (
        WINNOW_K,
        WINNOW_W,
        winnow_fingerprints,
    )

    base = " ".join(f"tok{i % 97}x{i % 13}" for i in range(300))
    edited = base.split(" ")
    edited[150] = "EDITED"
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, " ".join(edited))], ["doc_id", "text"]
    )
    fps = {
        doc_id: {r.fp for r in rows}
        for doc_id, rows in (
            (d, winnow_fingerprints(docs, WINNOW_K, WINNOW_W)
                .filter(f"doc_id = {d}").collect())
            for d in (1, 2, 3)
        )
    }
    # (a) exact duplicate -> identical fingerprint set
    assert fps[1] == fps[2] and fps[1]
    # (b) one edited token out of 300 -> the vast majority of fingerprints
    # survive (the edit can disturb at most k + w - 1 = 8 window minima per
    # side; be loose: require > 2/3 overlap)
    shared = len(fps[1] & fps[3])
    assert shared / len(fps[1]) > 2 / 3, (shared, len(fps[1]))
    # (c) the two distinct docs still share a long common run -> candidate
    # pair guarantee holds
    assert shared >= 1


def test_word_entropy_hand_cases(spark):
    """Uniform distribution -> log2(k) bits; single repeated word -> 0."""
    from clinical_search_data_pipeline_spark.operators.textanalysis import (
        word_entropy,
    )

    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "x x x x"), (2, "a a b b")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in word_entropy(docs).collect()}
    assert got[0]["entropy"] == 2.0 and got[0]["n_unique"] == 4
    assert got[1]["entropy"] == 0.0 and got[1]["n_unique"] == 1
    assert got[2]["entropy"] == 1.0 and got[2]["n_tokens"] == 4


def test_ewma_loop_matches_pandas_production_path():
    """The oracle-exact recurrence loop must equal pandas'
    ewm(alpha, adjust=False).mean() — the C-accelerated path a production
    run swaps in — to 1e-12."""
    import numpy as np
    import pandas as pd

    from clinical_search_data_pipeline_spark.operators.smoothing import (
        EWMA_ALPHA,
        _ewma_series,
    )

    rng = np.random.default_rng(7)
    xs = pd.Series(rng.normal(50, 20, size=500))
    ours = np.array(_ewma_series(xs, EWMA_ALPHA))
    ref = xs.ewm(alpha=EWMA_ALPHA, adjust=False).mean().to_numpy()
    assert np.max(np.abs(ours - ref)) < 1e-12


def test_ewma_hand_case(spark):
    """alpha=0.5 on [1, 3, 5] -> [1, 2, 3.5]; order comes from ts."""
    from clinical_search_data_pipeline_spark.operators.smoothing import ewma_per_user

    df = spark.createDataFrame(
        [(10, 1, 100, 1.0), (10, 2, 200, 3.0), (10, 3, 300, 5.0)],
        "user_id long, event_id long, ts_sec long, value double",
    )
    got = {r["rn"]: r["ewma"] for r in ewma_per_user(df, alpha=0.5).collect()}
    assert got == {1: 1.0, 2: 2.0, 3: 3.5}


def test_ewma_chunked_matches_unchunked_with_hot_key(spark):
    """Skew hardening (VERDICT r05 #2): the chunked EWMA must be
    output-identical to the unchunked path on the fixture PLUS one synthetic
    hot key 100x the median series length — while actually splitting that
    key's series across many bounded chunks (no task holds the whole
    series)."""
    from pyspark.sql import functions as F

    from clinical_search_data_pipeline_spark.caching import release_caches
    from clinical_search_data_pipeline_spark.operators.smoothing import (
        ewma_per_user,
        ewma_per_user_chunked,
    )
    from clinical_search_data_pipeline_spark.sources.readers import load_events

    events = load_events(spark, "/root/testdata/sf0.01").select(
        "user_id", "event_id", "ts_sec", "value"
    )
    lens = (
        events.filter("value IS NOT NULL")
        .groupBy("user_id")
        .count()
        .approxQuantile("count", [0.5], 0.0)
    )
    median_len = int(lens[0])
    hot_n = 100 * median_len
    hot = spark.range(hot_n).select(
        F.lit(999_999_999).alias("user_id"),
        (F.lit(10_000_000) + F.col("id")).alias("event_id"),
        # one event per 97 s -> the series spans hot_n*97/chunk_sec chunks
        (F.col("id") * 97).alias("ts_sec"),
        (F.pmod(F.col("id") * 37, F.lit(1000)).cast("double") / 10).alias("value"),
    )
    both = events.unionByName(hot)

    chunk_sec = 3600
    try:
        base = {
            (r["user_id"], r["event_id"]): (r["rn"], r["ewma"])
            for r in ewma_per_user(both).collect()
        }
        got = {
            (r["user_id"], r["event_id"]): (r["rn"], r["ewma"])
            for r in ewma_per_user_chunked(both, chunk_sec=chunk_sec).collect()
        }
    finally:
        release_caches()
    assert got == base  # byte-identical at the output contract (6-dp round)

    n_hot_chunks = hot_n * 97 // chunk_sec
    assert n_hot_chunks > 50  # the hot series genuinely spans many chunks
    # and no chunk of the hot key exceeds the bounded window size
    max_chunk = (
        both.filter("user_id = 999999999")
        .groupBy((F.col("ts_sec") / chunk_sec).cast("long"))
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert max_chunk <= chunk_sec // 97 + 1


def test_ewma_auto_chunk_width_does_not_shatter_sparse_series(spark):
    """Auto-derived chunk width (chunk_sec=None) must keep group count in
    the same order as the user count on a sparse fixture — the 6h fixed
    width produced near-singleton groups (one Arrow round-trip per ROW);
    with ~target-row chunks aimed at the hottest key, a fixture whose
    hottest user is far below target collapses to O(1) chunks per user."""
    from pyspark.sql import functions as F

    from clinical_search_data_pipeline_spark.operators.smoothing import (
        ewma_per_user,
        ewma_per_user_chunked,
    )
    from clinical_search_data_pipeline_spark.sources.readers import load_events

    import math

    from clinical_search_data_pipeline_spark.operators.smoothing import (
        EWMA_TARGET_CHUNK_ROWS,
    )

    ev = load_events(spark, SF_SMOKE)
    sub = ev.filter("value IS NOT NULL")
    stats = (
        sub.groupBy("user_id")
        .agg(F.count("*").alias("c"), F.min("ts_sec").alias("lo"),
             F.max("ts_sec").alias("hi"))
        .agg(F.max("c").alias("m"), (F.max("hi") - F.min("lo") + 1).alias("span"),
             F.count("*").alias("n_users"))
        .collect()[0]
    )
    chunk_sec = max(1, math.ceil(EWMA_TARGET_CHUNK_ROWS * stats.span / stats.m))
    n_groups = (
        sub.select("user_id", (F.col("ts_sec") / chunk_sec).cast("long").alias("ch"))
        .distinct()
        .count()
    )
    # chunk boundaries are absolute (ts // chunk_sec): with width >= span a
    # user splits across at most 2 buckets -> O(users) groups, not O(rows)
    assert chunk_sec >= stats.span  # hottest fixture user is far below target
    assert n_groups <= 2 * stats.n_users
    # and the output still matches the unchunked path exactly
    a = {
        (r.user_id, r.event_id): (r.rn, r.ewma)
        for r in ewma_per_user(ev).collect()
    }
    b = {
        (r.user_id, r.event_id): (r.rn, r.ewma)
        for r in ewma_per_user_chunked(ev).collect()
    }
    assert a == b


def test_ewma_chunked_equality_across_widths(spark):
    """Output must be invariant to chunk width — including chunk_sec=1
    (one row per chunk, maximal carry-chain depth through the stitch) and
    a width so large the whole series is one chunk (the stitch degenerates
    to the seeded path)."""
    from pyspark.sql import functions as F

    from clinical_search_data_pipeline_spark.caching import release_caches
    from clinical_search_data_pipeline_spark.operators.smoothing import (
        ewma_per_user,
        ewma_per_user_chunked,
    )

    rows = spark.range(300).select(
        F.pmod(F.col("id"), F.lit(7)).alias("user_id"),
        F.col("id").alias("event_id"),
        (F.col("id") * 13).alias("ts_sec"),
        F.when(F.pmod("id", F.lit(11)) == 0, None)
        .otherwise(F.pmod(F.col("id") * 31, F.lit(997)).cast("double") / 7)
        .alias("value"),
    )
    try:
        base = {
            (r.user_id, r.event_id): (r.rn, r.ewma)
            for r in ewma_per_user(rows).collect()
        }
        for width in (1, 13, 97, 10_000_000):
            got = {
                (r.user_id, r.event_id): (r.rn, r.ewma)
                for r in ewma_per_user_chunked(rows, chunk_sec=width).collect()
            }
            assert got == base, f"divergence at chunk_sec={width}"
    finally:
        release_caches()


def test_cluster_safe_split_never_straddles_neardup_pairs(spark):
    """The leak-free property, end-to-end: no near-dup pair may land on
    opposite sides of the split, every component member shares its
    representative's split, and untouched docs keep plain hash_split
    assignment (so the cluster-aware split is a strict refinement, not a
    different scheme)."""
    from clinical_search_data_pipeline_spark.operators.dedup import jaccard_pairs
    from clinical_search_data_pipeline_spark.operators.splits import hash_split
    from clinical_search_data_pipeline_spark.registry import all_specs
    from clinical_search_data_pipeline_spark.sources.readers import read_table
    from tests.conftest import SF_SMOKE

    assigned = {
        r.doc_id: (r.cluster_rep, r.split)
        for r in all_specs()["q_cluster_safe_split"]
        .builder(spark, SF_SMOKE)
        .collect()
    }
    docs = read_table(spark, SF_SMOKE, "documents")
    assert set(assigned) == {r.doc_id for r in docs.select("doc_id").collect()}

    pairs = [
        (r.doc_a, r.doc_b)
        for r in jaccard_pairs(docs).select("doc_a", "doc_b").collect()
    ]
    assert pairs, "fixture produced no near-dup pairs"
    for a, b in pairs:
        assert assigned[a][1] == assigned[b][1], (a, b)
        assert assigned[a][0] == assigned[b][0], (a, b)

    # untouched docs: split == plain hash_split of their own doc_id
    touched = {d for p in pairs for d in p}
    plain = {
        r.doc_id: r.split
        for r in hash_split(
            docs.select("doc_id", "lang"), "doc_id"
        ).collect()
    }
    for d, (rep, split) in assigned.items():
        if d not in touched:
            assert rep == d and split == plain[d]


def test_cluster_safe_split_degrades_to_hash_split_without_pairs(spark):
    """An entirely-unique corpus (empty pair relation) must reduce to the
    plain per-doc hash split — the components machinery cannot choke on
    zero edges."""
    from pyspark.sql.types import LongType, StructField, StructType

    from clinical_search_data_pipeline_spark.operators.splits import (
        cluster_safe_split,
        hash_split,
    )
    from clinical_search_data_pipeline_spark.sources.readers import read_table
    from tests.conftest import SF_SMOKE

    docs = read_table(spark, SF_SMOKE, "documents").limit(20)
    empty = spark.createDataFrame(
        [],
        StructType(
            [StructField("doc_a", LongType()), StructField("doc_b", LongType())]
        ),
    )
    got = {
        r.doc_id: (r.cluster_rep, r.split)
        for r in cluster_safe_split(docs, empty).collect()
    }
    plain = {
        r.doc_id: r.split
        for r in hash_split(docs.select("doc_id"), "doc_id").collect()
    }
    assert len(got) == 20
    for d, (rep, split) in got.items():
        assert rep == d and split == plain[d]

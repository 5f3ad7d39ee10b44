"""Scale-posture bench (VERDICT r04 #2): measure the heavy dedup/ANN family
at 1x and FACTORx input and record whether runtime grows ~linearly.

Builds a disjoint self-union corpus (testing.make_scaled_corpus: replicas
cannot match each other, so DOCUMENT-family output is exactly linear in the
factor; the EMBEDDING family's pair output is superlinear by data geometry —
the fixture's cosine tail crosses the 0.45 threshold between any two
decorrelated replicas — so output rows are recorded alongside times to keep
engine cost and data growth separable).

Writes ONE JSON line + ./BENCH_scale.json:
  {"metric": "scale_growth", "factor": N, "queries": {name: {base_sec,
   scaled_sec, ratio, base_rows, scaled_rows, scaled_max_stage_tasks}}, ...}

Env: SPARK_GRAFT_SCALE_SRC (default /root/testdata/sf0.1),
     SPARK_GRAFT_SCALE_FACTOR (default 10), SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

from clinical_search_data_pipeline_spark.caching import release_caches
from clinical_search_data_pipeline_spark.registry import all_specs
from clinical_search_data_pipeline_spark.session import get_spark
from clinical_search_data_pipeline_spark.testing import env_fingerprint, make_scaled_corpus

HEAVY_FAMILY = (
    "q_jaccard_pairs",
    "q_minhash_lsh_pairs",
    "q_doc_dedup_apply",
    "q_neardup_clusters",
    "q_embedding_neardup_lsh",
    "q_ann_lsh_topk",
    "q_ann_lsh_multiprobe",
    "q_ann_ivf_topk",
    "q_ann_ivf_multiprobe",
    "q_passage_dedup",
    "q_train_order",
    "q_winnow_pairs",
    # Not heavy at sf0.1 but carrying explicit scale-posture claims the
    # record should evidence: token_budget's pre-shuffle budget pruning
    # (fixed budget, 10x corpus -> near-budget-sized shuffle), kmeans'
    # (cell,dim)-keyed linear update, bpe's vocab-sized workspace (the 10x
    # corpus is per-copy ciphered, so the vocab grows 10x yet stays tiny).
    "q_token_budget",
    "q_kmeans_refine",
    "q_bpe_merge_step",
)
# Deliberately excluded: q_embedding_neardup (exact all-pairs — quadratic in
# corpus size BY CONTRACT) and q_semdedup (its quadratic term is bounded per
# cell, but the oracle pins K=8 deterministic centroids, so a 10x corpus at
# FIXED K grows every cell 10x and the within-cell pair join ~100x; in
# production K scales ~sqrt(N) with the corpus — see operators/curation.py).


def _timed_run(spark, spec, sf_dir: str, group: str) -> tuple[float, int, int]:
    """(wall sec for a full noop materialization, output rows, max tasks in
    any stage of the timed jobs). The noop write matches bench.py's
    methodology; the row count re-executes untimed."""
    sc = spark.sparkContext
    sc.setJobGroup(group, group, interruptOnCancel=False)
    try:
        t0 = time.perf_counter()
        df = spec.builder(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        sec = time.perf_counter() - t0
        tracker = sc.statusTracker()
        stage_ids: set[int] = set()
        for jid in tracker.getJobIdsForGroup(group):
            info = tracker.getJobInfo(jid)
            if info:
                stage_ids.update(info.stageIds)
        max_tasks = 0
        for sid in stage_ids:
            sinfo = tracker.getStageInfo(sid)
            if sinfo:
                max_tasks = max(max_tasks, sinfo.numTasks)
        rows = df.count()
    finally:
        sc.setJobGroup("", "")
        release_caches()
    return sec, rows, max_tasks


def main() -> None:
    src = os.environ.get("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")
    factor = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "10"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="csdp-scale-bench",
        master=f"local[{cpus}]",
        extra_confs={"spark.sql.shuffle.partitions": cpus},
    )
    spark.sparkContext.setLogLevel("ERROR")

    scaled_dir = make_scaled_corpus(
        spark, src, tempfile.mkdtemp(prefix="csdp_scale_"), factor
    )
    specs = all_specs()
    # one warm pass (JVM codegen, Arrow, file indexes) so base timings are
    # not first-touch timings
    _timed_run(spark, specs["q_jaccard_pairs"], src, "warmup")

    results: dict[str, dict] = {}
    for name in HEAVY_FAMILY:
        base_sec, base_rows, _ = _timed_run(spark, specs[name], src, f"{name}@base")
        scaled_sec, scaled_rows, max_tasks = _timed_run(
            spark, specs[name], scaled_dir, f"{name}@scaled"
        )
        results[name] = {
            "base_sec": round(base_sec, 3),
            "scaled_sec": round(scaled_sec, 3),
            "ratio": round(scaled_sec / max(base_sec, 1e-9), 2),
            "base_rows": base_rows,
            "scaled_rows": scaled_rows,
            "rows_ratio": round(scaled_rows / max(base_rows, 1), 2),
            "scaled_max_stage_tasks": max_tasks,
        }
        print(f"# {name}: {base_sec:.2f}s -> {scaled_sec:.2f}s "
              f"(x{results[name]['ratio']}, rows x{results[name]['rows_ratio']}, "
              f"max tasks {max_tasks})", file=sys.stderr)

    payload = {
        "metric": "scale_growth",
        "factor": factor,
        "src": src,
        "cpus": int(cpus),
        "env": env_fingerprint(src),
        "queries": results,
        "total_base_sec": round(sum(r["base_sec"] for r in results.values()), 3),
        "total_scaled_sec": round(sum(r["scaled_sec"] for r in results.values()), 3),
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_scale.json")
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=2, sort_keys=True)
    print(json.dumps(payload, separators=(",", ":")), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

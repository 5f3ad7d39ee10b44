"""Regenerate DEDUP_RECALL.md: candidate recall/cost of banded MinHash-LSH
vs the exact prefix-filtered Jaccard pairs (q_jaccard_pairs), per scale
factor — the text-dedup twin of ann_recall_report.py.

Usage:  python dedup_recall_report.py [> DEDUP_RECALL.md]

Everything is deterministic (md5-derived minhashes), so re-runs reproduce
the committed numbers bit-for-bit; value-level cross-engine parity of every
figure is driver-checked via q_minhash_recall's composed DuckDB oracle.
"""

from __future__ import annotations

import os
import time

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def main() -> None:
    from clinical_search_data_pipeline_spark.caching import release_caches
    from clinical_search_data_pipeline_spark.registry import all_specs
    from clinical_search_data_pipeline_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="dedup-recall-report",
        master=f"local[{cpus}]",
        extra_confs={"spark.sql.shuffle.partitions": cpus},
    )
    builder = all_specs()["q_minhash_recall"].builder

    print("# MinHash-LSH recall evidence (`q_minhash_recall`)")
    print()
    print("Candidate recall and verification cost of banded MinHash-LSH")
    print("against the exact prefix-filtered Jaccard pairs")
    print("(`q_jaccard_pairs`, threshold 0.8), per (bands, rows_per_band)")
    print("partition of the SAME 8-hash signature. `candidates` is the")
    print("cost proxy — pairs entering exact verification; `recall_bp` is")
    print("integer basis points of true pairs recovered. Regenerate with")
    print("`python dedup_recall_report.py`; every figure is hash-verified")
    print("against the composed DuckDB oracle (tests/test_minhash_recall.py")
    print("pins monotonicity and the (4,2) production default's floor).")
    print()
    for sf_dir in SF_DIRS:
        t0 = time.time()
        rows = builder(spark, sf_dir).collect()
        release_caches()
        dt = time.time() - t0
        print(f"## {sf_dir.rsplit('/', 1)[-1]}  ({dt:.1f}s)")
        print()
        print("| bands | rows/band | candidates | hits | possible | recall_bp | recall |")
        print("|---|---|---|---|---|---|---|")
        for r in rows:
            print(
                f"| {r.bands} | {r.rows_per_band} | {r.candidates} "
                f"| {r.hits} | {r.possible} | {r.recall_bp} "
                f"| {r.recall_bp / 100:.2f}% |"
            )
        print()
    print("**Reading the curve:** the configs nest (an r-row band agreeing")
    print("implies every finer contained band agrees), so candidates and")
    print("hits shrink monotonically as rows_per_band grows — the knob")
    print("trades verification volume against recall, and the measured")
    print("table shows both failure directions: at sf0.1 the")
    print("precision-leaning (2,4) starts losing true pairs (98.04%) while")
    print("single-row banding (8,1) floods verification with ~100x the")
    print("candidates for the same hits. The production default (4,2)")
    print("holds 100% recall at ~3 candidates per true pair at every SF —")
    print("exactly the sweet spot the 1-(1-j^r)^b curve predicts for the")
    print("J >= 0.8 threshold. At 100 TB the candidate count — not recall —")
    print("is the shuffle you provision for.")
    spark.stop()


if __name__ == "__main__":
    main()

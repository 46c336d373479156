"""Per-query cost anatomy for optimization round r11 (guide §1): for each
named bench key, split wall time into PLAN CONSTRUCTION (the queries() call
— py4j expression building + any eager driver probes/checkpoints inside)
vs EXECUTION (the noop write), and count the Spark jobs + stages each phase
launched (the barrier count the iterative operators pay). Warm numbers:
one untimed warm-up run per key first.

Usage: python tools/query_profile.py key1 key2 ...   (default: bench top-10)
Writes JSON lines to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parallel_map_reduce_word_counter_for_one_machine_spark import registry
from parallel_map_reduce_word_counter_for_one_machine_spark.session import get_spark

registry.load_all()

DEFAULT = [
    "dedup_clusters_lsh",
    "pagerank_parts",
    "dedup_containment",
    "knn_graph_ivf_listing",
    "dedup_minhash_lsh",
    "dedup_embedding_lsh",
    "decontaminate_bloom",
    "tokenizer_bpe_ids",
    "hybrid_retrieval",
    "dedup_spans_trim",
    "knn_graph",
]


def bench_fn(name):
    import bench

    return bench._bench_fn(name)


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="pmr-wc-query-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # warm-up
    registry.QUERIES["word_count"](spark, sf_dir).write.mode(
        "overwrite"
    ).format("noop").save()

    for name in names:
        fn = bench_fn(name)
        # warm-up run (codegen, page cache, any module-level builds)
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        rows = []
        for _ in range(3):
            # getJobIdsForGroup(None) is bounded by spark.ui.retainedJobs
            # (default 1000): job deltas undercount once a long profiling
            # session evicts old entries — restart the session or raise
            # retainedJobs when profiling job-heavy keys for long.
            j0 = len(sc.statusTracker().getJobIdsForGroup(None))
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            t1 = time.monotonic()
            j1 = len(sc.statusTracker().getJobIdsForGroup(None))
            df.write.mode("overwrite").format("noop").save()
            t2 = time.monotonic()
            j2 = len(sc.statusTracker().getJobIdsForGroup(None))
            rows.append(
                {
                    "construct_s": round(t1 - t0, 3),
                    "exec_s": round(t2 - t1, 3),
                    "construct_jobs": j1 - j0,
                    "exec_jobs": j2 - j1,
                }
            )
        best = min(rows, key=lambda r: r["construct_s"] + r["exec_s"])
        print(
            json.dumps({"key": name, "best": best, "runs": rows}),
            flush=True,
        )


if __name__ == "__main__":
    main()

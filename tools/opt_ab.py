"""Ad-hoc A/B timing for optimization round 11: time named bench keys
(same methodology as bench.run_one — construction inside the timer, noop
sink, min over N runs after one warm-up) plus optional row-count/hash
sanity so a rewrite can be checked for output identity in the same session.

Usage: python tools/opt_ab.py key [key ...] [--runs N] [--hash]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parallel_map_reduce_word_counter_for_one_machine_spark import registry
from parallel_map_reduce_word_counter_for_one_machine_spark.session import get_spark

registry.load_all()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--hash", action="store_true")
    args = ap.parse_args()

    import bench

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="pmr-wc-opt-ab")
    spark.sparkContext.setLogLevel("ERROR")
    registry.QUERIES["word_count"](spark, sf_dir).write.mode(
        "overwrite"
    ).format("noop").save()

    for name in args.keys:
        fn = bench._bench_fn(name)
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm
        times = []
        for _ in range(args.runs):
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            times.append(round(time.monotonic() - t0, 3))
        rec = {"key": name, "times": times, "min": min(times)}
        if args.hash:
            from pyspark.sql import functions as F

            df = fn(spark, sf_dir)
            cols = df.columns
            h = (
                df.select(
                    F.sha2(
                        F.concat_ws("\x01", *[F.col(c).cast("string") for c in cols]),
                        256,
                    ).alias("h")
                )
                .agg(F.count("*").alias("n"), F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("decimal(38,0)")).alias("s"))
                .collect()[0]
            )
            rec["rows"] = h.n
            rec["order_insensitive_hash"] = str(h.s)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()

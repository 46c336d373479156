"""MinHash-LSH operating-point sweep for the near-dup pair pipeline
(dedup_minhash_lsh): for each (n_hashes, n_bands, max_bucket) config,
measure candidate volume, verified-pair recall against the exact all-pairs
shingle-Jaccard >= 0.5 truth, and candidate precision (what fraction of
candidates survive the exact verify).

Results are recorded in SCALE.md §LSH; the production operating point
(128 hashes / 32 bands x 4 rows) is additionally pinned by
tests/test_dedup_similarity.py::test_lsh_recall_at_production_params.

Usage: python tools/lsh_sweep.py [sf_dir]   (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from parallel_map_reduce_word_counter_for_one_machine_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    _fan_out_small_input,
    _shingles,
    lsh_candidate_pairs,
    minhash_signatures,
)
from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
    load_table,
)

CONFIGS = [  # (n_hashes, n_bands, max_bucket); rows per band = nh // nb
    (16, 8, 64),
    (32, 16, 64),
    (64, 16, 256),
    (128, 32, 256),  # production operating point (32 bands x 4 rows)
]


def truth_pairs(spark, sf_dir):
    """Exact all-pairs shingle-Jaccard >= threshold (O(n²) — sweep scale
    only; this is precisely what LSH replaces in production)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = _fan_out_small_input(docs).select("doc_id", _shingles().alias("sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    jac = F.when(union > 0, inter.cast("double") / union)
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def sweep_one(spark, sf_dir, truth: set, n_hashes, n_bands, max_bucket):
    t0 = time.monotonic()
    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, n_hashes=n_hashes)
    cands = lsh_candidate_pairs(
        sigs, n_bands=n_bands, n_hashes=n_hashes, max_bucket=max_bucket
    )
    sh = _fan_out_small_input(docs).select("doc_id", _shingles().alias("sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    jac = F.when(union > 0, inter.cast("double") / union)
    verified = (
        cands.join(a, cands.doc_a == F.col("a.doc_id"))
        .join(b, cands.doc_b == F.col("b.doc_id"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    n_cand = cands.count()
    got = {(r.doc_a, r.doc_b) for r in verified.collect()}
    dt = time.monotonic() - t0
    recall = len(got & truth) / len(truth) if truth else 1.0
    precision = len(got) / n_cand if n_cand else 1.0
    return n_cand, len(got), recall, precision, dt


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.monotonic()
    truth = {(r.doc_a, r.doc_b) for r in truth_pairs(spark, sf_dir).collect()}
    print(f"# {sf_dir}: exact truth pairs (shingle-J>=0.5) = {len(truth)} "
          f"({time.monotonic()-t0:.0f}s)")
    print(f"{'nh':>4} {'nb':>3} {'r':>2} {'cap':>4} {'cands':>9} "
          f"{'verified':>8} {'recall':>7} {'cand_prec':>9} {'sec':>6}")
    for nh, nb, cap in CONFIGS:
        n_cand, n_ver, rec, prec, dt = sweep_one(spark, sf_dir, truth, nh, nb, cap)
        print(f"{nh:>4} {nb:>3} {nh//nb:>2} {cap:>4} {n_cand:>9} "
              f"{n_ver:>8} {rec:>7.4f} {prec:>9.4f} {dt:>6.1f}")


if __name__ == "__main__":
    main()

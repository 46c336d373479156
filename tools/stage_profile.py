"""Per-stage profile of the dedup_clusters_lsh pipeline at decade tiers
(VERDICT r07 item 1): locate WHICH stage goes superlinear at x100 before
touching the code. BULK_r7 measured the x100 tier at 24.2x the x10 wall
(gate <= 13x) with every closure check green — correctness holds, the
physics doesn't — and the whole pipeline was one black-box timing. This
tool re-runs the same tiers with a barrier + wall + REST shuffle/input
delta per stage, so the fix targets the measured stage instead of a
guess.

Stages mirror ``dedup.lsh_verified_pairs`` + ``graphdedup`` composition
(re-composed from the SAME primitives; diagnostic-only — the production
path stays the single composed function, and the end-to-end decades gate
in tools/bulk_rehearsal.py is the record):

  collapse   tokenize + md5 fingerprint groupBy -> collapsed reps
  vocab      the _small_vocab limit(64) probe
  candidates sigs + banding + bucket enumeration + neighbor recovery
  verify     exact-Jaccard verify join of candidates
  pairs      star ∪ verified, distinct
  closure    label propagation to fixpoint
  size       cluster_size window + final count

Run: python tools/stage_profile.py [copies ...]   (default: 30 300)
Writes PROFILE_clusters_r8.json (one entry per tier, fresh context per
tier like the decades harness).
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def profile_tier(spark, copies: int, parts: int) -> dict:
    from pyspark.sql import functions as F

    from tools.bulk_rehearsal import StageMeter, _build_clusters_fixture
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators import (
        dedup as D,
        graphdedup as G,
    )
    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        load_table,
    )

    fix = _build_clusters_fixture(spark, f"prof_{copies}", copies)
    meter = StageMeter(spark)
    out = {"copies": copies, "n_docs": 5000 * copies, "shuffle_partitions": parts,
           "stages": {}}

    def mark(name: str, thunk):
        t0 = time.monotonic()
        r = thunk()
        dt = round(time.monotonic() - t0, 2)
        io = meter.delta()
        out["stages"][name] = {"wall_sec": dt, "io": io}
        print(f"  {name:11s} {dt:9.2f}s shuffle "
              f"{io['shuffle_write_b'] / 1e6:10.1f} MB", flush=True)
        return r

    t_all = time.monotonic()
    docs = load_table(spark, fix, "documents")
    docs = D._fan_out_small_input(docs)
    toks = docs.select(
        "doc_id", F.array_sort(F.array_distinct(D._tokens())).alias("toks")
    ).filter(F.size("toks") > 0)
    groups = toks.groupBy(F.md5(F.array_join("toks", "\x01")).alias("fp")).agg(
        F.min("doc_id").alias("rep"),
        F.collect_list("doc_id").alias("members"),
        F.first("toks").alias("toks"),
    )
    groups = mark("collapse", lambda: groups.localCheckpoint())
    out["n_reps"] = groups.count()

    star = groups.select(
        F.col("rep").alias("doc_a"), F.explode("members").alias("doc_b")
    ).filter(F.col("doc_a") != F.col("doc_b"))
    reps = groups.select(
        F.col("rep").alias("doc_id"), "toks", F.size("toks").alias("n")
    )
    sigs = D._signatures_of_sets(
        reps.withColumnRenamed("toks", "elems"), D.CLUSTER_N_HASHES, carry=("n",)
    )
    small_vocab = mark("vocab", lambda: D._small_vocab(reps))
    out["bitmask_verify"] = small_vocab is not None

    cands = mark(
        "candidates",
        lambda: D.lsh_candidate_pairs(
            sigs,
            n_bands=D.CLUSTER_N_BANDS,
            n_hashes=D.CLUSTER_N_HASHES,
            max_bucket=D.CLUSTER_MAX_BUCKET,
            size_ratio=0.8,
            dedupe=small_vocab is None,
        ).localCheckpoint(),
    )
    out["n_candidates"] = cands.count()

    verified = mark(
        "verify",
        lambda: D._jaccard_verify(reps, cands, 0.8, small_vocab).localCheckpoint(),
    )
    out["n_verified"] = verified.count()

    pairs = mark(
        "pairs", lambda: star.union(verified).distinct().localCheckpoint()
    )
    out["n_pairs"] = pairs.count()

    labels = mark(
        "closure",
        lambda: G.label_propagation(G._sym_edges(pairs)).localCheckpoint(),
    )

    from pyspark.sql.window import Window

    cc = labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )
    final = mark(
        "size",
        lambda: cc.withColumn(
            "cluster_size", F.count("*").over(Window.partitionBy("cluster_id"))
        ).localCheckpoint(),
    )
    out["n_nodes"] = final.count()
    out["total_wall_sec"] = round(time.monotonic() - t_all, 2)
    out["driver_maxrss_mb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
    )
    return out


def main() -> int:
    from tools.bulk_rehearsal import _make_session

    tiers = [int(a) for a in sys.argv[1:]] or [30, 300]
    parts_for = {3: 32, 30: 64, 300: 512}
    from parallel_map_reduce_word_counter_for_one_machine_spark import registry

    registry.load_all()
    spark = _make_session()  # first launch pins the 32g heap
    results = {}
    for copies in tiers:
        parts = parts_for.get(copies, 512)
        spark.stop()
        spark = _make_session(shuffle_partitions=parts)
        print(f"tier {copies} copies ({5000 * copies} docs), "
              f"{parts} shuffle partitions", flush=True)
        results[f"x{copies}"] = profile_tier(spark, copies, parts)
    path = os.path.join(REPO, "PROFILE_clusters_r8.json")
    payload = json.load(open(path)) if os.path.exists(path) else {}
    payload[time.strftime("%Y-%m-%dT%H:%M:%S")] = results
    with open(path, "w") as fh:
        json.dump(payload, fh, indent=1)
    print("wrote PROFILE_clusters_r8.json", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Focused A/B of the x100 LSH verify stage (r08): same materialized
candidate relation, three join-strategy variants of _jaccard_verify,
each timed with REST stage deltas and its final plan recorded — to find
out WHY the stage runs ~27x for 10x data (broadcast at x10, shuffled at
x100) and which strategy restores linearity.

Run: python tools/verify_ab.py [copies]   (default 300)
Writes VERIFY_AB_r8.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    from pyspark.sql import functions as F

    from tools.bulk_rehearsal import (
        StageMeter,
        _build_clusters_fixture,
        _make_session,
    )
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators import (
        dedup as D,
    )
    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        load_table,
    )

    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    parts = {30: 64, 300: 512}.get(copies, 512)
    spark = _make_session(shuffle_partitions=parts)
    fix = _build_clusters_fixture(spark, f"vab_{copies}", copies)

    docs = D._fan_out_small_input(load_table(spark, fix, "documents"))
    toks = docs.select(
        "doc_id", F.array_sort(F.array_distinct(D._tokens())).alias("toks")
    ).filter(F.size("toks") > 0)
    groups = (
        toks.groupBy(F.md5(F.array_join("toks", "\x01")).alias("fp"))
        .agg(
            F.min("doc_id").alias("rep"),
            F.first("toks").alias("toks"),
        )
        .localCheckpoint()
    )
    reps = groups.select(
        F.col("rep").alias("doc_id"), "toks", F.size("toks").alias("n")
    )
    sigs = D._signatures_of_sets(
        reps.withColumnRenamed("toks", "elems"), D.CLUSTER_N_HASHES, carry=("n",)
    )
    t0 = time.monotonic()
    cands = D.lsh_candidate_pairs(
        sigs,
        n_bands=D.CLUSTER_N_BANDS,
        n_hashes=D.CLUSTER_N_HASHES,
        max_bucket=D.CLUSTER_MAX_BUCKET,
        size_ratio=0.8,
        dedupe=True,
    ).localCheckpoint()
    n_c = cands.count()
    print(f"candidates materialized: {n_c} rows in "
          f"{time.monotonic() - t0:.1f}s", flush=True)

    reph = reps.select(
        "doc_id",
        F.transform("toks", lambda t: F.xxhash64(t)).alias("th"),
        "n",
    ).localCheckpoint()  # freeze the verify input so variants are identical

    def variant(name, conf=None, hint=False):
        if conf:
            for k, v in conf.items():
                spark.conf.set(k, v)
        side = reph.hint("shuffle_hash") if hint else reph
        a, b = side.alias("a"), side.alias("b")
        inter = F.size(F.array_intersect(F.col("a.th"), F.col("b.th")))
        union = F.col("a.n") + F.col("b.n") - inter
        jac = F.when(union > 0, inter.cast("double") / union)
        out = (
            cands.join(a, cands.doc_a == F.col("a.doc_id"))
            .join(b, cands.doc_b == F.col("b.doc_id"))
            .filter(jac >= 0.8)
            .select("doc_a", "doc_b")
        )
        meter = StageMeter(spark)
        t0 = time.monotonic()
        n = out.count()
        wall = round(time.monotonic() - t0, 2)
        io = meter.delta()
        import io as _io
        import contextlib

        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain(mode="formatted")
        plan = buf.getvalue()
        strategies = {
            s: plan.count(s)
            for s in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
        }
        print(f"{name:10s} {wall:8.2f}s n={n} shuffle "
              f"{io['shuffle_write_b'] / 1e6:.0f}MB joins={strategies}",
              flush=True)
        return {"wall_sec": wall, "n_verified": n, "io": io,
                "join_nodes": strategies}

    res = {"copies": copies, "n_candidates": n_c, "variants": {}}
    path = os.path.join(REPO, "VERIFY_AB_r8.json")

    def flush():
        payload = json.load(open(path)) if os.path.exists(path) else {}
        payload[f"x{copies}"] = res
        with open(path, "w") as fh:
            json.dump(payload, fh, indent=1)

    # Flush after every variant and survive a variant-level failure: the
    # first run of this tool lost its smj number when the aqe_shj variant
    # OOMed the shared heap (that crash IS the finding — recorded below).
    plan = [
        ("smj", {"conf": {"spark.sql.adaptive.shuffledHashJoinLocalMapThreshold": "0"}}),
        ("hint_shj", {"hint": True}),
        ("smj_2", {"conf": {"spark.sql.adaptive.shuffledHashJoinLocalMapThreshold": "0"}}),
        ("hint_shj_2", {"hint": True}),
        ("aqe_shj", {"conf": {"spark.sql.adaptive.shuffledHashJoinLocalMapThreshold": str(64 * 1024 * 1024)}}),
    ]
    for name, kw in plan:
        try:
            res["variants"][name] = variant(name, **kw)
        except Exception as e:  # OOM kills the session — record and stop
            res["variants"][name] = {"error": str(e)[:500]}
            flush()
            print(f"{name} FAILED: {str(e)[:200]}", flush=True)
            break
        flush()
    print("wrote VERIFY_AB_r8.json", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

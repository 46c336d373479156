"""Benchmark harness (driver contract): times the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Execution is a noop-format write: the full pipeline (scan → compute →
shuffle) runs distributed, without driver-side collect() distorting the
measurement. One warm-up query amortizes JVM/codegen startup out of the
numbers — the reference's own timers likewise exclude process start
(reference src/main.cpp:96-98 starts timing after argv parsing).

Baseline context (BASELINE.md): reference best = 19.6 MB/s single-node
word count; target ≥ ~10 MB/s at sf0.1.

Round-over-round comparison convention (ADVICE r03, tightened per VERDICT
r09 item 3 and again r10 item 3 + ADVICE r10): every entry reports BOTH
the cold first run (includes codegen + file listing;
`queries_cold_first_run`) and — the comparison number — the per-query
MIN ACROSS ≥2 CLEAN PASSES, each pass itself a min over N_RUNS uniform
runs (`queries`; per-pass values and cross-pass spreads in the detail
file). A pass is clean iff neither contended nor degraded (canary floor
>1.15× the reference floor); extra passes run until ≥2 clean passes
exist (≤4 total), degraded passes are EXCLUDED from the min (fallback to
all passes only when none is clean, flagged `min_over: all_passes`), box
normalization divides each pass's times by that pass's own factor before
the min, and suspect flags come from each query's min-providing pass —
one provenance rule for every reported number.
Compare like with like across rounds — r02 bulk numbers were effectively
cold/n=1, so the honest bulk-throughput headline vs the reference
baseline is the COLD ratio (~0.08, ≈11× faster), with the warm ratio
(~0.03) reported alongside, not substituted.

Contention canary (round 5): see ``measure_pass`` — a fixed cheap query is
interleaved before every headline entry; if >20% of second-half canary
runs exceed 1.5x their median the pass is marked contended and re-run
ONCE (caveat: a second pass's queries_cold_first_run values are no longer
truly cold — the canary block in the JSON says how many passes ran).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from parallel_map_reduce_word_counter_for_one_machine_spark import registry
from parallel_map_reduce_word_counter_for_one_machine_spark.session import get_spark

registry.load_all()

# Headline set: the flagship word-count family + one representative per
# operator class (join/agg/window/dedup/similarity/text/stream).
BENCH_QUERIES = [
    "word_count",
    "sort_by_count_desc",
    "star_join_agg",
    "agg_group",
    "window_rank",
    "sort_limit_topk",
    "tfidf",
    "dedup_minhash_lsh",
    "dedup_clusters_lsh",
    "dedup_spans",
    "similarity_topk",
    "dedup_embedding",
    "dedup_embedding_lsh",
    "stream_tumbling_agg",
    "corpus_drift_chi2",
    "pmi_bigrams",
    "curate_corpus",
    "pii_scrub",
    "pack_sequences",
    "prepare_training_corpus",
    "chunk_documents",
    "dedup_chunks",
    "dedup_spans_trim",
    "pq_topk_listing",
    "ivfpq_pruned_probe",
    "ivfpq_kmeans_probe",
    "layout_zorder",
    "pagerank_parts",
    # r06 continuation: one representative per new family — the two-stage
    # retrieval composite and the full tokenize step (train + id stream).
    "hybrid_retrieval",
    "tokenizer_bpe_ids",
    # r09: the broadcast-bitset decontamination gate and the crawl diff —
    # the two new keys whose 100 TB story is a PHYSICAL strategy (joinless
    # membership; fingerprints-before-join), so their cost is worth
    # tracking round-over-round.
    "decontaminate_bloom",
    "corpus_version_diff",
    # r10: the asymmetric near-dup detector — its df-capped blocking
    # self-join is the plan shape worth tracking round-over-round.
    "dedup_containment",
    # r11 (VERDICT r10 item 2): the two heaviest new operators — the
    # exact tiled k-NN graph and its IVF-celled scale path (benched as
    # the production LISTING, not the registered recall-verdict wrapper
    # which would re-run the exact graph alongside it — the
    # dedup_minhash_lsh precedent).
    "knn_graph",
    "knn_graph_ivf_listing",
]


# UNIFORM repetition count (round-3 change, per ADVICE.md): r02 granted
# best-of-3 to exactly the two noisy LSH queries, which skews their
# reported steady-state vs every best-of-2 key. All entries now run the
# same N, and the JSON carries per-run times + n so round-over-round
# comparisons can normalize however they like. Exception (VERDICT r03 item
# 10): the two LSH keys whose uniform n=3 left a 2× run spread unresolved
# get n=5, visible in queries_runs.
N_RUNS = 3
# dedup_clusters_lsh joined the noisy set in r06: the round's rework
# (bitmask verify + pointer jump) reaches a lower steady state (~7 s vs
# 10.3) but compiles more distinct codegen shapes, so runs keep cooling
# through run 3 ([31, 20, 12] measured in one pass vs [8.4, 8.3, 8.9] in
# the next); n=5 lets cross-round comparison see the converged number,
# same treatment the other two LSH entries have had since r02.
EXTRA_RUNS = {
    "dedup_minhash_lsh": 5,
    "dedup_embedding_lsh": 5,
    "dedup_clusters_lsh": 5,
}
ALL_RUNS: dict[str, list[float]] = {}


def _bench_fn(name: str):
    """The DataFrame-producing callable benched under ``name``. Two
    overrides time PRODUCTION listings whose registered keys are one-row
    verdicts (the verdicts embed exact-truth verifiers — correctness
    shape, not the production relation): ``dedup_minhash_lsh`` times the
    pair listing (the same relation every prior round's number measured)
    and ``pq_topk_listing`` times the ADC-shortlist + exact-re-rank scan
    behind ``similarity_topk_pq``."""
    if name == "dedup_minhash_lsh":
        from parallel_map_reduce_word_counter_for_one_machine_spark.operators.dedup import (
            minhash_lsh_pairs,
        )

        return minhash_lsh_pairs
    if name == "knn_graph_ivf_listing":
        from parallel_map_reduce_word_counter_for_one_machine_spark.operators.similarity import (
            knn_graph_ivf_listing,
        )

        return knn_graph_ivf_listing
    if name == "pq_topk_listing":
        from parallel_map_reduce_word_counter_for_one_machine_spark.operators.similarity import (
            pq_topk_listing,
        )

        return pq_topk_listing
    if name == "ivfpq_pruned_probe":
        from parallel_map_reduce_word_counter_for_one_machine_spark.operators.annindex import (
            ivfpq_pruned_topk_listing,
        )

        # cold run includes the one-off index build (the ingest step);
        # warm runs time the steady-state partition-pruned probe alone
        return ivfpq_pruned_topk_listing
    if name == "ivfpq_kmeans_probe":
        from parallel_map_reduce_word_counter_for_one_machine_spark.operators.annindex import (
            IVFPQ_KMEANS_CELLS,
            IVFPQ_KMEANS_PROBE,
            ivfpq_pruned_topk_listing,
        )

        # same probe against the k-means-quantized index: deeper pruning
        # (5/16 of cell files vs 7/10) — warm delta vs ivfpq_pruned_probe
        # is the measured benefit
        def kmeans_probe(spark, sf_dir):
            return ivfpq_pruned_topk_listing(
                spark,
                sf_dir,
                n_cells=IVFPQ_KMEANS_CELLS,
                n_probe=IVFPQ_KMEANS_PROBE,
            )

        return kmeans_probe
    return registry.QUERIES[name]


def run_one(spark, name: str, sf_dir: str) -> tuple[float, float]:
    """(cold, best-of-N): the first run includes codegen compilation and
    file-listing costs (honesty baseline); the later runs measure
    steady-state — the regime that matters at cluster scale where a query's
    stages run thousands of times. Both are reported in the JSON."""
    times = []
    fn = _bench_fn(name)
    for _ in range(EXTRA_RUNS.get(name, N_RUNS)):
        # Query CONSTRUCTION is inside the timer: iterative operators
        # (dedup_clusters*, kmeans IVF) do real distributed work eagerly
        # while building (localCheckpoint rounds); timing only the final
        # noop write would undercount them to near zero.
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        times.append(time.monotonic() - t0)
    ALL_RUNS[name] = [round(t, 3) for t in times]
    return times[0], min(times)


def run_stream_real(spark, sf_dir: str) -> tuple[float, float]:
    """A REAL readStream→writeStream execution (file source, availableNow,
    watermark, windowed agg into a memory sink), timed end-to-end start→
    drain — the streaming path's round-over-round regression guard."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.streaming.tumbling import (
        run_stream_tumbling,
    )

    times = []
    for i in range(N_RUNS):
        t0 = time.monotonic()
        run_stream_tumbling(spark, sf_dir, f"bench_stream_{i}").collect()
        times.append(time.monotonic() - t0)
    ALL_RUNS["stream_tumbling_real"] = [round(t, 3) for t in times]
    return times[0], min(times)


def run_bulk(spark, sf_dir: str) -> float:
    """Reference-volume throughput check: ~760 MB of text (512× the sf0.1
    corpus, replicated executor-side) through the full word-count pipeline.
    The reference's published best is 700 MB in 35.6 s (19.6 MB/s,
    BASELINE.md); this run demonstrates the engine's sustained MB/s at the
    same volume — divide 761 MB by this entry's seconds."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.wordcount import (
        word_count_bulk,
    )

    df = word_count_bulk(spark, sf_dir, copies=512)
    return _cold_and_best(df, "word_count_761mb_bulk")


def run_bulk_agg(spark, sf_dir: str) -> float:
    """Volume configuration of the Q1-style aggregate: the sf0.1 lineitem
    read as 100 parallel splits (6e7 rows, ~1 GB decoded) through the full
    partial+shuffle+final aggregation. Demonstrates scan+agg row throughput
    (~10M rows/s on local[32])."""
    from pyspark.sql import functions as F

    p = f"{sf_dir}/lineitem.parquet"
    df = spark.read.parquet(*([p] * 100))
    agg = df.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )
    return _cold_and_best(agg, "agg_group_60m_rows_bulk")


def run_bulk_dedup(spark, sf_dir: str) -> tuple[float, float]:
    """Exact-dedup at volume: 100 copies of the sf0.1 corpus (500k docs,
    re-keyed) through tokenize → sorted-distinct token set → md5
    fingerprint → collapse groupBy — the stage that absorbs the bulk of a
    100 TB corpus's duplicate mass before anything quadratic-ish runs.
    The replication is itself the workload: 500k docs collapse to the
    ~4k unique fingerprints, and the shuffle carries 16-byte fingerprints
    + counts, never text. ~240k docs/s warm on local[32].

    Optimization r11 (guide §8 / OPTIMIZATION_r11.md): replication is now
    partitioned-range ⋈ broadcast-corpus — the word_count_bulk shape —
    instead of crossJoin + repartition(64), whose keyless repartition
    SHUFFLED all 500k replicated texts before the fingerprint stage,
    contradicting the never-shuffle-text contract this docstring states.
    Same computed relation (verified row-identical); 4.10 → 1.98 s warm
    at sf0.1, interleaved A/B, every adjacent pair agreeing.

    r12 (ADVICE r11): the corpus broadcast is GATED on the parquet's
    actual on-disk size — a hard-coded F.broadcast(docs) grows with scale
    factor, the exact corpus-sized-broadcast OOM hazard VERDICT r03
    banned. Under the gate (every driver SF: sf0.1 is ~50 MB) the plan —
    and the measured workload — is byte-identical to r11's; above it the
    base (1-copy) corpus repartitions once for parallelism and the
    100-row range side broadcasts instead, still never shuffling
    replicated text."""
    import glob as _glob

    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    on_disk = sum(
        os.path.getsize(p)
        for p in _glob.glob(f"{sf_dir}/documents.parquet/*.parquet")
    ) or os.path.getsize(f"{sf_dir}/documents.parquet")
    if on_disk <= 256 * 1024 * 1024:
        rep = (
            spark.range(0, 100, 1, 64)
            .select(F.col("id").alias("copy"))
            .join(F.broadcast(docs))
        )
    else:
        copies = spark.range(0, 100).select(F.col("id").alias("copy"))
        rep = docs.repartition(64).join(F.broadcast(copies))
    rep = rep.select(
        (F.col("doc_id") + F.col("copy") * 1_000_000).alias("doc_id"),
        "text",
    )
    toks = rep.select(
        "doc_id",
        F.array_sort(
            F.array_distinct(F.filter(F.split("text", " "), lambda w: w != ""))
        ).alias("toks"),
    ).filter(F.size("toks") > 0)
    groups = toks.groupBy(F.md5(F.array_join("toks", "\x01")).alias("fp")).agg(
        F.min("doc_id").alias("rep"), F.count("*").alias("n_members")
    )
    return _cold_and_best(groups, "dedup_exact_500k_docs_bulk")


def _cold_and_best(df, name: str) -> tuple[float, float]:
    times = []
    for _ in range(N_RUNS):
        t0 = time.monotonic()
        df.write.mode("overwrite").format("noop").save()
        times.append(time.monotonic() - t0)
    ALL_RUNS[name] = [round(t, 3) for t in times]
    return times[0], min(times)


# Contention canary (VERDICT r04 item 1): the official BENCH_r04 record was
# taken on a contended box (uniform ~1.5-2x warm inflation on untouched
# plans), making round-over-round deltas untrustworthy. A fixed cheap query
# (the warm word_count pipeline) is re-timed before every headline entry;
# its spread over the pass is a direct measure of box interference DURING
# the measurements. If too many second-half canary runs exceed 1.5x their
# median the whole pass is marked contended and re-run ONCE; the JSON
# carries the canary run lists and 1-min load averages for both passes so
# a judge can audit the record instead of guessing.
# A pass is flagged contended when more than this fraction of second-half
# canary runs exceed 1.5x their median — the signature of interference
# DURING the pass (r04's contaminated record showed monotone-rising runs
# and multi-x outliers). Robust to both the long JVM warm-in decay (first
# half excluded) and the occasional isolated post-heavy-query GC tail
# (one or two spikes don't move the fraction past the limit), which a
# median/min spread statistic false-positives on at ~0.1 s canary scale.
CANARY_OUTLIER_X = 1.5
CANARY_OUTLIER_FRAC_LIMIT = 0.2

# Box normalization (VERDICT r06 item 8): builder/driver boxes differ
# ~1.2-1.4x and most round-over-round drift tracks the canary floor, so
# the JSON now ALSO emits each query's min scaled to a fixed reference
# box — the r05 builder2 canary-clean pass's floor (BENCH_r05_builder2
# .json canary.min = 0.114 s). normalized = t * REF_FLOOR / this_pass_
# floor: on a box whose canary floor is 1.24x the reference, every
# normalized number is the raw min / 1.24. Cross-round comparisons read
# `queries_box_normalized` directly instead of doing the canary
# arithmetic by hand; the raw `queries` block stays the ground truth.
CANARY_REF_FLOOR = 0.114


# Pass budget for the clean-pass loop (VERDICT r10 item 3): extra passes
# run until ≥2 clean passes exist, hard-capped so a persistently noisy box
# still terminates — the flags then tell the judge the record is weak.
MAX_PASSES = 4


def _pass_box(p: dict) -> float:
    return p["canary_min"] / CANARY_REF_FLOOR


def _pass_clean(p: dict) -> bool:
    return not p["contended"] and _pass_box(p) <= 1.15


def summarize_passes(passes: list[dict]) -> dict:
    """ONE provenance rule for every reported number (ADVICE r10):
    degraded/contended passes are EXCLUDED from the comparison min
    (falling back to all passes only if no pass is clean, flagged in
    ``min_over``), each pass's times are normalized by ITS OWN box factor
    before the normalized min, and the per-query suspect flag comes from
    the pass that actually provided that query's min. Pure function of
    the measured pass dicts — unit-tested without Spark."""
    used = [p for p in passes if _pass_clean(p)] or passes
    times_min = {
        k: min(p["times"][k] for p in used) for k in passes[0]["times"]
    }
    return {
        "times_min": times_min,
        "xpass_spread": {
            k: round(
                max(p["times"][k] for p in used) / max(times_min[k], 1e-9),
                2,
            )
            for k in times_min
        },
        "box_factors": [round(_pass_box(p), 3) for p in passes],
        "degraded": [
            i for i, p in enumerate(passes) if _pass_box(p) > 1.15
        ],
        "clean": [i for i, p in enumerate(passes) if _pass_clean(p)],
        "min_over": "clean_passes" if any(map(_pass_clean, passes)) else "all_passes",
        "box_normalized": {
            k: round(min(p["times"][k] / _pass_box(p) for p in used), 3)
            for k in times_min
        },
        "box_factor": round(min(_pass_box(p) for p in used), 3),
        "suspect": sorted(
            k
            for k in times_min
            if k
            in min(used, key=lambda p: p["times"][k]).get(
                "suspect_queries", []
            )
        ),
        "contended": not any(map(_pass_clean, passes)),
    }


def _canary_once(spark, sf_dir: str) -> float:
    fn = registry.QUERIES["word_count"]
    t0 = time.monotonic()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    return time.monotonic() - t0


def measure_pass(spark, sf_dir: str) -> dict:
    """One full measurement pass with interleaved canary timings. Every
    entry — headline AND the stream/bulk tail — gets a canary probe + a
    1-min loadavg reading immediately before it (VERDICT r07 item 4: the
    r07 driver pass showed loadavg rising 2.4→11.4 MID-pass while the
    median-based contended flag stayed quiet — uniform second-half
    contention moves the median itself). The per-query canary and loadavg
    land in the JSON, and any entry whose adjacent canary exceeded
    CANARY_OUTLIER_X × the pass canary floor is listed in
    ``suspect_queries`` so round-over-round comparisons can exclude it
    without guessing which keys the contention hit."""
    ALL_RUNS.clear()
    canary: list[float] = []
    canary_before: dict[str, float] = {}
    load_by_query: dict[str, float] = {}
    load_start = os.getloadavg()[0]
    times: dict[str, float] = {}
    cold: dict[str, float] = {}

    def probe(name: str) -> None:
        t = round(_canary_once(spark, sf_dir), 3)
        canary.append(t)
        canary_before[name] = t
        load_by_query[name] = round(os.getloadavg()[0], 2)

    for name in BENCH_QUERIES:
        probe(name)
        c, b = run_one(spark, name, sf_dir)
        times[name], cold[name] = round(b, 3), round(c, 3)
    probe("stream_tumbling_real")
    c, b = run_stream_real(spark, sf_dir)
    times["stream_tumbling_real"], cold["stream_tumbling_real"] = round(b, 3), round(c, 3)
    probe("word_count_761mb_bulk")
    c, b = run_bulk(spark, sf_dir)
    times["word_count_761mb_bulk"], cold["word_count_761mb_bulk"] = round(b, 3), round(c, 3)
    probe("agg_group_60m_rows_bulk")
    c, b = run_bulk_agg(spark, sf_dir)
    times["agg_group_60m_rows_bulk"], cold["agg_group_60m_rows_bulk"] = round(b, 3), round(c, 3)
    probe("dedup_exact_500k_docs_bulk")
    c, b = run_bulk_dedup(spark, sf_dir)
    times["dedup_exact_500k_docs_bulk"], cold["dedup_exact_500k_docs_bulk"] = round(b, 3), round(c, 3)
    canary.append(round(_canary_once(spark, sf_dir), 3))
    # tail = the SECOND HALF of the canary runs: JVM/JIT warm-in decay
    # extends past run ~15 at small sf (measured 0.39 -> 0.10 s across a
    # pass on an IDLE box), so any fixed short skip flags pure warm-up.
    # NOTE a pass contended UNIFORMLY (every run inflated, median too) is
    # invisible WITHIN a pass — that is what the recorded canary min +
    # loadavg are for: the next round's judge compares canary minima
    # across BENCH files before trusting round-over-round query deltas.
    tail = canary[len(canary) // 2 :] or canary
    med = sorted(tail)[len(tail) // 2]
    outliers = [t for t in tail if t > CANARY_OUTLIER_X * med]
    frac = len(outliers) / len(tail)
    # Suspect flags against the PASS FLOOR, not the tail median: uniform
    # contention inflates the median too (the r07 blind spot), but the
    # floor is set by the pass's quietest moment. Scoped to the SECOND
    # HALF of the pass (same convention as the outlier check): early
    # canaries carry JVM warm-in and would false-flag the first keys,
    # which the cold/warm split already treats as untrusted.
    floor = min(tail)
    order = list(canary_before)
    tail_queries = order[len(order) // 2 :]
    suspect = sorted(
        q
        for q in tail_queries
        if canary_before[q] > CANARY_OUTLIER_X * floor
    )
    return {
        "times": times,
        "cold": cold,
        "runs": dict(ALL_RUNS),
        "canary_runs": canary,
        "canary_before": canary_before,
        "loadavg_per_query": load_by_query,
        "suspect_queries": suspect,
        "canary_min": floor,
        "canary_median": med,
        "canary_spread": round(frac, 3),
        "contended": frac > CANARY_OUTLIER_FRAC_LIMIT,
        "loadavg_1min": [round(load_start, 2), round(os.getloadavg()[0], 2)],
    }


def main() -> None:
    # The result JSON must be the SOLE stdout line (VERDICT r07 item 4:
    # BENCH_r06/r07 both recorded "parsed": null — JVM/log chatter on fd 1
    # broke the driver's parse and the record survived only in `tail`).
    # Everything — including the JVM, which inherits fd 1 at launch — is
    # redirected to stderr; the final JSON goes to the saved real stdout.
    # AND (VERDICT r08 item 1) the driver keeps only a 2,000-char TAIL of
    # stdout — r08's sole-line fix still recorded "parsed": null because
    # the full payload was ~6.7 kB. stdout now carries a compact summary
    # (hard-guarded < 1,900 chars); the full detail (per-run times, cold
    # firsts, canary/loadavg forensics) goes to BENCH_detail_last.json
    # next to this script and to stderr.
    real_stdout = os.dup(1)
    os.dup2(2, 1)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="pmr-wc-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    run_one(spark, "word_count", sf_dir)  # warm-up (JVM/codegen/page cache)

    # VERDICT r09 item 3: cross-pass noise (same query swinging up to
    # 1.9× between passes) made round-over-round deltas unreadable. The
    # comparison number is now the per-query MIN ACROSS ≥2 CLEAN passes
    # (each itself a min over N_RUNS uniform runs). VERDICT r10 item 3
    # closed the remaining hole: a pass is CLEAN iff neither contended
    # nor degraded (canary floor >1.15× the reference floor), and extra
    # passes run until ≥2 clean passes exist (capped at MAX_PASSES so a
    # persistently noisy box still terminates — the degraded flags then
    # tell the judge the record is non-comparable).
    passes = [measure_pass(spark, sf_dir), measure_pass(spark, sf_dir)]
    while sum(map(_pass_clean, passes)) < 2 and len(passes) < MAX_PASSES:
        passes.append(measure_pass(spark, sf_dir))
    best = min(passes, key=lambda p: p["canary_spread"])

    s = summarize_passes(passes)
    times_min = s["times_min"]
    total = round(sum(times_min.values()), 3)
    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": times_min,
        "queries_per_pass": [p["times"] for p in passes],
        "queries_xpass_spread": s["xpass_spread"],
        "queries_cold_first_run": passes[0]["cold"],
        "queries_runs": best["runs"],
        "queries_box_normalized": s["box_normalized"],
        "box_factor": s["box_factor"],
        "box_factors_per_pass": s["box_factors"],
        "degraded_passes": s["degraded"],
        "clean_passes": s["clean"],
        "min_over": s["min_over"],
        "suspect_queries_min_provenance": s["suspect"],
        "box_ref_floor": CANARY_REF_FLOOR,
        "n_runs": N_RUNS,
        "sf": float(sf),
        "canary": {
            "query": "word_count",
            "runs": best["canary_runs"],
            "per_query": best["canary_before"],
            "loadavg_per_query": best["loadavg_per_query"],
            "suspect_queries": best["suspect_queries"],
            "min": best["canary_min"],
            "tail": "second_half",
            "spread": best["canary_spread"],
            "spread_metric": "outlier_frac",
            "outlier_x": CANARY_OUTLIER_X,
            "spread_limit": CANARY_OUTLIER_FRAC_LIMIT,
            "contended": best["contended"],
            "loadavg_1min": best["loadavg_1min"],
            "n_passes": len(passes),
            "all_pass_spreads": [p["canary_spread"] for p in passes],
        },
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_detail_last.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1)
        fh.write("\n")
    print(json.dumps(detail), file=sys.stderr)

    # Compact stdout summary. The driver keeps a 2,000-char stdout tail;
    # optional fields are dropped in order until the line fits with margin.
    compact = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": times_min,
        "sf": float(sf),
        "box_factor": s["box_factor"],
        "n_passes": len(passes),
        "degraded_passes": s["degraded"],
        "n_runs": N_RUNS,
        # same provenance as `queries`: contended means NO clean pass
        # exists (the min had to fall back to noisy passes); suspects are
        # per-query flags from each query's min-providing pass.
        "contended": s["contended"],
        "suspect_queries": s["suspect"],
        "detail": "BENCH_detail_last.json",
    }
    payload = json.dumps(compact)
    for droppable in (
        "detail",
        "suspect_queries",
        "contended",
        "n_runs",
        "degraded_passes",
        "n_passes",
    ):
        if len(payload) < 1900:
            break
        compact.pop(droppable, None)
        payload = json.dumps(compact)
    assert len(payload) < 1900, f"bench summary line too long: {len(payload)}"
    os.write(real_stdout, (payload + "\n").encode())
    os.close(real_stdout)


if __name__ == "__main__":
    main()

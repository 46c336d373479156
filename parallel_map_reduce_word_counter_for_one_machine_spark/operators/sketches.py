"""Mergeable sketch algebra — the approximate-aggregation toolkit a
100 TB pipeline leans on when exact state would be unbounded (driver
contract § scale extensions; the reference keeps EXACT per-word hash
state, src/main.cpp:42-76 — fine for one machine, the sketch versions
are what replace it when the key domain outgrows memory).

Three properties make sketches the at-scale shape, and each key here
demonstrates one:

* **bounded size** — ``relational2.approx_distinct`` (HLL++, r02).
* **MERGEABILITY** — ``hll_partition_merge``: per-partition (here
  per-lang) Datasketches HLL sketches unioned into a global estimate
  with ``hll_union_agg``; this is the algebra that lets daily/partition
  sketches roll up without rescanning history (Spark 3.5+ sketch
  functions, Apache DataSketches).
* **provable error bounds** — ``cms_heavy_hitters``: Count-Min Sketch
  (Cormode & Muthukrishnan, J.Alg'05) point estimates obey
  ``true ≤ est ≤ true + ε·N`` (w.h.p.); the verdict checks BOTH
  inequalities for every vocabulary word against the exact counts.

Verdict pattern: like the ANN/approx_distinct keys, the registered
relation is a one-row (exact_anchor, bound_ok) verdict — DuckDB pins the
exact anchor + TRUE; a broken sketch path flips the hash. All sketch
estimates are deterministic (fixed seeds/defaults), so green is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..sources.tables import load_table
from .wordcount import tokenize

# CMS parameters: overcount slack ε·N with N = total token count.
CMS_EPS = 0.001
CMS_CONFIDENCE = 0.9999
CMS_SEED = 42
# Heavy-hitter support: the bound check probes only words with
# true count ≥ HH_SUPPORT·N, so the driver-side probe set is ≤
# 1/HH_SUPPORT = 500 words REGARDLESS of corpus size.
HH_SUPPORT = 0.002


@query(
    "hll_partition_merge",
    oracle=(
        "SELECT CAST(count(DISTINCT word) AS BIGINT) AS exact_words, "
        "TRUE AS within_bound FROM ("
        "SELECT unnest(string_split(text, ' ')) AS word FROM documents"
        ") t WHERE word <> ''"
    ),
)
def hll_partition_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct words via PER-LANG HLL sketches merged with
    ``hll_union_agg`` — the partition-rollup algebra: each partition
    keeps a fixed-size sketch, the union is associative, and the global
    estimate never rescans the corpus. Checked in-query against the
    exact distinct count at a ±5% envelope (lgK default 12 ⇒ rsd ~1.6%);
    the oracle pins the exact count + TRUE."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "lang", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    per_lang = toks.groupBy("lang").agg(F.hll_sketch_agg("word").alias("sk"))
    merged = per_lang.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = toks.agg(F.count_distinct("word").alias("exact_words"))
    return exact.crossJoin(merged).select(
        "exact_words",
        (
            F.abs(F.col("est") - F.col("exact_words"))
            <= 0.05 * F.col("exact_words")
        ).alias("within_bound"),
    )


@query(
    "cms_heavy_hitters",
    oracle=(
        "WITH cnts AS (SELECT word, count(*) AS cnt FROM ("
        "SELECT unnest(string_split(text, ' ')) AS word FROM documents"
        ") t WHERE word <> '' GROUP BY word), "
        "tot AS (SELECT sum(cnt) AS n FROM cnts) "
        "SELECT CAST(count(*) AS BIGINT) AS n_words, "
        "CAST((SELECT n FROM tot) AS BIGINT) AS n_tokens, "
        "CAST((SELECT count(*) FROM cnts, tot WHERE cnt >= 0.002 * n) "
        "AS BIGINT) AS n_heavy, TRUE AS bounds_ok FROM cnts"
    ),
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch heavy hitters with the CMS guarantee as the
    verdict: for every word whose true count ≥ ``HH_SUPPORT``·N,
    ``true ≤ est ≤ true + ε·N`` (ε = 0.001, confidence 0.9999, fixed
    seed ⇒ deterministic). The sketch is built distributed
    (``count_min_sketch`` partial+final aggregate — fixed d×w counter
    array per partition, the bounded replacement for the reference's
    exact hash at unbounded vocabularies) and queried driver-side
    through the public ``org.apache.spark.util.sketch.CountMinSketch``
    reader against the exact counts of the CANDIDATE SET ONLY: the
    probe set is the words above the support floor, at most
    1/HH_SUPPORT = 500 rows no matter how large the corpus — nothing
    collected is proportional to the vocabulary (the r05 verdict's
    scale defect). ``n_words``/``n_tokens`` stay fully distributed
    single-row aggregates."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokenize(d)
    cnts = toks.groupBy("word").agg(F.count("*").alias("cnt"))
    sk_row = toks.agg(
        F.count_min_sketch(
            "word", F.lit(CMS_EPS), F.lit(CMS_CONFIDENCE), F.lit(CMS_SEED)
        ).alias("sk")
    ).collect()[0]
    jvm = spark.sparkContext._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(sk_row.sk)
    )
    # One-row distributed totals; no per-word driver traffic.
    totals = cnts.agg(
        F.count("*").alias("n_words"), F.sum("cnt").alias("n_tokens")
    ).collect()[0]
    n_tokens = int(totals.n_tokens)
    slack = CMS_EPS * n_tokens
    # Bounded probe set: ≤ 1/HH_SUPPORT rows by the support floor.
    heavy = cnts.filter(
        F.col("cnt") >= F.lit(HH_SUPPORT * n_tokens)
    ).collect()
    ok = all(
        r.cnt <= cms.estimateCount(r.word) <= r.cnt + slack for r in heavy
    )
    return spark.createDataFrame(
        [(int(totals.n_words), n_tokens, len(heavy), bool(ok))],
        "n_words BIGINT, n_tokens BIGINT, n_heavy BIGINT, bounds_ok BOOLEAN",
    )


# Histogram-quantile bin width (tokens). State per source is bounded by
# max_len/HIST_W counters regardless of corpus size; estimate error is
# bounded by one bin width by construction.
HIST_W = 8


@query(
    "hist_quantile_lengths",
    oracle=(
        "WITH lens AS (SELECT source, "
        "len(list_filter(string_split(text, ' '), w -> w <> '')) AS l "
        "FROM documents), "
        f"hist AS (SELECT source, l // {HIST_W} AS bin, count(*) AS cnt "
        "FROM lens GROUP BY source, bin), "
        "n AS (SELECT source, sum(cnt) AS n_docs FROM hist GROUP BY source), "
        "cum AS (SELECT source, bin, "
        "sum(cnt) OVER (PARTITION BY source ORDER BY bin) AS c FROM hist), "
        "est AS (SELECT cum.source, "
        f"{HIST_W} * min(CASE WHEN c >= ceil(0.5 * n_docs) THEN bin END) AS p50_est, "
        f"{HIST_W} * min(CASE WHEN c >= ceil(0.9 * n_docs) THEN bin END) AS p90_est, "
        f"{HIST_W} * min(CASE WHEN c >= ceil(0.99 * n_docs) THEN bin END) AS p99_est "
        "FROM cum JOIN n USING (source) GROUP BY cum.source), "
        "ordered AS (SELECT source, l, "
        "row_number() OVER (PARTITION BY source ORDER BY l) AS rk FROM lens), "
        "ex AS (SELECT ordered.source, "
        "min(CASE WHEN rk = ceil(0.5 * n_docs) THEN l END) AS e50, "
        "min(CASE WHEN rk = ceil(0.9 * n_docs) THEN l END) AS e90, "
        "min(CASE WHEN rk = ceil(0.99 * n_docs) THEN l END) AS e99 "
        "FROM ordered JOIN n USING (source) GROUP BY ordered.source) "
        "SELECT n.source, CAST(n.n_docs AS BIGINT) AS n_docs, "
        "CAST(p50_est AS BIGINT) AS p50_est, CAST(p90_est AS BIGINT) AS p90_est, "
        "CAST(p99_est AS BIGINT) AS p99_est, "
        f"(e50 >= p50_est AND e50 < p50_est + {HIST_W} "
        f"AND e90 >= p90_est AND e90 < p90_est + {HIST_W} "
        f"AND e99 >= p99_est AND e99 < p99_est + {HIST_W}) AS bounds_ok "
        "FROM n JOIN est USING (source) JOIN ex USING (source)"
    ),
)
def hist_quantile_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable fixed-bin histogram quantiles — the bounded-state slot a
    KLL/t-digest fills in a 100 TB pipeline (per-source token-length
    p50/p90/p99 for curriculum and packing decisions). Per (source, bin)
    counts are an ordinary partial+final aggregate: fixed ≤ max_len/W
    counters per source, associatively mergeable across partitions, days,
    or incremental loads — the same rollup algebra as the HLL key, but
    DETERMINISTIC and with a hard error bound (the true quantile provably
    lies inside the reported bin, so est ≤ q < est + W). The discrete
    order statistic is recovered from the cumulative histogram as the
    smallest bin covering rank ceil(p·n).

    Where a real KLL fits: when value domains are unbounded or bins can't
    be pre-sized, KLL's compactor ladder gives rank-ε guarantees at
    O(1/ε·log n) space — but its compaction is randomized, so this
    engine's deterministic-verdict protocol pins the fixed-bin form and
    leaves KLL as the documented swap-in.

    Both engines genuinely compute the bound check (exact per-source
    order statistics vs the bin interval): the verification arm is a
    per-source sort — fine at verdict time, NOT part of the production
    estimate, which touches only the histogram."""
    d = load_table(spark, sf_dir, "documents")
    lens = d.select(
        "source",
        F.size(F.filter(F.split("text", " "), lambda w: w != "")).alias("l"),
    )
    hist = lens.groupBy(
        "source", F.floor(F.col("l") / HIST_W).alias("bin")
    ).agg(F.count("*").alias("cnt"))
    n = hist.groupBy("source").agg(F.sum("cnt").alias("n_docs"))
    wb = Window.partitionBy("source").orderBy("bin")
    cum = hist.withColumn("c", F.sum("cnt").over(wb))

    def _est(p: float, name: str):
        return (
            F.lit(HIST_W)
            * F.min(
                F.when(
                    F.col("c") >= F.ceil(F.lit(p) * F.col("n_docs")), F.col("bin")
                )
            )
        ).alias(name)

    est = (
        cum.join(n, "source")
        .groupBy("source")
        .agg(_est(0.5, "p50_est"), _est(0.9, "p90_est"), _est(0.99, "p99_est"))
    )
    wr = Window.partitionBy("source").orderBy("l")
    ordered = lens.withColumn("rk", F.row_number().over(wr))

    def _ex(p: float, name: str):
        return F.min(
            F.when(
                F.col("rk") == F.ceil(F.lit(p) * F.col("n_docs")), F.col("l")
            )
        ).alias(name)

    ex = (
        ordered.join(n, "source")
        .groupBy("source")
        .agg(_ex(0.5, "e50"), _ex(0.9, "e90"), _ex(0.99, "e99"))
    )
    ok = (
        (F.col("e50") >= F.col("p50_est"))
        & (F.col("e50") < F.col("p50_est") + HIST_W)
        & (F.col("e90") >= F.col("p90_est"))
        & (F.col("e90") < F.col("p90_est") + HIST_W)
        & (F.col("e99") >= F.col("p99_est"))
        & (F.col("e99") < F.col("p99_est") + HIST_W)
    )
    return (
        n.join(est, "source")
        .join(ex, "source")
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("p50_est").cast("long").alias("p50_est"),
            F.col("p90_est").cast("long").alias("p90_est"),
            F.col("p99_est").cast("long").alias("p99_est"),
            ok.alias("bounds_ok"),
        )
    )


@query(
    "bitmap_distinct_users",
    oracle=(
        "SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) "
        "AS n_users FROM events GROUP BY event_type"
    ),
)
def bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct counting via bitmap aggregates (the third
    member of the mergeable family here, between exact groupBy-distinct
    and the approximate HLL): ids map to (bucket, bit-position), each
    bucket aggregates to a fixed ≤4 KB bitmap (``bitmap_construct_agg``),
    and counts sum across buckets. Unlike ``count(DISTINCT ...)`` — whose
    shuffle carries every distinct id — the shuffle here carries one
    bitmap per (group, bucket): for dense id spaces that is ~1 bit per id
    pre-combined map-side, and the bitmaps union associatively
    (``bitmap_or_agg``) across partitions, days, or incremental loads.
    The exactness contract is the whole point vs HLL — the oracle is a
    plain COUNT(DISTINCT), no tolerance verdict needed."""
    e = load_table(spark, sf_dir, "events")
    buckets = e.select(
        "event_type",
        F.expr("bitmap_bucket_number(user_id)").alias("bk"),
        F.expr("bitmap_bit_position(user_id)").alias("pos"),
    )
    per_bucket = buckets.groupBy("event_type", "bk").agg(
        F.expr("bitmap_construct_agg(pos)").alias("bm")
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("n_users")
    )

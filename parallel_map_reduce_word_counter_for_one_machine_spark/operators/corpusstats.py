"""Corpus-level statistical analytics for training-data curation (driver
contract § north-star extensions; no reference citation — the reference
computes only the global word→count map, src/main.cpp:42-76, which these
build on).

Three monitoring/QA operators every large-corpus pipeline runs:

- ``corpus_drift_chi2``  — per-token χ² drift between two corpus slices
  (the refresh-vs-baseline distribution check run before a new crawl
  batch is admitted into the mixture).
- ``pmi_bigrams``        — pointwise mutual information collocations
  (phrase mining / tokenizer-merge candidates).
- ``zipf_slope``         — least-squares slope of log-frequency vs
  log-rank over the head vocabulary (corpus health check: natural text
  sits near -1; template/boilerplate floods flatten it).

All three are one-or-two-shuffle aggregation pipelines over the exploded
token stream — counts shuffle as (word, long) rows bounded by vocabulary,
never by corpus size; the statistics are per-row expressions on top.
Float parity with the DuckDB oracles follows the module conventions in
text.py: ln-bearing outputs round to 6dp (libm ≤1 ulp), division-only
outputs round to 4dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load_table

# Head-vocabulary size for drift and Zipf fits: big enough to be stable,
# small enough that the per-word output is a bounded report table.
DRIFT_VOCAB = 200
# Minimum bigram occurrences for PMI — the classic low-count PMI blowup
# guard (a 1-occurrence pair has maximal PMI by construction).
PMI_MIN_COUNT = 5


def _tok_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, w): the exploded non-empty token stream."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.explode(F.filter(F.split("text", " "), lambda w: w != "")).alias("w"),
    )


_DRIFT_ORACLE = (
    "WITH toks AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), "
    "w -> w <> '')) AS w FROM documents), "
    "vocab AS (SELECT w FROM toks GROUP BY w "
    f"ORDER BY count(*) DESC, w LIMIT {DRIFT_VOCAB}), "
    "cnt AS (SELECT t.w, "
    "CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_a, "
    "CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_b "
    "FROM toks t JOIN vocab v ON t.w = v.w GROUP BY t.w), "
    "tot AS (SELECT CAST(sum(c_a) AS BIGINT) AS na, "
    "CAST(sum(c_b) AS BIGINT) AS nb FROM cnt) "
    "SELECT w, c_a, c_b, "
    "round(power(c_a - (c_a + c_b) * (na * 1.0 / (na + nb)), 2) "
    "  / ((c_a + c_b) * (na * 1.0 / (na + nb))) "
    "+ power(c_b - (c_a + c_b) * (nb * 1.0 / (na + nb)), 2) "
    "  / ((c_a + c_b) * (nb * 1.0 / (na + nb))), 4) AS chi2 "
    "FROM cnt, tot"
)


@query("corpus_drift_chi2", oracle=_DRIFT_ORACLE)
def corpus_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-token χ² drift between two corpus slices (doc_id parity plays
    the baseline-vs-refresh role — the driver tables carry no crawl-date
    column). For each head-vocabulary token: observed counts (c_a, c_b)
    vs expectation under the pooled rate, χ² = Σ (o−e)²/e over the two
    cells. Large values flag tokens whose rate shifted between slices —
    the admission check before a new batch joins the training mixture.

    Shape: one token-stream explode → one (word) groupBy carrying two
    conditional counts; the head vocabulary is a TakeOrdered top-V (tiny,
    broadcast-joined); slice totals are one 2-value aggregate cross-joined
    back. χ² itself is a per-row double expression, identical formula on
    both engines, rounded to 4dp (division-only float path)."""
    toks = _tok_stream(spark, sf_dir)
    toks = toks.localCheckpoint()  # vocab + counts both consume it
    vocab = (
        toks.groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "w")
        .limit(DRIFT_VOCAB)
        .select("w")
    )
    cnt = (
        toks.join(F.broadcast(vocab), "w")
        .groupBy("w")
        .agg(
            F.sum(F.when(F.col("doc_id") % 2 == 0, 1).otherwise(0))
            .cast("long")
            .alias("c_a"),
            F.sum(F.when(F.col("doc_id") % 2 == 1, 1).otherwise(0))
            .cast("long")
            .alias("c_b"),
        )
    )
    cnt = cnt.localCheckpoint()  # totals + output rows both consume it
    tot = cnt.agg(
        F.sum("c_a").cast("long").alias("na"), F.sum("c_b").cast("long").alias("nb")
    )
    t = F.col("c_a") + F.col("c_b")
    ra = F.col("na") * F.lit(1.0) / (F.col("na") + F.col("nb"))
    rb = F.col("nb") * F.lit(1.0) / (F.col("na") + F.col("nb"))
    ea, eb = t * ra, t * rb
    chi2 = F.pow(F.col("c_a") - ea, 2) / ea + F.pow(F.col("c_b") - eb, 2) / eb
    return cnt.crossJoin(F.broadcast(tot)).select(
        "w", "c_a", "c_b", F.round(chi2, 4).alias("chi2")
    )


_PMI_ORACLE = (
    "WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), "
    "w -> w <> '') AS t FROM documents), "
    "uni AS (SELECT unnest(t) AS w FROM toks), "
    "un AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY w), "
    "n1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM uni), "
    "bg AS (SELECT unnest(list_transform(list_zip(t, t[2:]), "
    "x -> CASE WHEN x[2] IS NULL THEN NULL ELSE x[1] || '\x01' || x[2] END)) "
    "AS b FROM toks), "
    "bn AS (SELECT string_split(b, '\x01')[1] AS w1, "
    "string_split(b, '\x01')[2] AS w2, CAST(count(*) AS BIGINT) AS c12 "
    "FROM bg WHERE b IS NOT NULL GROUP BY 1, 2), "
    "n2 AS (SELECT CAST(sum(c12) AS BIGINT) AS n FROM bn) "
    "SELECT w1, w2, c12, "
    "round(ln((c12 * 1.0 / n2.n)) - ln(u1.c * 1.0 / n1.n) "
    "- ln(u2.c * 1.0 / n1.n), 6) AS pmi "
    "FROM bn, n1, n2 "
    "JOIN un u1 ON bn.w1 = u1.w JOIN un u2 ON bn.w2 = u2.w "
    f"WHERE c12 >= {PMI_MIN_COUNT}"
)


@query("pmi_bigrams", oracle=_PMI_ORACLE)
def pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over adjacent-token pairs:
    PMI = ln p(w₁w₂) − ln p(w₁) − ln p(w₂), with a minimum-count floor
    (low-count PMI is maximal by construction — the classic blowup).
    High-PMI pairs are collocations: phrase-mining / tokenizer-merge
    candidates, and a cheap template detector (boilerplate pairs score
    near the top with huge counts).

    Shape: bigrams built in the array domain (zip_with of the token array
    with its own tail, the ngram_bigrams pattern) → one (w₁,w₂) groupBy;
    unigram counts → one (w) groupBy, joined back twice (vocabulary-sized
    build side, AQE broadcasts). Totals are single-row broadcasts. ln
    rounds to 6dp (libm ≤1 ulp, the tfidf convention)."""
    d = load_table(spark, sf_dir, "documents")
    t = F.filter(F.split("text", " "), lambda w: w != "")
    toks = d.select("doc_id", t.alias("t"))
    toks = toks.localCheckpoint()  # unigram + bigram streams both consume
    uni = toks.select(F.explode("t").alias("w"))
    un = uni.groupBy("w").agg(F.count("*").cast("long").alias("c"))
    n1 = uni.agg(F.count("*").cast("long").alias("n1"))
    tail = F.slice(F.col("t"), 2, F.greatest(F.size("t") - 1, F.lit(0)))
    bigram = F.zip_with(
        F.col("t"),
        tail,
        lambda a, b: F.when(b.isNotNull(), F.struct(a.alias("w1"), b.alias("w2"))),
    )
    bn = (
        toks.select(F.explode(bigram).alias("p"))
        .filter(F.col("p").isNotNull())
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count("*").cast("long").alias("c12"))
        .filter(F.col("c12") >= PMI_MIN_COUNT)
    )
    n2all = (
        toks.select(F.explode(bigram).alias("p"))
        .filter(F.col("p").isNotNull())
        .agg(F.count("*").cast("long").alias("n2"))
    )
    u1 = un.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = un.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    pmi = (
        F.log(F.col("c12") * F.lit(1.0) / F.col("n2"))
        - F.log(F.col("c1") * F.lit(1.0) / F.col("n1"))
        - F.log(F.col("c2") * F.lit(1.0) / F.col("n1"))
    )
    return (
        bn.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2all))
        .select("w1", "w2", "c12", F.round(pmi, 6).alias("pmi"))
    )


_ZIPF_ORACLE = (
    "WITH cnt AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM "
    "(SELECT unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS w "
    "FROM documents) GROUP BY w ORDER BY c DESC, w "
    f"LIMIT {DRIFT_VOCAB}), "
    "ranked AS (SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rk "
    "FROM cnt) "
    "SELECT CAST(count(*) AS BIGINT) AS n_words, "
    "round(regr_slope(ln(c), ln(rk)), 4) AS slope, "
    "round(regr_intercept(ln(c), ln(rk)), 4) AS intercept "
    "FROM ranked"
)


@query("zipf_slope", oracle=_ZIPF_ORACLE)
def zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares slope of ln(frequency) vs ln(rank) over the top-V
    vocabulary — the Zipf health check: natural language sits near −1;
    a flattened slope flags boilerplate floods, a steepened one flags
    vocabulary collapse. One word-count aggregate (TakeOrdered head), a
    single-partition rank window over V=200 rows (bounded — this is NOT
    the corpus-wide window the rank operators distribute), and one
    regr_slope/regr_intercept aggregate. Rounded to 4dp: the regression
    sums accumulate in engine-specific order (~1e-12 drift)."""
    from pyspark.sql.window import Window

    toks = _tok_stream(spark, sf_dir)
    cnt = (
        toks.groupBy("w")
        .agg(F.count("*").cast("long").alias("c"))
        .orderBy(F.col("c").desc(), "w")
        .limit(DRIFT_VOCAB)
    )
    ranked = cnt.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.col("c").desc(), "w"))
    )
    return ranked.agg(
        F.count("*").cast("long").alias("n_words"),
        F.round(F.regr_slope(F.log("c"), F.log("rk")), 4).alias("slope"),
        F.round(F.regr_intercept(F.log("c"), F.log("rk")), 4).alias("intercept"),
    )


@query(
    "token_entropy_per_source",
    oracle=(
        "WITH toks AS (SELECT source, unnest(list_filter(string_split(text, ' '), "
        "w -> w <> '')) AS w FROM documents), "
        "cnt AS (SELECT source, w, count(*) AS c FROM toks GROUP BY source, w), "
        "n AS (SELECT source, sum(c) AS n, count(*) AS v FROM cnt GROUP BY source) "
        "SELECT cnt.source, CAST(n.n AS BIGINT) AS n_tokens, "
        "CAST(n.v AS BIGINT) AS n_distinct, "
        "round(-sum((c * 1.0 / n.n) * ln(c * 1.0 / n.n)), 6) AS entropy, "
        "CASE WHEN n.v > 1 THEN "
        "round(-sum((c * 1.0 / n.n) * ln(c * 1.0 / n.n)) / ln(n.v), 6) "
        "ELSE 0.0 END AS entropy_norm "
        "FROM cnt JOIN n ON cnt.source = n.source "
        "GROUP BY cnt.source, n.n, n.v"
    ),
)
def token_entropy_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each source's token distribution, plus the
    entropy normalized by ln(vocabulary) — the lexical-diversity health
    metric of corpus curation (template floods and boilerplate collapse
    entropy toward 0; natural text sits near the top of the band). Shape:
    one (source, word) count groupBy — shuffle bounded by per-source
    vocabulary — one G-row totals aggregate joined back, entropy as a
    partial-aggregable sum of p·ln p terms. 6-dp rounding (ln-bearing,
    module float policy)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(F.filter(F.split("text", " "), lambda w: w != "")).alias("w"),
    )
    cnt = toks.groupBy("source", "w").agg(F.count("*").alias("c"))
    n = cnt.groupBy("source").agg(
        F.sum("c").alias("n"), F.count("*").alias("v")
    )
    p = F.col("c") * 1.0 / F.col("n")
    return (
        cnt.join(n, "source")
        .groupBy("source", "n", "v")
        .agg(
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
            # v = 1 ⇒ ln(v) = 0: a single-symbol source has zero entropy
            # and an undefined norm — pinned to 0.0 on both engines
            # (ANSI mode makes the unguarded divide a hard error).
            F.when(
                F.col("v") > 1,
                F.round(-F.sum(p * F.log(p)) / F.log(F.col("v")), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("entropy_norm"),
        )
        .select(
            "source",
            F.col("n").cast("long").alias("n_tokens"),
            F.col("v").cast("long").alias("n_distinct"),
            "entropy",
            "entropy_norm",
        )
    )


# PSI bins over token length (same fixed-width grid as the histogram
# sketch) and the standard monitoring thresholds: < 0.1 stable, > 0.25
# investigate. Laplace-smoothed shares so empty bins never divide by 0.
PSI_BIN_W = 8


@query(
    "drift_psi",
    oracle=(
        "WITH lens AS (SELECT doc_id % 2 AS slice, "
        f"len(list_filter(string_split(text, ' '), w -> w <> '')) // {PSI_BIN_W} "
        "AS bin FROM documents), "
        "cnt AS (SELECT bin, "
        "sum(CASE WHEN slice = 0 THEN 1 ELSE 0 END) AS ca, "
        "sum(CASE WHEN slice = 1 THEN 1 ELSE 0 END) AS cb FROM lens GROUP BY bin), "
        "tot AS (SELECT sum(ca) AS na, sum(cb) AS nb, count(*) AS b FROM cnt), "
        "sh AS (SELECT bin, (ca + 0.5) / (na + 0.5 * b) AS pa, "
        "(cb + 0.5) / (nb + 0.5 * b) AS pb FROM cnt, tot) "
        "SELECT CAST((SELECT b FROM tot) AS BIGINT) AS n_bins, "
        "round(sum((pa - pb) * ln(pa / pb)), 6) AS psi, "
        "round(sum((pa - pb) * ln(pa / pb)), 6) < 0.1 AS stable FROM sh"
    ),
)
def drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two corpus slices over the
    token-length distribution — the production drift monitor run on every
    refresh (χ² above flags WHICH tokens moved; PSI is the single-number
    gate with industry thresholds: < 0.1 stable, 0.1–0.25 watch, > 0.25
    block the batch). Doc-id parity plays baseline-vs-refresh as in
    ``corpus_drift_chi2``; bins are the fixed-width length grid of the
    histogram sketch (mergeable bounded state), shares are Laplace-
    smoothed (+0.5 per bin) so a bin present in only one slice
    contributes a finite term instead of dividing by zero."""
    d = load_table(spark, sf_dir, "documents")
    lens = d.select(
        (F.col("doc_id") % 2).alias("slice"),
        F.floor(
            F.size(F.filter(F.split("text", " "), lambda w: w != "")) / PSI_BIN_W
        ).alias("bin"),
    )
    cnt = lens.groupBy("bin").agg(
        F.sum(F.when(F.col("slice") == 0, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("slice") == 1, 1).otherwise(0)).alias("cb"),
    )
    tot = cnt.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb"), F.count("*").alias("b")
    )
    pa = (F.col("ca") + 0.5) / (F.col("na") + 0.5 * F.col("b"))
    pb = (F.col("cb") + 0.5) / (F.col("nb") + 0.5 * F.col("b"))
    term = (pa - pb) * F.log(pa / pb)
    return (
        cnt.crossJoin(F.broadcast(tot))
        .agg(
            F.max("b").alias("n_bins"),
            F.round(F.sum(term), 6).alias("psi"),
        )
        .select(
            F.col("n_bins").cast("long").alias("n_bins"),
            "psi",
            # the verdict derives from the SAME 6dp-rounded value both
            # engines emit — the unrounded aggregate differs by ln ulps
            # plus partial-agg order, which can flip the boolean on a
            # near-threshold corpus (module float policy)
            (F.col("psi") < 0.1).alias("stable"),
        )
    )


@query(
    "drift_ks",
    oracle=(
        "WITH lens AS (SELECT doc_id % 2 AS slice, "
        "len(list_filter(string_split(text, ' '), w -> w <> '')) AS l "
        "FROM documents), "
        "cnt AS (SELECT l, "
        "sum(CASE WHEN slice = 0 THEN 1 ELSE 0 END) AS ca, "
        "sum(CASE WHEN slice = 1 THEN 1 ELSE 0 END) AS cb FROM lens GROUP BY l), "
        "tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM cnt), "
        "cum AS (SELECT l, sum(ca) OVER (ORDER BY l) * 1.0 / na AS fa, "
        "sum(cb) OVER (ORDER BY l) * 1.0 / nb AS fb FROM cnt, tot) "
        "SELECT CAST((SELECT count(*) FROM cnt) AS BIGINT) AS n_points, "
        "round(max(abs(fa - fb)), 6) AS ks_stat, "
        "round(max(abs(fa - fb)), 6) < 0.15 AS stable FROM cum"
    ),
)
def drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the corpus slices'
    token-length distributions — the nonparametric companion to
    ``drift_psi`` (PSI needs binning and smoothing; KS is the exact sup
    of the empirical-CDF gap, computed on the raw length values). Shape:
    one (length) groupBy with two conditional counts (support-bounded,
    not corpus-bounded), a 2-scalar total, one window cumsum over the
    support, one max — every step partial-aggregable except the support-
    sized window, which at 100 TB holds |distinct lengths| rows, not
    |docs|. The 0.15 gate plays the role an α-derived critical value
    would in production (fixed here so the verdict is deterministic)."""
    d = load_table(spark, sf_dir, "documents")
    lens = d.select(
        (F.col("doc_id") % 2).alias("slice"),
        F.size(F.filter(F.split("text", " "), lambda w: w != "")).alias("l"),
    )
    cnt = lens.groupBy("l").agg(
        F.sum(F.when(F.col("slice") == 0, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("slice") == 1, 1).otherwise(0)).alias("cb"),
    )
    tot = cnt.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    from pyspark.sql.window import Window as _W

    w = _W.orderBy("l").rowsBetween(_W.unboundedPreceding, _W.currentRow)
    cum = cnt.crossJoin(F.broadcast(tot)).select(
        (F.sum("ca").over(w) * 1.0 / F.col("na")).alias("fa"),
        (F.sum("cb").over(w) * 1.0 / F.col("nb")).alias("fb"),
    )
    n_points = cnt.agg(F.count("*").alias("n"))
    gap = F.max(F.abs(F.col("fa") - F.col("fb")))
    return (
        cum.agg(F.round(gap, 6).alias("ks_stat"))
        # verdict from the SAME 6dp-rounded stat both engines emit (the
        # drift_psi rationale: unrounded floats can flip the boolean
        # cross-engine on a near-threshold corpus)
        .select("ks_stat", (F.col("ks_stat") < 0.15).alias("stable"))
        .crossJoin(F.broadcast(n_points))
        .select(F.col("n").cast("long").alias("n_points"), "ks_stat", "stable")
    )


_HEALTH_ORACLE = (
    "WITH d AS (SELECT doc_id, source, lang, n_chars, md5(text) AS fp, "
    "list_filter(string_split(text, ' '), w -> w <> '') AS toks "
    "FROM documents), "
    "per AS (SELECT doc_id, source, lang, n_chars, fp, len(toks) AS n_tok, "
    "CAST(round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) "
    "* 1000000) AS BIGINT) AS ttr_e6 FROM d WHERE len(toks) > 0), "
    "fpc AS (SELECT fp, count(*) AS n_fp FROM per GROUP BY fp), "
    "tot AS (SELECT sum(n_tok) AS total_tok FROM per) "
    "SELECT source, count(*) AS n_docs, "
    "CAST(sum(n_tok) AS BIGINT) AS n_tokens, "
    "CAST(round(sum(n_tok) * 1000000.0 / max(t.total_tok)) AS BIGINT) "
    "AS token_share_e6, "
    "CAST(count(*) FILTER (f.n_fp > 1) AS BIGINT) AS dup_docs, "
    "CAST(round(avg(ttr_e6)) AS BIGINT) AS mean_ttr_e6, "
    "round(quantile_cont(n_chars, 0.5), 2) AS median_len, "
    "count(DISTINCT lang) AS n_langs "
    "FROM per JOIN fpc f USING (fp) CROSS JOIN tot t GROUP BY source"
)


@query("corpus_health_report", oracle=_HEALTH_ORACLE)
def corpus_health_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus-health dashboard — the one-row-per-source report
    a curation team reviews before every training run: volume (docs,
    tokens, corpus token share), exact-duplicate involvement (docs whose
    full-text fingerprint occurs more than once ANYWHERE in the corpus —
    cross-source dups count in both sources), lexical diversity (mean
    type-token ratio), length median, and language spread.

    Determinism: per-doc TTR quantizes to BIGINT e6 BEFORE the mean so
    the average is exact-integer-sum / count (no float summation-order
    hazard); token share is fixed-point e6 of exact token counts; the
    median interpolates two BIGINTs (engine-identical doubles).

    Plan shape: one corpus scan → per-doc derivations; the fingerprint
    cardinality is one md5-keyed aggregate joined back (the dedup_exact
    exchange); the report is one source-keyed aggregate with the 1-row
    token total broadcast. Nothing wider than the corpus shuffles, and
    the output is |sources| rows."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda w: w != "")
    per = d.select(
        "doc_id",
        "source",
        "lang",
        "n_chars",
        F.md5("text").alias("fp"),
        F.size(toks).alias("n_tok"),
        F.round(
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks) * 1e6
        )
        .cast("long")
        .alias("ttr_e6"),
    ).filter(F.size(toks) > 0)
    # three consumers (fpc, tot, the report join) — materialize the
    # per-doc derivations once so 'one corpus scan' holds in execution,
    # not just in the lineage (module multi-consumer policy)
    per = per.localCheckpoint()
    fpc = per.groupBy("fp").agg(F.count("*").alias("n_fp"))
    tot = per.agg(F.sum("n_tok").alias("total_tok"))
    return (
        per.join(fpc, "fp")
        .crossJoin(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.round(F.sum("n_tok") * 1e6 / F.max("total_tok"))
            .cast("long")
            .alias("token_share_e6"),
            F.count(F.when(F.col("n_fp") > 1, 1)).alias("dup_docs"),
            F.round(F.avg("ttr_e6")).cast("long").alias("mean_ttr_e6"),
            F.round(F.expr("percentile(n_chars, 0.5)"), 2).alias("median_len"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )

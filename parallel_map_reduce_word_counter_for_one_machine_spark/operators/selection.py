"""Model-based data selection — the trained-filter tier of an LLM data
pipeline (no reference citation: the reference's surface stops at word
counting, src/main.cpp:78-281; this module is part of the §2c LLM-pipeline
extension the build plan adds on top).

Three operators cover the canonical selection ladder:

- ``sample_weighted``: Efraimidis–Spirakis A-ES weighted sampling
  (top-k per group under ``u^(1/w)`` keys) with DETERMINISTIC md5-derived
  uniforms — the reproducible replacement for ``df.sample(weights=…)``.
- ``perplexity_buckets``: CCNet-style head/middle/tail bucketing per
  language by LM score terciles (Wenzek et al., LREC 2020 — public).
- ``quality_classifier_gd``: a quality classifier TRAINED inside the
  engine by batch gradient descent — the fastText/WebText-classifier slot
  (GPT-3 appendix A; fastText Joulin et al. 2016 — public papers). The
  entire training loop is fixed-point integer arithmetic + a hard-sigmoid
  link, so the learned weights are bit-identical across engines,
  partitionings, and retries — which is what makes the DuckDB oracle able
  to re-run the TRAINING itself (unrolled per-iteration CTEs, the
  ``pagerank_parts`` oracle pattern), not just the scoring.

Cross-engine exactness notes:
- md5 is md5 everywhere; hex→int via conv/'0x' cast (the repo idiom).
- ``ln`` differs by ≤1 ulp between libms, so log-derived sort keys are
  quantized to integers (``*1e9`` + half-up floor) before any ordering;
  a flip would need the pre-quantization values to straddle a 1e-9
  boundary within 1 ulp (~1e-15 relative) — negligible.
- The GD loop has NO transcendentals: the hard-sigmoid link
  ``clamp(0.25·z + 0.5, 0, 1)`` is mul/add/clamp (all correctly-rounded
  IEEE, so bit-identical on identical inputs), per-row gradient
  contributions are quantized to BIGINT before the order-sensitive SUM,
  and the learning-rate step uses ``floor(g / (0.25·N))`` whose quotient
  is ≥ 1/(4N) away from integer boundaries when not exactly on them —
  far beyond double rounding error.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..sources.tables import load_table

# --- sample_weighted -------------------------------------------------------

SAMPLE_K = 10  # docs kept per source

_U32 = 4294967296.0  # 2^32: md5-prefix uniform denominator


@query(
    "sample_weighted",
    oracle=(
        "WITH keyed AS (SELECT source, doc_id, n_chars AS w, "
        "CAST(floor(ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) "
        f"AS BIGINT) + 1) / {_U32}) / n_chars * 1000000000.0 + 0.5) AS BIGINT) "
        "AS key_e9 FROM documents), "
        "r AS (SELECT source, doc_id, w, key_e9, "
        "row_number() OVER (PARTITION BY source ORDER BY key_e9 DESC, doc_id) "
        "AS rk FROM keyed) "
        f"SELECT source, doc_id, w, key_e9, rk FROM r WHERE rk <= {SAMPLE_K}"
    ),
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, top-k per source — the
    Efraimidis–Spirakis A-ES scheme (IPL 2006, public): each row draws a
    uniform u and keeps the k largest ``u^(1/w)`` keys, which selects row i
    with probability proportional to its weight w_i. Maximizing ``u^(1/w)``
    ≡ maximizing ``ln(u)/w``, so the key never exponentiates.

    Determinism: u = (md5-prefix(doc_id) + 1) / 2^32 ∈ (0, 1] — a pure
    function of the data (the ``sample_hash`` idiom), so the kept set is
    stable across partitioning, retries, and engines, unlike seeded
    ``df.sample``. The log key is quantized to 1e-9 (BIGINT) with doc_id
    tiebreak so the ORDER is engine-exact too.

    Scale shape: one narrow projection + a per-group top-k window. The
    rank-filter window compiles to WindowGroupLimit (partial top-k on the
    map side before the group exchange), so per-source skew never funnels
    a full group through the sort — only k survivors per partition per
    group shuffle."""
    d = load_table(spark, sf_dir, "documents")
    u64 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    key = F.floor(
        F.log((u64 + 1) / F.lit(_U32)) / F.col("n_chars") * 1000000000.0 + 0.5
    ).cast("long")
    w = Window.partitionBy("source").orderBy(F.desc("key_e9"), F.asc("doc_id"))
    return (
        d.select(
            "source",
            "doc_id",
            F.col("n_chars").alias("w"),
            key.alias("key_e9"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= SAMPLE_K)
    )


# --- perplexity_buckets ----------------------------------------------------


@query(
    "perplexity_buckets",
    oracle=(
        "WITH tok AS (SELECT doc_id, lang, "
        "unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS word "
        "FROM documents), "
        "model AS (SELECT word, count(*) AS c FROM tok GROUP BY word), "
        "tot AS (SELECT count(*) AS n FROM tok), "
        "scored AS (SELECT t.doc_id, t.lang, "
        "round(avg(ln(m.c * 1.0 / tot.n)), 6) AS avg_lp "
        "FROM tok t JOIN model m ON t.word = m.word CROSS JOIN tot "
        "GROUP BY t.doc_id, t.lang), "
        "r AS (SELECT doc_id, lang, avg_lp, "
        "row_number() OVER (PARTITION BY lang ORDER BY avg_lp DESC, doc_id) "
        "AS rk, count(*) OVER (PARTITION BY lang) AS n FROM scored) "
        "SELECT doc_id, lang, avg_lp, "
        "CASE WHEN rk * 3 <= n THEN 'head' WHEN rk * 3 <= 2 * n THEN 'middle' "
        "ELSE 'tail' END AS ppl_bucket FROM r"
    ),
)
def perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al., LREC 2020): score
    each document by its mean token log-probability under the corpus
    unigram LM, then split EACH LANGUAGE into head/middle/tail terciles by
    score rank — the standard curriculum knob (train on head+middle, drop
    tail). Higher avg logprob = lower perplexity = head.

    The per-language rank uses ``grouped_global_rank`` (rank.py): group
    keys prepended to the range exchange + per-(partition, group) offsets —
    NOT ``Window.partitionBy(lang)``, which at 100 TB funnels each
    language (there are only dozens) through a single task. Tercile
    boundaries are integer comparisons (rk·3 vs n), exact on both engines;
    the score is rounded to 6dp before ranking (ln ulp + avg order slack)
    with doc_id tiebreak."""
    from .rank import grouped_global_rank

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        "lang",
        F.explode(F.filter(F.split("text", " "), lambda w: w != "")).alias("word"),
    ).localCheckpoint()  # two consumers: model build + scoring scan
    model = tok.groupBy("word").agg(F.count("*").alias("c"))
    tot = tok.agg(F.count("*").alias("n"))
    scored = (
        tok.join(F.broadcast(model), "word")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id", "lang")
        .agg(F.round(F.avg(F.log(F.col("c") * 1.0 / F.col("n"))), 6).alias("avg_lp"))
    )
    ranked = grouped_global_rank(
        scored.withColumn("neg_lp", -F.col("avg_lp")),
        ["lang"],
        ["neg_lp", "doc_id"],
    )
    counts = scored.groupBy("lang").agg(F.count("*").alias("n"))
    return (
        ranked.join(F.broadcast(counts), "lang")
        .select(
            "doc_id",
            "lang",
            "avg_lp",
            F.when(F.col("rk") * 3 <= F.col("n"), "head")
            .when(F.col("rk") * 3 <= 2 * F.col("n"), "middle")
            .otherwise("tail")
            .alias("ppl_bucket"),
        )
    )


# --- quality_classifier_gd -------------------------------------------------

GD_ITERS = 12  # batch-GD passes (plateaus ~0.84 accuracy on the fixture)
GD_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")
GD_LABEL_STOP_FRAC = 0.06  # weak label: stopword share >= corpus-typical

_SQL_STOPS = ", ".join(f"'{w}'" for w in GD_STOPWORDS)

# Shared feature SQL (DuckDB): x1 = words/100, x2 = stop hits/10,
# x3 = type-token ratio; weak label from the stop fraction.
_FEATS_SQL = (
    "feats AS (SELECT doc_id, "
    "CASE WHEN stop_hits * 1.0 / n_words >= "
    f"{GD_LABEL_STOP_FRAC} THEN 1 ELSE 0 END AS y, "
    "n_words / 100.0 AS x1, stop_hits / 10.0 AS x2, "
    "n_distinct * 1.0 / n_words AS x3 FROM ("
    "SELECT doc_id, len(toks) AS n_words, "
    f"len(list_filter(toks, w -> w IN ({_SQL_STOPS}))) AS stop_hits, "
    "len(list_distinct(toks)) AS n_distinct FROM ("
    "SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') "
    "AS toks FROM documents)) WHERE n_words > 0)"
)


def _gd_oracle() -> str:
    """Unrolled training + scoring SQL: one (gradient, weights) CTE pair
    per GD iteration — the ``pagerank_parts`` unrolled-oracle pattern.
    DuckDB re-runs the whole fixed-point training loop and must land on
    bit-identical weights."""

    # Every iteration CTE is AS MATERIALIZED: w{t} is referenced by both
    # g{t} and w{t+1}, and DuckDB inlines plain CTEs per reference — the
    # two-fanout chain would expand 2^iters copies of the whole training
    # lineage (measured: planner hangs at 12 iterations). Materialization
    # makes the unrolled oracle linear, like the Spark driver loop.
    def z(wref: str) -> str:
        return (
            f"({wref}.w0 + {wref}.w1 * f.x1 + {wref}.w2 * f.x2 "
            f"+ {wref}.w3 * f.x3) / 1000000.0"
        )

    def p(wref: str) -> str:
        return f"least(greatest(0.25 * ({z(wref)}) + 0.5, 0.0), 1.0)"

    parts = [
        "WITH " + _FEATS_SQL.replace("feats AS (", "feats AS MATERIALIZED (", 1),
        "n AS MATERIALIZED (SELECT count(*) AS n FROM feats)",
        "w0 AS (SELECT 0 AS w0, 0 AS w1, 0 AS w2, 0 AS w3)",
    ]
    for t in range(GD_ITERS):
        err = f"(f.y - {p('w')})"
        sums = ", ".join(
            f"sum(CAST(floor({err} * {xj} * 1000000.0 + 0.5) AS BIGINT)) AS g{j}"
            for j, xj in enumerate(["1.0", "f.x1", "f.x2", "f.x3"])
        )
        parts.append(f"g{t} AS MATERIALIZED (SELECT {sums} FROM feats f, w{t} w)")
        ws = ", ".join(
            f"w.w{j} + floor(g.g{j} / (0.25 * n.n)) AS w{j}" for j in range(4)
        )
        parts.append(
            f"w{t + 1} AS MATERIALIZED (SELECT {ws} FROM g{t} g, w{t} w, n)"
        )
    final_p = p("w")
    parts.append(
        "scored AS (SELECT f.doc_id, f.y, "
        f"CAST(floor({final_p} * 1000000.0 + 0.5) AS BIGINT) AS p_e6 "
        f"FROM feats f, w{GD_ITERS} w)"
    )
    return (
        ", ".join(parts)
        + " SELECT doc_id, y, p_e6, p_e6 >= 500000 AS pred FROM scored"
    )


def _gd_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda w: w != "")
    stops = F.array(*[F.lit(s) for s in GD_STOPWORDS])
    base = d.select(
        "doc_id",
        F.size(toks).alias("n_words"),
        F.size(F.filter(toks, lambda w: F.array_contains(stops, w))).alias(
            "stop_hits"
        ),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
    ).filter(F.col("n_words") > 0)
    return base.select(
        "doc_id",
        F.when(
            F.col("stop_hits") * 1.0 / F.col("n_words") >= GD_LABEL_STOP_FRAC, 1
        )
        .otherwise(0)
        .alias("y"),
        (F.col("n_words") / 100.0).alias("x1"),
        (F.col("stop_hits") / 10.0).alias("x2"),
        (F.col("n_distinct") * 1.0 / F.col("n_words")).alias("x3"),
    )


def _hard_sigmoid(zcol: F.Column) -> F.Column:
    return F.least(F.greatest(0.25 * zcol + 0.5, F.lit(0.0)), F.lit(1.0))


def train_quality_classifier(
    feats: DataFrame, iters: int = GD_ITERS
) -> list[int]:
    """Batch gradient descent on (y, x1..x3) with a hard-sigmoid link;
    weights held as integer micro-units. One distributed aggregate per
    pass (partial map-side sums of BIGINT-quantized per-row gradient
    contributions), weights a 4-int driver scalar broadcast back as
    literals — the pagerank convergence-scalar economics. Returns the
    final micro-unit weights."""
    n = feats.count()
    w = [0, 0, 0, 0]
    xs = [F.lit(1.0), F.col("x1"), F.col("x2"), F.col("x3")]
    for _ in range(iters):
        zc = (
            F.lit(w[0]) + F.lit(w[1]) * F.col("x1") + F.lit(w[2]) * F.col("x2")
            + F.lit(w[3]) * F.col("x3")
        ) / 1000000.0
        err = F.col("y") - _hard_sigmoid(zc)
        row = feats.agg(
            *[
                F.sum(F.floor(err * xj * 1000000.0 + 0.5)).alias(f"g{j}")
                for j, xj in enumerate(xs)
            ]
        ).collect()[0]
        w = [w[j] + math.floor(row[f"g{j}"] / (0.25 * n)) for j in range(4)]
    return w


@query("quality_classifier_gd", oracle=_gd_oracle())
def quality_classifier_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering with a classifier TRAINED in-engine —
    the GPT-3/fastText pattern (score every doc against a model fit on
    weak labels; here the weak label is a stopword-share rule the linear
    features can only approximate, so the model genuinely has to learn a
    boundary: ~0.84 accuracy vs 0.52 majority on the sf0.01 fixture).

    Training is 100%-reproducible fixed-point batch GD (module docstring):
    no transcendentals, per-row gradient contributions quantized to BIGINT
    before the sum (order-insensitive by integrality), weights integers.
    The oracle re-runs all 12 training iterations as unrolled CTEs
    and must reach bit-identical weights before scoring — the strongest
    cross-engine check a trained model can get.

    Scale shape: one narrow feature projection (checkpointed once), then
    per pass ONE partial+final aggregate over 4 BIGINT sums and a 4-int
    driver round-trip; scoring is a broadcast-literal projection. T passes
    over 100 TB is the real cost — production would train on a hash-sample
    (``sample_hash``) and score the full corpus, same plan shapes."""
    feats = _gd_features(spark, sf_dir).localCheckpoint()
    w = train_quality_classifier(feats)
    zc = (
        F.lit(w[0]) + F.lit(w[1]) * F.col("x1") + F.lit(w[2]) * F.col("x2")
        + F.lit(w[3]) * F.col("x3")
    ) / 1000000.0
    p_e6 = F.floor(_hard_sigmoid(zc) * 1000000.0 + 0.5).cast("long")
    return feats.select(
        "doc_id",
        "y",
        p_e6.alias("p_e6"),
        (p_e6 >= 500000).alias("pred"),
    )


@query(
    "preference_pairs",
    oracle=(
        # argmax/argmin spelled as row_number windows — result-equivalent
        # to the engine's max-over-struct hash aggregate.
        "WITH t AS (SELECT doc_id, source, lang, "
        "list_filter(string_split(text, ' '), w -> w <> '') AS toks "
        "FROM documents), "
        "s AS (SELECT doc_id, source, lang, "
        "round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) "
        "AS ttr FROM t WHERE len(toks) > 0), "
        "r AS (SELECT *, "
        "row_number() OVER (PARTITION BY source, lang "
        "ORDER BY ttr DESC, doc_id) AS rc, "
        "row_number() OVER (PARTITION BY source, lang "
        "ORDER BY ttr ASC, doc_id) AS rr FROM s) "
        "SELECT source, lang, "
        "max(CASE WHEN rc = 1 THEN doc_id END) AS chosen_id, "
        "max(CASE WHEN rc = 1 THEN ttr END) AS chosen_score, "
        "max(CASE WHEN rr = 1 THEN doc_id END) AS rejected_id, "
        "max(CASE WHEN rr = 1 THEN ttr END) AS rejected_score, "
        "round(max(CASE WHEN rc = 1 THEN ttr END) "
        "- max(CASE WHEN rr = 1 THEN ttr END), 6) AS score_gap "
        "FROM r GROUP BY source, lang"
    ),
)
def preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair construction (the DPO/RLHF dataset-building step):
    per (source, lang) cohort, pair the highest-scoring document (chosen)
    with the lowest (rejected) under a deterministic quality signal —
    here type-token ratio (lexical diversity; exact integer division,
    float-identical cross-engine) — with doc_id tiebreaks, plus the score
    gap a trainer can threshold on. Swap the score column for any of the
    registered quality signals (gopher flags, classifier margin, LM
    logprob) without changing the plan.

    Plan shape: one corpus pass computes the score, then BOTH extremes
    come from ONE hash aggregate (max over (score, -doc_id) / (−score,
    −doc_id) structs — the triplet_mining argmax pattern): partials
    combine map-side and only |cohorts| rows shuffle. The window spelling
    in the oracle would shuffle the whole corpus per extreme."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda w: w != "")
    s = d.select(
        "doc_id",
        "source",
        "lang",
        F.round(
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 6
        ).alias("ttr"),
    ).filter(F.size(toks) > 0)
    best = F.struct(F.col("ttr"), (-F.col("doc_id")).alias("nid"))
    worst = F.struct((-F.col("ttr")).alias("nttr"), (-F.col("doc_id")).alias("nid"))
    agg = s.groupBy("source", "lang").agg(
        F.max(best).alias("c"), F.max(worst).alias("r")
    )
    return agg.select(
        "source",
        "lang",
        (-F.col("c.nid")).alias("chosen_id"),
        F.col("c.ttr").alias("chosen_score"),
        (-F.col("r.nid")).alias("rejected_id"),
        (-F.col("r.nttr")).alias("rejected_score"),
        F.round(F.col("c.ttr") + F.col("r.nttr"), 6).alias("score_gap"),
    )

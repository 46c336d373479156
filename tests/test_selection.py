"""Model-based selection operators: E-S weighted sampling determinism and
math, grouped distributed rank ≡ per-group window, CCNet bucket structure,
and the fixed-point GD classifier reproducing a pure-Python trainer
bit-for-bit (the property the unrolled DuckDB oracle relies on)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from parallel_map_reduce_word_counter_for_one_machine_spark import registry
from parallel_map_reduce_word_counter_for_one_machine_spark.operators.rank import (
    grouped_global_rank,
)
from parallel_map_reduce_word_counter_for_one_machine_spark.operators.selection import (
    GD_ITERS,
    GD_LABEL_STOP_FRAC,
    GD_STOPWORDS,
    SAMPLE_K,
    _gd_features,
    train_quality_classifier,
)

from .oracle import assert_matches_oracle

registry.load_all()


def test_oracle_matches(spark, sf_correct):
    for key in ("sample_weighted", "perplexity_buckets", "quality_classifier_gd"):
        assert_matches_oracle(
            spark, sf_correct, key, registry.QUERIES[key], registry.ORACLES[key]
        )


# --- sample_weighted ---------------------------------------------------------


def _es_reference(spark, sf_dir):
    """Pure-Python Efraimidis–Spirakis over the same md5 uniforms."""
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source", "doc_id", "n_chars")
        .collect()
    )
    keyed = []
    for r in rows:
        h = hashlib.md5(str(r.doc_id).encode()).hexdigest()
        u = (int(h[:8], 16) + 1) / 4294967296.0
        key_e9 = math.floor(math.log(u) / r.n_chars * 1e9 + 0.5)
        keyed.append((r.source, r.doc_id, key_e9))
    out = set()
    for src in {k[0] for k in keyed}:
        grp = sorted(
            (k for k in keyed if k[0] == src), key=lambda k: (-k[2], k[1])
        )
        out.update((src, k[1]) for k in grp[:SAMPLE_K])
    return out


def test_sample_weighted_is_es_over_md5_uniforms(spark, sf_dir):
    got = {
        (r.source, r.doc_id)
        for r in registry.QUERIES["sample_weighted"](spark, sf_dir).collect()
    }
    assert got == _es_reference(spark, sf_dir)


def test_sample_weighted_partitioning_invariant(spark, sf_correct):
    """The kept set is a pure function of the data — identical under a
    hostile repartitioning (the property seeded df.sample lacks)."""
    base = registry.QUERIES["sample_weighted"](spark, sf_correct)
    docs = (
        spark.read.parquet(f"{sf_correct}/documents.parquet").repartition(37)
    )
    docs.createOrReplaceTempView("_sw_repart")
    u64 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    key = F.floor(
        F.log((u64 + 1) / F.lit(4294967296.0))
        / F.col("n_chars")
        * 1000000000.0
        + 0.5
    ).cast("long")
    w = Window.partitionBy("source").orderBy(F.desc("key_e9"), F.asc("doc_id"))
    again = (
        docs.select(
            "source", "doc_id", F.col("n_chars").alias("w"), key.alias("key_e9")
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= SAMPLE_K)
    )
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, again.collect()))


def test_sample_weighted_k_per_group(spark, sf_correct):
    counts = (
        registry.QUERIES["sample_weighted"](spark, sf_correct)
        .groupBy("source")
        .count()
        .collect()
    )
    assert counts and all(r["count"] == SAMPLE_K for r in counts)


# --- grouped_global_rank -----------------------------------------------------


def test_grouped_global_rank_equals_window(spark):
    df = spark.range(0, 997).select(
        (F.col("id") % 7).alias("g"),
        F.md5(F.col("id").cast("string")).alias("k"),
        "id",
    )
    got = grouped_global_rank(df, ["g"], ["k", "id"], num_partitions=8)
    naive = df.withColumn(
        "rk_w",
        F.row_number().over(Window.partitionBy("g").orderBy("k", "id")),
    )
    joined = got.join(naive, ["g", "k", "id"])
    assert joined.filter(F.col("rk") != F.col("rk_w")).count() == 0
    assert got.count() == 997


# --- perplexity_buckets ------------------------------------------------------


def test_perplexity_bucket_structure(spark, sf_correct):
    rows = registry.QUERIES["perplexity_buckets"](spark, sf_correct).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    assert len(by_lang) >= 2
    for lang, rs in by_lang.items():
        sizes = {b: sum(1 for r in rs if r.ppl_bucket == b) for b in ("head", "middle", "tail")}
        n = len(rs)
        # exact tercile split by rank: |bucket| ∈ {floor(n/3), ceil(n/3)}
        for b, s in sizes.items():
            assert n // 3 <= s <= n // 3 + 1, (lang, sizes)
        # every head score >= every tail score (ties broken by doc_id only
        # WITHIN equal scores, which can't cross the strict inequality)
        heads = [r.avg_lp for r in rs if r.ppl_bucket == "head"]
        tails = [r.avg_lp for r in rs if r.ppl_bucket == "tail"]
        assert min(heads) >= max(tails)


# --- quality_classifier_gd ---------------------------------------------------


def _py_train(feats_rows, iters):
    """The trusted twin: plain-Python fixed-point GD, same op shapes."""
    n = len(feats_rows)
    w = [0, 0, 0, 0]

    def hsig(z):
        return min(max(0.25 * z + 0.5, 0.0), 1.0)

    for _ in range(iters):
        g = [0, 0, 0, 0]
        for r in feats_rows:
            x = [1.0, r.x1, r.x2, r.x3]
            z = (w[0] + w[1] * r.x1 + w[2] * r.x2 + w[3] * r.x3) / 1000000.0
            err = r.y - hsig(z)
            for j in range(4):
                g[j] += math.floor(err * x[j] * 1000000.0 + 0.5)
        w = [w[j] + math.floor(g[j] / (0.25 * n)) for j in range(4)]
    return w


def test_gd_weights_match_python_reference(spark, sf_correct):
    feats = _gd_features(spark, sf_correct).localCheckpoint()
    got = train_quality_classifier(feats)
    want = _py_train(feats.collect(), GD_ITERS)
    assert got == want


def test_gd_learns_beyond_majority(spark, sf_correct):
    rows = registry.QUERIES["quality_classifier_gd"](spark, sf_correct).collect()
    n = len(rows)
    pos = sum(r.y for r in rows)
    majority = max(pos, n - pos) / n
    acc = sum((r.p_e6 >= 500000) == bool(r.y) for r in rows) / n
    assert acc >= majority + 0.1, (acc, majority)
    # the weak label really is the stop-frac rule (guards label drift)
    docs = spark.read.parquet(f"{sf_correct}/documents.parquet").collect()
    stops = set(GD_STOPWORDS)
    for d in docs[:50]:
        toks = [w for w in d.text.split(" ") if w]
        want_y = 1 if len([w for w in toks if w in stops]) / len(toks) >= GD_LABEL_STOP_FRAC else 0
        got_y = next(r.y for r in rows if r.doc_id == d.doc_id)
        assert got_y == want_y


def test_preference_pairs_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "preference_pairs",
        registry.QUERIES["preference_pairs"],
        registry.ORACLES["preference_pairs"],
    )


def test_preference_pairs_vs_python(spark, sf_dir):
    """chosen/rejected must be the argmax/argmin type-token-ratio doc per
    (source, lang) with min-doc_id tiebreaks; chosen score >= rejected."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    cohorts = {}
    for r in docs:
        toks = [w for w in r.text.split(" ") if w]
        if not toks:
            continue
        # half-up on the repr, matching the engines' round() (Python's
        # built-in is banker's — flips exact-.5 cases)
        import decimal

        ttr = float(
            decimal.Decimal(repr(len(set(toks)) / len(toks))).quantize(
                decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
            )
        )
        cohorts.setdefault((r.source, r.lang), []).append((ttr, r.doc_id))
    expected = {}
    for k, xs in cohorts.items():
        chosen = min(xs, key=lambda t: (-t[0], t[1]))
        rejected = min(xs, key=lambda t: (t[0], t[1]))
        expected[k] = (
            chosen[1],
            chosen[0],
            rejected[1],
            rejected[0],
            round(chosen[0] - rejected[0], 6),
        )
    got = {
        (r.source, r.lang): (
            r.chosen_id,
            r.chosen_score,
            r.rejected_id,
            r.rejected_score,
            r.score_gap,
        )
        for r in registry.QUERIES["preference_pairs"](spark, sf_dir).collect()
    }
    assert got == expected
    for _, cs, _, rs, gap in got.values():
        assert cs >= rs and gap >= 0

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parallel_map_reduce_word_counter_for_one_machine_spark import registry

from .oracle import assert_matches_oracle

registry.load_all()

ORACLE_KEYS = [
    "join_range",
    "agg_cube",
    "agg_grouping_sets",
    "subquery_in",
    "subquery_scalar",
    "union_all",
    "window_ntile",
    "pivot_status",
    "percentiles",
    "agg_salted",
    "tfidf_ngrams",
    "agg_corr",
    "regr_funcs",
    "map_funcs",
]


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_match(spark, sf_correct, name):
    assert_matches_oracle(
        spark, sf_correct, name, registry.QUERIES[name], registry.ORACLES[name]
    )


def test_approx_distinct_error_bound(spark, sf_correct):
    """The query now evaluates the ±5% HLL envelope in-query (tolerance
    oracle); independently re-derive the raw estimate here and check it."""
    row = registry.QUERIES["approx_distinct"](spark, sf_correct).collect()[0]
    assert row.within_bound and row.exact_customers > 0

    from pyspark.sql import functions as F

    o = spark.read.parquet(f"{sf_correct}/orders.parquet")
    raw = o.agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("a"),
        F.count_distinct("o_custkey").alias("e"),
    ).collect()[0]
    rel_err = abs(raw.a - raw.e) / raw.e
    assert rel_err < 0.05, f"HLL error {rel_err:.3f} too large"
    assert raw.e == row.exact_customers


def test_dedup_fuzzy_alias_matches_lsh(spark, sf_correct):
    a = registry.QUERIES["dedup_fuzzy"](spark, sf_correct)
    b = registry.QUERIES["dedup_minhash_lsh"](spark, sf_correct)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_subquery_in_plans_as_semi_join(spark, sf_dir):
    from parallel_map_reduce_word_counter_for_one_machine_spark.plans.inspect import (
        plan_string,
    )

    df = registry.QUERIES["subquery_in"](spark, sf_dir)
    assert "LeftSemi" in plan_string(df)


def test_word_count_bulk_matches_scaled_counts(spark, sf_dir):
    """Replicating the corpus k times must scale every count by exactly k."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.wordcount import (
        word_count_bulk,
        word_counts,
    )

    k = 3
    base = {r.word: r.cnt for r in word_counts(spark, sf_dir).collect()}
    bulk = {r.word: r.cnt for r in word_count_bulk(spark, sf_dir, copies=k).collect()}
    assert bulk == {w: c * k for w, c in base.items()}


def test_try_funcs_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "scalar_try_funcs",
        registry.QUERIES["scalar_try_funcs"],
        registry.ORACLES["scalar_try_funcs"],
    )


def test_try_funcs_null_on_error_semantics(spark, sf_correct):
    """Both error arms actually fire on the corpus: NULL rows from the
    zero divisor (every l_linenumber == 1) and from the failing cast;
    non-error rows carry real values."""
    from pyspark.sql import functions as F

    out = registry.QUERIES["scalar_try_funcs"](spark, sf_correct).cache()
    n_ln1 = out.filter(F.col("l_linenumber") == 1).count()
    assert n_ln1 > 0
    assert out.filter(
        (F.col("l_linenumber") == 1) & F.col("safe_ratio").isNotNull()
    ).count() == 0
    assert out.filter(
        (F.col("l_linenumber") > 1) & F.col("safe_ratio").isNull()
    ).count() == 0
    assert out.filter(F.col("parsed").isNull()).count() > 0
    assert out.filter(F.col("parsed") == 12).count() > 0
    out.unpersist()


def test_window_cume_dist_domain(spark, sf_correct):
    """Oracle match + distribution-function laws: cd in (0,1] with the
    max of every group exactly 1; pr in [0,1] with the min of every
    group exactly 0; pr < cd row-wise (k-1)/(n-1) < k/n for n > 1."""
    from parallel_map_reduce_word_counter_for_one_machine_spark import registry
    from .oracle import assert_matches_oracle

    assert_matches_oracle(
        spark,
        sf_correct,
        "window_cume_dist",
        registry.QUERIES["window_cume_dist"],
        registry.ORACLES["window_cume_dist"],
    )
    rows = registry.QUERIES["window_cume_dist"](spark, sf_correct).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        assert max(r.cd for r in rs) == 1.0
        assert min(r.pr for r in rs) == 0.0
        for r in rs:
            assert 0 < r.cd <= 1 and 0 <= r.pr <= 1
            if len(rs) > 1:
                # exact pr < cd, but both are ROUNDED at 6dp and can
                # collapse to equal for large groups
                assert r.pr <= r.cd

from __future__ import annotations

import pytest

from parallel_map_reduce_word_counter_for_one_machine_spark import registry

from .oracle import assert_matches_oracle

registry.load_all()


@pytest.mark.parametrize("name", ["dq_profile", "dq_gate"])
def test_oracle_match(spark, sf_correct, name):
    assert_matches_oracle(
        spark, sf_correct, name, registry.QUERIES[name], registry.ORACLES[name]
    )


def test_gate_passes_on_clean_fixture(spark, sf_correct):
    row = registry.QUERIES["dq_gate"](spark, sf_correct).collect()[0]
    assert row.n_rows > 0
    assert row.qty_in_range and row.price_positive
    assert row.returnflag_domain and row.keys_not_null and row.orderkey_unique


def test_gate_catches_violations(spark, tmp_path):
    """The gate must actually FLAG bad data: a corrupted batch with an
    out-of-range quantity, an out-of-domain flag, a null key, and a
    duplicated order key flips exactly those booleans."""
    li_rows = [
        (1, 10.0, 100.0, "A", "1995-06-01"),
        (None, 99.0, -5.0, "X", "1995-06-02"),  # null key, qty>50, price<0, bad flag
    ]
    li = spark.createDataFrame(
        li_rows,
        "l_orderkey long, l_quantity double, l_extendedprice double, "
        "l_returnflag string, ship string",
    ).selectExpr(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag",
        "CAST(ship AS TIMESTAMP) AS l_shipdate",
    )
    li.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    o = spark.createDataFrame([(7,), (7,)], "o_orderkey long")
    o.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    row = registry.QUERIES["dq_gate"](spark, str(tmp_path)).collect()[0]
    assert not row.qty_in_range
    assert not row.price_positive
    assert not row.returnflag_domain
    assert not row.keys_not_null
    assert not row.orderkey_unique


def test_profile_single_scan(spark, sf_dir):
    """The whole profile must come from ONE pass over lineitem — one
    parquet scan in the plan, however many metrics are declared."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.plans.inspect import (
        plan_string,
    )

    p = plan_string(registry.QUERIES["dq_profile"](spark, sf_dir), mode="simple")
    assert p.count("FileScan parquet") == 1


def test_quantile_normalize_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "quantile_normalize_lengths",
        registry.QUERIES["quantile_normalize_lengths"],
        registry.ORACLES["quantile_normalize_lengths"],
    )


def test_quantile_normalize_vs_python(spark, sf_dir):
    """Exact twin: each doc's norm_len is the global length at its
    within-source mid-rank quantile; norm values are drawn from the global
    value multiset and the mapping is rank-monotone within a source."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    s = [(r.doc_id, r.source, r.n_chars) for r in docs]
    glob = sorted(s, key=lambda t: (t[2], t[0]))
    n = len(glob)
    expected = {}
    by_src = {}
    for t in s:
        by_src.setdefault(t[1], []).append(t)
    for src, xs in by_src.items():
        xs.sort(key=lambda t: (t[2], t[0]))
        for i, (doc_id, _, n_chars) in enumerate(xs, start=1):
            # Python round() is banker's; the engines round HALF_UP
            import decimal

            idx = int(
                decimal.Decimal((i - 0.5) / len(xs) * (n - 1)).quantize(
                    0, rounding=decimal.ROUND_HALF_UP
                )
            )
            expected[doc_id] = (src, n_chars, glob[idx][2])
    got = {
        r.doc_id: (r.source, r.n_chars, r.norm_len)
        for r in registry.QUERIES["quantile_normalize_lengths"](
            spark, sf_dir
        ).collect()
    }
    assert got == expected
    # within a source, the mapping is monotone in the original length
    for src, xs in by_src.items():
        seq = [got[d][2] for d, _, _ in sorted(xs, key=lambda t: (t[2], t[0]))]
        assert seq == sorted(seq)


def test_vector_dq_gate_fires_on_every_defect_class(spark, sf_correct):
    """Oracle match + each torture defect detected exactly once and the
    gate verdict demonstrably FALSE on the poisoned feed; percentile
    anchors agree across engines at 6dp."""
    from parallel_map_reduce_word_counter_for_one_machine_spark import registry
    from .oracle import assert_matches_oracle

    assert_matches_oracle(
        spark,
        sf_correct,
        "vector_dq_gate",
        registry.QUERIES["vector_dq_gate"],
        registry.ORACLES["vector_dq_gate"],
    )
    row = registry.QUERIES["vector_dq_gate"](spark, sf_correct).collect()[0]
    assert row.n_bad_dim == 1
    assert row.n_zero_norm == 1
    assert row.n_nonfinite == 1
    assert row.n_dup_ids == 1
    assert not row.gate_pass
    assert 0 < row.normsq_p50 <= row.normsq_p99

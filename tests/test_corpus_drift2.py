"""Entropy + PSI drift: oracle matches and analytic ground truths on
constructed corpora (uniform => entropy_norm 1, constant => 0; identical
slices => PSI exactly 0)."""

from __future__ import annotations

import math

import pytest

from parallel_map_reduce_word_counter_for_one_machine_spark import registry

from .oracle import assert_matches_oracle

registry.load_all()


@pytest.mark.parametrize("name", ["token_entropy_per_source", "drift_psi"])
def test_oracle_match(spark, sf_correct, name):
    assert_matches_oracle(
        spark, sf_correct, name, registry.QUERIES[name], registry.ORACLES[name]
    )


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING"
    )
    out = str(tmp_path)
    df.write.mode("overwrite").parquet(out + "/documents.parquet")
    return out


def test_entropy_analytic_cases(spark, tmp_path):
    rows = [(0, "a b c d a b c d", "en", "uniform")]  # 4 symbols, uniform
    rows += [(1, "x x x x x x", "en", "constant")]  # single symbol
    out = _write_docs(spark, tmp_path, rows)
    got = {
        r.source: r
        for r in registry.QUERIES["token_entropy_per_source"](spark, out).collect()
    }
    assert abs(got["uniform"].entropy - math.log(4)) < 1e-5
    assert abs(got["uniform"].entropy_norm - 1.0) < 1e-5
    assert got["constant"].entropy == 0.0


def test_psi_zero_on_identical_slices(spark, tmp_path):
    # even/odd doc pairs carry identical text => per-bin ca == cb => every
    # smoothed term is exactly 0.
    rows = []
    for i in range(10):
        text = "w " * (5 + 3 * i)
        rows.append((2 * i, text.strip(), "en", "s"))
        rows.append((2 * i + 1, text.strip(), "en", "s"))
    out = _write_docs(spark, tmp_path, rows)
    row = registry.QUERIES["drift_psi"](spark, out).collect()[0]
    assert row.psi == 0.0 and row.stable is True


def test_psi_trips_on_shifted_lengths(spark, tmp_path):
    # baseline slice short docs, refresh slice long docs => large PSI.
    rows = []
    for i in range(10):
        rows.append((2 * i, ("a " * 5).strip(), "en", "s"))
        rows.append((2 * i + 1, ("a " * 80).strip(), "en", "s"))
    out = _write_docs(spark, tmp_path, rows)
    row = registry.QUERIES["drift_psi"](spark, out).collect()[0]
    assert row.psi > 0.25 and row.stable is False


def test_drift_ks_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "drift_ks",
        registry.QUERIES["drift_ks"],
        registry.ORACLES["drift_ks"],
    )


def test_ks_zero_on_identical_slices(spark, tmp_path):
    rows = []
    for i in range(10):
        text = ("w " * (5 + 3 * i)).strip()
        rows.append((2 * i, text, "en", "s"))
        rows.append((2 * i + 1, text, "en", "s"))
    out = _write_docs(spark, tmp_path, rows)
    row = registry.QUERIES["drift_ks"](spark, out).collect()[0]
    assert row.ks_stat == 0.0 and row.stable is True


def test_ks_one_on_disjoint_supports(spark, tmp_path):
    rows = []
    for i in range(10):
        rows.append((2 * i, ("a " * 5).strip(), "en", "s"))
        rows.append((2 * i + 1, ("a " * 80).strip(), "en", "s"))
    out = _write_docs(spark, tmp_path, rows)
    row = registry.QUERIES["drift_ks"](spark, out).collect()[0]
    assert row.ks_stat == 1.0 and row.stable is False

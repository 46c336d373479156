"""k-anonymity suppression gate: class audit vs the DuckDB oracle plus the
release-semantics properties (every released class ≥ k, accounting sums to
the full table, the suppress-join drops exactly the small classes)."""

from __future__ import annotations

from parallel_map_reduce_word_counter_for_one_machine_spark import registry
from parallel_map_reduce_word_counter_for_one_machine_spark.operators.pipeline import (
    K_ANON,
)

from .oracle import assert_matches_oracle

registry.load_all()


def test_k_anonymity_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "k_anonymity",
        registry.QUERIES["k_anonymity"],
        registry.ORACLES["k_anonymity"],
    )


def test_k_anonymity_release_semantics(spark, sf_correct):
    classes = registry.QUERIES["k_anonymity"](spark, sf_correct).collect()
    total = spark.read.parquet(f"{sf_correct}/events.parquet").count()
    # the audit partitions the table: class row counts sum to the corpus
    assert sum(r.n_rows for r in classes) == total
    for r in classes:
        assert r.released == (r.n_rows >= K_ANON)
        # a class cannot have more distinct users than rows, nor zero
        assert 1 <= r.n_users <= r.n_rows
    # the gate is non-degenerate on this corpus: both outcomes occur
    assert any(r.released for r in classes)
    assert any(not r.released for r in classes)

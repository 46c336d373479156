from __future__ import annotations

from pyspark.sql import functions as F

from parallel_map_reduce_word_counter_for_one_machine_spark import registry
from parallel_map_reduce_word_counter_for_one_machine_spark.operators import dedup as D

from .oracle import assert_matches_oracle

registry.load_all()


def test_oracle_match(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "dedup_incremental_fuzzy",
        registry.QUERIES["dedup_incremental_fuzzy"],
        registry.ORACLES["dedup_incremental_fuzzy"],
    )


def test_gate_verdict_flags_hold(spark, sf_correct):
    row = registry.QUERIES["dedup_incremental_fuzzy"](spark, sf_correct).collect()[0]
    assert row.n_incoming > 0
    assert row.n_dup_truth > 0  # non-vacuous: the corpus has near-dup families
    assert row.precision_ok and row.recall_ok


def test_gate_flags_planted_near_dup(spark, tmp_path):
    """End-to-end on a planted corpus: an incoming doc that is a one-token
    edit of a corpus doc must be flagged; an unrelated incoming doc must
    not. doc_id % 10 == 0 marks incoming."""
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    rows = [
        (1, base, "s", "en"),                           # corpus original
        (3, "completely different words entirely " * 8, "s", "en"),  # corpus
        (10, base.replace("lazy", "sleepy", 1), "s", "en"),  # incoming near-dup
        (20, "unrelated incoming text with nothing shared " * 6, "s", "en"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, source string, lang string")
    d.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    flags = {
        r.doc_id: r.dup_of_corpus
        for r in D.fuzzy_gate_flags(spark, str(tmp_path)).collect()
    }
    assert flags == {10: True, 20: False}


def test_stream_gate_equals_batch_gate(spark, sf_correct):
    """The REAL readStream gate (stream-static joins against the standing
    index + shingle table, append-mode match events) must flag exactly the
    batch gate's doc set."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.streaming.fuzzygate import (
        run_stream_fuzzy_gate,
    )

    batch = {
        r.doc_id
        for r in D.fuzzy_gate_flags(spark, sf_correct)
        .filter(F.col("dup_of_corpus"))
        .collect()
    }
    ev = run_stream_fuzzy_gate(spark, sf_correct, "fuzzygate_eq_test")
    stream = {r.in_id for r in ev.select("in_id").distinct().collect()}
    assert batch == stream
    assert batch  # non-vacuous


def test_registered_stream_gate_matches_oracle(spark, sf_correct):
    """Driver-gated streaming gate: the drained event set must yield the
    same precision/recall verdict as the batch gate, under the same
    exact-truth oracle."""
    from parallel_map_reduce_word_counter_for_one_machine_spark import registry
    from parallel_map_reduce_word_counter_for_one_machine_spark.streaming import (
        fuzzygate,  # noqa: F401 — registers the key
    )
    from .oracle import assert_matches_oracle

    assert_matches_oracle(
        spark,
        sf_correct,
        "stream_fuzzy_gate",
        registry.QUERIES["stream_fuzzy_gate"],
        registry.ORACLES["stream_fuzzy_gate"],
    )
    row = registry.QUERIES["stream_fuzzy_gate"](spark, sf_correct).collect()[0]
    assert row.precision_ok and row.recall_ok and row.n_dup_truth > 0

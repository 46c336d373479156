"""BM25 retrieval + bigram Stupid-Backoff LM: oracle matches and the
structural properties each relation promises."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parallel_map_reduce_word_counter_for_one_machine_spark import registry
from parallel_map_reduce_word_counter_for_one_machine_spark.operators.retrieval import (
    N_TERMS,
    TOP_DOCS,
)
from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
    load_table,
)

from .oracle import assert_matches_oracle

registry.load_all()


@pytest.mark.parametrize("name", ["bm25_topk", "lm_bigram_backoff"])
def test_oracle_match(spark, sf_correct, name):
    assert_matches_oracle(
        spark, sf_correct, name, registry.QUERIES[name], registry.ORACLES[name]
    )


def test_bm25_shape_and_monotonicity(spark, sf_correct):
    rows = registry.QUERIES["bm25_topk"](spark, sf_correct).collect()
    by_term = {}
    for r in rows:
        by_term.setdefault(r.term, []).append(r)
    assert len(by_term) == N_TERMS
    for term, rs in by_term.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= TOP_DOCS
        scores = [r.score for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert all(s > 0 for s in scores)  # +1 idf never goes negative


def test_bigram_counts_per_doc(spark, sf_correct):
    """n_bigrams must equal n_tokens - 1 for every multi-token doc (the
    element_at pass must not drop or duplicate pairs)."""
    got = {
        r.doc_id: r.n_bigrams
        for r in registry.QUERIES["lm_bigram_backoff"](spark, sf_correct).collect()
    }
    toks = (
        load_table(spark, sf_correct, "documents")
        .select(
            "doc_id",
            F.size(F.filter(F.split("text", " "), lambda w: w != "")).alias("n"),
        )
        .collect()
    )
    for r in toks:
        if r.n >= 2:
            assert got[r.doc_id] == r.n - 1
        else:
            assert r.doc_id not in got


def test_backoff_scores_disfluent_text_lower(spark, tmp_path):
    """The discriminative claim, on a corpus that HAS bigram structure
    (the driver corpus is random tokens, where word order carries no
    signal): docs following the dominant cyclic pattern must outscore
    docs with the same unigrams in a scrambled order — scrambled bigrams
    are rare or unseen, so they pay the conditional-probability drop or
    the backoff discount."""
    pattern = "alpha beta gamma delta epsilon " * 8
    scrambled = "beta delta alpha epsilon gamma " * 8
    rows = [(i, pattern.strip(), "en", "src0") for i in range(18)]
    rows += [(100 + i, scrambled.strip(), "en", "src0") for i in range(2)]
    df = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING"
    )
    out = str(tmp_path)
    df.write.mode("overwrite").parquet(out + "/documents.parquet")
    got = {
        r.doc_id: r.avg_logscore
        for r in registry.QUERIES["lm_bigram_backoff"](spark, out).collect()
    }
    worst_pattern = min(got[i] for i in range(18))
    best_scrambled = max(got[100 + i] for i in range(2))
    assert best_scrambled < worst_pattern

from __future__ import annotations

import pytest

from parallel_map_reduce_word_counter_for_one_machine_spark import registry

from .oracle import assert_matches_oracle

registry.load_all()

TEXT_KEYS = [
    "text_stats",
    "lang_id",
    "quality_score",
    "token_count_bpe",
    "doc_fingerprint",
    "ngram_bigrams",
    "tfidf",
]


@pytest.mark.parametrize("name", TEXT_KEYS)
def test_oracle_match(spark, sf_correct, name):
    assert_matches_oracle(
        spark, sf_correct, name, registry.QUERIES[name], registry.ORACLES[name]
    )

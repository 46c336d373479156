from __future__ import annotations

import pytest

from parallel_map_reduce_word_counter_for_one_machine_spark import registry

from .oracle import assert_matches_oracle

registry.load_all()

WORDCOUNT_KEYS = [
    "text_scan",
    "tokenize_explode",
    "word_count",
    "word_count_alpha",
    "sort_by_count_desc",
    "word_count_topk",
    "distinct_words",
    "format_output",
]


@pytest.mark.parametrize("name", WORDCOUNT_KEYS)
def test_smoke_rows(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


@pytest.mark.parametrize("name", WORDCOUNT_KEYS)
def test_oracle_match(spark, sf_correct, name):
    assert_matches_oracle(
        spark, sf_correct, name, registry.QUERIES[name], registry.ORACLES[name]
    )


def test_write_listings(spark, sf_dir, tmp_path):
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.wordcount import (
        write_listings,
    )

    out = str(tmp_path / "out")
    write_listings(spark, sf_dir, out)
    alpha = spark.read.text(f"{out}/alpha")
    assert alpha.count() > 0
    first = alpha.limit(1).collect()[0][0]
    assert " -> " in first

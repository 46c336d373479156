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

    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.wordcount import (
        ALPHA_HEADER,
        BY_COUNT_HEADER,
    )

    out = str(tmp_path / "out")
    write_listings(spark, sf_dir, out)
    alpha = [r[0] for r in spark.read.text(f"{out}/alpha").collect()]
    assert alpha[0] == ALPHA_HEADER  # reference src/main.cpp:231
    assert len(alpha) > 1 and all(" -> " in l for l in alpha[1:])
    by_count = [r[0] for r in spark.read.text(f"{out}/by_count").collect()]
    assert by_count[0] == BY_COUNT_HEADER  # reference src/main.cpp:262
    assert len(by_count) == len(alpha)

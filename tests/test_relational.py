from __future__ import annotations

import pytest

from parallel_map_reduce_word_counter_for_one_machine_spark import registry

from .oracle import assert_matches_oracle

registry.load_all()

RELATIONAL_KEYS = [
    "filter_project",
    "join_inner",
    "join_left",
    "join_semi",
    "join_anti",
    "star_join_agg",
    "agg_group",
    "agg_rollup",
    "agg_stats",
    "window_rank",
    "window_running",
    "window_lag_lead",
    "sort_limit_topk",
    "set_union",
    "set_except",
    "set_intersect",
    "scalar_funcs",
    "date_funcs",
    "json_extract",
]


@pytest.mark.parametrize("name", RELATIONAL_KEYS)
def test_oracle_match(spark, sf_correct, name):
    assert_matches_oracle(
        spark, sf_correct, name, registry.QUERIES[name], registry.ORACLES[name]
    )

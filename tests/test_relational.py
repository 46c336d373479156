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


def test_json_variant_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "json_variant",
        registry.QUERIES["json_variant"],
        registry.ORACLES["json_variant"],
    )


def test_json_variant_typed_extraction(spark):
    """variant_get on nested objects and array indexes, and NULL for
    missing paths — the semantics the registered key relies on."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, '{"a": 5, "b": {"c": "x"}, "arr": [10, 20]}'), (2, '{"a": null}')],
        "id long, j string",
    )
    v = F.parse_json("j")
    rows = {
        r.id: r
        for r in df.select(
            "id",
            F.variant_get(v, "$.a", "long").alias("a"),
            F.variant_get(v, "$.b.c", "string").alias("c"),
            F.variant_get(v, "$.arr[1]", "long").alias("arr1"),
            F.variant_get(v, "$.nope", "string").alias("nope"),
        ).collect()
    }
    assert rows[1].a == 5 and rows[1].c == "x" and rows[1].arr1 == 20
    assert rows[1].nope is None
    assert rows[2].a is None and rows[2].c is None

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parallel_map_reduce_word_counter_for_one_machine_spark import registry

from .oracle import assert_matches_oracle

registry.load_all()


@pytest.mark.parametrize(
    "name", [
        "udf_scalar_pandas",
        "udf_grouped_agg",
        "arrow_vector_norms",
        "udf_arrow_optimized",
        "robust_length_stats",
    ]
)
def test_oracle_match(spark, sf_correct, name):
    assert_matches_oracle(
        spark, sf_correct, name, registry.QUERIES[name], registry.ORACLES[name]
    )


def test_udtf_equals_posexplode(spark, sf_correct):
    """The UDTF tokenizer must produce exactly the split+posexplode rows."""
    udtf_rows = registry.QUERIES["udtf_split_words"](spark, sf_correct)
    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    expr_rows = (
        docs.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word"))
        .filter(F.col("word") != "")
        .select("doc_id", "word", "pos")
    )
    assert sorted(map(tuple, udtf_rows.collect())) == sorted(
        map(tuple, expr_rows.collect())
    )


def test_map_in_arrow_equals_expression_norm(spark, sf_correct):
    """The Arrow-native path must agree with the pure-expression L2 norm
    (aggregate over the array) — same twin-check discipline as the UDTF."""
    from pyspark.sql import functions as F

    from parallel_map_reduce_word_counter_for_one_machine_spark.functions.udfs import (
        arrow_vector_norms,
    )
    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        load_table,
    )

    got = {
        (r.vec_id, r.l2)
        for r in arrow_vector_norms(spark, sf_correct).collect()
    }
    expr = load_table(spark, sf_correct, "embeddings").select(
        "vec_id",
        F.round(
            F.sqrt(
                F.aggregate(
                    "embedding",
                    F.lit(0.0),
                    lambda acc, x: acc + x * x,
                )
            ),
            6,
        ).alias("l2"),
    )
    want = {(r.vec_id, r.l2) for r in expr.collect()}
    assert got == want and got

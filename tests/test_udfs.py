from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parallel_map_reduce_word_counter_for_one_machine_spark import registry

from .oracle import assert_matches_oracle

registry.load_all()


@pytest.mark.parametrize("name", ["udf_scalar_pandas", "udf_grouped_agg"])
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

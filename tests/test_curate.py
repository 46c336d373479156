from __future__ import annotations

from parallel_map_reduce_word_counter_for_one_machine_spark import registry
from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
    SCHEMAS,
    load_table,
)

from .oracle import assert_matches_oracle

registry.load_all()


def test_curate_corpus_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "curate_corpus",
        registry.QUERIES["curate_corpus"],
        registry.ORACLES["curate_corpus"],
    )


def test_orc_roundtrip(spark, sf_correct, tmp_path):
    """ORC connector (another format the reference lacks, SURVEY.md §2b)."""
    src = load_table(spark, sf_correct, "part")
    out = str(tmp_path / "part_orc")
    src.write.mode("overwrite").orc(out)
    back = spark.read.schema(SCHEMAS["part"]).orc(out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.utils import AnalysisException

from .oracle import assert_matches_oracle

from parallel_map_reduce_word_counter_for_one_machine_spark.sources.jsonio import (
    CORRUPT_COL,
    quarantine_split,
    read_jsonl,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

LINES = [
    '{"id": 1, "text": "good"}',
    '{"id": "not-a-number", "text": "bad type"}',
    "{broken json",
    '{"id": 4, "text": "also good"}',
]


@pytest.fixture()
def jsonl_path(tmp_path):
    p = tmp_path / "feed.jsonl"
    p.write_text("\n".join(LINES) + "\n")
    return str(p)


def test_permissive_quarantines_malformed(spark, jsonl_path):
    df = read_jsonl(spark, jsonl_path, SCHEMA)
    assert CORRUPT_COL in df.columns
    clean, bad = quarantine_split(df)
    assert {r["id"] for r in clean.collect()} == {1, 4}
    raw = [r[CORRUPT_COL] for r in bad.collect()]
    assert len(raw) == 2
    # the raw line is preserved for replay
    assert any("broken json" in r for r in raw)


def test_dropmalformed_drops(spark, jsonl_path):
    df = read_jsonl(spark, jsonl_path, SCHEMA, mode="dropmalformed")
    assert sorted(r["id"] for r in df.collect()) == [1, 4]


def test_failfast_raises(spark, jsonl_path):
    with pytest.raises(Exception) as ei:
        read_jsonl(spark, jsonl_path, SCHEMA, mode="failfast").collect()
    assert "Malformed" in str(ei.value) or "FAILFAST" in str(ei.value)


def test_bad_mode_rejected(spark, jsonl_path):
    with pytest.raises(ValueError):
        read_jsonl(spark, jsonl_path, SCHEMA, mode="lenient")


def test_stream_resumes_across_restarts_with_new_files(
    spark, sf_correct, tmp_path
):
    """Incremental resume: a checkpointed file stream picks up ONLY files
    that arrived since the last run — no reprocessing, no loss. This is the
    operational loop of a continuously-ingesting corpus (new crawl dumps
    landing between runs)."""
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        load_table,
    )

    events = load_table(spark, sf_correct, "events").select(
        "event_id", "event_type", "value"
    )
    chunks = events.randomSplit([0.25, 0.25, 0.25, 0.25], seed=7)

    def land(i):
        chunks[i].write.mode("overwrite").parquet(f"{src}/chunk={i}")

    def drain():
        q = (
            spark.readStream.schema(events.schema)
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    land(0)
    land(1)
    drain()
    n_first = spark.read.parquet(out).count()
    assert n_first == chunks[0].count() + chunks[1].count()

    land(2)
    land(3)
    drain()
    sink = spark.read.parquet(out)
    assert sink.count() == 10000
    assert sink.agg(F.count_distinct("event_id")).collect()[0][0] == 10000


CSV_LINES = [
    "id,text",
    "1,good",
    "not-a-number,bad id",
    "4,also good",
]


def test_csv_robust_modes(spark, tmp_path):
    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.jsonio import (
        read_csv_robust,
    )

    p = tmp_path / "feed.csv"
    p.write_text("\n".join(CSV_LINES) + "\n")

    df = read_csv_robust(spark, str(p), SCHEMA)
    clean, bad = quarantine_split(df)
    assert {r["id"] for r in clean.collect()} == {1, 4}
    # collect (not count): count() would prune the scan down to the corrupt
    # column alone, hitting QUERY_ONLY_CORRUPT_RECORD_COLUMN again.
    assert len(bad.collect()) == 1

    dropped = read_csv_robust(spark, str(p), SCHEMA, mode="dropmalformed")
    assert sorted(r["id"] for r in dropped.collect()) == [1, 4]


def test_merge_schema_unions_footers_and_nulls_old_rows(spark, sf_correct, tmp_path):
    """mergeSchema read: all 5 columns present, generation-1 rows read
    with NULL source/n_chars, no rows dropped."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.evolution import (
        read_evolved,
        write_evolving_batches,
    )
    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        load_table,
    )

    root = str(tmp_path / "evolve")
    write_evolving_batches(spark, sf_correct, root)
    d = read_evolved(spark, root)
    assert set(d.columns) >= {"doc_id", "text", "lang", "source", "n_chars"}
    docs = load_table(spark, sf_correct, "documents")
    assert d.count() == docs.count()
    gen1 = d.filter(F.col("doc_id") % 2 == 0)
    assert gen1.filter(F.col("source").isNotNull()).count() == 0
    assert gen1.filter(F.col("n_chars").isNotNull()).count() == 0
    gen2 = d.filter(F.col("doc_id") % 2 == 1)
    assert gen2.filter(F.col("source").isNull()).count() == 0


def test_schema_evolution_key_matches_oracle(spark, sf_correct):
    from parallel_map_reduce_word_counter_for_one_machine_spark import registry

    registry.load_all()
    assert_matches_oracle(
        spark,
        sf_correct,
        "schema_evolution_read",
        registry.QUERIES["schema_evolution_read"],
        registry.ORACLES["schema_evolution_read"],
    )


def test_union_by_name_is_the_dataframe_twin_of_merge_schema(
    spark, sf_correct, tmp_path
):
    """unionByName(allowMissingColumns=True) over the two generations
    reconstructs exactly what the mergeSchema read returns — the in-memory
    and on-disk spellings of additive evolution agree."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.evolution import (
        read_evolved,
        write_evolving_batches,
    )

    root = str(tmp_path / "ubn")
    write_evolving_batches(spark, sf_correct, root)
    merged = read_evolved(spark, root)
    import os

    gen1 = spark.read.parquet(os.path.join(root, "batch=1"))
    gen2 = spark.read.parquet(os.path.join(root, "batch=2"))
    ubn = gen1.unionByName(gen2, allowMissingColumns=True)
    cols = sorted(merged.columns)
    a = sorted(map(tuple, merged.select(*cols).collect()))
    b = sorted(map(tuple, ubn.select(*cols).collect()))
    assert a == b and a


def test_file_metadata_columns_expose_lineage(spark, sf_correct, tmp_path):
    """The hidden `_metadata` struct: every row can name the file it came
    from (file-level quarantine/lineage at scale). Per-file row counts
    through _metadata agree with reading each file individually."""
    import os

    from pyspark.sql import functions as F

    root = str(tmp_path / "meta")
    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    docs.repartition(4).write.parquet(root)
    d = spark.read.parquet(root).select(
        "doc_id", F.col("_metadata.file_name").alias("fname")
    )
    per_file = {
        r.fname: r.n
        for r in d.groupBy("fname").agg(F.count("*").alias("n")).collect()
    }
    files = [f for f in os.listdir(root) if f.endswith(".parquet")]
    assert set(per_file) == set(files) and len(files) == 4
    for f in files:
        assert per_file[f] == spark.read.parquet(os.path.join(root, f)).count()
    assert sum(per_file.values()) == docs.count()

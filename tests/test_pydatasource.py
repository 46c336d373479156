"""Custom Python Data Source (format("wordgen")): determinism across
partitionings, filter pushdown absorbed into the generator, and
composition with the word-count pipeline."""

from __future__ import annotations

from collections import Counter

import pytest

from pyspark.sql import functions as F

from parallel_map_reduce_word_counter_for_one_machine_spark.sources.pydatasource import (
    _doc_text,
    register,
)


@pytest.fixture(scope="module")
def wordgen(spark):
    register(spark)
    return spark


def _load(spark, **opts):
    r = spark.read.format("wordgen")
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_deterministic_and_partitioned(wordgen):
    df = _load(wordgen, docs=200, partitions=7)
    assert df.rdd.getNumPartitions() == 7
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, _load(wordgen, docs=200, partitions=3).collect()))
    assert a == b  # content independent of parallelism
    assert len(a) == 200 and len({t[0] for t in a}) == 200
    # rows match the reference generator exactly
    for doc_id, text in a[:20]:
        assert text == _doc_text(42, doc_id)


def test_filter_pushdown_absorbed(wordgen):
    df = _load(wordgen, docs=500, partitions=5)
    f = df.filter((F.col("doc_id") >= 90) & (F.col("doc_id") < 95))
    assert sorted(r.doc_id for r in f.collect()) == [90, 91, 92, 93, 94]
    # the range predicate is absorbed by pushFilters: the executed plan is
    # a bare Python BatchScan with NO post-scan Filter node
    plan = f._jdf.queryExecution().executedPlan().toString()
    assert "BatchScan wordgen" in plan
    assert "Filter " not in plan, plan


def test_unsupported_filter_still_correct(wordgen):
    """A predicate pushFilters declines (on text) must be evaluated by
    Spark after the scan — correctness identical, Filter node present."""
    df = _load(wordgen, docs=100, partitions=4)
    f = df.filter(F.col("text").contains("spark") & (F.col("doc_id") < 50))
    rows = f.collect()
    for r in rows:
        assert "spark" in r.text and r.doc_id < 50
    expect = sum(
        1 for i in range(50) if "spark" in _doc_text(42, i)
    )
    assert len(rows) == expect > 0
    plan = f._jdf.queryExecution().executedPlan().toString()
    assert "Filter" in plan  # the declined predicate stays Spark-side


def test_compose_with_word_count(wordgen):
    """The generated corpus flows through the standard tokenize+count
    pipeline; result equals a Python recount of the generator output."""
    df = _load(wordgen, docs=300, partitions=6)
    wc = (
        df.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    got = {r.word: r.cnt for r in wc.collect()}
    truth: Counter = Counter()
    for i in range(300):
        truth.update(_doc_text(42, i).split(" "))
    assert got == dict(truth)


def test_streaming_wordgen_equals_batch(wordgen):
    """The streaming face of the source (SimpleDataSourceStreamReader)
    must emit exactly the batch corpus, across several micro-batches,
    with replayable offsets (the runner itself re-reads batches through
    readBetweenOffsets during prefetch)."""
    import time

    q = (
        wordgen.readStream.format("wordgen")
        .option("docs", "250")
        .option("batch_docs", "100")
        .load()
        .writeStream.format("memory")
        .queryName("t_wg_stream")
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            if wordgen.sql("SELECT count(*) c FROM t_wg_stream").collect()[0].c >= 250:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    rows = wordgen.sql("SELECT * FROM t_wg_stream").collect()
    got = sorted((r.doc_id, r.text) for r in rows)
    expect = sorted((i, _doc_text(42, i)) for i in range(250))
    assert got == expect

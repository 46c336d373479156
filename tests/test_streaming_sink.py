from __future__ import annotations

from pyspark.sql import functions as F


def _events_stream(spark, sf_dir):
    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        read_events_stream,
    )

    return read_events_stream(spark, sf_dir).select(
        "event_id", "event_type", "value"
    )


def test_file_sink_exactly_once_on_restart(spark, sf_correct, tmp_path):
    """Streaming parquet sink + checkpoint: a second run over the same
    checkpoint must be a no-op (the source offset is committed), so the
    sink holds each input row exactly once — the recovery guarantee the
    reference's restart-from-scratch batch loop doesn't have."""
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            _events_stream(spark, sf_correct)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    n1 = spark.read.parquet(out).count()
    run_once()  # restart over same checkpoint: no new input -> no new rows
    n2 = spark.read.parquet(out).count()
    assert n1 == 10000
    assert n2 == n1, f"duplicated rows on restart: {n2} != {n1}"
    # content spot check
    total = spark.read.parquet(out).agg(F.count_distinct("event_id")).collect()[0][0]
    assert total == 10000


def test_foreachbatch_upsert_state_equals_batch(spark, sf_correct, tmp_path):
    """The foreachBatch MERGE sink's final state must equal the batch
    computation of latest-row-per-user over the whole feed, regardless of
    how the stream was micro-batched."""
    from pyspark.sql import functions as F

    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        load_table,
    )
    from parallel_map_reduce_word_counter_for_one_machine_spark.streaming.upsertsink import (
        _latest_per_key,
        run_stream_upsert,
    )

    state = str(tmp_path / "upsert_state")
    final = run_stream_upsert(spark, sf_correct, state, "t_upsert_sink")
    expect = _latest_per_key(load_table(spark, sf_correct, "events"))
    a = sorted(map(tuple, final.collect()))
    b = sorted(map(tuple, expect.collect()))
    assert a == b and len(a) > 0

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parallel_map_reduce_word_counter_for_one_machine_spark import registry
from parallel_map_reduce_word_counter_for_one_machine_spark.streaming.tumbling import (
    run_stream_session,
    run_stream_sliding,
    run_stream_tumbling,
)

from .oracle import assert_matches_oracle

registry.load_all()

ORACLE_KEYS = [
    "stream_tumbling_agg",
    "stream_sliding_agg",
    "stream_session_window",
    "multimodal_meta",
    "multimodal_frames",
]


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_match(spark, sf_correct, name):
    assert_matches_oracle(
        spark, sf_correct, name, registry.QUERIES[name], registry.ORACLES[name]
    )


def test_stream_equals_batch(spark, sf_correct):
    """Structured Streaming run (readStream + watermark + availableNow) must
    produce exactly the batch result — the equivalence that justifies
    checking streaming semantics against a batch oracle."""
    stream_df = run_stream_tumbling(spark, sf_correct, "t_stream_tumbling")
    batch_df = registry.QUERIES["stream_tumbling_agg"](spark, sf_correct)
    s = sorted(map(tuple, stream_df.collect()))
    b = sorted(map(tuple, batch_df.collect()))
    assert s == b


def test_sliding_stream_equals_batch(spark, sf_correct):
    stream_df = run_stream_sliding(spark, sf_correct, "t_stream_sliding")
    batch_df = registry.QUERIES["stream_sliding_agg"](spark, sf_correct)
    assert sorted(map(tuple, stream_df.collect())) == sorted(
        map(tuple, batch_df.collect())
    )


def test_session_stream_equals_batch(spark, sf_correct):
    stream_df = run_stream_session(spark, sf_correct, "t_stream_session")
    batch_df = registry.QUERIES["stream_session_window"](spark, sf_correct)
    assert sorted(map(tuple, stream_df.collect())) == sorted(
        map(tuple, batch_df.collect())
    )


def test_multimodal_decode_deterministic(spark, sf_correct):
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.multimodal import (
        decode_features,
    )

    raw = decode_features(spark, sf_correct)
    feat = raw.select(F.size("feat").alias("n")).distinct().collect()
    assert [r.n for r in feat] == [8]

    df = registry.QUERIES["multimodal_decode"](spark, sf_correct)
    rows1 = sorted(map(tuple, df.collect()))
    rows2 = sorted(map(tuple, df.collect()))
    assert rows1 == rows2
    assert len(rows1) == 500
    # canonical feat_bytes round-trips the raw doubles: 8 ints in 0..255
    parts = rows1[0][-1].split(",")
    assert len(parts) == 8 and all(0 <= int(p) <= 255 for p in parts)


def test_multimodal_resize_shape_and_determinism(spark, sf_correct):
    """Binary-in/binary-out resize plumbing: one row per blob, fixed target
    dimensions, fixed thumbnail size, byte-deterministic across runs."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.multimodal import (
        _RESIZE_TARGET,
        blobs,
        resize_thumbs,
    )

    out = resize_thumbs(spark, sf_correct)
    rows = out.collect()
    assert len(rows) == blobs(spark, sf_correct).count()
    assert {(r["width"], r["height"]) for r in rows} == {_RESIZE_TARGET}
    assert {len(r["thumb"]) for r in rows} == {32}
    again = {r["doc_id"]: bytes(r["thumb"]) for r in resize_thumbs(spark, sf_correct).collect()}
    assert all(bytes(r["thumb"]) == again[r["doc_id"]] for r in rows)
    # registered canonical form carries the same bytes as hex
    hexed = {
        r["doc_id"]: r["thumb_hex"]
        for r in registry.QUERIES["multimodal_resize"](spark, sf_correct).collect()
    }
    assert all(bytes(r["thumb"]).hex().upper() == hexed[r["doc_id"]] for r in rows)


def test_chained_stateful_aggs_stream_vs_batch(spark, sf_correct):
    """TWO stateful aggregations chained in one streaming query (hourly →
    6-hourly rollup): every emitted row matches the batch twin exactly,
    and every 6-hour window the final watermark closed was emitted —
    append-mode finalization, the same contract as the outer stream-stream
    join test. Oracle parity of the batch face is checked separately."""
    import datetime

    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        load_table,
    )
    from parallel_map_reduce_word_counter_for_one_machine_spark.streaming.tumbling import (
        run_stream_chained,
        stream_chained_windows,
    )

    batch = set(map(tuple, stream_chained_windows(spark, sf_correct).collect()))
    stream = set(
        map(
            tuple,
            run_stream_chained(spark, sf_correct, "t_chained_aggs").collect(),
        )
    )
    assert stream <= batch, "stream emitted rows the batch twin disowns"
    ev = load_table(spark, sf_correct, "events")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    # tumbling.WATERMARK is 10 min; +1 h margin for per-batch watermark lag
    # (derived from the PREVIOUS batch's max event time)
    cutoff_ms = int(
        (max_ts - datetime.timedelta(minutes=70)).timestamp() * 1000
    )
    six_h_ms = 6 * 3600 * 1000
    finalized = {t for t in batch if t[0] + six_h_ms <= cutoff_ms}
    missing = finalized - stream
    assert not missing, f"{len(missing)} finalized windows not emitted"
    assert stream  # the chained path actually produced output


def test_stream_chained_windows_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "stream_chained_windows",
        registry.QUERIES["stream_chained_windows"],
        registry.ORACLES["stream_chained_windows"],
    )


def test_streaming_query_listener_observes_progress(spark, sf_correct):
    """StreamingQueryListener — the ops surface a production pipeline
    hangs monitoring on: start/progress/termination events fire with the
    query's id, progress reports the true input row count, and the
    listener detaches cleanly. (df.observe metrics piggyback is covered in
    test_streaming_sink; this pins the listener half.)"""
    import time

    from pyspark.sql.streaming import StreamingQueryListener

    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        load_table,
    )
    from parallel_map_reduce_word_counter_for_one_machine_spark.streaming.tumbling import (
        run_stream_tumbling,
    )

    events = {"started": [], "progress": [], "terminated": []}

    class Capture(StreamingQueryListener):
        def onQueryStarted(self, e):
            events["started"].append(e.id)

        def onQueryProgress(self, e):
            events["progress"].append(e.progress)

        def onQueryIdle(self, e):
            pass

        def onQueryTerminated(self, e):
            events["terminated"].append(e.id)

    listener = Capture()
    spark.streams.addListener(listener)
    try:
        run_stream_tumbling(spark, sf_correct, "t_listener_probe")
        # listener events are delivered asynchronously on the listener bus
        deadline = time.time() + 30
        while time.time() < deadline and not events["terminated"]:
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(listener)
    assert events["started"] and events["terminated"]
    n_in = sum(int(p.numInputRows) for p in events["progress"])
    n_events = load_table(spark, sf_correct, "events").count()
    assert n_in == n_events, (n_in, n_events)


def test_chained_stream_runs_two_state_operators(spark, sf_correct):
    """Runtime proof of the multiple-stateful-operators claim: the drained
    chained query's progress reports TWO stateOperators (one per window
    aggregation), each having kept state rows."""
    import json

    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        read_events_stream,
    )
    from parallel_map_reduce_word_counter_for_one_machine_spark.streaming import (
        drain,
    )
    from parallel_map_reduce_word_counter_for_one_machine_spark.streaming.tumbling import (
        WATERMARK,
        _chained_plan,
    )

    stream = read_events_stream(spark, sf_correct).withWatermark("ts", WATERMARK)
    q = (
        _chained_plan(stream)
        .writeStream.format("memory")
        .queryName("t_chained_stateops")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain(q)
    progress = [json.loads(p.json) for p in q.recentProgress]
    with_state = [p for p in progress if p.get("stateOperators")]
    assert with_state, "no progress entry carried state operators"
    ops = with_state[-1]["stateOperators"]
    assert len(ops) == 2, ops
    names = {o.get("operatorName") for o in ops}
    assert names == {"stateStoreSave"}, names
    assert all(o["numRowsTotal"] > 0 for o in ops), ops


def test_value_quantiles_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "stream_value_quantiles",
        registry.QUERIES["stream_value_quantiles"],
        registry.ORACLES["stream_value_quantiles"],
    )


def test_value_quantiles_stream_equals_batch(spark, sf_correct):
    """Sketch-in-stream equivalence: the streamed (window, bin) histogram
    finalized over the drained sink must equal the batch face — the
    histogram stage is the only stateful op, quantile recovery is batch
    algebra on the sink."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.streaming.tumbling import (
        finalize_value_quantiles,
        run_stream_value_hist,
    )

    hist = run_stream_value_hist(spark, sf_correct, "t_stream_vq")
    s = sorted(map(tuple, finalize_value_quantiles(hist).collect()))
    b = sorted(
        map(
            tuple,
            registry.QUERIES["stream_value_quantiles"](spark, sf_correct).collect(),
        )
    )
    assert s == b

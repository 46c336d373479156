"""Event-time windowed aggregation — batch-mode queries (oracle-checked)
plus the real Structured Streaming pipeline over the same events table.

The reference's "streaming" is bounded-memory batch iteration over a static
file (reference src/main.cpp:140-178; README motivates it as an OOM
workaround) — there is no event time. This module supplies the real thing:
tumbling / sliding / session windows on ``events.ts``, and
``run_stream_tumbling`` wires the identical logical plan through
``readStream`` + watermark, asserting stream/batch equivalence in tests
(the Structured Streaming guarantee that makes the batch oracle valid).

Scale notes: windowed aggregation state is bounded by the watermark (10
minutes here) — state for windows older than the watermark is dropped, so
executor state stays O(active windows), not O(stream length). Window
boundaries are emitted as epoch millis (``unix_millis``) — timezone-free
and exactly comparable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load_table, read_events_stream
from . import drain

WATERMARK = "10 minutes"


def _tumbling_plan(events: DataFrame) -> DataFrame:
    """The shared logical plan: 1-hour tumbling windows per event_type."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("bucket_ms"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "stream_tumbling_agg",
    oracle=(
        "SELECT epoch_ms(date_trunc('hour', ts)) AS bucket_ms, event_type, "
        "count(*) AS n, round(sum(value), 2) AS sum_value "
        "FROM events GROUP BY 1, 2"
    ),
)
def stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour counts+sums per event type (batch mode — identical
    logical plan to the streaming run, which is the point)."""
    return _tumbling_plan(load_table(spark, sf_dir, "events"))


@query(
    "stream_sliding_agg",
    oracle=(
        # 1h windows sliding every 30min: each event belongs to exactly two
        # windows, starting at its 30-min bucket and 30 min before it.
        "SELECT bucket_ms, event_type, count(*) AS n FROM ("
        "SELECT unnest([epoch_ms(time_bucket(INTERVAL '30 minutes', ts)), "
        "epoch_ms(time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes')])"
        " AS bucket_ms, event_type FROM events) t GROUP BY 1, 2"
    ),
)
def stream_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1h length, 30min slide): Spark's window() generator
    emits one row per covering window — same shape streaming or batch."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_millis(F.col("w.start")).alias("bucket_ms"), "event_type", "n"
        )
    )


@query(
    "stream_session_window",
    oracle=(
        # Session = maximal run of a user's events with gaps < 30 min.
        "WITH g AS (SELECT user_id, event_id, ts, value, CASE WHEN ts - lag(ts) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) >= INTERVAL '30 minutes' "
        "OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL "
        "THEN 1 ELSE 0 END AS brk FROM events), "
        # event_id tiebreak keeps the cumsum deterministic for duplicate ts
        "s AS (SELECT user_id, ts, value, sum(brk) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id FROM g) "
        "SELECT user_id, epoch_ms(min(ts)) AS session_start_ms, "
        "count(*) AS n_events, round(sum(value), 2) AS sum_value "
        "FROM s GROUP BY user_id, session_id"
    ),
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap, via Spark's
    native ``session_window`` (merge-on-overlap state machine; in streaming
    the same call is watermark-bounded). The oracle replicates the
    semantics with the classic lag/cumsum idiom."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.unix_millis(F.min("ts")).alias("session_start_ms"),
        )
        .select("user_id", "session_start_ms", "n_events", "sum_value")
    )


def _run_windowed_stream(
    spark: SparkSession, sf_dir: str, query_name: str, plan_fn
) -> DataFrame:
    """Execute a windowed aggregation as a REAL stream: file-source
    ``readStream`` with a 10-minute watermark, complete mode into a memory
    sink; returns the sink contents after the stream drains."""
    stream = read_events_stream(spark, sf_dir).withWatermark("ts", WATERMARK)
    q = (
        plan_fn(stream)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    drain(q)
    return spark.sql(f"SELECT * FROM {query_name}")


def run_stream_tumbling(spark: SparkSession, sf_dir: str, query_name: str) -> DataFrame:
    """Tumbling aggregation as a real stream (tests assert ≡ batch)."""
    return _run_windowed_stream(spark, sf_dir, query_name, _tumbling_plan)


def run_stream_sliding(spark: SparkSession, sf_dir: str, query_name: str) -> DataFrame:
    """Sliding-window aggregation as a real stream (tests assert ≡ batch)."""

    def plan(events: DataFrame) -> DataFrame:
        return (
            events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
            .agg(F.count("*").alias("n"))
            .select(
                F.unix_millis(F.col("w.start")).alias("bucket_ms"), "event_type", "n"
            )
        )

    return _run_windowed_stream(spark, sf_dir, query_name, plan)


def run_stream_session(spark: SparkSession, sf_dir: str, query_name: str) -> DataFrame:
    """Session windows as a real stream — ``session_window`` state merges
    overlapping per-key windows incrementally; the watermark bounds state."""

    def plan(events: DataFrame) -> DataFrame:
        return (
            events.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum("value"), 2).alias("sum_value"),
                F.unix_millis(F.min("ts")).alias("session_start_ms"),
            )
            .select("user_id", "session_start_ms", "n_events", "sum_value")
        )

    return _run_windowed_stream(spark, sf_dir, query_name, plan)


def _chained_plan(events: DataFrame) -> DataFrame:
    """TWO chained event-time aggregations in one plan: hourly per-type
    counts/sums rolled up into 6-hour windows by re-windowing the FIRST
    aggregation's window struct (``F.window`` over a window column, the
    Spark-3.4+ time-window-of-window form). Identical logical plan batch
    or streaming — in streaming this is Spark 4's multiple-stateful-
    operators support: two stateful aggs share one query, one watermark,
    per-operator state stores."""
    hourly = events.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
    return (
        hourly.groupBy(F.window("w", "6 hours").alias("d"), "event_type")
        .agg(F.sum("n").alias("n"), F.round(F.sum("sv"), 2).alias("sum_value"))
        .select(
            F.unix_millis(F.col("d.start")).alias("bucket_ms"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "stream_chained_windows",
    oracle=(
        # 6h buckets: both engines align to midnight-divisible boundaries
        # (24h is a multiple of 6h), so time_bucket ≡ Spark's epoch-aligned
        # window despite different origin conventions.
        "SELECT epoch_ms(time_bucket(INTERVAL '6 hours', ts)) AS bucket_ms, "
        "event_type, count(*) AS n, round(sum(value), 2) AS sum_value "
        "FROM events GROUP BY 1, 2"
    ),
)
def stream_chained_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face of the chained hourly→6-hourly rollup (equals the flat
    6-hour aggregation by associativity of count/sum; rounding only at the
    outer level). The REAL two-stateful-operator stream runs in
    ``run_stream_chained`` with watermark-finalization semantics pinned by
    tests."""
    return _chained_plan(load_table(spark, sf_dir, "events"))


def run_stream_chained(
    spark: SparkSession, sf_dir: str, query_name: str
) -> DataFrame:
    """The chained aggregation as a real stream. Chained stateful
    aggregations require APPEND mode (complete/update are unsupported for
    downstream stateful consumers), so only windows the final watermark
    CLOSED are emitted — the test asserts exactly that subset relation
    against the batch twin, the same finalization contract as the outer
    stream-stream join."""
    stream = read_events_stream(spark, sf_dir).withWatermark("ts", WATERMARK)
    q = (
        _chained_plan(stream)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain(q)
    return spark.sql(f"SELECT * FROM {query_name}")


# Histogram-sketch-in-stream: per-window value histograms with fixed-width
# bins (the mergeable bounded-state quantile form of operators/sketches.py,
# composed with event-time windows). Bin width sized to the events value
# range (0–~500).
VQ_BIN_W = 25


def _value_hist_plan(events: DataFrame) -> DataFrame:
    """The STREAMING stage: per (1-hour window, value-bin) counts — one
    stateful aggregation whose state is O(windows × bins), the sketch
    property that makes per-window quantiles safe on an unbounded
    stream."""
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"),
            F.floor(F.col("value") / VQ_BIN_W).alias("bin"),
        )
        .agg(F.count("*").alias("cnt"))
        .select(F.unix_millis(F.col("w.start")).alias("bucket_ms"), "bin", "cnt")
    )


def finalize_value_quantiles(hist: DataFrame) -> DataFrame:
    """Per-bucket quantile estimates from the (bucket, bin, cnt) histogram
    — plain batch algebra over the drained sink (or over the batch-mode
    plan), exactly the sketches.py cumulative-bin recovery."""
    from pyspark.sql.window import Window as _W

    # Join-free on purpose: the hist relation may be a memory-sink table
    # (stream test), where a groupBy-then-self-join trips conflicting-
    # reference analysis. The per-bucket total is the max of the ordered
    # cumsum — one more window over the same tiny partition.
    wb = _W.partitionBy("bucket_ms").orderBy("bin")
    cum = hist.withColumn("c", F.sum("cnt").over(wb)).withColumn(
        "n_events", F.max("c").over(_W.partitionBy("bucket_ms"))
    )

    def _est(p: float):
        return F.lit(VQ_BIN_W) * F.min(
            F.when(
                F.col("c") >= F.ceil(F.lit(p) * F.col("n_events")),
                F.col("bin"),
            )
        )

    return cum.groupBy("bucket_ms").agg(
        F.max("n_events").cast("long").alias("n_events"),
        _est(0.5).cast("long").alias("p50_est"),
        _est(0.9).cast("long").alias("p90_est"),
    )


@query(
    "stream_value_quantiles",
    oracle=(
        "WITH h AS (SELECT epoch_ms(date_trunc('hour', ts)) AS bucket_ms, "
        f"CAST(floor(value / {VQ_BIN_W}) AS BIGINT) AS bin, count(*) AS cnt "
        "FROM events GROUP BY 1, 2), "
        "n AS (SELECT bucket_ms, sum(cnt) AS n_events FROM h GROUP BY bucket_ms), "
        "cum AS (SELECT bucket_ms, bin, "
        "sum(cnt) OVER (PARTITION BY bucket_ms ORDER BY bin) AS c FROM h) "
        "SELECT n.bucket_ms, CAST(n.n_events AS BIGINT) AS n_events, "
        f"CAST({VQ_BIN_W} * min(CASE WHEN c >= ceil(0.5 * n_events) "
        "THEN bin END) AS BIGINT) AS p50_est, "
        f"CAST({VQ_BIN_W} * min(CASE WHEN c >= ceil(0.9 * n_events) "
        "THEN bin END) AS BIGINT) AS p90_est "
        "FROM cum JOIN n USING (bucket_ms) GROUP BY n.bucket_ms, n.n_events"
    ),
)
def stream_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour value-distribution quantiles via the mergeable fixed-bin
    histogram — the sketch-in-stream composition: the STREAMING stage is
    one windowed (window, bin) count whose state is bounded by
    windows × bins regardless of stream length (and watermark-evictable),
    and the quantile recovery is batch algebra over the tiny histogram —
    run per trigger in ``foreachBatch`` or downstream of the sink, never
    as a second stateful operator. Batch face here (identical logical
    plan); stream ≡ batch is asserted in tests via the same memory-sink
    protocol as the other windowed keys."""
    return finalize_value_quantiles(
        _value_hist_plan(load_table(spark, sf_dir, "events"))
    )


def run_stream_value_hist(
    spark: SparkSession, sf_dir: str, query_name: str
) -> DataFrame:
    """The histogram stage as a real stream (memory sink, complete mode);
    finalize over the drained sink to compare with the batch face."""
    return _run_windowed_stream(spark, sf_dir, query_name, _value_hist_plan)

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

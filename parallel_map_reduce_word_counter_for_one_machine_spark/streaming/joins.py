"""Watermarked stream-stream join: purchases joined to the clicks that
preceded them (attribution-style), plus its batch twin for the oracle.

The reference has no joins of any kind (single input, single table —
src/main.cpp:78-281); this is part of the Structured Streaming extension
surface mandated by the driver contract.

Semantics: for every ``purchase`` event, every ``click`` by the same user
in the preceding ``WINDOW_HOURS`` hours. In streaming form both sides are
watermarked and the join condition bounds event time on both inputs, so
Spark can expire buffered state: a click older than (watermark -
WINDOW_HOURS) can never match a future purchase and is dropped. That state
bound is what makes the operator viable on an unbounded 100 TB/day feed —
state is O(events in the window), not O(stream history).

Batch and streaming share one condition builder; the equivalence test
(tests/) asserts the streaming run produces exactly the batch rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load_table, read_events_stream
from . import drain

WINDOW_HOURS = 6
WATERMARK = "12 hours"  # late-data allowance before state expiry


def _sides(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    a = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("pts"),
    )
    b = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("cts"),
    )
    return a, b


def _cond(a: DataFrame, b: DataFrame) -> Column:
    return (
        (a["user_id"] == b["c_user"])
        & (b["cts"] >= a["pts"] - F.expr(f"INTERVAL {WINDOW_HOURS} HOURS"))
        & (b["cts"] <= a["pts"])
    )


def _project(j: DataFrame) -> DataFrame:
    # Gap in exact integer micros: truncation-free in both engines
    # (DuckDB epoch_us is the oracle-side twin).
    return j.select(
        "purchase_id",
        "click_id",
        "user_id",
        (F.unix_micros("pts") - F.unix_micros("cts")).alias("gap_us"),
    )


@query(
    "join_event_attribution",
    oracle=(
        "SELECT a.event_id AS purchase_id, b.event_id AS click_id, "
        "a.user_id, epoch_us(a.ts) - epoch_us(b.ts) AS gap_us "
        "FROM events a JOIN events b ON a.user_id = b.user_id "
        "AND a.event_type = 'purchase' AND b.event_type = 'click' "
        f"AND b.ts BETWEEN a.ts - INTERVAL {WINDOW_HOURS} HOUR AND a.ts"
    ),
)
def join_event_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream join — equi-join on user_id with an
    event-time range predicate; one hash exchange per side on user_id."""
    a, b = _sides(load_table(spark, sf_dir, "events"))
    return _project(a.join(b, _cond(a, b)))


def run_stream_stream_join(
    spark: SparkSession, sf_dir: str, query_name: str
) -> DataFrame:
    """The real streaming run: two watermarked event streams, inner join
    with the time-range condition, results in a memory sink. Append mode —
    a joined row is emitted once, when both matches are final."""
    a, b = _sides(read_events_stream(spark, sf_dir))
    a = a.withWatermark("pts", WATERMARK)
    b = b.withWatermark("cts", WATERMARK)
    out = _project(a.join(b, _cond(a, b)))
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain(q)
    return spark.sql(f"SELECT * FROM {query_name}")


@query(
    "stream_enrich",
    oracle=(
        "SELECT e.event_id, e.user_id, e.event_type, c.c_mktsegment "
        "FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey"
    ),
)
def stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-static enrichment: every event decorated
    with a dimension attribute via a left join against the (small) static
    customer table — planned as a BroadcastHashJoin, so the streaming
    version needs no shuffle and no state at all."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    return e.join(
        F.broadcast(c), e["user_id"] == c["c_custkey"], "left"
    ).select("event_id", "user_id", "event_type", "c_mktsegment")


def run_stream_static_enrich(
    spark: SparkSession, sf_dir: str, query_name: str
) -> DataFrame:
    """Real streaming run: the event stream left-joined to the static dim.
    Stream-static joins are stateless — each micro-batch joins against the
    (broadcast) table snapshot; no watermark required."""
    e = read_events_stream(spark, sf_dir).select(
        "event_id", "user_id", "event_type"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    out = e.join(
        F.broadcast(c), e["user_id"] == c["c_custkey"], "left"
    ).select("event_id", "user_id", "event_type", "c_mktsegment")
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain(q)
    return spark.sql(f"SELECT * FROM {query_name}")


@query(
    "join_attribution_outer",
    oracle=(
        "SELECT a.event_id AS purchase_id, b.event_id AS click_id, "
        "a.user_id, epoch_us(a.ts) - epoch_us(b.ts) AS gap_us "
        "FROM events a LEFT JOIN events b ON a.user_id = b.user_id "
        "AND b.event_type = 'click' "
        f"AND b.ts BETWEEN a.ts - INTERVAL {WINDOW_HOURS} HOUR AND a.ts "
        "WHERE a.event_type = 'purchase'"
    ),
)
def join_attribution_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the LEFT OUTER stream-stream join: every purchase
    appears, attributed clicks where they exist, NULL click otherwise —
    the conversion-funnel shape where unattributed purchases are the
    signal. Same one-exchange-per-side plan as the inner twin."""
    a, b = _sides(load_table(spark, sf_dir, "events"))
    return _project_outer(a.join(b, _cond(a, b), "left_outer"))


def _project_outer(j: DataFrame) -> DataFrame:
    return j.select(
        "purchase_id",
        "click_id",
        "user_id",
        (F.unix_micros("pts") - F.unix_micros("cts")).alias("gap_us"),
    )


def run_stream_stream_outer_join(
    spark: SparkSession, sf_dir: str, query_name: str
) -> DataFrame:
    """LEFT OUTER stream-stream join as a real stream. The semantics the
    inner join doesn't exercise: an unmatched left row can only emit its
    NULL-padded result once the WATERMARK closes its join window (here:
    no matching click can arrive once watermark > pts), so state finalizes
    rows instead of just matching them. With availableNow the final
    watermark lands at max(event ts) − delay; left rows later than that
    remain unfinalized and are legitimately absent — the equivalence test
    compares against the batch twin RESTRICTED to finalized purchases,
    and asserts every emitted row is batch-correct."""
    a, b = _sides(read_events_stream(spark, sf_dir))
    a = a.withWatermark("pts", WATERMARK)
    b = b.withWatermark("cts", WATERMARK)
    out = _project_outer(a.join(b, _cond(a, b), "left_outer"))
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain(q)
    return spark.sql(f"SELECT * FROM {query_name}")

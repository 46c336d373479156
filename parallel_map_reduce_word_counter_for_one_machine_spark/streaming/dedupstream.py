"""Streaming exact dedup: ``dropDuplicatesWithinWatermark`` over an event
feed that delivers duplicates (at-least-once sources re-deliver; here the
duplicate feed is synthesized by unioning the stream with itself, so the
dedup path is exercised on every row).

The reference has no streaming and no dedup (src/main.cpp:78-281); this is
extension surface. The watermark bound is the operational point: plain
``dropDuplicates`` on a stream keeps ALL seen keys forever (state grows
with stream history — unusable on an unbounded feed), while
``dropDuplicatesWithinWatermark`` expires a key's state once the watermark
passes its event time + the allowed lateness, so state is O(events within
the watermark horizon) — the property that survives a 100 TB/day feed.

The batch twin (registered, oracle-checked) computes the same result with
a union + dropDuplicates; the equivalence test runs the real stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load_table, read_events_stream
from . import drain

WATERMARK = "1 hour"

_COLS = ["event_id", "user_id", "event_type"]


@query(
    "stream_dedup",
    oracle=(
        # The duplicated union collapses back to one row per event_id
        # (duplicates are bit-identical rows, so any representative works).
        "SELECT event_id, user_id, event_type FROM "
        "(SELECT * FROM events UNION ALL SELECT * FROM events) "
        "GROUP BY event_id, user_id, event_type"
    ),
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin: duplicate the feed, dedup on event_id."""
    e = load_table(spark, sf_dir, "events").select(*_COLS)
    return e.unionAll(e).dropDuplicates(["event_id"])


def run_stream_dedup(
    spark: SparkSession, sf_dir: str, query_name: str
) -> DataFrame:
    """Real streaming run: two copies of the file stream unioned, deduped
    within the watermark horizon, appended to a memory sink."""
    s = read_events_stream(spark, sf_dir)
    doubled = s.unionAll(read_events_stream(spark, sf_dir)).withWatermark(
        "ts", WATERMARK
    )
    out = doubled.dropDuplicatesWithinWatermark(["event_id"]).select(*_COLS)
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain(q)
    return spark.sql(f"SELECT * FROM {query_name}")

"""Structured Streaming operators (tumbling/sliding/session windows,
stream-stream joins, streaming dedup, stateful processing, incremental
word count) — each with a batch-twin oracle plus a real readStream
equivalence test."""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQuery

DRAIN_TIMEOUT_SEC = 120


def drain(q: StreamingQuery, timeout_sec: int = DRAIN_TIMEOUT_SEC) -> None:
    """Block until an availableNow-triggered stream finishes, RAISING on
    timeout: awaitTermination(t) returns False when the query is still
    running, and reading the memory sink at that point would silently
    return partial results — equivalence tests would then fail on a
    mysterious row-count diff instead of the actual cause."""
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"streaming query {q.name!r} did not drain within {timeout_sec}s"
        )

"""Custom stateful streaming operator via ``applyInPandasWithState``.

Demonstrates the arbitrary-state API the engine exposes for operators that
windowed aggregation can't express: here, a per-user running counter that
emits one row per micro-batch per active user. State is a single
(count, sum) pair per key — O(active keys) executor memory. Idle-key
eviction on an unbounded production stream belongs to EventTimeTimeout +
watermark (see the NoTimeout note in run_stateful_user_totals).

This is the Structured Streaming replacement for hand-rolled stateful
consumers; batch-mode equivalence (a plain groupBy) is asserted in tests.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from . import drain

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def _update_user_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events into the running (n, total) state and
    emit the updated totals for the key."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        [{"user_id": key[0], "n_events": n, "sum_value": total}],
        columns=[f.name for f in OUTPUT_SCHEMA.fields],
    )


def run_stateful_user_totals(
    spark: SparkSession, sf_dir: str, query_name: str
) -> DataFrame:
    """Stream events.parquet through the stateful per-user counter and
    return the final memory-sink contents (one row per user from the last
    micro-batch that touched them)."""
    from ..sources.tables import read_events_stream

    stream = read_events_stream(spark, sf_dir).select("user_id", "value")
    out = stream.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        # NoTimeout: with ProcessingTimeTimeout every batch leaves pending
        # timeouts, and the availableNow trigger keeps scheduling empty
        # micro-batches to fire them — the query NEVER terminates (observed:
        # 750+ epochs before drain() aborted it; round-1 code masked this by
        # ignoring awaitTermination's return and leaking the running query).
        # A production continuous stream that needs idle-key eviction should
        # use EventTimeTimeout against the watermark instead.
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    drain(q)
    # update-mode memory sink holds one row per user per micro-batch that
    # touched them; the final state is the row with the highest n_events
    # (strictly growing), taken as an argmax via struct ordering.
    return (
        spark.sql(f"SELECT * FROM {query_name}")
        .groupBy("user_id")
        .agg(F.max(F.struct("n_events", "sum_value")).alias("s"))
        .select("user_id", "s.n_events", "s.sum_value")
    )


from ..registry import query  # noqa: E402  (registry has no back-import)


@query(
    "stream_stateful_totals",
    oracle=(
        "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, "
        "round(sum(value), 2) AS sum_value FROM events GROUP BY user_id"
    ),
)
def stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated face of the ``applyInPandasWithState`` operator (until
    now unit-test-only): the per-user running counter streamed over the
    events file source, final state per user taken from the update-mode
    sink's last emission (n_events is strictly growing, so the struct
    argmax is the final row). Must equal the plain batch aggregate DuckDB
    recomputes — proving the custom state machine (init, per-batch
    update, emission) conserves counts and sums across micro-batches, not
    just within one."""
    name = "stateful_totals_" + str(abs(hash((sf_dir, "tot"))) % 10**8)
    final = run_stateful_user_totals(spark, sf_dir, name)
    return final.select(
        "user_id", "n_events", F.round("sum_value", 2).alias("sum_value")
    )

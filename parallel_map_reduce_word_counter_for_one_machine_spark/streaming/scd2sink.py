"""foreachBatch incremental SCD2 sink: maintain the type-2 dimension
(``operators/temporal.dim_scd2_build``'s output) from a change-log
stream, versioned-parquet state with the upsert sink's marker-ledger
commit protocol (lineage-scoped ``_applied`` markers, merge base from
committed versions only — streaming/upsertsink.py).

Per micro-batch (the CDC arrival contract: batches partition the log in
event-time order — a later batch never carries an earlier timestamp;
within a batch order is (ts, event_id), same as the batch build):

1. change-detect inside the batch (lag) AND against the standing OPEN
   version per key (a value equal to the key's current open value opens
   no new version — the consecutive-duplicate collapse must hold across
   the batch boundary, not just inside one batch);
2. close each key's standing open row at its first new version's
   valid_from;
3. interval-chain the new versions (lead), leaving each key's last one
   open (valid_to NULL).

The final state is proven EXACTLY equal to the one-shot batch
``dim_scd2_build`` regardless of how the log is cut into batches
(tests/test_scd2_stream.py: manual ordered batches, a REAL readStream
run over mtime-ordered staged files, and replay idempotence).

Scale: each batch shuffles batch keys once (the two windows share the
key exchange, as in the batch build) and joins against the OPEN slice of
state (one row per live key — the small hot edge of the dimension);
closed versions are carried forward untouched. At 100 TB the closed-
version rewrite per commit is the bottleneck and the production layout
partitions state so only open-row partitions rewrite — same logical
plan, narrower scope (the upsert sink's note, verbatim)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import drain
from .upsertsink import commit_merged_batch, latest_committed_state


def _scd2_merge(cur: DataFrame, batch: DataFrame) -> DataFrame:
    """Merge one event-time-ordered change batch into the SCD2 state."""
    open_cur = cur.filter(F.col("valid_to_ms").isNull()).select(
        "user_id",
        F.col("valid_from_ms").alias("open_from"),
        F.col("value").alias("open_value"),
    )
    closed_cur = cur.filter(F.col("valid_to_ms").isNotNull())

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    b = (
        batch.select("user_id", "ts", "event_id", "value")
        .withColumn("prev", F.lag("value").over(w))
        .join(open_cur, "user_id", "left")
    )
    # a row opens a version iff it differs from its predecessor: the
    # in-batch prev when there is one, else the key's standing open value
    kept = b.filter(
        F.when(F.col("prev").isNotNull(), F.col("value") != F.col("prev"))
        .otherwise(
            F.col("open_value").isNull()
            | (F.col("value") != F.col("open_value"))
        )
    )
    new_versions = kept.select(
        "user_id",
        F.unix_millis("ts").alias("valid_from_ms"),
        F.unix_millis(F.lead("ts").over(w)).alias("valid_to_ms"),
        "value",
    )
    first_new = kept.groupBy("user_id").agg(
        F.unix_millis(F.min(F.struct("ts", "event_id")).getField("ts")).alias(
            "first_vf"
        )
    )
    open_closed = open_cur.join(first_new, "user_id").select(
        "user_id",
        F.col("open_from").alias("valid_from_ms"),
        F.col("first_vf").alias("valid_to_ms"),
        F.col("open_value").alias("value"),
    )
    open_kept = open_cur.join(first_new, "user_id", "left_anti").select(
        "user_id",
        F.col("open_from").alias("valid_from_ms"),
        F.lit(None).cast("long").alias("valid_to_ms"),
        F.col("open_value").alias("value"),
    )
    return (
        closed_cur.select("user_id", "valid_from_ms", "valid_to_ms", "value")
        .unionByName(open_closed)
        .unionByName(open_kept)
        .unionByName(new_versions)
    )


def apply_scd2_batch(
    batch_df: DataFrame, batch_id: int, state_root: str, lineage: str = ""
) -> None:
    """One sink commit through the SHARED protocol
    (``upsertsink.commit_merged_batch`` — skip on existing marker, merge
    base from the committed ledger, orphan overwrite, marker last); only
    the merge function is SCD2-specific."""

    def merge(cur, bdf):
        if cur is None:
            cur = bdf.sparkSession.createDataFrame(
                [],
                "user_id BIGINT, valid_from_ms BIGINT, "
                "valid_to_ms BIGINT, value DOUBLE",
            )
        return _scd2_merge(cur, bdf)

    commit_merged_batch(batch_df, batch_id, state_root, lineage, merge)


def run_stream_scd2(
    spark: SparkSession,
    staged_dir: str,
    state_root: str,
    query_name: str,
) -> DataFrame:
    """Drive a staged change-log directory (one parquet file per
    event-time slice, mtime-ordered so the file source delivers them
    oldest-first) through the foreachBatch SCD2 sink, one file per
    micro-batch; return the final dimension state."""
    from ..sources.tables import SCHEMAS

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        apply_scd2_batch(batch_df, batch_id, state_root, lineage=query_name)

    q = (
        spark.readStream.schema(SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(staged_dir)
        .writeStream.foreachBatch(sink)
        .queryName(query_name)
        .option("checkpointLocation", os.path.join(state_root, "_chk"))
        .trigger(availableNow=True)
        .start()
    )
    drain(q)
    return latest_committed_state(spark, state_root)


_N_SLICES = 5


def slice_bounds_us(spark: SparkSession, sf_dir: str) -> list[int]:
    """The ``_N_SLICES - 1`` cut points as epoch MICROSECONDS — pure
    integer arithmetic (floor division), so any other engine derives the
    identical cut from the same data: bound_k = t0 + ((t1-t0)·(k+1)) // N.
    Integer-domain bounds are what make point-in-time reads of the
    version ledger (``scd2_time_travel``) oracle-able — a float-rounded
    bound could flip a boundary event between engines."""
    from ..sources.tables import load_table

    evs = load_table(spark, sf_dir, "events")
    b = evs.agg(
        F.unix_micros(F.min("ts")).alias("t0"),
        F.unix_micros(F.max("ts")).alias("t1"),
    ).collect()[0]  # bounded: one 2-long row
    return [
        b.t0 + ((b.t1 - b.t0) * (i + 1)) // _N_SLICES
        for i in range(_N_SLICES - 1)
    ]


def stage_event_slices(spark: SparkSession, sf_dir: str) -> str:
    """Cut the events table into ``_N_SLICES`` event-time range slices and
    stage them as one parquet file each with ascending mtimes — the
    change-log layout ``run_stream_scd2`` consumes (file source delivers
    oldest-mtime first, one file per micro-batch). Bounds come from
    ``slice_bounds_us`` (equal integer-microsecond divisions of
    [min ts, max ts]) — the merge theorem (tested under random cuts in
    tests/test_scd2_stream.py) makes the FINAL dimension independent of
    where the cut lands, and the integer bounds make the INTERMEDIATE
    versions deterministic too (``scd2_time_travel``)."""
    import shutil
    import tempfile
    import time as _time

    from ..sources.tables import load_table

    evs = load_table(spark, sf_dir, "events")
    bounds = slice_bounds_us(spark, sf_dir)
    us = F.unix_micros(F.col("ts"))
    staged = tempfile.mkdtemp(prefix="pmrwc_scd2stage_")
    now = _time.time() - 1000
    for i in range(_N_SLICES):
        s = evs.filter(us >= F.lit(bounds[i - 1])) if i else evs
        if i < _N_SLICES - 1:
            s = s.filter(us < F.lit(bounds[i]))
        tmp = os.path.join(staged, f"_w{i}")
        s.repartition(1).write.parquet(tmp)
        part = next(
            f for f in os.listdir(tmp)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        dst = os.path.join(staged, f"slice{i}.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        shutil.rmtree(tmp)
        os.utime(dst, (now + i * 10, now + i * 10))
    return staged


from ..registry import query  # noqa: E402  (registry has no back-import)


@query(
    "stream_scd2_real",
    oracle=(
        # identical to dim_scd2_build's oracle: the REAL stream over any
        # event-time-ordered cut must land on the batch dimension.
        "WITH o AS (SELECT user_id, ts, event_id, value, "
        "lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "AS prev FROM events), "
        "ch AS (SELECT user_id, ts, event_id, value FROM o "
        "WHERE prev IS NULL OR value <> prev) "
        "SELECT user_id, epoch_ms(ts) AS valid_from_ms, "
        "epoch_ms(lead(ts) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id)) AS valid_to_ms, value "
        "FROM ch"
    ),
)
def stream_scd2_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated face of the STREAMING SCD2 sink (until now covered by
    unit tests only, like delete was): the events change log arrives as
    five mtime-ordered micro-batches through ``run_stream_scd2`` —
    foreachBatch, marker-ledger commits, replay idempotence — and the
    FINAL COMMITTED STATE must equal the batch ``dim_scd2_build`` oracle
    row-for-row. A green row certifies the whole sink protocol (merge
    function, version ledger, crash-marker ordering) lands on the
    declarative answer, not just that the merge function is right in
    isolation."""
    import tempfile

    staged = stage_event_slices(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="pmrwc_scd2real_")
    name = "scd2_real_" + str(abs(hash((sf_dir, "scd2"))) % 10**8)
    final = run_stream_scd2(spark, staged, root, name)
    return final.select("user_id", "valid_from_ms", "valid_to_ms", "value")


_TRAVEL_K = 3  # versions applied before the point-in-time read (v index 2)


@query(
    "scd2_time_travel",
    oracle=(
        # the dimension AS OF the third slice boundary: dim_scd2_build's
        # oracle over exactly the first three slices' events, cut at the
        # same integer-microsecond bound the stager derives.
        "WITH b AS (SELECT epoch_us(min(ts)) AS t0, epoch_us(max(ts)) AS t1 "
        "FROM events), "
        f"cut AS (SELECT t0 + ((t1 - t0) * {_TRAVEL_K}) // 5 AS hi FROM b), "
        "e AS (SELECT events.* FROM events, cut WHERE epoch_us(ts) < cut.hi), "
        "o AS (SELECT user_id, ts, event_id, value, "
        "lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "AS prev FROM e), "
        "ch AS (SELECT user_id, ts, event_id, value FROM o "
        "WHERE prev IS NULL OR value <> prev) "
        "SELECT user_id, epoch_ms(ts) AS valid_from_ms, "
        "epoch_ms(lead(ts) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id)) AS valid_to_ms, value "
        "FROM ch"
    ),
)
def scd2_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME TRAVEL over the versioned SCD2 ledger: run the full 5-batch
    stream, then read the COMMITTED VERSION as of batch ``_TRAVEL_K - 1``
    (not the latest) — the "dimension as the warehouse saw it last
    Tuesday" read every versioned sink exists to serve. Because the slice
    bounds are integer-microsecond pure functions of the data
    (``slice_bounds_us``), DuckDB reconstructs the SAME point in time by
    cutting the change log at the same bound and building the dimension
    declaratively — a green row certifies each intermediate version is a
    CONSISTENT dimension snapshot, not just that the final state is
    right. Versions are retention-managed by ``vacuum_versions`` (keeps
    the ledger bounded; tested in test_streaming_sink)."""
    import tempfile

    from .upsertsink import committed_versions, read_version

    staged = stage_event_slices(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="pmrwc_scd2tt_")
    name = "scd2_tt_" + str(abs(hash((sf_dir, "tt"))) % 10**8)
    run_stream_scd2(spark, staged, root, name)
    versions = committed_versions(root)
    assert len(versions) == _N_SLICES, versions
    snap = read_version(spark, root, versions[_TRAVEL_K - 1])
    return snap.select("user_id", "valid_from_ms", "valid_to_ms", "value")

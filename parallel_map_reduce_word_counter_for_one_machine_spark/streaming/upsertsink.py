"""foreachBatch incremental-upsert sink: materialize a keyed state table
from a stream, MERGE-style (the CDC/"latest row per key" pattern every
warehouse ingestion runs; Delta/Iceberg expose it as MERGE INTO — here
the same inner plan maintains versioned parquet, which is also how those
formats implement it: immutable files + a new table version per commit).

The reference has no streaming and no mutation (src/main.cpp:78-281);
extension surface alongside ``operators/pipeline.merge_upsert`` (the
batch MERGE) and the exactly-once file sink test.

Per micro-batch: reduce the batch to one row per key (latest by event
time, deterministic tiebreak), full-outer-merge against the previous
state VERSION directory, write version N+1. Versioned directories rather
than in-place overwrite because a Spark job cannot safely read and
overwrite the same path — exactly the immutability rule the table
formats enforce; the latest-version pointer is the commit.

Two correctness properties the naive shape misses (both held here):

* **Total-order merge.** State persists the FULL tiebreak key
  ``(last_ts, last_event_id)``, and the matched-row rule compares
  ``struct(b_last_ts, b_last_event_id) >= struct(last_ts,
  last_event_id)`` — so two same-timestamp events for one key resolve
  identically whether they share a micro-batch or arrive in different
  ones, matching the batch ``_latest_per_key`` twin exactly.
* **Idempotent replay.** Each version commit is keyed on the
  micro-batch's ``batch_id`` scoped by the QUERY LINEAGE (an
  ``_applied_{lineage}_b{N}`` marker written after the version
  directory); a replayed batch after a failure finds its marker and is
  skipped — the standard foreachBatch exactly-once pattern (Spark
  docs: "use batchId to deduplicate"). Scoping by lineage matters
  because Spark batch_ids are unique only within one checkpoint
  lineage: a NEW query (fresh checkpoint) writing the same state_root
  restarts at batch 0, and an unscoped marker would silently skip its
  batches as "replays" (r05 advice).
* **Crash-consistent merge base.** The merge base is resolved from the
  COMMIT-MARKER LEDGER (each marker records the version it committed),
  never from directory presence: a crash between the parquet write and
  the marker write leaves an orphaned, possibly partial ``v{N+1}``
  directory, and the replayed batch must merge against the last
  COMMITTED ``v{N}`` and overwrite the orphan — trusting
  ``list_versions()`` would treat the torn directory as state and
  silently drop keys (r05 advice).

Scale: each batch shuffles batch-keys + state-keys once on the key
column. For 100 TB state the full-outer rewrite becomes the bottleneck
and the real systems switch to partitioned/clustered MERGE (rewrite only
matching files) — same logical plan, narrower physical scope.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import read_events_stream
from . import drain


def _latest_per_key(df: DataFrame) -> DataFrame:
    """One row per user_id: the latest (ts, event_id)-ordered event's
    value — max_by with a total order so replays are deterministic. The
    full tiebreak key (last_ts, last_event_id) is part of the output so
    downstream merges can apply the same total order."""
    return df.groupBy("user_id").agg(
        F.max_by(
            F.struct("value", "event_type", "event_id"),
            F.struct("ts", "event_id"),
        ).alias("s"),
        F.max("ts").alias("last_ts"),
        F.count("*").alias("n_events_batch"),
    ).select(
        "user_id",
        F.col("s.value").alias("value"),
        F.col("s.event_type").alias("event_type"),
        "last_ts",
        F.col("s.event_id").alias("last_event_id"),
    )


def _merge_state(cur: DataFrame, batch: DataFrame) -> DataFrame:
    """Full-outer MERGE of a reduced batch (one row per key, from
    ``_latest_per_key``) into the current state. Batch wins when the key
    is new OR the batch row is at least as late under the FULL
    (ts, event_id) total order — the MERGE WHEN MATCHED rule, identical
    no matter how events were split across micro-batches."""
    b = batch.select(
        F.col("user_id").alias("b_user_id"),
        F.col("value").alias("b_value"),
        F.col("event_type").alias("b_event_type"),
        F.col("last_ts").alias("b_last_ts"),
        F.col("last_event_id").alias("b_last_event_id"),
    )
    newer = F.col("b_user_id").isNotNull() & (
        F.col("user_id").isNull()
        | (
            F.struct(
                F.col("b_last_ts").alias("ts"),
                F.col("b_last_event_id").alias("eid"),
            )
            >= F.struct(
                F.col("last_ts").alias("ts"),
                F.col("last_event_id").alias("eid"),
            )
        )
    )
    return cur.join(
        b, cur["user_id"] == b["b_user_id"], "full_outer"
    ).select(
        F.coalesce("b_user_id", "user_id").alias("user_id"),
        F.when(newer, F.col("b_value"))
        .otherwise(F.col("value")).alias("value"),
        F.when(newer, F.col("b_event_type"))
        .otherwise(F.col("event_type")).alias("event_type"),
        F.when(newer, F.col("b_last_ts"))
        .otherwise(F.col("last_ts")).alias("last_ts"),
        F.when(newer, F.col("b_last_event_id"))
        .otherwise(F.col("last_event_id")).alias("last_event_id"),
    )


def list_versions(state_root: str) -> list[int]:
    """Version DIRECTORIES present on disk — includes any orphaned
    uncommitted directory a crash left behind. Use ``committed_versions``
    (the marker ledger) for anything that must only see committed state."""
    if not os.path.isdir(state_root):
        return []
    return sorted(
        int(d[1:])
        for d in os.listdir(state_root)
        if d.startswith("v") and d[1:].isdigit()
    )


def _marker_name(lineage: str, batch_id: int) -> str:
    """Commit-marker filename, scoped by query lineage so two queries
    (distinct checkpoints, both restarting at batch 0) sharing one
    state_root never mistake each other's batches for replays."""
    return (
        f"_applied_{lineage}_b{batch_id}" if lineage else f"_applied_b{batch_id}"
    )


def committed_versions(state_root: str) -> list[int]:
    """The COMMIT LEDGER: version numbers recorded inside ``_applied_*``
    markers (written only after a complete version write), sorted. This —
    not directory listing — is the truth about what state exists: an
    orphaned ``v{N+1}`` from a crash between write and marker is absent
    here and gets overwritten by the replay."""
    if not os.path.isdir(state_root):
        return []
    out = set()
    for name in os.listdir(state_root):
        if not name.startswith("_applied_"):
            continue
        try:
            with open(os.path.join(state_root, name)) as fh:
                txt = fh.read().strip()
        except OSError:
            continue
        if txt.startswith("v") and txt[1:].isdigit():
            out.add(int(txt[1:]))
    return sorted(out)


def commit_merged_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_root: str,
    lineage: str,
    merge_fn,
) -> None:
    """The ONE copy of the commit protocol, shared by every versioned-
    state sink (upsert here, SCD2 in scd2sink.py): skip on an existing
    marker (replay), resolve the merge base from the COMMITTED ledger
    (never directory listing), ``merge_fn(cur_or_None, batch_df)`` →
    next state, overwrite any orphaned version directory, and write the
    ``_applied_{lineage}_b{batch_id}`` marker LAST. Fixes to the
    torn-commit/replay guarantees land here once for all sinks."""
    marker = os.path.join(state_root, _marker_name(lineage, batch_id))
    if os.path.exists(marker):
        return  # replayed micro-batch: version already committed
    committed = committed_versions(state_root)
    if committed:
        cur = batch_df.sparkSession.read.parquet(
            os.path.join(state_root, f"v{committed[-1]}")
        )
        out_version = committed[-1] + 1
    else:
        cur = None
        out_version = 0
    merged = merge_fn(cur, batch_df)
    # mode("overwrite") also clobbers an orphaned v{out_version} left by
    # a crash between the previous attempt's write and its marker — the
    # replayed batch OVERWRITES the orphan rather than merging against it
    merged.write.mode("overwrite").parquet(
        os.path.join(state_root, f"v{out_version}")
    )
    # commit marker LAST, recording the version it commits: a crash
    # before this line leaves the version directory orphaned (invisible
    # to the ledger) and the replay rewrites that same version number
    with open(marker, "w") as fh:
        fh.write(f"v{out_version}\n")


def latest_committed_state(spark: SparkSession, state_root: str) -> DataFrame:
    """The newest COMMITTED version as a DataFrame; a clear error (not an
    IndexError) when nothing ever committed."""
    versions = committed_versions(state_root)
    if not versions:
        raise RuntimeError(
            f"no committed state under {state_root!r} — the stream "
            "committed zero batches (empty staged input?)"
        )
    return spark.read.parquet(os.path.join(state_root, f"v{versions[-1]}"))


def apply_batch(
    batch_df: DataFrame, batch_id: int, state_root: str, lineage: str = ""
) -> None:
    """One upsert commit: reduce the micro-batch, MERGE into the latest
    committed version, commit (see ``commit_merged_batch`` for the shared
    protocol). Named (not a closure) so the stream, replay tests, and any
    manual backfill drive the IDENTICAL commit path."""

    def merge(cur, bdf):
        batch = _latest_per_key(bdf)
        return _merge_state(cur, batch) if cur is not None else batch

    commit_merged_batch(batch_df, batch_id, state_root, lineage, merge)


def run_stream_upsert(
    spark: SparkSession, sf_dir: str, state_root: str, query_name: str
) -> DataFrame:
    """Drive the stream through the foreachBatch upsert; returns the final
    state (latest version directory) as a DataFrame."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        apply_batch(batch_df, batch_id, state_root, lineage=query_name)

    q = (
        read_events_stream(spark, sf_dir)
        .writeStream.foreachBatch(upsert)
        .queryName(query_name)
        .option("checkpointLocation", os.path.join(state_root, "_chk"))
        .trigger(availableNow=True)
        .start()
    )
    drain(q)
    return latest_committed_state(spark, state_root)


def vacuum_versions(state_root: str, keep_last: int = 2) -> list[int]:
    """Retention for the versioned state table — the VACUUM half of the
    table-maintenance story (compaction is sources/compaction.py): every
    commit above writes a full new version, so without retention the sink
    stores one complete state copy per micro-batch forever. Removes all
    but the newest ``keep_last`` version directories and returns the
    removed version numbers.

    Two things deliberately survive a vacuum:

    * the newest ``keep_last`` versions — ``keep_last >= 1`` is enforced
      because the latest version IS the table; real formats additionally
      keep a time-travel horizon, which is what ``keep_last > 1`` models;
    * ALL ``_applied_b{N}`` commit markers — they are the replay ledger,
      not data: a marker whose version directory was vacuumed still
      proves batch N was applied, and deleting it would let a replayed
      batch N re-apply against newer state (the exactly-once violation
      the markers exist to prevent).
    """
    import shutil

    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    # retention is over COMMITTED versions (the ledger): an orphaned
    # uncommitted directory is garbage and never counts toward keep_last
    # (single-writer assumption: no commit is in flight during vacuum)
    keep = set(committed_versions(state_root)[-keep_last:])
    doomed = [v for v in list_versions(state_root) if v not in keep]
    for v in doomed:
        shutil.rmtree(os.path.join(state_root, f"v{v}"))
    return doomed


def read_version(spark: SparkSession, state_root: str, version: int) -> DataFrame:
    """Time travel: read state AS OF a retained version. The horizon is
    whatever ``vacuum_versions``'s keep_last preserved — exactly the
    Delta/Iceberg ``VERSION AS OF`` / retention interaction: travel works
    until vacuum reclaims the version, then raises. Only COMMITTED
    versions are travel targets — an orphaned directory from a torn
    commit is not readable history."""
    retained = set(committed_versions(state_root)) & set(
        list_versions(state_root)
    )
    if version not in retained:
        raise ValueError(
            f"version {version} not retained in {state_root} "
            f"(have {sorted(retained)}); vacuumed or never committed"
        )
    return spark.read.parquet(os.path.join(state_root, f"v{version}"))


from ..registry import query  # noqa: E402  (registry has no back-import)


@query(
    "stream_upsert_real",
    oracle=(
        "WITH r AS (SELECT user_id, value, event_type, ts, event_id, "
        "row_number() OVER (PARTITION BY user_id "
        "ORDER BY ts DESC, event_id DESC) AS rn FROM events) "
        "SELECT user_id, value, event_type, epoch_ms(ts) AS last_ts_ms, "
        "event_id AS last_event_id FROM r WHERE rn = 1"
    ),
)
def stream_upsert_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated face of the versioned UPSERT sink (unit-test-only
    until now, like the SCD2 sink): the events stream through the
    foreachBatch marker-ledger upsert, and the FINAL COMMITTED VERSION
    must hold exactly one row per user — the latest event under the full
    (ts, event_id) total order — no matter how the source happened to
    micro-batch. The oracle is the declarative last-row-per-key query, so
    a green row certifies the reduce-then-merge protocol (batch
    ``_latest_per_key`` → full-outer MERGE, marker last) conserves the
    total order across commits."""
    import tempfile

    root = tempfile.mkdtemp(prefix="pmrwc_upsreal_")
    name = "upsert_real_" + str(abs(hash((sf_dir, "up"))) % 10**8)
    final = run_stream_upsert(spark, sf_dir, root, name)
    return final.select(
        "user_id",
        "value",
        "event_type",
        F.unix_millis("last_ts").alias("last_ts_ms"),
        "last_event_id",
    )


@query(
    "sink_vacuum_retention",
    oracle=(
        # after vacuum the LATEST version must still be the declarative
        # last-row-per-key relation — retention must never touch the table
        "WITH r AS (SELECT user_id, value, event_type, ts, event_id, "
        "row_number() OVER (PARTITION BY user_id "
        "ORDER BY ts DESC, event_id DESC) AS rn FROM events) "
        "SELECT user_id, value, event_type, epoch_ms(ts) AS last_ts_ms, "
        "event_id AS last_event_id, TRUE AS horizon_enforced_ok, "
        "TRUE AS markers_survive_ok FROM r WHERE rn = 1"
    ),
)
def sink_vacuum_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETENTION verb for the versioned sink (the VACUUM in the
    build/commit/travel/vacuum lifecycle): run the upsert stream, vacuum
    to ``keep_last=2``, and certify (1) the LATEST state is untouched —
    still exactly the declarative last-row-per-key relation DuckDB
    recomputes, (2) the horizon is enforced — vacuumed versions are gone
    from disk and ``read_version`` refuses them, while the two retained
    ones still read, and (3) the replay LEDGER survives — every
    ``_applied`` marker still present, because a marker whose version was
    reclaimed still proves its batch was applied (deleting it would let a
    replayed batch re-apply against newer state). Rides per row so the
    driver hashes retention flags together with the data."""
    import tempfile

    root = tempfile.mkdtemp(prefix="pmrwc_vac_")
    name = "vacuum_" + str(abs(hash((sf_dir, "vac"))) % 10**8)
    run_stream_upsert(spark, sf_dir, root, name)
    committed_before = committed_versions(root)
    markers_before = sorted(
        f for f in os.listdir(root) if f.startswith("_applied_")
    )
    removed = vacuum_versions(root, keep_last=2)
    kept = committed_before[-2:]
    horizon_ok = (
        sorted(list_versions(root)) == sorted(kept)
        and all(not os.path.isdir(os.path.join(root, f"v{v}")) for v in removed)
    )
    for v in removed:  # travel to a reclaimed version must refuse
        try:
            read_version(spark, root, v)
            horizon_ok = False
        except ValueError:
            pass
    for v in kept:  # retained versions must still read
        read_version(spark, root, v).limit(1).count()
    markers_after = sorted(
        f for f in os.listdir(root) if f.startswith("_applied_")
    )
    markers_ok = markers_after == markers_before and len(markers_before) > 0
    final = latest_committed_state(spark, root)
    return final.select(
        "user_id",
        "value",
        "event_type",
        F.unix_millis("last_ts").alias("last_ts_ms"),
        "last_event_id",
        F.lit(bool(horizon_ok)).alias("horizon_enforced_ok"),
        F.lit(bool(markers_ok)).alias("markers_survive_ok"),
    )

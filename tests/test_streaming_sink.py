from __future__ import annotations

import pytest
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


def test_upsert_merge_cross_batch_tiebreak(spark):
    """Two same-timestamp events for one key split ACROSS micro-batches
    must resolve by the (ts, event_id) total order, not batch arrival
    order — in either arrival order the higher event_id wins, matching
    the batch _latest_per_key twin."""
    import datetime

    from parallel_map_reduce_word_counter_for_one_machine_spark.streaming.upsertsink import (
        _latest_per_key,
        _merge_state,
    )

    ts = datetime.datetime(2026, 1, 1, 12, 0, 0)
    cols = ["event_id", "user_id", "event_type", "value", "ts"]

    def ev(eid, val):
        return (eid, 7, "click", float(val), ts)

    lo = _latest_per_key(spark.createDataFrame([ev(100, 1.0)], cols))
    hi = _latest_per_key(spark.createDataFrame([ev(200, 2.0)], cols))
    # batch-order A: low event_id arrives first, then high
    a = _merge_state(lo, hi).collect()
    # batch-order B: high arrives first, then low — the stale low row
    # must NOT overwrite despite equal last_ts
    b = _merge_state(hi, lo).collect()
    both = _latest_per_key(
        spark.createDataFrame([ev(100, 1.0), ev(200, 2.0)], cols)
    ).collect()
    assert len(a) == len(b) == len(both) == 1
    assert tuple(a[0]) == tuple(b[0]) == tuple(both[0])
    assert a[0]["last_event_id"] == 200 and a[0]["value"] == 2.0


def test_upsert_replay_is_idempotent(spark, sf_correct, tmp_path):
    """A replayed foreachBatch invocation (same lineage + batch_id after
    a failure) must be skipped via the _applied_{lineage}_b{id} commit
    marker: no new version directory appears and state is unchanged."""
    import os

    from parallel_map_reduce_word_counter_for_one_machine_spark.streaming.upsertsink import (
        run_stream_upsert,
    )

    state = str(tmp_path / "upsert_state2")
    final = run_stream_upsert(spark, sf_correct, state, "t_upsert_replay")
    versions = sorted(d for d in os.listdir(state) if d.startswith("v"))
    markers = sorted(d for d in os.listdir(state) if d.startswith("_applied_"))
    assert len(versions) == len(markers) >= 1
    assert all(m.startswith("_applied_t_upsert_replay_b") for m in markers)
    before = sorted(map(tuple, final.collect()))
    # drive the SAME query again over a fresh checkpoint (the lost-
    # checkpoint restart): every batch replays with already-committed
    # (lineage, batch_id) pairs -> all skipped
    import shutil

    shutil.rmtree(os.path.join(state, "_chk"))
    final2 = run_stream_upsert(spark, sf_correct, state, "t_upsert_replay")
    versions2 = sorted(d for d in os.listdir(state) if d.startswith("v"))
    assert versions2 == versions, "replayed batches wrote new versions"
    assert sorted(map(tuple, final2.collect())) == before


def test_upsert_markers_scoped_by_lineage(spark, tmp_path):
    """Batch ids are unique only within one checkpoint lineage: a NEW
    query writing the same state_root restarts at batch 0, and its
    batches must APPLY, not be skipped as cross-query 'replays' (the r05
    advice defect). Same (lineage, batch_id) is still skipped."""
    import datetime
    import os

    from parallel_map_reduce_word_counter_for_one_machine_spark.streaming.upsertsink import (
        apply_batch,
        committed_versions,
    )

    cols = "event_id LONG, user_id LONG, event_type STRING, ts TIMESTAMP, value DOUBLE"

    def ev(eid, val):
        return (eid, 1, "view", datetime.datetime(2024, 1, 1, 0, 0, eid), val)

    state = str(tmp_path / "lineage_state")
    os.makedirs(state)
    apply_batch(spark.createDataFrame([ev(1, 1.0)], cols), 0, state, "qA")
    assert committed_versions(state) == [0]
    # second lineage, batch 0 again: must apply (new version), not skip
    apply_batch(spark.createDataFrame([ev(2, 2.0)], cols), 0, state, "qB")
    assert committed_versions(state) == [0, 1]
    final = spark.read.parquet(os.path.join(state, "v1")).collect()
    assert len(final) == 1 and final[0]["value"] == 2.0
    # genuine replay (same lineage + batch_id): skipped, no new version
    apply_batch(spark.createDataFrame([ev(3, 9.0)], cols), 0, state, "qB")
    assert committed_versions(state) == [0, 1]


def test_upsert_replay_overwrites_torn_commit(spark, tmp_path):
    """Crash window between the version write and the marker write: the
    orphaned v{N+1} directory (possibly partial — here truncated to
    EMPTY) must be invisible to the ledger; the replayed batch merges
    against committed v{N} and OVERWRITES the orphan, so no prior keys
    are dropped (the r05 advice medium)."""
    import datetime
    import os

    from parallel_map_reduce_word_counter_for_one_machine_spark.streaming.upsertsink import (
        apply_batch,
        committed_versions,
        list_versions,
    )

    cols = "event_id LONG, user_id LONG, event_type STRING, ts TIMESTAMP, value DOUBLE"

    def ev(eid, uid, val):
        return (eid, uid, "view", datetime.datetime(2024, 1, 1, 0, 0, eid), val)

    state = str(tmp_path / "torn_state")
    os.makedirs(state)
    apply_batch(spark.createDataFrame([ev(1, 1, 1.0)], cols), 0, state, "q")
    # simulate the torn commit: v1 written (EMPTY state — worst case of
    # a partial write) but the crash hit before the marker
    empty = spark.read.parquet(os.path.join(state, "v0")).limit(0)
    empty.write.mode("overwrite").parquet(os.path.join(state, "v1"))
    assert list_versions(state) == [0, 1]
    assert committed_versions(state) == [0], "orphan leaked into ledger"
    # the replayed batch 1: must merge against v0 (keeping user 1) and
    # rewrite v1, not merge against the empty orphan
    apply_batch(spark.createDataFrame([ev(2, 2, 2.0)], cols), 1, state, "q")
    assert committed_versions(state) == [0, 1]
    users = sorted(
        r["user_id"]
        for r in spark.read.parquet(os.path.join(state, "v1")).collect()
    )
    assert users == [1, 2], "torn commit dropped prior keys"


def test_statestore_reader_exposes_aggregation_state(spark, sf_dir, tmp_path):
    """Spark 4 state data source: a streaming aggregation's checkpointed
    state is queryable as DataFrames — `state-metadata` lists the
    operators, `statestore` returns the keyed state rows. The ops story
    this enables (inspect/repair/backfill state without replaying the
    stream) is a real 100 TB operational need; here the state rows must
    reconstruct EXACTLY the batch aggregation over the drained input."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        load_table,
        read_events_stream,
    )
    from parallel_map_reduce_word_counter_for_one_machine_spark.streaming import drain
    from parallel_map_reduce_word_counter_for_one_machine_spark.streaming.tumbling import (
        WATERMARK,
        _tumbling_plan,
    )

    ckpt = str(tmp_path / "ckpt")
    stream = read_events_stream(spark, sf_dir).withWatermark("ts", WATERMARK)
    q = (
        _tumbling_plan(stream)
        .writeStream.format("memory")
        .queryName("t_statestore_reader")
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    drain(q)

    meta = spark.read.format("state-metadata").load(ckpt)
    ops = [r.operatorName for r in meta.collect()]
    assert "stateStoreSave" in ops, ops

    st = spark.read.format("statestore").load(ckpt)
    # state key = (window struct, event_type); value = aggregation buffer
    # (count, sum). Reconstruct the published relation from raw state.
    val_fields = st.schema["value"].dataType.fieldNames()
    cnt_f = next(f for f in val_fields if "count" in f.lower())
    sum_f = next(f for f in val_fields if "sum" in f.lower())
    got = sorted(
        (
            r["key"]["window"]["start"],
            r["key"]["event_type"],
            r["value"][cnt_f],
            round(r["value"][sum_f], 2),
        )
        for r in st.collect()
    )
    want = sorted(
        map(
            tuple,
            load_table(spark, sf_dir, "events")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s"))
            .select(F.col("w.start"), "event_type", "n", "s")
            .collect(),
        )
    )
    assert len(got) > 0 and got == want


def test_rocksdb_state_store_provider(spark, sf_dir, tmp_path):
    """The production state-store config: RocksDB provider + changelog
    checkpointing (bounded executor memory for 100 TB-scale streaming
    state, incremental commits instead of full snapshots). The tumbling
    aggregation must produce identical results under it, and the
    checkpoint must contain RocksDB artifacts (proof the provider was
    actually engaged, not silently defaulted)."""
    import os

    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        load_table,
        read_events_stream,
    )
    from parallel_map_reduce_word_counter_for_one_machine_spark.streaming import drain
    from parallel_map_reduce_word_counter_for_one_machine_spark.streaming.tumbling import (
        WATERMARK,
        _tumbling_plan,
    )

    prov = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", prov)
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true",
    )
    try:
        ckpt = str(tmp_path / "ckpt_rocks")
        stream = read_events_stream(spark, sf_dir).withWatermark("ts", WATERMARK)
        q = (
            _tumbling_plan(stream)
            .writeStream.format("memory")
            .queryName("t_rocksdb_provider")
            .option("checkpointLocation", ckpt)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        drain(q)
        got = sorted(
            map(tuple, spark.sql("SELECT * FROM t_rocksdb_provider").collect())
        )
        want = sorted(
            map(tuple, _tumbling_plan(load_table(spark, sf_dir, "events")).collect())
        )
        assert got == want and len(got) > 0
        arts = [
            f
            for root, _, fs in os.walk(ckpt)
            for f in fs
            if f.endswith((".zip", ".sst", ".changelog"))
        ]
        assert arts, "no RocksDB snapshot/changelog artifacts in checkpoint"
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        spark.conf.unset(
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled"
        )


def test_observe_metrics_piggyback_on_pipeline(spark, sf_correct):
    """`df.observe`: accumulator-style metrics collected DURING a real
    action, no second scan — the operational counterpart of dq_profile
    (which is itself a query). The observed totals must equal a separate
    aggregation's answer."""
    from pyspark.sql import Observation

    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        load_table,
    )

    d = load_table(spark, sf_correct, "documents")
    obs = Observation("corpus_metrics")
    observed = d.observe(
        obs,
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.approx_count_distinct("lang").alias("n_langs_est"),
    )
    observed.write.mode("overwrite").format("noop").save()  # one real action
    got = obs.get
    want = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.count_distinct("lang").alias("n_langs"),
    ).collect()[0]
    assert got["n_docs"] == want["n_docs"] > 0
    assert got["total_chars"] == want["total_chars"]
    # observed metrics forbid DISTINCT aggregates (pinned error class
    # INVALID_OBSERVED_METRICS...DISTINCT_UNSUPPORTED) - the HLL estimate
    # is the supported spelling, exact at this cardinality (3 langs)
    assert got["n_langs_est"] == want["n_langs"]


def test_vacuum_keeps_latest_versions_and_replay_ledger(spark, sf_correct, tmp_path):
    """VACUUM over a multi-version state table: drives three commits
    through the REAL apply_batch path (event_id-range micro-batches), then
    vacuums to keep_last=1 — only the newest version survives, all commit
    markers survive, the surviving state is untouched, and a replayed old
    batch_id is still skipped (the ledger outlives its vacuumed version)."""
    import os

    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        load_table,
    )
    from parallel_map_reduce_word_counter_for_one_machine_spark.streaming.upsertsink import (
        apply_batch,
        list_versions,
        vacuum_versions,
    )

    state = str(tmp_path / "vacuum_state")
    os.makedirs(state)
    events = load_table(spark, sf_correct, "events")
    n = events.count()
    cuts = [0, n // 3, 2 * n // 3, n]
    w = F.row_number().over(
        __import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy(
            "ts", "event_id"
        )
    )
    numbered = events.withColumn("rn", w).localCheckpoint()
    for i in range(3):
        batch = numbered.filter(
            (F.col("rn") > cuts[i]) & (F.col("rn") <= cuts[i + 1])
        ).drop("rn")
        apply_batch(batch, i, state)
    assert list_versions(state) == [0, 1, 2]
    latest_before = sorted(
        map(tuple, spark.read.parquet(os.path.join(state, "v2")).collect())
    )

    removed = vacuum_versions(state, keep_last=1)
    assert removed == [0, 1]
    assert list_versions(state) == [2]
    markers = sorted(d for d in os.listdir(state) if d.startswith("_applied_b"))
    assert markers == ["_applied_b0", "_applied_b1", "_applied_b2"]
    latest_after = sorted(
        map(tuple, spark.read.parquet(os.path.join(state, "v2")).collect())
    )
    assert latest_after == latest_before

    # replay of a vacuumed batch: marker still blocks it — no new version
    replay = numbered.filter(F.col("rn") <= cuts[1]).drop("rn")
    apply_batch(replay, 0, state)
    assert list_versions(state) == [2]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        vacuum_versions(state, keep_last=0)


def test_time_travel_reads_retained_versions_until_vacuumed(
    spark, sf_correct, tmp_path
):
    """VERSION AS OF semantics on the versioned sink: an old version reads
    back its exact historical state while retained, and raises once
    vacuum reclaims it (the retention-horizon contract)."""
    import os

    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        load_table,
    )
    from parallel_map_reduce_word_counter_for_one_machine_spark.streaming.upsertsink import (
        apply_batch,
        read_version,
        vacuum_versions,
    )
    from pyspark.sql.window import Window

    state = str(tmp_path / "tt_state")
    os.makedirs(state)
    events = load_table(spark, sf_correct, "events")
    n = events.count()
    numbered = events.withColumn(
        "rn", F.row_number().over(Window.orderBy("ts", "event_id"))
    ).localCheckpoint()
    apply_batch(numbered.filter(F.col("rn") <= n // 2).drop("rn"), 0, state)
    v0 = sorted(map(tuple, read_version(spark, state, 0).collect()))
    apply_batch(numbered.filter(F.col("rn") > n // 2).drop("rn"), 1, state)
    # v0 still reads its exact pre-batch-1 content
    assert sorted(map(tuple, read_version(spark, state, 0).collect())) == v0
    v1 = sorted(map(tuple, read_version(spark, state, 1).collect()))
    assert v1 != v0
    vacuum_versions(state, keep_last=1)
    assert sorted(map(tuple, read_version(spark, state, 1).collect())) == v1
    with pytest.raises(ValueError, match="not retained"):
        read_version(spark, state, 0)


def test_late_data_drop_matches_oracle_and_actually_drops(spark, sf_correct):
    """The append-mode watermark key must match DuckDB's two-rule
    reconstruction (no-cohort counts, finalized windows only) AND the
    drop must be REAL: the withheld first-hour cohort is non-empty, its
    window is absent from the emitted relation, and total emitted events
    equal the non-cohort finalized-window population — not the corpus."""
    from parallel_map_reduce_word_counter_for_one_machine_spark import registry
    from parallel_map_reduce_word_counter_for_one_machine_spark.streaming import (
        latedata,  # noqa: F401 — registers the key
    )
    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        load_table,
    )
    from .oracle import assert_matches_oracle

    assert_matches_oracle(
        spark,
        sf_correct,
        "stream_late_data_drop",
        registry.QUERIES["stream_late_data_drop"],
        registry.ORACLES["stream_late_data_drop"],
    )
    evs = load_table(spark, sf_correct, "events")
    b = evs.agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.max("ts").alias("tmax"),
    ).collect()[0]
    cohort_end = b.t0 + __import__("datetime").timedelta(hours=1)
    n_cohort = evs.filter(F.col("ts") < F.lit(cohort_end)).count()
    assert n_cohort > 0, "experiment needs a non-empty late cohort"
    emitted = registry.QUERIES["stream_late_data_drop"](spark, sf_correct)
    rows = emitted.collect()
    t0_ms = int(b.t0.timestamp() * 1000)
    assert all(r.window_start_ms != t0_ms for r in rows), (
        "the late cohort's window must never be emitted"
    )
    # emitted total = all events minus the cohort minus unfinalized tail
    import datetime

    wm = b.tmax - datetime.timedelta(hours=1)
    n_expected = evs.filter(
        (F.col("ts") >= F.lit(cohort_end))
        & (F.date_trunc("hour", F.col("ts")) + F.expr("INTERVAL 1 HOUR") <= F.lit(wm))
    ).count()
    assert sum(r.n_events for r in rows) == n_expected


def test_registered_stream_upsert_matches_oracle(spark, sf_correct):
    """Driver-gated upsert sink: final committed version == the
    declarative last-row-per-key relation."""
    from parallel_map_reduce_word_counter_for_one_machine_spark import registry
    from parallel_map_reduce_word_counter_for_one_machine_spark.streaming import (
        upsertsink,  # noqa: F401 — registers the key
    )
    from .oracle import assert_matches_oracle

    assert_matches_oracle(
        spark,
        sf_correct,
        "stream_upsert_real",
        registry.QUERIES["stream_upsert_real"],
        registry.ORACLES["stream_upsert_real"],
    )


def test_registered_vacuum_retention(spark, sf_correct):
    """Retention verb: latest state intact under the batch oracle, the
    horizon enforced, the replay ledger untouched."""
    from parallel_map_reduce_word_counter_for_one_machine_spark import registry
    from parallel_map_reduce_word_counter_for_one_machine_spark.streaming import (
        upsertsink,  # noqa: F401 — registers the key
    )
    from .oracle import assert_matches_oracle

    assert_matches_oracle(
        spark,
        sf_correct,
        "sink_vacuum_retention",
        registry.QUERIES["sink_vacuum_retention"],
        registry.ORACLES["sink_vacuum_retention"],
    )
    rows = registry.QUERIES["sink_vacuum_retention"](spark, sf_correct).collect()
    assert all(r.horizon_enforced_ok and r.markers_survive_ok for r in rows)

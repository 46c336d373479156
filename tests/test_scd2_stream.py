"""Incremental SCD2 maintenance ≡ the one-shot batch build, regardless of
how the change log is cut into event-time-ordered micro-batches — manual
ordered batches, a REAL readStream run, and replay idempotence."""

from __future__ import annotations

import os
import time

import duckdb

from parallel_map_reduce_word_counter_for_one_machine_spark import registry
from parallel_map_reduce_word_counter_for_one_machine_spark.streaming.scd2sink import (
    apply_scd2_batch,
    run_stream_scd2,
)
from parallel_map_reduce_word_counter_for_one_machine_spark.streaming.upsertsink import (
    committed_versions,
)

registry.load_all()

N_SLICES = 5


def _slice_bounds(sf_dir):
    con = duckdb.connect()
    qs = ", ".join(str((i + 1) / N_SLICES) for i in range(N_SLICES - 1))
    bounds = con.execute(
        f"SELECT quantile_disc(ts, [{qs}]) FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()[0]
    con.close()
    return bounds


def _expected(spark, sf_dir):
    return {
        (r.user_id, r.valid_from_ms, r.valid_to_ms, r.value)
        for r in registry.QUERIES["dim_scd2_build"](spark, sf_dir).collect()
    }


def _state_rows(df):
    return {
        (r.user_id, r.valid_from_ms, r.valid_to_ms, r.value)
        for r in df.collect()
    }


def test_manual_ordered_batches_equal_batch_build(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        load_table,
    )

    # load_table, not a raw read: the declared schema pins ts to TIMESTAMP
    # (raw reads infer TIMESTAMP_NTZ under Spark 4's default)
    evs = load_table(spark, sf_dir, "events")
    bounds = _slice_bounds(sf_dir)
    root = str(tmp_path / "state")
    os.makedirs(root)
    lo = None
    batches = []
    for i, hi in enumerate(list(bounds) + [None]):
        b = evs
        if lo is not None:
            b = b.filter(F.col("ts") >= F.lit(lo))
        if hi is not None:
            b = b.filter(F.col("ts") < F.lit(hi))
        batches.append(b)
        lo = hi
    for i, b in enumerate(batches):
        apply_scd2_batch(b, i, root, lineage="manual")
    final = spark.read.parquet(
        os.path.join(root, f"v{committed_versions(root)[-1]}")
    )
    assert _state_rows(final) == _expected(spark, sf_dir)
    # replay idempotence: re-applying a committed batch changes nothing
    n_versions = len(committed_versions(root))
    apply_scd2_batch(batches[2], 2, root, lineage="manual")
    assert len(committed_versions(root)) == n_versions


def test_real_stream_equals_batch_build(spark, sf_dir, tmp_path):
    staged = str(tmp_path / "staged")
    os.makedirs(staged)
    bounds = _slice_bounds(sf_dir)
    con = duckdb.connect()
    lo = None
    now = time.time() - 1000
    for i, hi in enumerate(list(bounds) + [None]):
        conds = []
        if lo is not None:
            conds.append(f"ts >= TIMESTAMP '{lo}'")
        if hi is not None:
            conds.append(f"ts < TIMESTAMP '{hi}'")
        where = ("WHERE " + " AND ".join(conds)) if conds else ""
        path = os.path.join(staged, f"part{i}.parquet")
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{sf_dir}/events.parquet') "
            f"{where}) TO '{path}' (FORMAT parquet)"
        )
        # distinct ascending mtimes: the file source delivers oldest-first
        os.utime(path, (now + i * 10, now + i * 10))
        lo = hi
    con.close()
    root = str(tmp_path / "stream_state")
    os.makedirs(root)
    final = run_stream_scd2(spark, staged, root, "scd2-test")
    # one commit per staged file, each a separate micro-batch
    assert len(committed_versions(root)) == N_SLICES
    assert _state_rows(final) == _expected(spark, sf_dir)


def test_merge_theorem_under_random_cuts(spark, sf_dir, tmp_path):
    """The merge theorem, property-tested: ANY event-time-ordered cut of
    the change log into micro-batches (random count and boundaries,
    including empty slices) yields the identical final dimension. Uses a
    ~100-event sub-log so each hypothesis example stays cheap."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        load_table,
    )

    evs = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 17 == 0)
        .localCheckpoint()
    )
    ts_sorted = sorted(r.ts for r in evs.select("ts").collect())
    n = len(ts_sorted)
    assert n >= 40
    # reference state: the SAME sub-log merged as ONE batch (the one-batch
    # case equals dim_scd2_build by test_manual_ordered_batches above)
    root0 = str(tmp_path / "ref")
    os.makedirs(root0)
    apply_scd2_batch(evs, 0, root0, lineage="ref")
    from parallel_map_reduce_word_counter_for_one_machine_spark.streaming.upsertsink import (
        latest_committed_state,
    )

    expected = _state_rows(latest_committed_state(spark, root0))

    counter = {"i": 0}

    @settings(max_examples=5, deadline=None)
    @given(
        cuts=st.lists(
            st.integers(min_value=0, max_value=n - 1), min_size=1, max_size=6
        )
    )
    def run(cuts):
        counter["i"] += 1
        root = str(tmp_path / f"s{counter['i']}")
        os.makedirs(root)
        bounds = sorted({ts_sorted[c] for c in cuts})
        lo = None
        bid = 0
        for hi in list(bounds) + [None]:
            b = evs
            if lo is not None:
                b = b.filter(F.col("ts") >= F.lit(lo))
            if hi is not None:
                b = b.filter(F.col("ts") < F.lit(hi))
            apply_scd2_batch(b, bid, root, lineage=f"hyp{counter['i']}")
            bid += 1
            lo = hi
        got = _state_rows(latest_committed_state(spark, root))
        assert got == expected

    run()


def test_registered_stream_scd2_matches_oracle(spark, sf_correct):
    """The driver-gated key: five mtime-ordered micro-batches through the
    marker-ledger sink must land on the batch dimension oracle."""
    from .oracle import assert_matches_oracle

    assert_matches_oracle(
        spark,
        sf_correct,
        "stream_scd2_real",
        registry.QUERIES["stream_scd2_real"],
        registry.ORACLES["stream_scd2_real"],
    )


def test_scd2_time_travel_snapshot_is_consistent(spark, sf_correct):
    """The point-in-time key: version v2 (after 3 of 5 slices) must match
    DuckDB's dimension built over exactly the first three slices; and the
    snapshot must itself be a well-formed dimension (one open row per
    user, no interval overlaps)."""
    from .oracle import assert_matches_oracle

    assert_matches_oracle(
        spark,
        sf_correct,
        "scd2_time_travel",
        registry.QUERIES["scd2_time_travel"],
        registry.ORACLES["scd2_time_travel"],
    )
    rows = registry.QUERIES["scd2_time_travel"](spark, sf_correct).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for u, rs in by_user.items():
        opens = [r for r in rs if r.valid_to_ms is None]
        assert len(opens) == 1, f"user {u}: {len(opens)} open rows"
        ordered = sorted(rs, key=lambda r: r.valid_from_ms)
        for a, b in zip(ordered, ordered[1:]):
            assert a.valid_to_ms == b.valid_from_ms, f"user {u} gap/overlap"

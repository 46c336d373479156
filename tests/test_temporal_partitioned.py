from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parallel_map_reduce_word_counter_for_one_machine_spark import registry
from parallel_map_reduce_word_counter_for_one_machine_spark.plans.inspect import (
    plan_string,
)
from parallel_map_reduce_word_counter_for_one_machine_spark.sources.partitioned import (
    read_language,
    write_partitioned_documents,
)

from .oracle import assert_matches_oracle

registry.load_all()

ORACLE_KEYS = ["join_asof", "join_interval", "join_salted", "sort_alpha"]


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_match(spark, sf_correct, name):
    assert_matches_oracle(
        spark, sf_correct, name, registry.QUERIES[name], registry.ORACLES[name]
    )


def test_pandas_similarity_equals_exact(spark, sf_correct):
    exact = registry.QUERIES["similarity_topk"](spark, sf_correct)
    pandas = registry.QUERIES["similarity_topk_pandas"](spark, sf_correct)
    assert sorted(map(tuple, exact.collect())) == sorted(map(tuple, pandas.collect()))


def test_partitioned_write_prunes(spark, sf_correct, tmp_path):
    out = str(tmp_path / "docs_by_lang")
    write_partitioned_documents(spark, sf_correct, out)
    df = read_language(spark, out, "en")
    plan = plan_string(df)
    assert "PartitionFilters" in plan
    assert "lang" in plan.split("PartitionFilters")[1].splitlines()[0]
    # content roundtrip: same docs as filtering the source table
    src = spark.read.parquet(f"{sf_correct}/documents.parquet").filter(
        F.col("lang") == "en"
    )
    assert sorted(r.doc_id for r in df.collect()) == sorted(
        r.doc_id for r in src.collect()
    )


def test_asof_join_no_extra_exchange(spark, sf_dir):
    """The as-of window must reuse the join's hash distribution — exactly
    one exchange per input side plus none for the window."""
    df = registry.QUERIES["join_asof"](spark, sf_dir)
    plan = plan_string(df, mode="simple")
    # join (2 sides) => at most 2 shuffles... broadcast may remove both; the
    # window partitioned by purchase_id adds its own exchange. Guard against
    # pathological plans only:
    assert plan.count("Exchange") <= 3


def test_registered_partition_pruned_scan(spark, sf_correct):
    """The registered key: PartitionFilters in the plan (pruning happens at
    file-listing time) and parity with filtering the flat table."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.plans.inspect import (
        plan_string,
    )
    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.partitioned import (
        scan_partition_pruned,
    )
    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        load_table,
    )

    df = scan_partition_pruned(spark, sf_correct)
    plan = plan_string(df, mode="formatted")
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:120]
    flat = load_table(spark, sf_correct, "documents").filter("lang = 'de'")
    assert df.count() == flat.count() > 0


def test_join_dpp_plans_dynamic_pruning(spark, sf_correct):
    """`join_dpp` must prune the partitioned fact scan with a RUNTIME
    filter derived from the dim's broadcast: the static plan cannot name
    the langs (the predicate is on the dim's family column), so pruning
    only happens if Spark injects dynamicpruningexpression into the fact's
    PartitionFilters. Also checks oracle parity."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.partitioned import (
        join_dpp,
    )

    df = join_dpp(spark, sf_correct)
    plan = plan_string(df)
    assert "dynamicpruning" in plan.lower(), plan
    part_line = plan.split("PartitionFilters")[1].splitlines()[0]
    assert "dynamicpruning" in part_line.lower(), part_line
    assert_matches_oracle(
        spark,
        sf_correct,
        "join_dpp",
        registry.QUERIES["join_dpp"],
        registry.ORACLES["join_dpp"],
    )


def test_dynamic_partition_overwrite_touches_only_written_partitions(
    spark, sf_correct, tmp_path
):
    """partitionOverwriteMode=dynamic: INSERT OVERWRITE of one lang
    partition replaces ONLY that directory; static mode (the default)
    would truncate every partition first — the difference between a
    partition refresh and wiping a 100 TB table. Asserts other partitions
    byte-identical and the target partition replaced."""
    import os

    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.partitioned import (
        write_partitioned_documents,
    )

    root = str(tmp_path / "dyn_overwrite")
    write_partitioned_documents(spark, sf_correct, root)
    before_en = sorted(
        r.doc_id for r in spark.read.parquet(f"{root}/lang=en").collect()
    )
    de_files_before = sorted(os.listdir(f"{root}/lang=de"))

    saved = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # refreshed 'en' partition: same docs, n_chars recomputed (+1 marker)
        refreshed = (
            spark.read.parquet(f"{root}/lang=en")
            .withColumn("n_chars", F.col("n_chars") + 1)
            .withColumn("lang", F.lit("en"))
        )
        refreshed.write.mode("overwrite").partitionBy("lang").parquet(root)
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", saved)

    # untouched partition: same files on disk, same content
    assert sorted(os.listdir(f"{root}/lang=de")) == de_files_before
    # overwritten partition: same docs, marker applied
    after = spark.read.parquet(f"{root}/lang=en")
    assert sorted(r.doc_id for r in after.collect()) == before_en
    src = spark.read.parquet(f"{sf_correct}/documents.parquet").filter(
        "lang = 'en'"
    )
    want = {(r.doc_id, r.n_chars + 1) for r in src.collect()}
    got = {(r.doc_id, r.n_chars) for r in after.collect()}
    assert got == want


def test_events_locf_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "events_locf",
        registry.QUERIES["events_locf"],
        registry.ORACLES["events_locf"],
    )


def test_scd2_oracle(spark, sf_correct):
    from .oracle import assert_matches_oracle

    assert_matches_oracle(
        spark,
        sf_correct,
        "dim_scd2_build",
        registry.QUERIES["dim_scd2_build"],
        registry.ORACLES["dim_scd2_build"],
    )


def test_scd2_interval_chain(spark, sf_correct):
    """Per user: valid_from strictly increasing, each valid_to equals the
    next row's valid_from (half-open intervals chain without gaps or
    overlaps), exactly ONE open (NULL valid_to) current row per user, and
    consecutive versions always change the tracked value."""
    rows = registry.QUERIES["dim_scd2_build"](spark, sf_correct).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for chain in by_user.values():
        chain.sort(key=lambda r: r.valid_from_ms)
        assert sum(1 for r in chain if r.valid_to_ms is None) == 1
        assert chain[-1].valid_to_ms is None
        for a, b in zip(chain, chain[1:]):
            assert a.valid_to_ms == b.valid_from_ms
            assert a.valid_from_ms < b.valid_from_ms
            assert a.value != b.value


def test_ohlc_oracle(spark, sf_correct):
    from .oracle import assert_matches_oracle

    assert_matches_oracle(
        spark,
        sf_correct,
        "events_ohlc_hourly",
        registry.QUERIES["events_ohlc_hourly"],
        registry.ORACLES["events_ohlc_hourly"],
    )


def test_ohlc_vs_python(spark, sf_dir):
    """open/close must be the first/last value under the (ts, event_id)
    total order; high/low the extremes; per (event_type, hour)."""
    rows = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    groups = {}
    for r in rows:
        hour_ms = int(
            r.ts.replace(minute=0, second=0, microsecond=0).timestamp() * 1000
        )
        groups.setdefault((r.event_type, hour_ms), []).append(
            (r.ts, r.event_id, r.value)
        )
    expected = {}
    for k, xs in groups.items():
        xs.sort()
        vals = [v for _, _, v in xs]
        expected[k] = (xs[0][2], max(vals), min(vals), xs[-1][2], len(xs))
    got = {
        (r.event_type, r.hour_ms): (r.open, r.high, r.low, r.close, r.n_events)
        for r in registry.QUERIES["events_ohlc_hourly"](spark, sf_dir).collect()
    }
    assert got == expected
    for o, h, l, c, _ in got.values():
        assert l <= o <= h and l <= c <= h


def test_events_gap_fill_densifies(spark, sf_correct):
    """Oracle match + density invariants: per user, exactly one row per
    day between first and last activity, gap rows carry zeros, non-gap
    rows reproduce the plain daily aggregate."""
    from parallel_map_reduce_word_counter_for_one_machine_spark import registry
    from .oracle import assert_matches_oracle

    assert_matches_oracle(
        spark,
        sf_correct,
        "events_gap_fill",
        registry.QUERIES["events_gap_fill"],
        registry.ORACLES["events_gap_fill"],
    )
    rows = registry.QUERIES["events_gap_fill"](spark, sf_correct).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    day = 86_400_000
    n_gaps = 0
    for u, rs in by_user.items():
        ds = sorted(r.day_ms for r in rs)
        assert ds == list(range(ds[0], ds[-1] + day, day)), f"user {u} not dense"
        for r in rs:
            if r.is_gap:
                n_gaps += 1
                assert r.n_events == 0 and r.sum_value == 0.0
            else:
                assert r.n_events > 0
    assert n_gaps > 0  # the corpus genuinely has inactive days


def test_join_asof_tolerance_semantics(spark, sf_correct):
    """Oracle match + the bound's semantics vs the unbounded as-of: same
    row count (left join), matches are exactly the unbounded matches
    within 24h, stale matches become NULL (never an OLDER substitute)."""
    from parallel_map_reduce_word_counter_for_one_machine_spark import registry
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.temporal import (
        ASOF_TOL_MS,
        join_asof,
        join_asof_tolerance,
    )
    from .oracle import assert_matches_oracle

    assert_matches_oracle(
        spark,
        sf_correct,
        "join_asof_tolerance",
        registry.QUERIES["join_asof_tolerance"],
        registry.ORACLES["join_asof_tolerance"],
    )
    unbounded = {
        r.purchase_id: r for r in join_asof(spark, sf_correct).collect()
    }
    bounded = {
        r.purchase_id: r
        for r in join_asof_tolerance(spark, sf_correct).collect()
    }
    assert set(bounded) == set(unbounded)
    n_nulled = 0
    for pid, b in bounded.items():
        u = unbounded[pid]
        if u.click_ms is not None and u.purchase_ms - u.click_ms <= ASOF_TOL_MS:
            assert b.click_id == u.click_id  # within bound: identical match
        else:
            assert b.click_id is None  # stale or absent: NULL, no substitute
            if u.click_ms is not None:
                n_nulled += 1
    assert n_nulled > 0  # the bound genuinely fires on this corpus

"""Physical-plan assertions: the 100 TB design contract, executable.

Each test pins a property that keeps the plan scalable — if a refactor
regresses one (a broadcast silently becomes a sort-merge join, a filter
stops pushing down, a top-k becomes a global sort), these fail before any
benchmark notices.
"""

from __future__ import annotations

from parallel_map_reduce_word_counter_for_one_machine_spark import registry
from parallel_map_reduce_word_counter_for_one_machine_spark.plans.inspect import (
    assert_in_plan,
    count_occurrences,
    plan_string,
)

registry.load_all()


def test_filter_project_pushdown(spark, sf_dir):
    df = registry.QUERIES["filter_project"](spark, sf_dir)
    plan = plan_string(df)
    assert "PushedFilters" in plan
    assert "l_quantity" in plan.split("PushedFilters")[1].splitlines()[0]
    # column pruning: shipdate/tax/etc. must not be in the scan schema
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_shipdate" not in read_schema
    assert "l_extendedprice" in read_schema


def test_star_join_all_broadcast(spark, sf_dir):
    # simple mode: each operator appears exactly once (formatted lists ops
    # twice — tree + detail section).
    df = registry.QUERIES["star_join_agg"](spark, sf_dir)
    plan = plan_string(df, mode="simple")
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan


def test_word_count_partial_aggregation(spark, sf_dir):
    # partial + final HashAggregate around exactly one exchange — the sound
    # version of the reference's per-thread maps + striped-lock merge.
    df = registry.QUERIES["word_count"](spark, sf_dir)
    plan = plan_string(df, mode="simple")
    assert plan.count("HashAggregate") == 2
    assert plan.count("Exchange") == 1


def test_topk_is_take_ordered(spark, sf_dir):
    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        load_table,
    )
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders")
    top = o.orderBy(F.desc("o_totalprice")).limit(10)
    assert_in_plan(top, "TakeOrderedAndProject")


def test_semi_join_stays_semi(spark, sf_dir):
    df = registry.QUERIES["join_semi"](spark, sf_dir)
    assert "LeftSemi" in plan_string(df)


def test_whole_stage_codegen_in_scalar_battery(spark, sf_dir):
    # the '*' operator prefix marks whole-stage-codegen spans
    df = registry.QUERIES["scalar_funcs"](spark, sf_dir)
    assert "* Project" in plan_string(df) or "*(1) Project" in plan_string(
        df, mode="simple"
    )


def test_global_rank_distributed(spark, sf_dir):
    # Full-listing ranks (word_count_alpha / sort_by_count_desc) must NOT
    # funnel the data through a single-partition window. The distributed
    # scheme (operators/rank.py): one range exchange REUSED by both the
    # local-rank branch and the offsets branch (reuse also guarantees both
    # see the same sampled boundaries), and the only SinglePartition
    # exchange operates on the P-row per-partition counts.
    df = registry.QUERIES["sort_by_count_desc"](spark, sf_dir)
    df.collect()  # AQE: reuse appears in the final adaptive plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "ReusedExchange" in final
    assert "rangepartitioning" in final
    # the full-data window is partitioned by _pid, not global
    assert "windowspecdefinition(_pid" in final


def test_pack_sequences_cumsum_distributed(spark, sf_dir):
    # Same contract as global_rank for the prefix sum: the range exchange
    # is planned once (ReusedExchange in the final adaptive plan, which
    # also pins identical sampled boundaries for both branches) and the
    # full-data cumsum window is per-_pid, not global.
    df = registry.QUERIES["pack_sequences"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "ReusedExchange" in final
    assert "rangepartitioning" in final
    assert "windowspecdefinition(_pid" in final


def test_sessionize_single_exchange(spark, sf_dir):
    # hashpartitioning(user_id) satisfies the groupBy's
    # ClusteredDistribution(user_id, session_n) — the windows' exchange is
    # the ONLY one in the whole sessionization plan.
    p = plan_string(registry.QUERIES["sessionize"](spark, sf_dir), mode="simple")
    assert p.count("Exchange") == 1


def test_stream_enrich_broadcasts_dim(spark, sf_dir):
    p = plan_string(
        registry.QUERIES["stream_enrich"](spark, sf_dir), mode="simple"
    )
    assert "BroadcastHashJoin" in p


def test_events_ts_predicate_pushes_to_scan(spark, sf_dir):
    # The events table is read with its declared schema (ts: timestamp), so
    # a time-range predicate reaches the parquet scan as a pushed filter —
    # at 100 TB this is what turns "last 6 hours" into a footer-stats skip
    # of almost every row group instead of a full scan.
    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        load_table,
    )
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts") >= F.lit("2024-01-02 00:00:00").cast("timestamp")
    )
    plan = plan_string(e)
    pushed = plan.split("PushedFilters")[1].splitlines()[0]
    assert "GreaterThanOrEqual(ts" in pushed
    assert "timestamp" in plan.split("ReadSchema")[1].splitlines()[0]


def test_event_funnel_single_corpus_exchange(spark, sf_dir):
    # The funnel folds inside the per-user aggregate: ONE hashpartitioning
    # exchange over event rows; the only other exchange is the
    # SinglePartition gather of the (single-row) step counts. A regression
    # to the per-step join formulation would add an exchange per step.
    p = plan_string(registry.QUERIES["event_funnel"](spark, sf_dir), mode="simple")
    assert p.count("Exchange hashpartitioning") == 1
    assert p.count("Exchange SinglePartition") == 1
    # the type filter reaches the parquet scan
    assert "PushedFilters" in p and "event_type" in p.split("PushedFilters")[1].splitlines()[0]


def test_events_anomaly_single_exchange(spark, sf_dir):
    # One keyed window exchange on (user_id, event_type); no global pass.
    p = plan_string(registry.QUERIES["events_anomaly"](spark, sf_dir), mode="simple")
    assert p.count("Exchange") == 1
    assert "SinglePartition" not in p


def test_lsh_verify_joins_no_hardcoded_broadcast(spark, sf_dir):
    # VERDICT r03 item 3: the LSH candidate-pair lists grow O(N * bands)
    # with the corpus, so a hard-coded F.broadcast hint on them is a
    # driver-OOM at 100x. The verify joins must carry NO user hint in the
    # logical plan (AQE may still choose broadcast at runtime when the
    # list actually fits -- that's the point).
    from pyspark.sql import functions as F

    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.dedup import (
        embedding_lsh_pairs,
        lsh_verified_pairs,
        minhash_lsh_pairs,
    )
    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dfs = [
        minhash_lsh_pairs(spark, sf_dir),
        embedding_lsh_pairs(emb.select("vec_id", v.alias("v"))),
        lsh_verified_pairs(spark, sf_dir),
    ]
    for df in dfs:
        analyzed = df._jdf.queryExecution().analyzed().toString()
        assert "ResolvedHint" not in analyzed
        assert "UnresolvedHint" not in analyzed


def test_join_strategy_hints_are_honored(spark, sf_dir):
    """The per-join strategy hint surface: SHUFFLE_HASH forces a
    ShuffledHashJoin, MERGE forces SortMergeJoin, BROADCAST forces
    BroadcastHashJoin — the escape hatches when stats mislead the planner
    (a 100 TB join whose build side fits memory per-partition wants
    shuffle-hash: no sort, no broadcast collect). The package's own
    operators rely on AQE + stats instead of hard-coded hints
    (plan-tested elsewhere); this pins that the hint mechanism itself
    works when an operator genuinely needs it."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )

    def plan_of(hint):
        j = li.join(orders.hint(hint), li.l_orderkey == orders.o_orderkey)
        return plan_string(j, mode="simple")

    assert "ShuffledHashJoin" in plan_of("shuffle_hash")
    assert "SortMergeJoin" in plan_of("merge")
    assert "BroadcastHashJoin" in plan_of("broadcast")
    # and the hinted plans agree on the answer
    n = li.join(orders.hint("shuffle_hash"), li.l_orderkey == orders.o_orderkey).count()
    m = li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey).count()
    assert n == m > 0


def test_correlated_exists_plans_as_semi_and_anti_joins(spark, sf_dir):
    """EXISTS → LeftSemi, NOT EXISTS → LeftAnti: the correlated subqueries
    must lower to key joins, never per-row subquery execution. Plus oracle
    parity at correctness scale (sf_dir here for the plan only)."""
    from parallel_map_reduce_word_counter_for_one_machine_spark import registry

    registry.load_all()
    df = registry.QUERIES["sql_exists_correlated"](spark, sf_dir)
    plan = plan_string(df, mode="simple")
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan


def test_quality_deciles_rank_is_distributed_and_reused(spark, sf_dir):
    """quality_deciles must inherit global_rank's contract: the range
    exchange planned once (ReusedExchange in the final adaptive plan) and
    the full-data window per-_pid — never a corpus-wide ntile window."""
    from parallel_map_reduce_word_counter_for_one_machine_spark import registry

    registry.load_all()
    df = registry.QUERIES["quality_deciles"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "ReusedExchange" in final, final[:3000]
    assert "rangepartitioning" in final
    assert "windowspecdefinition(_pid" in final

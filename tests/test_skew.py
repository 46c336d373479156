"""AQE skew-join robustness: a deliberately skewed shuffle join (one key
owning ~95% of the fact side) must complete with correct results AND the
adaptive planner must actually split the skewed partition — the runtime
defense SCALE.md relies on for hot keys the static salting operators
(`agg_salted`, `join_salted`) don't cover.

Two traps found while building this test, both worth remembering when
debugging "why didn't AQE split my skew" in production:
- a groupBy on the JOIN KEY downstream of the join disables the split
  (splitting would break the hash distribution the aggregate needs, and
  forceOptimizeSkewedJoin is off by default);
- skew detection works on COMPRESSED shuffle sizes, so a hot partition
  of constant/pruned columns can compress below the threshold and look
  healthy.
"""

from __future__ import annotations

from pyspark.sql import functions as F

N_HOT = 200_000  # rows on the hot key
N_COLD_KEYS = 50
N_COLD_EACH = 200

_SKEW_CONFS = {
    # shrink AQE's skew thresholds so the test-sized hot partition trips
    # the same machinery a 256 MB-per-partition production skew would
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    # keep AQE from first coalescing the skew away at this tiny scale
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


def _skewed_tables(spark):
    # non-sequential payload so the hot partition doesn't compress below
    # the skew threshold (see module docstring)
    hot = spark.range(N_HOT).select(
        F.lit(0).alias("k"), (F.col("id") * F.col("id") % 997).alias("payload")
    )
    cold = spark.range(N_COLD_KEYS * N_COLD_EACH).select(
        (F.col("id") % N_COLD_KEYS + 1).alias("k"), F.col("id").alias("payload")
    )
    fact = hot.unionAll(cold)
    dim = spark.range(N_COLD_KEYS + 1).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim_val")
    )
    # a dim with duplicate keys forces a real shuffle join contribution
    dim = dim.unionAll(dim)
    return fact, dim


def test_aqe_splits_skewed_join(spark):
    saved = {k: spark.conf.get(k, None) for k in _SKEW_CONFS}
    for k, v in _SKEW_CONFS.items():
        spark.conf.set(k, v)
    try:
        fact, dim = _skewed_tables(spark)
        # global agg only: a groupBy on the join key would forbid the
        # split (module docstring trap #1); summing payload+dim_val keeps
        # both columns un-pruned through the join (trap #2)
        j = fact.join(dim, "k").agg(
            F.count("*").alias("n"),
            F.sum(F.col("payload") + F.col("dim_val")).alias("s"),
        )
        row = j.collect()[0]
        # every fact row matches exactly 2 dim rows (dim duplicated)
        assert row.n == 2 * (N_HOT + N_COLD_KEYS * N_COLD_EACH)
        # collect() ran THIS DataFrame's QueryExecution, so the adaptive
        # plan attached to it is final and records the skew split
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_skewed_join_correct_without_aqe_split(spark):
    """Same join with skew handling off still returns identical results —
    the optimization is transparent to semantics."""
    saved = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try:
        fact, dim = _skewed_tables(spark)
        agg = (
            fact.join(dim, "k")
            .groupBy("k")
            .agg(F.count("*").alias("n"))
            .collect()
        )
        got = {r.k: r.n for r in agg}
        assert got[0] == 2 * N_HOT
        for k in range(1, N_COLD_KEYS + 1):
            assert got[k] == 2 * N_COLD_EACH
    finally:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", saved)


def test_aqe_coalesces_small_shuffle_partitions(spark):
    """The other AQE lever: a shuffle whose data is far smaller than
    shuffle.partitions × advisory size must coalesce to fewer partitions
    at runtime (AQEShuffleRead coalesced) — the behavior that keeps a
    1000-executor job from scheduling thousands of empty reducers."""
    from pyspark.sql import functions as F

    df = (
        spark.range(10_000)
        .select((F.col("id") % 100).alias("k"), "id")
        .groupBy("k")
        .agg(F.sum("id").alias("s"))
    )
    rows = df.collect()
    assert len(rows) == 100
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "AQEShuffleRead coalesced" in plan, plan[:1500]
    assert df.rdd.getNumPartitions() < int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )


_BLOOM_CONFS = {
    # force a shuffle join (broadcast joins get DPP-style reuse instead)
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # test-scale scans are far below the 10 GB production threshold
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
}


def test_runtime_bloom_filter_injected_on_shuffle_join(spark):
    """Runtime filter injection — the shuffle-join sibling of DPP: a
    selective predicate on one join side materializes a bloom filter
    (bloom_filter_agg over the creation side's join keys) that is pushed
    into the other side's scan as might_contain(), discarding non-matching
    rows BEFORE the shuffle. At 100 TB this is the difference between
    shuffling the full fact table and shuffling the ~1% that can join.
    Thresholds (creation side ≤ 10 MB agg'd, application side ≥ 10 GB
    scanned by default) gate it in production; the test lowers the
    application-side floor to make the injection observable at sf scale,
    and asserts results are unchanged vs the un-filtered plan."""
    sf = "/root/testdata/sf0.01"
    saved = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}

    def run():
        li = spark.read.parquet(f"{sf}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf}/orders.parquet").filter(
            "o_orderpriority = '1-URGENT'"
        )
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("l_quantity").cast("long")).alias("q"),
            )
        )

    for k, v in _BLOOM_CONFS.items():
        spark.conf.set(k, v)
    try:
        j = run()
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "might_contain" in plan, plan[:2000]
        assert "bloom_filter_agg" in plan, plan[:2000]
        # the runtime filter lands on the APPLICATION side's scan condition
        # (l_orderkey), not the creation side
        cond = [ln for ln in plan.splitlines() if "might_contain" in ln]
        assert any("l_orderkey" in ln for ln in cond), cond
        with_filter = {tuple(r) for r in j.collect()}
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    # semantics unchanged: same result without the runtime filter
    key = "spark.sql.optimizer.runtime.bloomFilter.enabled"
    spark.conf.set(key, "false")
    try:
        without = {tuple(r) for r in run().collect()}
    finally:
        if saved[key] is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, saved[key])
    assert with_filter == without and with_filter

"""Second relational batch: non-equi joins, cube/grouping-sets, subquery
forms, percentiles, ntile/percent_rank, pivot, approximate distinct, and
two-phase salted aggregation (the scalable form of the reference's striped
hot-key insight, reference src/main.cpp:118-138 / README.md:189-204).

Same determinism policy as relational.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..sources.tables import load_table


@query(
    "join_range",
    oracle=(
        "SELECT l_orderkey, l_linenumber, p_partkey, p_size "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "AND l_quantity BETWEEN p_size - 2 AND p_size + 2"
    ),
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi key + range residual: planned as a hash join on l_partkey with
    the BETWEEN as a post-probe filter — the residual never forces a
    nested-loop. (A pure range join with no equi key would use a broadcast
    NLJ or, at scale, a binned/bucketized range join.)"""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (li.l_partkey == p.p_partkey)
        & (li.l_quantity >= p.p_size - 2)
        & (li.l_quantity <= p.p_size + 2)
    )
    return li.join(F.broadcast(p), cond).select(
        "l_orderkey", "l_linenumber", "p_partkey", "p_size"
    )


@query(
    "agg_cube",
    oracle=(
        "SELECT o_orderstatus, o_orderpriority, count(*) AS n, "
        "round(sum(o_totalprice), 2) AS sum_price "
        "FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)"
    ),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cube over two dimensions — one expand + single aggregation pass."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("sum_price")
    )


@query(
    "agg_grouping_sets",
    oracle=(
        "SELECT l_returnflag, l_linestatus, count(*) AS n "
        "FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))"
    ),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via SQL (the DataFrame API exposes only
    rollup/cube; ``spark.sql`` is part of this engine's surface)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem_gs")
    return spark.sql(
        "SELECT l_returnflag, l_linestatus, count(*) AS n "
        "FROM v_lineitem_gs GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))"
    )


@query(
    "subquery_in",
    oracle=(
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_custkey IN ("
        "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') "
        "AND o_totalprice > 300000"
    ),
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery — Catalyst rewrites to a left-semi join (asserted in
    plan tests); expressed via SQL to exercise the subquery path."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_sq")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer_sq")
    return spark.sql(
        "SELECT o_orderkey, o_totalprice FROM v_orders_sq WHERE o_custkey IN ("
        "SELECT c_custkey FROM v_customer_sq WHERE c_mktsegment = 'BUILDING') "
        "AND o_totalprice > 300000"
    )


@query(
    "subquery_scalar",
    oracle=(
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)"
    ),
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate — planned as a one-row subquery
    broadcast into the filter. avg()*1.5 compares identically cross-engine
    because the threshold is one double and rows are far from it... but to
    be exact: both engines compute avg over the same 15k doubles; the
    comparison boundary could in principle flip a row, so the filter uses a
    strict margin column emitted for visibility."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_ssq")
    return spark.sql(
        "SELECT o_orderkey, o_totalprice FROM v_orders_ssq "
        "WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM v_orders_ssq)"
    )


@query(
    "union_all",
    oracle=(
        "SELECT c_custkey AS key, 'customer' AS src FROM customer "
        "UNION ALL SELECT s_suppkey, 'supplier' FROM supplier"
    ),
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics UNION ALL — no dedup aggregate, no shuffle at all."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"), F.lit("customer").alias("src")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("key"), F.lit("supplier").alias("src")
    )
    return c.unionAll(s)


@query(
    "window_ntile",
    oracle=(
        "SELECT o_orderkey, "
        "ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile, "
        "round(percent_rank() OVER (ORDER BY o_totalprice, o_orderkey), 6) AS pct_rank "
        "FROM orders"
    ),
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile + percent_rank (global windows; rank semantics need a total
    order for determinism — o_orderkey tiebreak)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


@query(
    "pivot_status",
    oracle=(
        "SELECT o_orderpriority, "
        "count(*) FILTER (WHERE o_orderstatus = 'F') AS status_F, "
        "count(*) FILTER (WHERE o_orderstatus = 'O') AS status_O, "
        "count(*) FILTER (WHERE o_orderstatus = 'P') AS status_P "
        "FROM orders GROUP BY o_orderpriority"
    ),
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (never let pivot infer values at
    scale — that's a full distinct scan before planning)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("status_F"),
            F.coalesce("O", F.lit(0)).alias("status_O"),
            F.coalesce("P", F.lit(0)).alias("status_P"),
        )
    )


@query(
    "percentiles",
    oracle=(
        "SELECT l_returnflag, "
        "round(quantile_cont(l_extendedprice, 0.5), 4) AS p50, "
        "round(quantile_cont(l_extendedprice, 0.95), 4) AS p95 "
        "FROM lineitem GROUP BY l_returnflag"
    ),
)
def percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``). At 100 TB swap for ``approx_percentile`` (t-digest,
    single pass, bounded memory) — exact kept here because the oracle is
    exact; the approx variant is ``approx_distinct``'s sibling below."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", 0.5), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", 0.95), 4).alias("p95"),
    )


@query(
    "approx_distinct",
    oracle=(
        # Tolerance-checked oracle (round-2 upgrade from rows-only): the HLL
        # estimate itself is sketch-algorithm-specific and can't be compared
        # cross-engine, but the BOUND CHECK can — the oracle asserts the
        # exact count and `TRUE` for the documented ±5% envelope (2.5× the
        # configured rsd=0.02), and the Spark side emits the actually-
        # evaluated bound, so a drifting sketch flips the hash match.
        "SELECT count(DISTINCT o_custkey) AS exact_customers, "
        "TRUE AS within_bound FROM orders"
    ),
)
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimation — THE cardinality operator at
    100 TB (fixed-size sketch vs the unbounded exact-distinct hash). The
    estimate is checked in-query against the exact count at a ±5% envelope
    (rsd 0.02 ⇒ |err| < 2.5σ with probability ≈ 0.988; observed error on
    this column is ≪ 1%); the driver oracle pins exact count + bound."""
    o = load_table(spark, sf_dir, "orders")
    est = F.approx_count_distinct("o_custkey", 0.02)
    exact = F.count_distinct("o_custkey")
    return o.agg(
        exact.alias("exact_customers"),
        (F.abs(est - exact) <= 0.05 * exact).alias("within_bound"),
    )


@query(
    "agg_salted",
    oracle=(
        "SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty "
        "FROM lineitem GROUP BY l_returnflag"
    ),
)
def agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a LOW-CARDINALITY/hot-key column:
    phase 1 groups by (key, salt∈[0,16)) spreading each hot key over 16
    reducers, phase 2 folds the salted partials. This is the scalable
    version of the reference's striped-lock merge (hash(word)%stripes,
    src/main.cpp:132-135) — same idea, but with disjoint state per
    partition instead of a racy shared map. Result ≡ plain groupBy (the
    oracle), because count/sum are associative+commutative.

    NOTE: for most workloads Spark's map-side partial aggregation already
    absorbs hot keys — salting is the explicit escape hatch for when it
    can't (e.g. partial agg disabled by distinct-agg rewrites)."""
    li = load_table(spark, sf_dir, "lineitem")
    salted = li.withColumn("salt", F.pmod(F.xxhash64("l_orderkey"), F.lit(16)))
    phase1 = salted.groupBy("l_returnflag", "salt").agg(
        F.count("*").alias("n_part"), F.sum("l_quantity").alias("qty_part")
    )
    return phase1.groupBy("l_returnflag").agg(
        F.sum("n_part").alias("n"),
        F.round(F.sum("qty_part"), 2).alias("sum_qty"),
    )


@query(
    "window_cume_dist",
    oracle=(
        "SELECT event_id, event_type, "
        "round(cume_dist() OVER (PARTITION BY event_type "
        "ORDER BY value, event_id), 6) AS cd, "
        "round(percent_rank() OVER (PARTITION BY event_type "
        "ORDER BY value, event_id), 6) AS pr "
        "FROM events"
    ),
)
def window_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group distribution ranks — ``cume_dist`` (share of the group at
    or below this row) and ``percent_rank``, partitioned by event_type
    with a total order: the percentile-calibration idiom that turns a raw
    score column into a within-group percentile (how quality scores get
    calibrated per source before a global threshold is applied). Completes
    the window battery: rank/ntile/lag/lead/range-frame/running are
    registered, these were the two distribution functions missing.

    Scale shape: one exchange on the partition key, each group streams
    through its sort independently — identical physical shape to
    window_rank; both functions are exact rationals (k/n), rounded 6dp."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return e.select(
        "event_id",
        "event_type",
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
    )

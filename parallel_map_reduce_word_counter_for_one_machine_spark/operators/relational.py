"""Generalized relational surface (SURVEY.md §2c rows filter_project …
json_extract) over the TPC-H-ish test tables.

The reference has NO relational operators beyond its single word-count
pipeline — no joins of any kind, no general predicates/projections, no
window functions, no set ops, no scalar function library (evidence of
absence: SURVEY.md §2b; the whole program is one linear pipeline,
reference src/main.cpp:78-281). This module supplies that surface
Spark-first: every query is a declarative DataFrame plan, so Catalyst does
predicate pushdown into the parquet scans, column pruning, join selection,
and AQE does runtime coalescing/skew handling.

Scale design notes applied throughout:
- Dimension joins take an explicit ``broadcast()`` hint (region/nation/
  supplier/part stay tiny at any SF) — no shuffle for the dim side.
- Fact-fact joins (orders ⋈ customer at 100 TB) shuffle on the join key;
  AQE skew-join splits oversized partitions at runtime.
- Float determinism policy (driver's value-hash is exact): per-row double
  arithmetic is emitted UNROUNDED — identical IEEE ops on identical inputs
  are bit-identical cross-engine. AGGREGATES of doubles are rounded (2dp
  money, 4dp averages) in BOTH the Spark plan and the DuckDB oracle because
  summation order differs cross-engine (~1e-8 error). Never round a raw
  per-row double: Spark rounds the shortest-decimal repr HALF_UP while
  DuckDB rounds the binary value, so exact half-boundary inputs (common in
  money data) disagree — observed empirically on this dataset.
- Window tiebreaks are always total orders (explicit key tiebreak) so
  results are deterministic and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..sources.tables import load_table


# --------------------------------------------------------------------------
# filter + projection
# --------------------------------------------------------------------------
@query(
    "filter_project",
    oracle=(
        "SELECT l_orderkey, l_partkey, l_quantity, "
        "l_extendedprice * (1 - l_discount) AS revenue "
        "FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'"
    ),
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection; both the filter and the 4-column ReadSchema
    push into the parquet scan (verified in tests/test_plans.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_quantity") > 45) & (F.col("l_returnflag") == "R")).select(
        "l_orderkey",
        "l_partkey",
        "l_quantity",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


# --------------------------------------------------------------------------
# joins
# --------------------------------------------------------------------------
@query(
    "join_inner",
    oracle=(
        "SELECT o_orderkey, o_totalprice, c_name, c_mktsegment "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "WHERE o_orderstatus = 'O'"
    ),
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join fact→customer. customer is broadcast-able at test SF;
    at 100 TB it becomes a shuffled hash join on the key — same plan code,
    AQE + the size threshold pick the strategy."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    cust = load_table(spark, sf_dir, "customer")
    return orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@query(
    "join_left",
    oracle=(
        "SELECT c_custkey, c_name, o_orderkey, o_totalprice "
        "FROM customer LEFT JOIN orders "
        "ON c_custkey = o_custkey AND o_totalprice > 400000"
    ),
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with a join-side predicate (kept in the join condition,
    not the WHERE, to preserve unmatched customers)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cond = (cust.c_custkey == orders.o_custkey) & (orders.o_totalprice > 400000)
    return cust.join(orders, cond, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "join_semi",
    oracle=(
        "SELECT c_custkey, c_name FROM customer c WHERE EXISTS ("
        "SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
        "AND o.o_totalprice > 450000)"
    ),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join — customers with ≥1 big order. Semi joins never
    duplicate the left side, so no post-join distinct is needed."""
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle=(
        "SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS ("
        "SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"
    ),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join — customers with no orders at all."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "star_join_agg",
    oracle=(
        "SELECT r_name, n_name, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, "
        "count(*) AS n_items "
        "FROM lineitem "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "GROUP BY r_name, n_name"
    ),
)
def star_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-style star join: fact ⋈ three broadcast dims → group-agg.
    All three dim joins are broadcast (no shuffle); the only exchange is the
    final groupBy — the canonical 100 TB star-schema plan."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    return (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# aggregation
# --------------------------------------------------------------------------
@query(
    "agg_group",
    oracle=(
        "SELECT l_returnflag, l_linestatus, "
        "round(sum(l_quantity), 2) AS sum_qty, "
        "round(sum(l_extendedprice), 2) AS sum_base_price, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
        "round(avg(l_quantity), 4) AS avg_qty, "
        "round(avg(l_discount), 4) AS avg_disc, "
        "count(*) AS count_order "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '2024-09-01' "
        "GROUP BY l_returnflag, l_linestatus"
    ),
)
def agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style multi-aggregate. Partial (map-side) agg + one hash
    exchange on the two group keys — the generalized version of the
    reference's per-thread maps + striped merge (src/main.cpp:111-138)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "agg_rollup",
    oracle=(
        "SELECT l_returnflag, l_linestatus, "
        "count(*) AS n, round(sum(l_quantity), 2) AS sum_qty "
        "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"
    ),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals: (flag,status) → (flag) → grand total.
    Planned as a single expand+aggregate, not three passes."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


@query(
    "agg_stats",
    oracle=(
        "SELECT o_orderpriority, "
        "count(*) AS n, "
        "round(min(o_totalprice), 2) AS min_price, "
        "round(max(o_totalprice), 2) AS max_price, "
        "round(avg(o_totalprice), 4) AS avg_price, "
        "count(DISTINCT o_custkey) AS n_customers "
        "FROM orders GROUP BY o_orderpriority"
    ),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max/avg/count-distinct battery — aggregates the reference lacks
    entirely (its only reduce is ``+=``, src/main.cpp:135)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.count_distinct("o_custkey").alias("n_customers"),
    )


# --------------------------------------------------------------------------
# window functions
# --------------------------------------------------------------------------
@query(
    "window_rank",
    oracle=(
        "SELECT * FROM ("
        "SELECT o_custkey, o_orderkey, o_totalprice, "
        "row_number() OVER (PARTITION BY o_custkey "
        "ORDER BY o_totalprice DESC, o_orderkey) AS rk FROM orders) t "
        "WHERE rk <= 3"
    ),
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. Partitioned window — one hash exchange on
    o_custkey, then per-partition sort; scales with customer cardinality
    (no global sort, no single-partition window)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 3)
    )


@query(
    "window_running",
    oracle=(
        "SELECT o_custkey, o_orderkey, "
        "round(sum(o_totalprice) OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderdate, o_orderkey "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend "
        "FROM orders"
    ),
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer spend — an explicit ROWS frame. Accumulation
    order is pinned by the total order (date, key) so the fp sum is
    reproducible cross-engine."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@query(
    "window_lag_lead",
    oracle=(
        "SELECT o_custkey, o_orderkey, "
        "lag(o_orderkey) OVER w AS prev_order, "
        "lead(o_orderkey) OVER w AS next_order, "
        "rank() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS status_rank "
        "FROM orders "
        "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"
    ),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead navigation + rank-with-ties in one pass over one window
    exchange."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wr = Window.partitionBy("o_custkey").orderBy("o_orderstatus")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.rank().over(wr).alias("status_rank"),
    )


# --------------------------------------------------------------------------
# sort / limit
# --------------------------------------------------------------------------
@query(
    "sort_limit_topk",
    oracle=(
        "SELECT o_orderkey, o_totalprice, "
        "row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rk "
        "FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
    ),
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k → TakeOrderedAndProject (per-partition heap + k-row
    driver merge), NOT a full range-partitioned sort. Rank attached after
    the limit so the window runs on 10 rows."""
    o = load_table(spark, sf_dir, "orders")
    top = o.select("o_orderkey", "o_totalprice").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    ).limit(10)
    w = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return top.select("o_orderkey", "o_totalprice", F.row_number().over(w).alias("rk"))


# --------------------------------------------------------------------------
# set operations
# --------------------------------------------------------------------------
@query(
    "set_union",
    oracle=(
        "SELECT c_nationkey AS nationkey FROM customer "
        "UNION SELECT s_nationkey FROM supplier"
    ),
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of nation-key sets. Spark's union is bag semantics;
    the trailing distinct makes it SQL UNION, planned as union + one hash
    aggregate."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "set_except",
    oracle=(
        "SELECT c_nationkey AS nationkey FROM customer "
        "EXCEPT SELECT s_nationkey FROM supplier"
    ),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set semantics) — nations with customers but no suppliers.
    ``subtract`` is SQL EXCEPT DISTINCT (bag-semantics ``exceptAll`` would
    leave surplus duplicates of keys present on both sides)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@query(
    "set_intersect",
    oracle=(
        "SELECT c_nationkey AS nationkey FROM customer "
        "INTERSECT SELECT s_nationkey FROM supplier"
    ),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set semantics) — nations with both customers and suppliers."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


# --------------------------------------------------------------------------
# scalar function battery + JSON
# --------------------------------------------------------------------------
@query(
    "scalar_funcs",
    oracle=(
        "SELECT p_partkey, "
        "upper(p_brand) AS brand_upper, "
        "substring(p_name, 1, 8) AS name_prefix, "
        "length(p_name) AS name_len, "
        "concat_ws('|', p_brand, p_type) AS brand_type, "
        "p_retailprice * 1.1 AS price_with_tax, "
        "abs(p_size - 25) AS size_dev, "
        "CAST(floor(p_retailprice) AS BIGINT) % 7 AS price_mod "
        "FROM part"
    ),
)
def scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/math scalar battery — all JVM-side builtins inside one
    whole-stage-codegen projection; zero Python in the row path."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        # no per-row round(): Spark HALF_UP on shortest-repr vs DuckDB binary
        # rounding disagree at half boundaries; raw IEEE product is exact.
        (F.col("p_retailprice") * 1.1).alias("price_with_tax"),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        # floor() first: Spark casts double→bigint by truncation, DuckDB by
        # rounding — floor makes the value integral so both casts agree.
        (F.floor(F.col("p_retailprice")).cast("bigint") % 7).alias("price_mod"),
    )


@query(
    "date_funcs",
    oracle=(
        "SELECT o_orderkey, "
        "year(o_orderdate) AS order_year, "
        "month(o_orderdate) AS order_month, "
        "day(o_orderdate) AS order_day, "
        "quarter(o_orderdate) AS order_quarter, "
        "CAST(strftime(o_orderdate, '%Y-%m-%d') AS VARCHAR) AS order_date_str "
        "FROM orders"
    ),
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp part-extraction battery (container/session tz = UTC)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
    )


@query(
    "json_extract",
    oracle=(
        "SELECT event_id, event_type, "
        "CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k "
        "FROM events"
    ),
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the events.props JSON payload. ``get_json_object`` runs JVM-side
    (Jackson) — no Python; at scale prefer ``from_json`` with an explicit
    schema once the payload shape is fixed, enabling pushdown-friendly
    struct columns."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
    )

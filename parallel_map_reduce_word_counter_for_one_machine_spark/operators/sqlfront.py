"""SQL front-end surface: whole queries expressed through ``spark.sql``.

The reference has no query language at all — its single query is
compiled-in (SURVEY.md §2b; only runtime parameter is the input path,
reference src/main.cpp:78-82). This engine inherits full ANSI SQL from
Spark; these entries exercise it end-to-end (parser → Catalyst → same
physical plans as the DataFrame API) with a TPC-H-shaped showcase.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..sources.tables import register_views


@query(
    "sql_shipping_priority",
    oracle=(
        "SELECT o_orderkey, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, "
        "o_orderdate, o_orderpriority "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "WHERE c_mktsegment = 'BUILDING' "
        "GROUP BY o_orderkey, o_orderdate, o_orderpriority "
        "ORDER BY revenue DESC, o_orderkey LIMIT 20"
    ),
)
def sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped query written entirely in SQL: 3-way join, filtered
    dim, grouped revenue, ordered top-20 (TakeOrderedAndProject after the
    agg). The rank-free LIMIT result is made deterministic by the explicit
    (revenue DESC, o_orderkey) total order; revenue is an aggregate so the
    rounded-aggregate policy applies. o_orderdate is TIMESTAMP_NTZ (the
    parquet writer didn't mark UTC adjustment), so it is returned raw and
    compares as a naive timestamp on both engines (unix_millis would
    reject the NTZ type)."""
    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT o_orderkey, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, "
        "o_orderdate, o_orderpriority "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "WHERE c_mktsegment = 'BUILDING' "
        "GROUP BY o_orderkey, o_orderdate, o_orderpriority "
        "ORDER BY revenue DESC, o_orderkey LIMIT 20"
    )


@query(
    "sql_word_count",
    oracle=(
        "SELECT word, count(*) AS cnt FROM ("
        "SELECT unnest(string_split(text, ' ')) AS word FROM documents"
        ") tok WHERE word <> '' GROUP BY word"
    ),
)
def sql_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship expressed in pure SQL — parser-to-plan parity with the
    DataFrame version (identical physical plan, asserted in tests)."""
    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT word, count(*) AS cnt FROM ("
        "SELECT explode(split(text, ' ')) AS word FROM documents"
        ") tok WHERE word <> '' GROUP BY word"
    )


_Q5_SQL = (
    "SELECT n_name, "
    "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue "
    "FROM customer JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON l_orderkey = o_orderkey "
    "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
    "JOIN nation ON s_nationkey = n_nationkey "
    "JOIN region ON n_regionkey = r_regionkey "
    "WHERE r_name = 'ASIA' AND year(o_orderdate) = 1997 "
    "GROUP BY n_name"
)


@query("sql_local_supplier_volume", oracle=_Q5_SQL)
def sql_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped: a 6-way join (two broadcast-able dims, a
    customer=supplier nation equi-condition that is NOT a key join) ending
    in a small grouped aggregate — the classic Catalyst join-reordering
    showcase. The SQL text is identical on both engines (`year()` is the
    portable NTZ-safe date filter); revenue follows the rounded-aggregate
    policy."""
    register_views(spark, sf_dir)
    return spark.sql(_Q5_SQL)


_Q1_SQL = (
    "SELECT l_returnflag, l_linestatus, "
    "round(sum(l_quantity), 2) AS sum_qty, "
    "round(sum(l_extendedprice), 2) AS sum_base_price, "
    "round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
    "round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) "
    "AS sum_charge, "
    "CAST(count(*) AS BIGINT) AS count_order "
    "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
    "GROUP BY l_returnflag, l_linestatus"
)


@query("sql_pricing_summary", oracle=_Q1_SQL)
def sql_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary in pure SQL: the canonical
    scan-heavy single-pass aggregate (filter pushed to the scan, partial +
    final HashAggregate, group cardinality 6). Averages are omitted in
    favor of sums+count (the avg is derivable and raw aggregate doubles
    round engine-differently); every money aggregate follows the
    rounded-aggregate policy. Identical SQL text runs on both engines."""
    register_views(spark, sf_dir)
    return spark.sql(_Q1_SQL)


_Q10_SQL = (
    "SELECT c_custkey, c_name, "
    "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, "
    "n_name "
    "FROM customer JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON l_orderkey = o_orderkey "
    "JOIN nation ON c_nationkey = n_nationkey "
    "WHERE l_returnflag = 'R' AND year(o_orderdate) = 1996 "
    "GROUP BY c_custkey, c_name, n_name "
    "ORDER BY revenue DESC, c_custkey LIMIT 20"
)


@query("sql_returned_items", oracle=_Q10_SQL)
def sql_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-shaped returned-item report: fact-fact join (orders ×
    lineitem, both shuffled on the key) with two broadcast dims, grouped
    revenue per customer, deterministic top-20 via the explicit
    (revenue DESC, c_custkey) total order — TakeOrderedAndProject after
    the agg, never a full sort."""
    register_views(spark, sf_dir)
    return spark.sql(_Q10_SQL)


# TPC-H Q18 shape (large-volume customer): an IN-subquery with a HAVING
# aggregate gate, rewritten by Catalyst into a semi join against the
# grouped lineitem — the classic "aggregate filter feeding a join" plan.
# Threshold 250 is scaled to the synthetic data (TPC-H uses 300 at sf1;
# per-order sum(l_quantity) here tops out at ~458). total_qty sums
# integral doubles, so it is order-insensitive-exact and needs no
# rounding; the explicit (o_totalprice DESC, o_orderkey) total order makes
# the LIMIT deterministic.
_Q18_SQL = (
    "SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, "
    "sum(l_quantity) AS total_qty "
    "FROM customer JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON o_orderkey = l_orderkey "
    "WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem "
    "GROUP BY l_orderkey HAVING sum(l_quantity) > 250) "
    "GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice "
    "ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"
)


@query("sql_large_orders", oracle=_Q18_SQL)
def sql_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-shaped query, identical SQL text on both engines: the
    HAVING-gated IN subquery becomes a LeftSemi join on l_orderkey (plan
    asserted in tests), the fact joins shuffle on their natural keys, and
    the final top-100 is a TakeOrderedAndProject — no global sort of the
    grouped result."""
    register_views(spark, sf_dir)
    return spark.sql(_Q18_SQL)


# Identical SQL text on both engines: a correlated LATERAL subquery with
# ORDER BY + LIMIT — per-customer top-2 orders without a window function.
# Catalyst decorrelates it into a ranked join (same physical family as
# window_rank); engines that can't decorrelate would nested-loop it, so
# this is also a planner-capability probe.
_LATERAL_SQL = (
    "SELECT c.c_custkey, o.o_orderkey, o.o_totalprice "
    "FROM customer c, LATERAL ("
    "SELECT o_orderkey, o_totalprice FROM orders "
    "WHERE o_custkey = c.c_custkey "
    "ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o"
)


@query("sql_lateral_topn", oracle=_LATERAL_SQL)
def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL top-N (SQL:2016 lateral derived table), the
    'greatest-n-per-group' idiom in its join-shaped form. Customers with
    no orders vanish (inner lateral) on both engines; the explicit
    (price DESC, orderkey) total order makes the per-group LIMIT
    deterministic."""
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


@query(
    "agg_listagg",
    oracle=(
        # DuckDB spells ordered string aggregation string_agg(... ORDER
        # BY); Spark 4 spells it listagg(...) WITHIN GROUP — same result.
        "SELECT c_nationkey, "
        "string_agg(c_mktsegment, ',' ORDER BY c_custkey) AS segments, "
        "CAST(count(*) AS BIGINT) AS n_customers "
        "FROM customer GROUP BY c_nationkey"
    ),
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (SQL:2016 LISTAGG, new in Spark 4) —
    the report-friendly collect: per-nation market segments concatenated
    in a deterministic (c_custkey) order so the string hashes identically
    across engines and shuffles."""
    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT c_nationkey, "
        "listagg(c_mktsegment, ',') WITHIN GROUP (ORDER BY c_custkey) "
        "AS segments, "
        "CAST(count(*) AS BIGINT) AS n_customers "
        "FROM customer GROUP BY c_nationkey"
    )


# ---------------------------------------------------------------------------
# Recursive CTEs (SQL:1999 WITH RECURSIVE, shipped in Spark 4 — SPARK-24497).
#
# Spark 4.1's recursion is UNION ALL-only with a single recursive reference
# and no aggregation over the recursive relation (error classes
# UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE / INVALID_RECURSIVE_REFERENCE.PLACE,
# pinned by tests/test_sql_connectors.py). That rules out fixpoint closures
# over CYCLIC graphs — a distinct-union walk (the DuckDB _CC_ORACLE shape in
# graphdedup.py) cannot be expressed, and an ALL-walk diverges on cycles; a
# path-guarded walk enumerates simple paths, which is exponential in clique
# size (the sf0.01 dup graph has a 342-node component). Connected components
# therefore stays with the iterative DataFrame closure / large-star small-star
# (graphdedup.py). These keys exercise recursion where it is the RIGHT tool:
# ACYCLIC successor structures, where UNION ALL recursion terminates at the
# chain depth. Physically each recursion step materializes as a UnionLoop
# over the previous step's rows (depth capped by
# spark.sql.cteRecursionLevelLimit, default 100) — see PLANS.md.
# ---------------------------------------------------------------------------

_SPINE_SQL_SPARK = """
WITH RECURSIVE bounds AS (
  SELECT date_trunc('month', min(o_orderdate)) AS lo,
         date_trunc('month', max(o_orderdate)) AS hi FROM orders
),
months(m, hi) AS (
  SELECT lo, hi FROM bounds
  UNION ALL
  SELECT m + INTERVAL '1' MONTH, hi FROM months WHERE m < hi
),
rev AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT date_format(months.m, 'yyyy-MM') AS month,
       coalesce(rev.revenue, 0.0) AS revenue,
       coalesce(rev.n_orders, 0) AS n_orders
FROM months LEFT JOIN rev ON months.m = rev.m
"""


@query(
    "sql_recursive_spine",
    oracle=_SPINE_SQL_SPARK.replace("INTERVAL '1' MONTH", "INTERVAL 1 MONTH")
    .replace("date_format(months.m, 'yyyy-MM')", "strftime(months.m, '%Y-%m')"),
)
def sql_recursive_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine gap fill via recursive CTE: generate every month
    between min and max order date (anchor = bounds row, recursive step =
    +1 month while m < hi — the bound rides along the recursion so the
    recursive member needs no subquery), then left-join monthly revenue so
    silent zero-activity months appear as explicit 0 rows. The classic
    reporting-spine pattern; recursion depth = month span (80 at sf0.01),
    far under the level limit. DuckDB oracle is the same query modulo
    dialect spelling (INTERVAL literal, strftime)."""
    register_views(spark, sf_dir)
    return spark.sql(_SPINE_SQL_SPARK)


_CHAIN_EDGES_MAT_SQL = """
WITH ordered AS (
  SELECT user_id, event_id, ts,
         lead(event_id) OVER w AS next_id,
         lead(ts) OVER w AS next_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id AS src, next_id AS dst FROM ordered
WHERE next_id IS NOT NULL AND next_ts <= ts + INTERVAL '30' MINUTE
"""

_CHAINS_WALK_SQL = """
WITH RECURSIVE heads AS (
  SELECT e.event_id FROM events e
  LEFT JOIN t_chain_edges_mat x ON x.dst = e.event_id
  WHERE x.dst IS NULL
),
chain(event_id, head_id, depth) AS (
  SELECT event_id, event_id, 1 FROM heads
  UNION ALL
  SELECT e.dst, c.head_id, c.depth + 1
  FROM chain c JOIN t_chain_edges_mat e ON e.src = c.event_id
)
SELECT event_id, head_id, CAST(depth AS BIGINT) AS depth FROM chain
"""

# Single-statement spelling for the DuckDB oracle (DuckDB CTEs are
# materialized by default, so one statement is fine THERE).
_CHAINS_SQL_DUCKDB = """
WITH RECURSIVE ordered AS (
  SELECT user_id, event_id, ts,
         lead(event_id) OVER w AS next_id,
         lead(ts) OVER w AS next_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
edges AS (
  SELECT event_id AS src, next_id AS dst FROM ordered
  WHERE next_id IS NOT NULL AND next_ts <= ts + INTERVAL 30 MINUTE
),
heads AS (
  SELECT o.event_id FROM ordered o LEFT JOIN edges ON edges.dst = o.event_id
  WHERE edges.dst IS NULL
),
chain(event_id, head_id, depth) AS (
  SELECT event_id, event_id, 1 FROM heads
  UNION ALL
  SELECT e.dst, c.head_id, c.depth + 1
  FROM chain c JOIN edges e ON e.src = c.event_id
)
SELECT event_id, head_id, CAST(depth AS BIGINT) AS depth FROM chain
"""


@query("sql_recursive_chains", oracle=_CHAINS_SQL_DUCKDB)
def sql_recursive_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive sessionization: per-user next-event edges (gap ≤ 30 min
    under the (ts, event_id) total order — each event has ≤ 1 incoming
    edge, so the successor graph is a forest of chains, i.e. ACYCLIC and
    UNION ALL recursion terminates at max chain depth), heads = events
    with no incoming edge, then the recursion walks each chain labeling
    every event with its session head and 1-based depth. Every event
    appears exactly once (head or unique successor), so rows = |events|.

    TWO STATEMENTS on the Spark side, on purpose: Spark INLINES
    non-recursive CTEs into the UnionLoop step, so a single-statement
    spelling re-runs the corpus window EVERY recursion step (verified in
    the executed plan — one Window operator per loop reference). The
    production shape materializes the edge table ONCE (localCheckpoint →
    temp view) and the recursion walks the materialized table: depth D
    costs D scans of |edges|, not D re-windows of the corpus. DuckDB
    materializes CTEs by default, so its oracle stays one statement.

    The window-function ``sessionize`` key computes the same grouping
    one-shot; this is the recursion-native spelling, useful when the step
    relation is richer than a time gap (e.g. referrer chains)."""
    register_views(spark, sf_dir)
    edges = spark.sql(_CHAIN_EDGES_MAT_SQL).localCheckpoint()
    edges.createOrReplaceTempView("t_chain_edges_mat")
    return spark.sql(_CHAINS_WALK_SQL)


_SCRIPT_GATE_SQL = """
BEGIN
  DECLARE n_docs BIGINT;
  DECLARE avg_chars DOUBLE;
  SET n_docs = (SELECT count(*) FROM documents);
  SET avg_chars = (SELECT round(avg(n_chars), 2) FROM documents);
  IF n_docs >= 100 AND avg_chars > 50 THEN
    SELECT n_docs AS n_docs, avg_chars AS avg_chars, 'pass' AS gate;
  ELSE
    SELECT n_docs AS n_docs, avg_chars AS avg_chars, 'fail' AS gate;
  END IF;
END
"""


@query(
    "sql_script_gate",
    oracle=(
        "SELECT n_docs, avg_chars, CASE WHEN n_docs >= 100 AND "
        "avg_chars > 50 THEN 'pass' ELSE 'fail' END AS gate FROM ("
        "SELECT CAST(count(*) AS BIGINT) AS n_docs, "
        "round(avg(n_chars), 2) AS avg_chars FROM documents)"
    ),
)
def sql_script_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (SQL/PSM compound statements, shipped in Spark 4:
    BEGIN/END blocks, DECLARE'd session-local variables, IF/ELSE control
    flow) driving a data-quality gate: compute corpus stats into
    variables, branch on thresholds, return the verdict row — the
    stored-procedure-style orchestration warehouses script inline.
    Control flow runs on the DRIVER between statements; each statement is
    still a full distributed query, so nothing here fights the planner.
    DuckDB has no scripting — the oracle is the equivalent single
    declarative query (same relation, CASE instead of IF), which is also
    the honest note: anything a script's IF can decide per-ROW belongs in
    a CASE expression; scripting earns its keep only for multi-STATEMENT
    orchestration (conditional DDL, retry loops, branching pipelines)."""
    register_views(spark, sf_dir)
    return spark.sql(_SCRIPT_GATE_SQL)


@query(
    "sql_pipe_syntax",
    oracle=(
        # standard-SQL twin of the piped query below — DuckDB runs this
        # form; the whole point of the key is that the |> spelling plans
        # and evaluates identically to it
        "SELECT * FROM ("
        "SELECT o_orderstatus, o_orderpriority, "
        "CAST(count(*) AS BIGINT) AS n, "
        "round(sum(o_totalprice), 2) AS total "
        "FROM orders WHERE o_totalprice > 100 "
        "GROUP BY o_orderstatus, o_orderpriority) t WHERE n > 5"
    ),
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's SQL PIPE syntax (`|>`): linear dataflow spelling of
    scan → filter → aggregate → post-filter. Each `|>` stage consumes the
    previous relation, so the query reads in execution order and the
    post-aggregation filter needs no subquery or HAVING — the `AGGREGATE
    ... GROUP BY` stage exposes its outputs to the next `WHERE` directly.
    Catalyst plans it identically to the nested standard form (the DuckDB
    oracle IS that form), so the feature is free at any scale — this key
    pins the dialect, not new semantics."""
    register_views(spark, sf_dir)
    return spark.sql(
        "FROM orders "
        "|> WHERE o_totalprice > 100 "
        "|> AGGREGATE count(*) AS n, round(sum(o_totalprice), 2) AS total "
        "   GROUP BY o_orderstatus, o_orderpriority "
        "|> WHERE n > 5"
    )


# Identical SQL text on both engines: TPC-H-Q19-shaped disjunctive
# predicate — an OR of three (brand, size-range, quantity-range) conjunct
# groups spanning BOTH join sides. The planner probe: the common
# p_partkey = l_partkey conjunct must still drive a hash join (not a
# nested loop over the disjunction), per-side prunable conjuncts
# (p_brand IN (...), the size/quantity envelopes) should be extracted
# below the join, and the residual disjunction evaluates post-join in
# codegen.
_Q19_SQL = (
    "SELECT p_brand, round(sum(l_extendedprice * (1 - l_discount)), 2) "
    "AS revenue, count(*) AS n_items "
    "FROM lineitem JOIN part ON p_partkey = l_partkey "
    "WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 "
    "AND l_quantity BETWEEN 1 AND 20) "
    "OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 25 "
    "AND l_quantity BETWEEN 10 AND 40) "
    "OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40 "
    "AND l_quantity BETWEEN 20 AND 50) "
    "GROUP BY p_brand"
)


@query("sql_disjunctive_revenue", oracle=_Q19_SQL)
def sql_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-shaped disjunctive-predicate revenue query (identical SQL
    text on both engines). Q19 is the classic test that a planner keeps
    the equi-join conjunct out of the OR (hash join, not a nested loop)
    and pushes the per-side implied filters (brand membership, size and
    quantity envelopes) below the join while the residual disjunction
    stays a codegen filter above it."""
    register_views(spark, sf_dir)
    return spark.sql(_Q19_SQL)

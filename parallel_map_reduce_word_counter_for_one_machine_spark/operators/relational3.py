"""Relational batch 3: filtered aggregates, RANGE window frames, and the
array-function battery (extension surface — the reference has no
aggregates beyond count/sum, no windows, and no array type at all;
SURVEY.md §2b, reference src/main.cpp:78-281).

All JVM-side expressions; the float policy follows the repo rule
(aggregate doubles rounded on both engines, per-row arithmetic unrounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load_table


@query(
    "agg_filtered",
    oracle=(
        "SELECT l_returnflag, count(*) AS n_all, "
        "count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted, "
        "round(sum(l_extendedprice) FILTER (WHERE l_quantity >= 25), 2) "
        "  AS rev_bulk, "
        "round(avg(l_tax) FILTER (WHERE l_returnflag <> 'A'), 4) AS avg_tax_nr "
        "FROM lineitem GROUP BY l_returnflag"
    ),
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause aggregates: several differently-filtered measures in
    ONE partial+final hash-agg pass over the fact — the scalable form of
    what would otherwise be N self-joined sub-aggregations."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("count(*)").alias("n_all"),
        F.expr("count(*) FILTER (WHERE l_discount > 0.05)").alias("n_discounted"),
        F.expr(
            "round(sum(l_extendedprice) FILTER (WHERE l_quantity >= 25), 2)"
        ).alias("rev_bulk"),
        F.expr("round(avg(l_tax) FILTER (WHERE l_returnflag <> 'A'), 4)").alias(
            "avg_tax_nr"
        ),
    )


@query(
    "window_range_frame",
    oracle=(
        "SELECT o_orderkey, o_custkey, "
        "round(sum(o_totalprice) OVER (PARTITION BY o_custkey "
        "ORDER BY datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) "
        "RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS spend_30d "
        "FROM orders"
    ),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 30-day customer spend via a RANGE frame over epoch days —
    value-based frames are well-defined under ties (every tie shares one
    frame), so the result is deterministic without a unique sort key. One
    exchange on o_custkey; the frame is evaluated with a sliding
    accumulator per partition, not a rescan per row."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01"))
    frame = (
        Window.partitionBy("o_custkey")
        .orderBy(days.alias("d"))
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(frame), 2).alias("spend_30d"),
    )


@query(
    "array_funcs",
    oracle=(
        "WITH t AS (SELECT doc_id, "
        "list_filter(string_split(text, ' '), w -> w <> '') AS toks "
        "FROM documents) "
        "SELECT doc_id, "
        "array_to_string(list_sort(toks)[1:3], ',') AS first3_sorted, "
        "list_contains(toks, 'the') AS has_the, "
        "CAST(coalesce(list_position(toks, 'spark'), 0) AS BIGINT) "
        "  AS spark_pos, "
        "array_to_string(list_reverse(toks[1:2]), ' ') AS head_rev "
        "FROM t"
    ),
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function battery (sort/slice/join/contains/position/reverse)
    — all inside whole-stage codegen; the token arrays never leave the
    executor. Binary-collation `array_sort` matches DuckDB `list_sort`."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda word: word != "")
    return d.select(
        "doc_id",
        F.array_join(F.slice(F.array_sort(toks), 1, 3), ",").alias(
            "first3_sorted"
        ),
        F.array_contains(toks, "the").alias("has_the"),
        F.array_position(toks, "spark").alias("spark_pos"),
        F.array_join(F.reverse(F.slice(toks, 1, 2)), " ").alias("head_rev"),
    )


@query(
    "histogram",
    oracle=(
        # floor() BEFORE the int cast on both engines (Spark casts by
        # truncation, DuckDB by rounding — the repo-wide float rule).
        "SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket, "
        "count(*) AS n, round(sum(value), 2) AS total "
        "FROM events GROUP BY 1"
    ),
)
def histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram — a groupBy on a computed bucket key:
    partial+final hash agg, one exchange whose cardinality is the bucket
    count, not the row count."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.floor(F.col("value") / 50.0).cast("bigint").alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
    )


@query(
    "percentiles_approx",
    oracle=(
        # Tolerance-checked oracle (round-2 upgrade from rows-only): the GK
        # sketch's outputs are engine-specific, but its rank-error contract
        # (≤ n/accuracy) is checkable — the Spark side evaluates each approx
        # quantile against the EXACT interpolated quantiles at p ± 0.005
        # (≥ 50× the configured accuracy=10000 guarantee) and emits the
        # verdicts; the oracle pins group counts and all-TRUE verdicts.
        "SELECT event_type, count(*) AS n, TRUE AS p50_ok, TRUE AS p90_ok, "
        "TRUE AS p99_ok FROM events GROUP BY event_type"
    ),
)
def percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch (`percentile_approx`, GK-style): each
    partition builds a bounded-size summary, merged at the driver side of
    the agg — ONE pass, no global sort, state O(accuracy) per group. The
    scale path for percentiles; the exact `percentiles` query is its
    oracle-checked counterpart. The in-query bound check computes exact
    quantiles alongside the sketch — affordable at oracle scale, and
    exactly the production acceptance test one runs on a sample."""
    e = load_table(spark, sf_dir, "events")
    eps = 0.005
    aggs = [F.count("*").alias("n")]
    for p, nm in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]:
        approx = F.percentile_approx("value", p, 10000)
        lo = F.percentile("value", max(p - eps, 0.0))
        hi = F.percentile("value", min(p + eps, 1.0))
        aggs.append(((approx >= lo) & (approx <= hi)).alias(f"{nm}_ok"))
    return e.groupBy("event_type").agg(*aggs).select(
        "event_type", "n", "p50_ok", "p90_ok", "p99_ok"
    )


@query(
    "hof_funcs",
    oracle=(
        "WITH t AS (SELECT doc_id, "
        "list_filter(string_split(text, ' '), w -> w <> '') AS toks "
        "FROM documents) "
        "SELECT doc_id, "
        "len(list_filter(toks, w -> length(w) > 6)) > 0 AS any_long, "
        "len(list_filter(toks, w -> length(w) >= 20)) = 0 AS all_short, "
        "CAST(coalesce(list_sum(list_transform(toks, w -> length(w))), 0) "
        "AS BIGINT) AS total_len "
        "FROM t"
    ),
)
def hof_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order-function battery (exists / forall / transform +
    aggregate) — per-row array lambdas inside whole-stage codegen, zero
    shuffles. The DuckDB twins are list_filter/list_transform/list_sum
    compositions computing identical values."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    return d.select(
        "doc_id",
        F.exists(toks, lambda w: F.length(w) > 6).alias("any_long"),
        F.forall(toks, lambda w: F.length(w) < 20).alias("all_short"),
        F.aggregate(
            F.transform(toks, lambda w: F.length(w).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("total_len"),
    )


@query(
    "unpivot_measures",
    oracle=(
        # Portable long-form twin: UNION ALL of one SELECT per measure —
        # exactly what unpivot lowers to (Spark plans it as Expand).
        "SELECT l_orderkey, l_linenumber, 'quantity' AS measure, "
        "l_quantity AS val FROM lineitem "
        "UNION ALL SELECT l_orderkey, l_linenumber, 'price', l_extendedprice "
        "FROM lineitem "
        "UNION ALL SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem"
    ),
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (`unpivot`/melt, the inverse of `pivot_status`).
    Plans as a single Expand over one scan — three output rows per input
    row WITHOUT three scans or a shuffle; values are carried verbatim
    (no float math), so the oracle matches bit-exactly."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_tax"],
        "measure",
        "val",
    ).withColumn(
        "measure",
        F.when(F.col("measure") == "l_quantity", "quantity")
        .when(F.col("measure") == "l_extendedprice", "price")
        .otherwise("tax"),
    )


@query(
    "agg_corr",
    oracle=(
        "SELECT l_returnflag, "
        "round(corr(l_quantity, l_extendedprice), 4) + 0.0 AS corr_qty_price, "
        "round(covar_samp(l_quantity, l_extendedprice), 2) + 0.0 AS covar_qty_price, "
        "round(stddev_samp(l_quantity), 4) AS sd_qty, "
        "round(var_samp(l_discount), 6) AS var_disc "
        "FROM lineitem GROUP BY l_returnflag"
    ),
)
def agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistical aggregates (correlation, sample covariance)
    plus stddev/variance — the co-moment family a stats-capable warehouse
    must answer, still one partial+final pass (each aggregate keeps a
    constant-size co-moment state, so the shuffle carries one state tuple
    per group per task). Aggregate doubles → rounded on both engines
    (summation/co-moment update order differs)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        # + 0.0 folds IEEE -0.0 to +0.0 (near-zero co-moments can round
        # to signed zero differently per engine — see embedding_centroids)
        (F.round(F.corr("l_quantity", "l_extendedprice"), 4) + 0.0).alias("corr_qty_price"),
        (F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2) + 0.0).alias(
            "covar_qty_price"
        ),
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
    )


@query(
    "map_funcs",
    oracle=(
        # The oracle reproduces the same VALUES without a MAP type: map
        # outputs are reduced to arrays/scalars precisely so the driver's
        # value hash never compares engine-specific map representations.
        "WITH t AS (SELECT doc_id, list_sort(list_distinct(list_filter("
        "string_split(text, ' '), w -> w <> ''))) AS ks FROM documents) "
        "SELECT doc_id, len(ks) AS n_keys, "
        # Stringified: the driver's pandas canonicalizer lexsorts every
        # output column and cannot hash a list — registered keys emit
        # scalars/strings only (ROUND3_NOTES rule; this was the last
        # array-typed registered output, VERDICT r03 item 1).
        "array_to_string(ks[1:3], ',') AS first_keys, "
        # coalesce: list_sum is NULL on an empty list, while the Spark
        # side's aggregate fold starts at 0 — the empty-doc divergence
        # pattern already handled in hof_funcs below.
        "CAST(coalesce(list_sum(list_transform(ks, k -> len(k))), 0) AS BIGINT) "
        "  AS total_key_len, "
        "len(list_filter(ks, k -> len(k) >= 5)) AS n_long_keys "
        "FROM t"
    ),
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-type function battery: build a token→length map per document
    (``map_from_arrays``), then exercise ``map_keys``, ``map_values``,
    ``transform_values``/``map_filter`` — reduced to array/scalar outputs
    (key count, first keys, total value sum, filtered-entry count) so the
    cross-engine comparison never depends on map ordering or
    representation. All per-row JVM expressions, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    ks = F.array_sort(
        F.array_distinct(F.filter(F.split("text", " "), lambda w: w != ""))
    )
    m = F.map_from_arrays(ks, F.transform(ks, F.length))
    long_only = F.map_filter(m, lambda k, v: v >= 5)
    return d.select(
        "doc_id",
        F.size(m).alias("n_keys"),
        F.concat_ws(",", F.slice(F.array_sort(F.map_keys(m)), 1, 3)).alias(
            "first_keys"
        ),
        F.aggregate(
            F.map_values(m), F.lit(0).cast("long"), lambda acc, v: acc + v
        ).alias("total_key_len"),
        F.size(long_only).alias("n_long_keys"),
    )


@query(
    "merge_upsert",
    oracle=(
        # Prices ride as integer CENTS end-to-end: round(x*1.05, 2) sits on
        # the .xx5 half-rounding boundary for ~0.1% of rows (HALF_UP vs
        # half-even — 11 mismatches at sf0.01), while cents + cents//20 is
        # exact integer math on both engines.
        "WITH target AS (SELECT o_orderkey, "
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders "
        "WHERE o_orderkey % 3 <> 0), "
        "source AS (SELECT o_orderkey, "
        "CAST(round(o_totalprice * 100) AS BIGINT) AS c0 FROM orders "
        "WHERE o_orderkey % 2 = 0), "
        "s2 AS (SELECT o_orderkey, c0 + c0 // 20 AS new_cents FROM source) "
        "SELECT coalesce(t.o_orderkey, s2.o_orderkey) AS o_orderkey, "
        "coalesce(s2.new_cents, t.cents) AS price_cents, "
        "CASE WHEN t.o_orderkey IS NULL THEN 'insert' "
        "WHEN s2.o_orderkey IS NULL THEN 'keep' ELSE 'update' END AS action "
        "FROM target t FULL OUTER JOIN s2 ON t.o_orderkey = s2.o_orderkey"
    ),
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (upsert) expressed as one full-outer join —
    matched rows take the source value ('update'), source-only keys become
    'insert', target-only rows pass through ('keep'). This is exactly the
    join Delta/Iceberg MERGE plans under the hood; with the target bucketed
    by key the join is shuffle-free on the standing side, and the action
    column is what an audit/CDC sink consumes. Split here: target = keys
    % 3 ≠ 0, source = keys % 2 = 0 with a +5% reprice (both slices
    deterministic over the shared orders table). Prices are carried as
    integer cents — the reprice in doubles lands on half-rounding
    boundaries (see oracle comment)."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    target = o.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", cents.alias("cents")
    )
    source = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        (cents + F.floor(cents / 20).cast("long")).alias("new_cents"),
    )
    t, s = target.alias("t"), source.alias("s")
    action = (
        F.when(F.col("t.o_orderkey").isNull(), F.lit("insert"))
        .when(F.col("s.o_orderkey").isNull(), F.lit("keep"))
        .otherwise(F.lit("update"))
    )
    return t.join(s, F.col("t.o_orderkey") == F.col("s.o_orderkey"), "full_outer").select(
        F.coalesce("t.o_orderkey", "s.o_orderkey").alias("o_orderkey"),
        F.coalesce("s.new_cents", "t.cents").alias("price_cents"),
        action.alias("action"),
    )


@query(
    "json_variant",
    oracle=(
        "SELECT event_id, "
        "CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_long, "
        "json_extract_string(props, '$.k') AS k_str, "
        "(json_extract_string(props, '$.missing') IS NOT NULL) AS has_missing "
        "FROM events"
    ),
)
def json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type:
    ``parse_json`` ingests the payload once into the binary variant
    encoding and ``variant_get`` extracts typed paths from it — the
    open-table-format answer to schema-on-read JSON columns (Parquet can
    store the variant natively, so repeated extraction never re-parses
    text the way ``get_json_object`` does). Typed long and string
    extractions plus a missing-path probe, all scalars; the DuckDB oracle
    reads the same paths with its JSON functions."""
    e = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "long").alias("k_long"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        F.variant_get(v, "$.missing", "string").isNotNull().alias("has_missing"),
    )


@query(
    "scalar_try_funcs",
    oracle=(
        # DuckDB has TRY_CAST but no try_divide/try_mod — the NULL-on-error
        # semantics are spelled as explicit zero guards instead.
        "SELECT l_orderkey, l_linenumber, "
        "CASE WHEN l_linenumber - 1 = 0 THEN NULL "
        "ELSE l_extendedprice / (l_linenumber - 1) END AS safe_ratio, "
        "CASE WHEN l_linenumber - 1 = 0 THEN NULL "
        "ELSE l_orderkey % (l_linenumber - 1) END AS safe_mod, "
        "TRY_CAST(CASE WHEN l_quantity > 25 THEN '12' ELSE 'abc' END "
        "AS INTEGER) AS parsed "
        "FROM lineitem"
    ),
)
def scalar_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI-mode error-safe scalar family (``try_divide``/``try_mod``/
    ``try_cast``): Spark 4 runs ANSI by default, so a divide-by-zero or a
    bad cast in a 100 TB scan ABORTS THE JOB unless the expression opts
    into NULL-on-error — these are the opt-ins, exercised data-dependently
    (the divisor hits zero on every first lineitem, the cast parses on
    high-quantity rows only). The rest of this repo uses the same guard in
    ``when(...)`` form; this key pins the dedicated functions."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(F.col("l_extendedprice"), F.col("l_linenumber") - 1).alias(
            "safe_ratio"
        ),
        F.expr("try_mod(l_orderkey, l_linenumber - 1)").alias("safe_mod"),
        F.expr(
            "try_cast(CASE WHEN l_quantity > 25 THEN '12' ELSE 'abc' END "
            "AS INT)"
        ).alias("parsed"),
    )


@query(
    "regr_funcs",
    oracle=(
        "SELECT l_returnflag, "
        "CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n, "
        "round(regr_slope(l_extendedprice, l_quantity), 4) + 0.0 AS slope, "
        "round(regr_intercept(l_extendedprice, l_quantity), 2) + 0.0 "
        "AS intercept, "
        "round(regr_r2(l_extendedprice, l_quantity), 6) + 0.0 AS r2, "
        "round(regr_avgx(l_extendedprice, l_quantity), 4) AS avg_qty "
        "FROM lineitem GROUP BY l_returnflag"
    ),
)
def regr_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2003 linear-regression aggregate family (regr_slope /
    intercept / r2 / count / avgx — price regressed on quantity per
    return flag): same constant-size co-moment state per group as
    ``agg_corr``, one partial+final pass, shuffle carries one state tuple
    per (group, task). The rounded-aggregate + ``+ 0.0`` signed-zero
    policy applies (co-moment update order differs per engine). These are
    the in-warehouse fit the quality-scoring pipelines use before
    reaching for a UDF — a slope/R² per stratum answers 'is length
    predictive of score in THIS slice' without leaving the JVM."""
    li = load_table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).alias("n"),
        (F.round(F.regr_slope(y, x), 4) + 0.0).alias("slope"),
        (F.round(F.regr_intercept(y, x), 2) + 0.0).alias("intercept"),
        (F.round(F.regr_r2(y, x), 6) + 0.0).alias("r2"),
        F.round(F.regr_avgx(y, x), 4).alias("avg_qty"),
    )


@query(
    "sql_exists_correlated",
    oracle=(
        "SELECT c_custkey, c_name FROM customer c WHERE EXISTS ("
        "SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
        "AND o.o_totalprice > 300000) AND NOT EXISTS ("
        "SELECT 1 FROM orders o2 WHERE o2.o_custkey = c.c_custkey "
        "AND o2.o_orderstatus = 'F' AND o2.o_totalprice < 1000)"
    ),
)
def sql_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS — the remaining subquery rewrite
    path next to `subquery_in`'s semi-join: Catalyst lowers EXISTS to a
    LeftSemi and NOT EXISTS to a LeftAnti on the correlation key, so both
    plan as key-partitioned joins (no per-row subquery execution, which is
    what a naive reading of correlated subqueries implies and what a
    100 TB plan must never do)."""
    from ..sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT c_custkey, c_name FROM customer c WHERE EXISTS ("
        "SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
        "AND o.o_totalprice > 300000) AND NOT EXISTS ("
        "SELECT 1 FROM orders o2 WHERE o2.o_custkey = c.c_custkey "
        "AND o2.o_orderstatus = 'F' AND o2.o_totalprice < 1000)"
    )

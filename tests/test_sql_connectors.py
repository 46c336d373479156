from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parallel_map_reduce_word_counter_for_one_machine_spark import registry
from parallel_map_reduce_word_counter_for_one_machine_spark.plans.inspect import (
    plan_string,
)
from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
    SCHEMAS,
    load_table,
)

from .oracle import assert_matches_oracle

registry.load_all()


@pytest.mark.parametrize(
    "name",
    [
        "sql_shipping_priority",
        "sql_word_count",
        "sql_pricing_summary",
        "sql_returned_items",
    ],
)
def test_oracle_match(spark, sf_correct, name):
    assert_matches_oracle(
        spark, sf_correct, name, registry.QUERIES[name], registry.ORACLES[name]
    )


def test_sql_and_dataframe_word_count_same_plan(spark, sf_correct):
    """Parser front end and DataFrame API must converge to the same
    physical plan (modulo expression ids)."""
    import re

    sql_plan = plan_string(
        registry.QUERIES["sql_word_count"](spark, sf_correct), mode="simple"
    )
    df_plan = plan_string(
        registry.QUERIES["word_count"](spark, sf_correct), mode="simple"
    )
    canon = lambda s: re.sub(r"plan_id=\d+", "plan_id=x", re.sub(r"#\d+L?", "#x", s))
    assert canon(sql_plan) == canon(df_plan)


def test_csv_roundtrip(spark, sf_correct, tmp_path):
    """CSV connector (absent from the reference — one ifstream text source,
    SURVEY.md §2b): write documents out as CSV, read back with the declared
    schema, content identical."""
    src = load_table(spark, sf_correct, "documents")
    out = str(tmp_path / "docs_csv")
    src.write.mode("overwrite").option("header", True).csv(out)
    back = (
        spark.read.schema(SCHEMAS["documents"])
        .option("header", True)
        .csv(out)
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_json_roundtrip(spark, sf_correct, tmp_path):
    src = load_table(spark, sf_correct, "embeddings")
    out = str(tmp_path / "emb_json")
    src.write.mode("overwrite").json(out)
    back = spark.read.schema(SCHEMAS["embeddings"]).json(out)
    # float32 values survive json roundtrip exactly (printed as shortest repr)
    a = sorted(map(repr, back.collect()))
    b = sorted(map(repr, src.collect()))
    assert a == b


def test_fact_fact_join_shuffles_when_broadcast_disabled(spark, sf_correct):
    """At 100 TB orders⋈lineitem is a shuffled join; with the broadcast
    threshold off, the planner must pick a shuffle strategy (SortMergeJoin
    or ShuffledHashJoin), proving the plan doesn't secretly depend on
    broadcast-ability."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load_table(spark, sf_correct, "orders")
        li = load_table(spark, sf_correct, "lineitem")
        j = o.join(li, o.o_orderkey == li.l_orderkey).select(
            "o_orderkey", "l_linenumber", "o_totalprice", "l_quantity"
        )
        plan = plan_string(j, mode="simple")
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
        assert "BroadcastHashJoin" not in plan
        # correctness unchanged under the shuffle strategy
        assert j.count() == li.count()  # every lineitem has an order
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_orc_roundtrip(spark, sf_correct, tmp_path):
    """ORC connector (the other columnar format Spark ships natively):
    lineitem out as ORC, read back, content identical — including decimals
    and dates. Also asserts predicate pushdown reaches the ORC scan the
    same way it does for parquet."""
    src = load_table(spark, sf_correct, "lineitem")
    out = str(tmp_path / "li_orc")
    src.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
    plan = plan_string(back.filter(F.col("l_quantity") > 40).select("l_orderkey"))
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity" in plan


def test_orc_aggregate_matches_parquet(spark, sf_correct, tmp_path):
    """The same aggregate over the ORC copy and the parquet original
    produces identical results — format-independence of the engine."""
    src = load_table(spark, sf_correct, "lineitem")
    out = str(tmp_path / "li_orc2")
    src.write.mode("overwrite").orc(out)
    agg = lambda df: sorted(  # noqa: E731
        map(
            tuple,
            df.groupBy("l_returnflag")
            .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
            .collect(),
        )
    )
    assert agg(spark.read.orc(out)) == agg(src)


def test_large_orders_oracle_and_plan(spark, sf_correct):
    """Q18 shape: oracle match, and the HAVING-gated IN subquery must be
    rewritten to a LeftSemi join (no re-aggregation of the subquery per
    outer row) with a TakeOrderedAndProject for the top-100."""
    assert_matches_oracle(
        spark,
        sf_correct,
        "sql_large_orders",
        registry.QUERIES["sql_large_orders"],
        registry.ORACLES["sql_large_orders"],
    )
    plan = plan_string(registry.QUERIES["sql_large_orders"](spark, sf_correct))
    assert "LeftSemi" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_xml_roundtrip(spark, sf_correct, tmp_path):
    """XML connector (built into Spark 4 — formerly spark-xml): nation out
    as row-tagged XML, read back with the declared schema, content
    identical."""
    src = load_table(spark, sf_correct, "nation")
    out = str(tmp_path / "nation_xml")
    src.write.format("xml").option("rootTag", "nations").option(
        "rowTag", "nation"
    ).save(out)
    back = (
        spark.read.schema(SCHEMAS["nation"])
        .format("xml")
        .option("rowTag", "nation")
        .load(out)
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


@pytest.mark.parametrize("name", ["sql_lateral_topn", "agg_listagg"])
def test_sql4_features_oracle(spark, sf_correct, name):
    assert_matches_oracle(
        spark, sf_correct, name, registry.QUERIES[name], registry.ORACLES[name]
    )


def test_lateral_equals_window_formulation(spark, sf_correct):
    """The LATERAL top-2 must equal the row_number() window formulation —
    the two classic spellings of greatest-n-per-group."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    lat = registry.QUERIES["sql_lateral_topn"](spark, sf_correct)
    o = load_table(spark, sf_correct, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    win = (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .select(
            F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice"
        )
    )
    assert sorted(map(tuple, lat.collect())) == sorted(map(tuple, win.collect()))


def test_parameterized_sql_and_session_variables(spark, sf_correct):
    """Spark 4 SQL front-end extras: named/positional parameter binding
    (injection-safe literals) and DECLARE/SET session variables, both
    driving a real query and matching the hand-built equivalent."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        register_views,
    )

    register_views(spark, sf_correct)
    expect = (
        load_table(spark, sf_correct, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .count()
    )
    got_named = spark.sql(
        "SELECT count(*) AS n FROM orders WHERE o_totalprice > :floor",
        args={"floor": 400000},
    ).collect()[0].n
    got_pos = spark.sql(
        "SELECT count(*) AS n FROM orders WHERE o_totalprice > ?",
        args=[400000],
    ).collect()[0].n
    spark.sql("DECLARE OR REPLACE VARIABLE price_floor DOUBLE DEFAULT 0.0")
    spark.sql("SET VARIABLE price_floor = 400000")
    got_var = spark.sql(
        "SELECT count(*) AS n FROM orders WHERE o_totalprice > price_floor"
    ).collect()[0].n
    assert got_named == got_pos == got_var == expect > 0


@pytest.mark.parametrize("name", ["sql_recursive_spine", "sql_recursive_chains"])
def test_recursive_cte_oracle(spark, sf_correct, name):
    """Spark 4 WITH RECURSIVE keys (calendar spine, chain sessionization)
    vs identical-structure DuckDB recursion."""
    assert_matches_oracle(
        spark, sf_correct, name, registry.QUERIES[name], registry.ORACLES[name]
    )


def test_recursive_chains_cover_all_events(spark, sf_correct):
    """Every event lands in exactly one chain (head or unique successor),
    and depth-1 rows are self-headed."""
    out = registry.QUERIES["sql_recursive_chains"](spark, sf_correct)
    n_events = load_table(spark, sf_correct, "events").count()
    assert out.count() == n_events
    assert out.select("event_id").distinct().count() == n_events
    bad = out.filter((F.col("depth") == 1) & (F.col("event_id") != F.col("head_id")))
    assert bad.count() == 0


def test_recursive_cte_union_distinct_unsupported(spark):
    """Pins WHY connected components has no recursive-SQL spelling in this
    engine (sqlfront.py module comment): Spark 4.1 recursion rejects
    distinct UNION, so the DuckDB-style fixpoint walk over a cyclic graph
    is inexpressible (an ALL-walk diverges on cycles; a path-guarded walk
    is exponential in clique size). If a future Spark version lifts this,
    this test fails and dedup_clusters_sql becomes implementable."""
    spark.createDataFrame([(1, 2), (2, 1)], ["src", "dst"]).createOrReplaceTempView(
        "t_cc_edges"
    )
    with pytest.raises(Exception, match="UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE"):
        spark.sql(
            "WITH RECURSIVE walk(node, r) AS ("
            "  SELECT src, src FROM (SELECT DISTINCT src FROM t_cc_edges)"
            "  UNION"
            "  SELECT w.node, e.dst FROM walk w JOIN t_cc_edges e ON e.src = w.r"
            ") SELECT node, min(r) FROM walk GROUP BY node"
        ).collect()


def test_sql_script_gate_oracle_and_branches(spark, sf_correct):
    """The scripted gate: oracle match (pass branch at the 500-doc
    corpus) AND the fail branch actually takes when the documents view
    is substituted with a sub-threshold corpus — both control-flow paths
    execute."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.sqlfront import (
        _SCRIPT_GATE_SQL,
    )

    assert_matches_oracle(
        spark,
        sf_correct,
        "sql_script_gate",
        registry.QUERIES["sql_script_gate"],
        registry.ORACLES["sql_script_gate"],
    )
    big = registry.QUERIES["sql_script_gate"](spark, sf_correct).collect()[0]
    assert big.gate == "pass" and big.n_docs == 500
    # fail branch: 10 docs < the 100-doc threshold
    spark.createDataFrame(
        [(i, 100 + i) for i in range(10)], "doc_id long, n_chars long"
    ).createOrReplaceTempView("documents")
    try:
        small = spark.sql(_SCRIPT_GATE_SQL).collect()[0]
        assert small.gate == "fail" and small.n_docs == 10
    finally:
        spark.catalog.dropTempView("documents")


def test_managed_table_catalog_roundtrip(spark, sf_correct, tmp_path):
    """Catalog/DDL surface: saveAsTable into the session catalog, INSERT
    INTO appends through the catalog, DESCRIBE sees the schema, and the
    managed table answers SQL identically to the path-based source. The
    engine is path-first (TESTDATA parquet), but a user of a SQL engine
    expects CREATE/INSERT/DROP to work."""
    tbl = "t_catalog_nation"
    src = spark.read.parquet(f"{sf_correct}/nation.parquet")
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    src.write.saveAsTable(tbl)
    try:
        assert spark.catalog.tableExists(tbl)
        n0 = spark.sql(f"SELECT count(*) AS n FROM {tbl}").collect()[0].n
        assert n0 == src.count() == 25
        spark.sql(
            f"INSERT INTO {tbl} VALUES (991, 'ATLANTIS', 0), "
            f"(992, 'LEMURIA', 1)"
        )
        n1 = spark.sql(f"SELECT count(*) AS n FROM {tbl}").collect()[0].n
        assert n1 == n0 + 2
        cols = {r.col_name for r in spark.sql(f"DESCRIBE {tbl}").collect()}
        assert {"n_nationkey", "n_name", "n_regionkey"} <= cols
        # catalog table and path source agree on real data
        a = sorted(
            map(tuple, spark.sql(
                f"SELECT * FROM {tbl} WHERE n_nationkey < 900"
            ).collect())
        )
        b = sorted(map(tuple, src.collect()))
        assert a == b
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    assert not spark.catalog.tableExists(tbl)


def test_analyze_table_feeds_cbo_statistics(spark, sf_correct):
    """ANALYZE TABLE → cost-based optimizer inputs: table-level rowCount/
    sizeInBytes land in the catalog and the optimized plan's stats, and
    FOR ALL COLUMNS records per-column min/max/distinct-count. At 100 TB
    these stats are what let the CBO pick join orders and broadcast sides
    without AQE having to discover sizes at runtime (the two are
    complementary: CBO plans from history, AQE corrects live)."""
    tbl = "t_stats_orders"
    src = spark.read.parquet(f"{sf_correct}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    src.write.saveAsTable(tbl)
    saved = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        n = src.count()
        spark.sql(f"ANALYZE TABLE {tbl} COMPUTE STATISTICS FOR ALL COLUMNS")
        # catalog-level stats
        desc = {
            r.col_name: r.data_type
            for r in spark.sql(f"DESCRIBE EXTENDED {tbl}").collect()
        }
        assert "Statistics" in desc, desc
        assert f"{n} rows" in desc["Statistics"], desc["Statistics"]
        # column-level stats (min/max/ndv) recorded
        col = {
            r.info_name: r.info_value
            for r in spark.sql(
                f"DESCRIBE EXTENDED {tbl} o_orderkey"
            ).collect()
        }
        assert col.get("min") not in (None, "NULL")
        assert col.get("max") not in (None, "NULL")
        assert int(col["distinct_count"]) > 0
        # the optimizer actually SEES them: logical-plan stats carry the
        # exact row count (not a size-based guess)
        df = spark.table(tbl)
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        assert stats.rowCount().isDefined()
        assert int(str(stats.rowCount().get())) == n
    finally:
        spark.conf.set("spark.sql.cbo.enabled", saved)
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_alter_table_add_column_default(spark):
    """Catalog-side additive evolution — the DDL twin of the mergeSchema
    read (sources/evolution.py): ALTER TABLE ADD COLUMN ... DEFAULT makes
    pre-evolution rows read the EXISTS-default WITHOUT rewriting their
    files (the catalog stores it; parquet files are untouched), new
    inserts take the default via the DEFAULT keyword, and explicit values
    override. This is how a 100 TB table gains a column in O(1)."""
    tbl = "t_default_evolve"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.range(3).selectExpr("id AS k").write.saveAsTable(tbl)
    try:
        spark.sql(f"ALTER TABLE {tbl} ADD COLUMN flag STRING DEFAULT 'legacy'")
        spark.sql(f"INSERT INTO {tbl} VALUES (10, 'new'), (11, DEFAULT)")
        rows = {
            (r.k, r.flag) for r in spark.sql(f"SELECT * FROM {tbl}").collect()
        }
        assert rows == {
            (0, "legacy"),
            (1, "legacy"),
            (2, "legacy"),
            (10, "new"),
            (11, "legacy"),
        }
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_sql_pipe_syntax_matches_standard_form(spark, sf_correct):
    """The |> spelling returns exactly the nested standard form's result
    AND its oracle row set (dialect equivalence, not new semantics)."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.sqlfront import (
        sql_pipe_syntax,
    )

    piped = sorted(map(tuple, sql_pipe_syntax(spark, sf_correct).collect()))
    std = sorted(
        map(
            tuple,
            spark.sql(
                "SELECT * FROM ("
                "SELECT o_orderstatus, o_orderpriority, count(*) AS n, "
                "round(sum(o_totalprice), 2) AS total "
                "FROM orders WHERE o_totalprice > 100 "
                "GROUP BY o_orderstatus, o_orderpriority) t WHERE n > 5"
            ).collect(),
        )
    )
    assert piped == std and piped
    assert_matches_oracle(
        spark,
        sf_correct,
        "sql_pipe_syntax",
        registry.QUERIES["sql_pipe_syntax"],
        registry.ORACLES["sql_pipe_syntax"],
    )


def test_group_by_all_and_order_by_all_sugar(spark, sf_correct):
    """GROUP BY ALL (group on every non-aggregate select item) and ORDER
    BY ALL must equal the explicit spellings — pure sugar, same plan
    family."""
    spark.read.parquet(f"{sf_correct}/orders.parquet").createOrReplaceTempView(
        "v_orders_gba"
    )
    sugar = spark.sql(
        "SELECT o_orderstatus, o_orderpriority, count(*) AS n "
        "FROM v_orders_gba GROUP BY ALL ORDER BY ALL"
    ).collect()
    explicit = spark.sql(
        "SELECT o_orderstatus, o_orderpriority, count(*) AS n "
        "FROM v_orders_gba GROUP BY o_orderstatus, o_orderpriority "
        "ORDER BY o_orderstatus, o_orderpriority, n"
    ).collect()
    assert [tuple(r) for r in sugar] == [tuple(r) for r in explicit] != []


def test_sql_unpivot_clause_equals_dataframe_unpivot(spark, sf_correct):
    """The SQL UNPIVOT clause lowers to the same Expand as the DataFrame
    unpivot — asserted by exact result equality with the registered
    `unpivot_measures` key (modulo its measure renames)."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.relational3 import (
        unpivot_measures,
    )

    spark.read.parquet(f"{sf_correct}/lineitem.parquet").createOrReplaceTempView(
        "v_li_unpivot"
    )
    sql_form = spark.sql(
        "SELECT l_orderkey, l_linenumber, measure, val "
        "FROM v_li_unpivot UNPIVOT (val FOR measure IN ("
        "l_quantity AS quantity, l_extendedprice AS price, l_tax AS tax))"
    )
    a = sorted(map(tuple, sql_form.collect()))
    b = sorted(map(tuple, unpivot_measures(spark, sf_correct).collect()))
    assert a == b and a


def test_transpose_small_aggregate(spark, sf_correct):
    """`df.transpose()` (Spark 4): rows become columns — sound ONLY on
    small aggregate results (the new column set is the old row count,
    driver-bound by design). Status totals flipped to one row per
    measure."""
    agg = (
        spark.read.parquet(f"{sf_correct}/orders.parquet")
        .groupBy("o_orderstatus")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("o_orderstatus")
        .select("o_orderstatus", F.col("n").cast("string").alias("n"))
    )
    t = agg.transpose("o_orderstatus")
    rows = t.collect()
    assert set(t.columns) >= {"key", "F", "O", "P"}
    wide = {c: rows[0][c] for c in ("F", "O", "P")}
    tall = {r.o_orderstatus: r.n for r in agg.collect()}
    assert wide == tall


def test_stat_crosstab_contingency(spark, sf_correct):
    """df.stat.crosstab: the contingency-table shorthand — cell counts
    must equal the explicit groupBy pair counts."""
    e = spark.read.parquet(f"{sf_correct}/events.parquet")
    ct = e.stat.crosstab("event_type", "user_id")
    pair = {
        (r.event_type, str(r.user_id)): r.n
        for r in e.groupBy("event_type", "user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    cols = [c for c in ct.columns if c != "event_type_user_id"]
    total = 0
    for r in ct.collect():
        for c in cols:
            got = r[c]
            total += got
            assert got == pair.get((r["event_type_user_id"], c), 0)
    assert total == e.count()


def test_sql_disjunctive_revenue(spark, sf_correct):
    """Q19-shaped disjunction: oracle match PLUS the planner probe — the
    equi-join conjunct must survive the OR (a hash/broadcast join, never
    a nested loop over the disjunction), and at least one per-side
    implied filter (brand membership) must land below the join."""
    assert_matches_oracle(
        spark,
        sf_correct,
        "sql_disjunctive_revenue",
        registry.QUERIES["sql_disjunctive_revenue"],
        registry.ORACLES["sql_disjunctive_revenue"],
    )
    plan = plan_string(
        registry.QUERIES["sql_disjunctive_revenue"](spark, sf_correct)
    )
    assert "NestedLoop" not in plan, plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan) or (
        "ShuffledHashJoin" in plan
    ), plan
    # per-side extraction reaches the SCANS: the implied brand/size
    # disjunction is a pushed filter on part, the quantity-envelope
    # disjunction a pushed filter on lineitem
    assert "PushedFilters: [IsNotNull(p_partkey), Or(" in plan, plan
    assert "PushedFilters: [IsNotNull(l_partkey), Or(" in plan, plan

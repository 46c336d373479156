"""Z-order layout: oracle match, hand-computed interleave cases, and the
quantitative data-skipping claim — files cut from a z-sorted table have
tighter combined (part, supplier) min/max ranges than files cut from a
single-column sort."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from parallel_map_reduce_word_counter_for_one_machine_spark import registry
from parallel_map_reduce_word_counter_for_one_machine_spark.operators.layout import (
    layout_zorder,
    zvalue,
)

from .oracle import assert_matches_oracle

registry.load_all()

N_FILES = 32


def test_zorder_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "layout_zorder",
        registry.QUERIES["layout_zorder"],
        registry.ORACLES["layout_zorder"],
    )


def test_zvalue_hand_cases(spark):
    """Interleave spot checks: bit i of a -> position 2i, bit i of b ->
    2i+1. (a=3, b=1) -> 0b0111 = 7; (a=0, b=3) -> 0b1010 = 10; and the
    key is monotone in each argument when the other is fixed at 0."""
    df = spark.createDataFrame(
        [(3, 1), (0, 3), (5, 0), (0, 5)], "a long, b long"
    ).select("a", "b", zvalue(F.col("a"), F.col("b")).alias("z"))
    got = {(r.a, r.b): r.z for r in df.collect()}
    assert got[(3, 1)] == 0b0111
    assert got[(0, 3)] == 0b1010
    assert got[(5, 0)] == 0b010001  # bits 0,2 of a -> positions 0,4
    assert got[(0, 5)] == 0b100010  # bits 0,2 of b -> positions 1,5


def _file_range_cost(df, order_col) -> float:
    """Cut the table into N_FILES equal row ranges along ``order_col`` and
    return the mean over files of (partkey width + suppkey width), each
    normalized by its global range — the fraction of each dimension a
    file's min/max stats fail to prune."""
    w = Window.orderBy(order_col, "l_orderkey", "l_linenumber")
    bounds = (
        df.withColumn("f", F.ntile(N_FILES).over(w))
        .groupBy("f")
        .agg(
            (F.max("l_partkey") - F.min("l_partkey")).alias("wp"),
            (F.max("l_suppkey") - F.min("l_suppkey")).alias("ws"),
        )
    )
    g = df.agg(
        (F.max("l_partkey") - F.min("l_partkey")).alias("gp"),
        (F.max("l_suppkey") - F.min("l_suppkey")).alias("gs"),
    ).collect()[0]
    r = bounds.agg(F.avg("wp").alias("p"), F.avg("ws").alias("s")).collect()[0]
    return r.p / g.gp + r.s / g.gs


def test_zorder_beats_single_column_sort(spark, sf_correct):
    """The point of the layout: z-sorted files bound BOTH dimensions.
    Sorting by l_partkey alone leaves suppkey unclustered (cost ~1 in
    that dimension, total ~1.0+); the z-sort must land strictly below
    either single-column layout's combined cost."""
    df = layout_zorder(spark, sf_correct)
    z_cost = _file_range_cost(df, "zkey")
    part_cost = _file_range_cost(df, "l_partkey")
    supp_cost = _file_range_cost(df, "l_suppkey")
    assert z_cost < part_cost, (z_cost, part_cost)
    assert z_cost < supp_cost, (z_cost, supp_cost)
    # and each dimension individually is far better than unclustered
    assert z_cost < 1.0, z_cost

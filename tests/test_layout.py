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


def test_zorder_rowgroup_stats_on_real_parquet(spark, sf_correct, tmp_path):
    """Materialize the layout and read back REAL parquet footer stats:
    writing z-sorted (repartitionByRange on zkey) produces files whose
    (l_partkey, l_suppkey) min/max spans are tight in BOTH dimensions —
    the statistics a scan's file/row-group skipping actually consults."""
    import glob

    import pyarrow.parquet as pq

    df = layout_zorder(spark, sf_correct)

    def write_and_cost(sorted_df, path) -> float:
        sorted_df.write.mode("overwrite").parquet(path)
        spans = []
        g = {"p": [1 << 62, 0], "s": [1 << 62, 0]}
        for f in glob.glob(path + "/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            cols = {
                md.row_group(0).column(i).path_in_schema: i
                for i in range(md.row_group(0).num_columns)
            }
            for rg in range(md.num_row_groups):
                st_p = md.row_group(rg).column(cols["l_partkey"]).statistics
                st_s = md.row_group(rg).column(cols["l_suppkey"]).statistics
                spans.append((st_p.max - st_p.min, st_s.max - st_s.min))
                g["p"][0] = min(g["p"][0], st_p.min)
                g["p"][1] = max(g["p"][1], st_p.max)
                g["s"][0] = min(g["s"][0], st_s.min)
                g["s"][1] = max(g["s"][1], st_s.max)
        gp = g["p"][1] - g["p"][0]
        gs = g["s"][1] - g["s"][0]
        assert len(spans) >= 8, "need multiple files/row-groups to compare"
        return sum(wp / gp + ws / gs for wp, ws in spans) / len(spans)

    z_cost = write_and_cost(
        df.repartitionByRange(N_FILES, "zkey"), str(tmp_path / "z")
    )
    p_cost = write_and_cost(
        df.repartitionByRange(N_FILES, "l_partkey"), str(tmp_path / "p")
    )
    assert z_cost < p_cost, (z_cost, p_cost)
    assert z_cost < 1.0, z_cost


def test_zorder_constant_column_guard(spark):
    """A dimension with zero range (mx == mn) quantizes to 0 instead of
    dividing by zero; the key degrades gracefully to a sort on the other
    dimension."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.layout import (
        Z_MAX,
        _quantize,
        zvalue,
    )

    df = spark.createDataFrame(
        [(i, 7) for i in range(10)], "a long, b long"
    )
    r = df.agg(
        F.min("a").alias("amn"), F.max("a").alias("amx"),
        F.min("b").alias("bmn"), F.max("b").alias("bmx"),
    )
    qa = _quantize(F.col("a"), F.col("amn"), F.col("amx"))
    qb = _quantize(F.col("b"), F.col("bmn"), F.col("bmx"))
    out = df.crossJoin(F.broadcast(r)).select(
        "a", qa.alias("qa"), qb.alias("qb"), zvalue(qa, qb).alias("z")
    ).collect()
    assert all(o.qb == 0 for o in out)  # constant dim -> grid 0, no error
    assert {o.qa for o in out} == {
        int((i * Z_MAX) / 9) for i in range(10)
    }
    # z strictly increases with a (b contributes nothing)
    zs = [o.z for o in sorted(out, key=lambda o: o.a)]
    assert zs == sorted(zs) and len(set(zs)) == len(zs)

def test_zvalue_n_hand_cases(spark):
    """3-dim interleave: bit i of column j lands at position 3i + j."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.layout import (
        zvalue_n,
    )

    df = spark.createDataFrame(
        [(1, 0, 0), (0, 1, 0), (0, 0, 1), (3, 0, 0), (1, 1, 1)],
        "a long, b long, c long",
    ).select(
        "a", "b", "c",
        zvalue_n([F.col("a"), F.col("b"), F.col("c")]).alias("z"),
    )
    got = {(r.a, r.b, r.c): r.z for r in df.collect()}
    assert got[(1, 0, 0)] == 0b001  # a bit 0 -> position 0
    assert got[(0, 1, 0)] == 0b010  # b bit 0 -> position 1
    assert got[(0, 0, 1)] == 0b100  # c bit 0 -> position 2
    assert got[(3, 0, 0)] == 0b001001  # a bits 0,1 -> positions 0,3
    assert got[(1, 1, 1)] == 0b111


def _file_range_cost3(df, order_col) -> tuple[float, float, float]:
    """Per-dimension normalized mean file widths for the 3-dim layout."""
    w = Window.orderBy(order_col, "l_orderkey", "l_linenumber")
    bounds = (
        df.withColumn("f", F.ntile(N_FILES).over(w))
        .groupBy("f")
        .agg(
            (F.max("l_partkey") - F.min("l_partkey")).alias("wp"),
            (F.max("l_suppkey") - F.min("l_suppkey")).alias("ws"),
            (F.max("l_quantity") - F.min("l_quantity")).alias("wq"),
        )
    )
    g = df.agg(
        (F.max("l_partkey") - F.min("l_partkey")).alias("gp"),
        (F.max("l_suppkey") - F.min("l_suppkey")).alias("gs"),
        (F.max("l_quantity") - F.min("l_quantity")).alias("gq"),
    ).collect()[0]
    r = bounds.agg(
        F.avg("wp").alias("p"), F.avg("ws").alias("s"), F.avg("wq").alias("q")
    ).collect()[0]
    return (r.p / g.gp, r.s / g.gs, r.q / g.gq)


def test_zorder3_tightens_all_three_dimensions(spark, sf_correct):
    """The 3-dim layout must (a) bound EVERY dimension below the
    unclustered cost (~1.0 each), and (b) beat each single-column sort on
    the combined 3-dim cost — a single-column sort leaves the other two
    dimensions unclustered (cost ~2.x of 3)."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.layout import (
        layout_zorder3,
    )

    df = layout_zorder3(spark, sf_correct)
    zp, zs, zq = _file_range_cost3(df, "zkey")
    assert zp < 0.9 and zs < 0.9 and zq < 0.9, (zp, zs, zq)
    z_total = zp + zs + zq
    for single in ("l_partkey", "l_suppkey", "l_quantity"):
        cost = sum(_file_range_cost3(df, single))
        assert z_total < cost, (single, z_total, cost)


def test_zvalue_n_matches_python_reference(spark):
    """Property: the SQL bit-interleave equals a pure-Python Morton
    reference for random coordinate tuples across 2/3 dims (hypothesis-
    generated, deterministic seed via derandomize in CI-less env)."""
    import random

    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.layout import (
        Z_BITS,
        zvalue_n,
    )

    def morton_py(vals, bits=Z_BITS):
        out = 0
        n = len(vals)
        for i in range(bits):
            for j, v in enumerate(vals):
                out |= ((v >> i) & 1) << (i * n + j)
        return out

    rng = random.Random(1234)
    for n in (2, 3):
        rows = [
            tuple(rng.randrange(0, 1 << Z_BITS) for _ in range(n))
            for _ in range(200)
        ]
        cols = [chr(ord("a") + j) for j in range(n)]
        df = spark.createDataFrame(rows, ", ".join(f"{c} long" for c in cols))
        got = {
            tuple(r[c] for c in cols): r.z
            for r in df.select(
                *cols, zvalue_n([F.col(c) for c in cols]).alias("z")
            ).collect()
        }
        for vals in rows:
            assert got[vals] == morton_py(list(vals)), (n, vals)


def _xy2d_reference(n_bits: int, hb_max: int, x: int, y: int) -> int:
    """Independent Python port of the canonical xy2d (Wikipedia form):
    the test's ground truth for the SQL/Column rotation chains."""
    d = 0
    s = 1 << (n_bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = hb_max - x
                y = hb_max - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "layout_hilbert",
        registry.QUERIES["layout_hilbert"],
        registry.ORACLES["layout_hilbert"],
    )


def test_hilbert_matches_python_reference(spark):
    """The chained-projection key equals the canonical xy2d on a grid
    sample covering every rotation branch."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.layout import (
        HB_BITS,
        HB_MAX,
        with_hilbert_key,
    )

    pts = [(x, y) for x in range(0, 256, 17) for y in range(0, 256, 23)]
    pts += [(0, 0), (255, 255), (0, 255), (255, 0), (1, 254)]
    df = spark.createDataFrame(pts, "x LONG, y LONG")
    keyed = with_hilbert_key(df, F.col("x"), F.col("y")).collect()
    for r in keyed:
        assert r.hkey == _xy2d_reference(HB_BITS, HB_MAX, r.x, r.y), (r.x, r.y)


def test_hilbert_adjacency(spark):
    """Hilbert's defining property (and what Morton lacks): consecutive
    curve positions are grid-adjacent — |Δx| + |Δy| = 1 for EVERY step
    along the full 256×256 curve's first 4096 positions."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.layout import (
        HB_BITS,
        HB_MAX,
        with_hilbert_key,
    )

    pts = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(pts, "x LONG, y LONG")
    rows = with_hilbert_key(df, F.col("x"), F.col("y")).collect()
    by_key = {r.hkey: (r.x, r.y) for r in rows}
    inside = sorted(k for k in by_key)
    prev = None
    checked = 0
    for k in inside:
        if prev is not None and k == prev + 1:
            (x0, y0), (x1, y1) = by_key[prev], by_key[k]
            assert abs(x0 - x1) + abs(y0 - y1) == 1, (prev, k)
            checked += 1
        prev = k
    assert checked >= 4000  # the 64x64 corner is one contiguous curve run


def test_hilbert_beats_single_column_sort(spark, sf_correct):
    """Same locality protocol as the z keys: the Hilbert layout must beat
    both single-column sorts on combined range cost, and stay within a
    few percent of (typically below) the z-order cost on the same data."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.layout import (
        layout_hilbert,
    )

    hdf = layout_hilbert(spark, sf_correct)
    h_cost = _file_range_cost(hdf, "hkey")
    part_cost = _file_range_cost(hdf, "l_partkey")
    supp_cost = _file_range_cost(hdf, "l_suppkey")
    assert h_cost < part_cost, (h_cost, part_cost)
    assert h_cost < supp_cost, (h_cost, supp_cost)
    zdf = layout_zorder(spark, sf_correct)
    z_cost = _file_range_cost(zdf, "zkey")
    assert h_cost < z_cost * 1.05, (h_cost, z_cost)

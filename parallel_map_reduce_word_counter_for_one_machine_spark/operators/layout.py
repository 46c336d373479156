"""Physical-layout operators: multi-dimensional clustering keys for
data skipping (driver contract § scale extensions; the reference has no
storage layout at all — one input file, src/main.cpp:78-108).

Z-ordering (Morton order) interleaves the bits of several columns into
one sort key so that sorting by the single key co-locates rows that are
close in EVERY dimension — the layout behind Delta/Iceberg
``OPTIMIZE ZORDER BY``: per-file min/max ranges become tight for all
participating columns at once, so a predicate on ANY of them prunes
files at listing time (the `scan_partition_pruned` effect without
committing to one partition column).

THE pitfall (measured here before normalization was added): interleaving
raw values whose ranges span different bit widths degenerates to a sort
by the widest column — l_partkey uses 15 bits, l_suppkey 10, so
partkey's high bits owned z-positions 20-28 unopposed and the "z" layout
scored the same file-range cost as a plain partkey sort (1.036 vs 1.031
in the locality test). Production z-ordering therefore RANGE-NORMALIZES
every dimension onto the same grid first (Delta uses range partition
ids); here each column is affinely scaled onto [0, 2^Z_BITS) from its
global min/max before the interleave.

Cost shape: one tiny min/max aggregate (2 longs per column) broadcast
back over a map-only key computation — whole-stage codegen shifts and
masks; then the one range exchange you were already paying to write
sorted files. Identical plan at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load_table

# Bits per dimension on the normalized grid.
Z_BITS = 16
Z_MAX = (1 << Z_BITS) - 1


def zvalue_n(cols: list[Column], bits: int = Z_BITS) -> Column:
    """Morton interleave of the low ``bits`` of n non-negative longs:
    bit i of column j lands at position i·n + j (the standard n-dim
    Morton layout; n·bits must stay < 63 to fit a signed long — 3 dims ×
    16 bits = 48 here)."""
    n = len(cols)
    assert n * bits < 63, "z-key overflows a signed long"
    parts = []
    for i in range(bits):
        for j, c in enumerate(cols):
            parts.append(
                F.shiftleft(F.shiftrightunsigned(c, i).bitwiseAND(1), i * n + j)
            )
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out


def zvalue(a: Column, b: Column, bits: int = Z_BITS) -> Column:
    """2-dim special case (bit i of ``a`` → 2i, of ``b`` → 2i+1)."""
    return zvalue_n([a, b], bits)


def _zvalue_sql_n(names: list[str], bits: int = Z_BITS) -> str:
    """The identical n-dim interleave as engine-neutral SQL text (>>, &,
    << are shared by Spark SQL and DuckDB; the oracle uses this
    verbatim)."""
    n = len(names)
    terms = []
    for i in range(bits):
        for j, name in enumerate(names):
            terms.append(f"((({name} >> {i}) & 1) << {i * n + j})")
    return " + ".join(terms)


def _zvalue_sql(a: str, b: str, bits: int = Z_BITS) -> str:
    return _zvalue_sql_n([a, b], bits)


def _quantize(col: Column, mn: Column, mx: Column, grid: int = Z_MAX) -> Column:
    """Affine map of ``col`` from [mn, mx] onto the integer grid
    [0, grid]. The arithmetic ((x−mn)·grid as exact doubles, one IEEE
    divide, floor) is the identical op sequence in the oracle, so the
    quantized grid — and therefore the key — matches bit-for-bit."""
    return F.when(
        mx > mn,
        F.floor((col - mn).cast("double") * grid / (mx - mn)).cast("long"),
    ).otherwise(F.lit(0))


@query(
    "layout_zorder",
    oracle=(
        "WITH r AS (SELECT min(l_partkey) AS pmn, max(l_partkey) AS pmx, "
        "min(l_suppkey) AS smn, max(l_suppkey) AS smx FROM lineitem), "
        "q AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, "
        f"CASE WHEN pmx > pmn THEN CAST(floor(CAST(l_partkey - pmn AS DOUBLE)"
        f" * {Z_MAX} / (pmx - pmn)) AS BIGINT) ELSE 0 END AS qa, "
        f"CASE WHEN smx > smn THEN CAST(floor(CAST(l_suppkey - smn AS DOUBLE)"
        f" * {Z_MAX} / (smx - smn)) AS BIGINT) ELSE 0 END AS qb "
        "FROM lineitem, r) "
        "SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, "
        f"CAST({_zvalue_sql('qa', 'qb')} AS BIGINT) AS zkey FROM q"
    ),
)
def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(part, supplier) Z-order key per lineitem row — the clustering key
    an OPTIMIZE-style rewrite would range-sort the table by, with both
    dimensions range-normalized onto the same 16-bit grid (see module
    docstring for why that step is load-bearing). Registered as the key
    computation (deterministic, oracled bit-for-bit); the layout BENEFIT
    — per-file min/max ranges tight in both dimensions at once — is
    asserted quantitatively in tests/test_layout.py against single-column
    sorting."""
    li = load_table(spark, sf_dir, "lineitem")
    r = li.agg(
        F.min("l_partkey").alias("pmn"),
        F.max("l_partkey").alias("pmx"),
        F.min("l_suppkey").alias("smn"),
        F.max("l_suppkey").alias("smx"),
    )
    qa = _quantize(F.col("l_partkey"), F.col("pmn"), F.col("pmx"))
    qb = _quantize(F.col("l_suppkey"), F.col("smn"), F.col("smx"))
    return li.crossJoin(F.broadcast(r)).select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        zvalue(qa, qb).alias("zkey"),
    )


@query(
    "layout_zorder3",
    oracle=(
        "WITH r AS (SELECT min(l_partkey) AS pmn, max(l_partkey) AS pmx, "
        "min(l_suppkey) AS smn, max(l_suppkey) AS smx, "
        "min(l_quantity) AS qmn, max(l_quantity) AS qmx FROM lineitem), "
        "q AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, "
        "l_quantity, "
        f"CASE WHEN pmx > pmn THEN CAST(floor(CAST(l_partkey - pmn AS DOUBLE)"
        f" * {Z_MAX} / (pmx - pmn)) AS BIGINT) ELSE 0 END AS qa, "
        f"CASE WHEN smx > smn THEN CAST(floor(CAST(l_suppkey - smn AS DOUBLE)"
        f" * {Z_MAX} / (smx - smn)) AS BIGINT) ELSE 0 END AS qb, "
        f"CASE WHEN qmx > qmn THEN CAST(floor(CAST(l_quantity - qmn AS DOUBLE)"
        f" * {Z_MAX} / (qmx - qmn)) AS BIGINT) ELSE 0 END AS qc "
        "FROM lineitem, r) "
        "SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, "
        f"CAST({_zvalue_sql_n(['qa', 'qb', 'qc'])} AS BIGINT) AS zkey FROM q"
    ),
)
def layout_zorder3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-dimensional Z-order key (part, supplier, quantity) — VERDICT
    r04 item 7. Same range-normalized grid per dimension; the interleave
    packs 3×16 = 48 bits into one long (``zvalue_n`` asserts the fit).
    The locality test proves per-file bounds tighten on ALL THREE columns
    vs any single-column sort; more dimensions dilute each one's
    tightness (the classic z-order tradeoff), so production layouts stop
    at 3-4 dims — exactly what Delta's OPTIMIZE ZORDER docs recommend."""
    li = load_table(spark, sf_dir, "lineitem")
    r = li.agg(
        F.min("l_partkey").alias("pmn"),
        F.max("l_partkey").alias("pmx"),
        F.min("l_suppkey").alias("smn"),
        F.max("l_suppkey").alias("smx"),
        F.min("l_quantity").alias("qmn"),
        F.max("l_quantity").alias("qmx"),
    )
    qa = _quantize(F.col("l_partkey"), F.col("pmn"), F.col("pmx"))
    qb = _quantize(F.col("l_suppkey"), F.col("smn"), F.col("smx"))
    qc = _quantize(F.col("l_quantity"), F.col("qmn"), F.col("qmx"))
    return li.crossJoin(F.broadcast(r)).select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        zvalue_n([qa, qb, qc]).alias("zkey"),
    )


# Hilbert grid: 2^HB_BITS per dimension. 8 bits/dim keeps the unrolled
# rotation chain readable while the curve key spans [0, 65536) — plenty
# of resolution for file-level clustering (files hold millions of rows;
# the key only has to ORDER them, not identify them).
HB_BITS = 8
HB_MAX = (1 << HB_BITS) - 1


def _hilbert_step_exprs(x: str, y: str, d: str, p: int) -> tuple[str, str, str]:
    """One xy2d step at bit position ``p`` (s = 2^p) as engine-neutral SQL
    (>>, &, CASE are shared by Spark SQL and DuckDB): accumulate the
    quadrant into d, then apply the Hilbert rotation/reflection. The
    (3·rx) XOR ry quadrant table is written out as a CASE so no engine-
    specific xor operator is needed."""
    s = 1 << p
    rx = f"(({x} >> {p}) & 1)"
    ry = f"(({y} >> {p}) & 1)"
    quad = (
        f"CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0 "
        f"WHEN {rx} = 0 THEN 1 WHEN {ry} = 1 THEN 2 ELSE 3 END"
    )
    d_next = f"{d} + {s * s} * ({quad})"
    x_next = (
        f"CASE WHEN {ry} = 1 THEN {x} "
        f"ELSE CASE WHEN {rx} = 1 THEN {HB_MAX} - {y} ELSE {y} END END"
    )
    y_next = (
        f"CASE WHEN {ry} = 1 THEN {y} "
        f"ELSE CASE WHEN {rx} = 1 THEN {HB_MAX} - {x} ELSE {x} END END"
    )
    return x_next, y_next, d_next


def _hilbert_sql(carry: list[str]) -> str:
    """Chained-CTE xy2d over quantized columns qa/qb (one CTE per bit,
    highest first — the rotation makes each step depend on the last, so
    unlike Morton there is no closed-form interleave). ``carry`` columns
    ride through unchanged."""
    keep = ", ".join(carry)
    steps = []
    x, y, d = "qa", "qb", "0"
    for k, p in enumerate(range(HB_BITS - 1, -1, -1)):
        xn, yn, dn = _hilbert_step_exprs(x, y, d, p)
        steps.append(
            f"h{k} AS (SELECT {keep}, {xn} AS x{k}, {yn} AS y{k}, "
            f"{dn} AS d{k} FROM {'q' if k == 0 else f'h{k - 1}'})"
        )
        x, y, d = f"x{k}", f"y{k}", f"d{k}"
    last = HB_BITS - 1
    return (
        ", ".join(steps)
        + f" SELECT {keep}, CAST(d{last} AS BIGINT) AS hkey FROM h{last}"
    )


def with_hilbert_key(
    df: DataFrame, qa: Column, qb: Column, out: str = "hkey"
) -> DataFrame:
    """The same xy2d chain as CHAINED PROJECTIONS — one step per bit,
    each reading the previous step's named x/y/d columns. Substituting
    every step into one Column tree is tempting but explodes ~5× per
    level (x/y each feed several branches of the next rotation): at 8
    bits that is a ~10⁶-node expression that OOMs the driver at
    construction. Named intermediates keep the tree linear in HB_BITS;
    rx/ry are materialized per step so each is computed once."""
    df = df.withColumns(
        {"_hx": qa, "_hy": qb, "_hd": F.lit(0).cast("long")}
    )
    for p in range(HB_BITS - 1, -1, -1):
        s = 1 << p
        df = df.withColumns(
            {
                "_rx": F.shiftrightunsigned(F.col("_hx"), p).bitwiseAND(1),
                "_ry": F.shiftrightunsigned(F.col("_hy"), p).bitwiseAND(1),
            }
        )
        rx, ry = F.col("_rx"), F.col("_ry")
        quad = (
            F.when((rx == 0) & (ry == 0), 0)
            .when(rx == 0, 1)
            .when(ry == 1, 2)
            .otherwise(3)
        )
        df = df.withColumns(
            {
                "_hd": F.col("_hd") + F.lit(s * s) * quad,
                "_hx": F.when(ry == 1, F.col("_hx")).otherwise(
                    F.when(rx == 1, F.lit(HB_MAX) - F.col("_hy")).otherwise(
                        F.col("_hy")
                    )
                ),
                "_hy": F.when(ry == 1, F.col("_hy")).otherwise(
                    F.when(rx == 1, F.lit(HB_MAX) - F.col("_hx")).otherwise(
                        F.col("_hx")
                    )
                ),
            }
        )
    return df.withColumn(out, F.col("_hd").cast("long")).drop(
        "_hx", "_hy", "_hd", "_rx", "_ry"
    )


_HB_CARRY = ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"]


@query(
    "layout_hilbert",
    oracle=(
        "WITH r AS (SELECT min(l_partkey) AS pmn, max(l_partkey) AS pmx, "
        "min(l_suppkey) AS smn, max(l_suppkey) AS smx FROM lineitem), "
        "q AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, "
        f"CASE WHEN pmx > pmn THEN CAST(floor(CAST(l_partkey - pmn AS DOUBLE)"
        f" * {HB_MAX} / (pmx - pmn)) AS BIGINT) ELSE 0 END AS qa, "
        f"CASE WHEN smx > smn THEN CAST(floor(CAST(l_suppkey - smn AS DOUBLE)"
        f" * {HB_MAX} / (smx - smn)) AS BIGINT) ELSE 0 END AS qb "
        "FROM lineitem, r), " + _hilbert_sql(_HB_CARRY)
    ),
)
def layout_hilbert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(part, supplier) HILBERT key per lineitem row — the curve behind
    Databricks liquid clustering and newer Iceberg layouts. Hilbert beats
    Morton on locality because the curve never makes the long diagonal
    jumps Z-order takes between quadrant boundaries: every consecutive
    pair of curve positions is grid-adjacent, so a file's rows cover a
    more compact region and its min/max ranges are tighter for the same
    file size (the effect is measured against z-order in
    tests/test_layout.py, same locality protocol as the z keys).

    The cost shape is identical to z-order — min/max broadcast, map-only
    key arithmetic in whole-stage codegen, then the range exchange the
    sorted write was already paying — but the key itself is a per-bit
    ROTATION chain (d accumulates the quadrant, x/y reflect and swap),
    which has no closed-form interleave; both engines run the identical
    unrolled 8-step chain (chained projections here, chained CTEs in the oracle),
    so the key matches bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem")
    r = li.agg(
        F.min("l_partkey").alias("pmn"),
        F.max("l_partkey").alias("pmx"),
        F.min("l_suppkey").alias("smn"),
        F.max("l_suppkey").alias("smx"),
    )
    qa = _quantize(F.col("l_partkey"), F.col("pmn"), F.col("pmx"), HB_MAX)
    qb = _quantize(F.col("l_suppkey"), F.col("smn"), F.col("smx"), HB_MAX)
    keyed = with_hilbert_key(li.crossJoin(F.broadcast(r)), qa, qb)
    return keyed.select(*_HB_CARRY, "hkey")

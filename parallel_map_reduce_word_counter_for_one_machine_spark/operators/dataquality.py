"""Data-quality gate (Deequ/Great-Expectations style) — the validation a
pipeline runs on every ingested batch BEFORE it joins the corpus (driver
contract § north-star extensions; the reference validates nothing,
src/main.cpp:104-108 trusts its input stream).

Two forms over the lineitem/orders facts:

- ``dq_profile`` — long-form column profile (completeness, cardinality,
  bounds) as a bounded report table: one row per (column, metric).
- ``dq_gate``    — one-row constraint verdict: declared invariants
  (domains, ranges, key uniqueness, non-null keys) each reduced to a
  boolean the driver value-hashes.

Shape: ONE aggregation pass per source table computes every metric
(partial+final; no per-metric scans — the profile is a single agg row
exploded into long form), so the cost is one table scan regardless of how
many constraints are declared. All metrics are emitted as BIGINT
(fixed-point ×100 for 2dp doubles, yyyymmdd for dates) — no float ever
crosses the driver hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load_table

_PROFILE_ORACLE = (
    "WITH a AS (SELECT "
    "  CAST(count(*) AS BIGINT) AS n, "
    "  CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS q_null, "
    "  CAST(count(DISTINCT l_quantity) AS BIGINT) AS q_distinct, "
    "  CAST(round(min(l_quantity) * 100) AS BIGINT) AS q_min, "
    "  CAST(round(max(l_quantity) * 100) AS BIGINT) AS q_max, "
    "  CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS p_null, "
    "  CAST(count(DISTINCT l_extendedprice) AS BIGINT) AS p_distinct, "
    "  CAST(round(min(l_extendedprice) * 100) AS BIGINT) AS p_min, "
    "  CAST(round(max(l_extendedprice) * 100) AS BIGINT) AS p_max, "
    "  CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS d_null, "
    "  CAST(count(DISTINCT l_shipdate) AS BIGINT) AS d_distinct, "
    "  CAST(strftime(min(l_shipdate), '%Y%m%d') AS BIGINT) AS d_min, "
    "  CAST(strftime(max(l_shipdate), '%Y%m%d') AS BIGINT) AS d_max, "
    "  CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS f_null, "
    "  CAST(count(DISTINCT l_returnflag) AS BIGINT) AS f_distinct "
    "FROM lineitem) "
    "SELECT 'l_quantity' AS column_name, 'n' AS metric, n AS value FROM a "
    "UNION ALL SELECT 'l_quantity', 'n_null', q_null FROM a "
    "UNION ALL SELECT 'l_quantity', 'n_distinct', q_distinct FROM a "
    "UNION ALL SELECT 'l_quantity', 'min_x100', q_min FROM a "
    "UNION ALL SELECT 'l_quantity', 'max_x100', q_max FROM a "
    "UNION ALL SELECT 'l_extendedprice', 'n', n FROM a "
    "UNION ALL SELECT 'l_extendedprice', 'n_null', p_null FROM a "
    "UNION ALL SELECT 'l_extendedprice', 'n_distinct', p_distinct FROM a "
    "UNION ALL SELECT 'l_extendedprice', 'min_x100', p_min FROM a "
    "UNION ALL SELECT 'l_extendedprice', 'max_x100', p_max FROM a "
    "UNION ALL SELECT 'l_shipdate', 'n', n FROM a "
    "UNION ALL SELECT 'l_shipdate', 'n_null', d_null FROM a "
    "UNION ALL SELECT 'l_shipdate', 'n_distinct', d_distinct FROM a "
    "UNION ALL SELECT 'l_shipdate', 'min_yyyymmdd', d_min FROM a "
    "UNION ALL SELECT 'l_shipdate', 'max_yyyymmdd', d_max FROM a "
    "UNION ALL SELECT 'l_returnflag', 'n', n FROM a "
    "UNION ALL SELECT 'l_returnflag', 'n_null', f_null FROM a "
    "UNION ALL SELECT 'l_returnflag', 'n_distinct', f_distinct FROM a"
)


@query("dq_profile", oracle=_PROFILE_ORACLE)
def dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the lineitem fact in ONE aggregation pass, then
    exploded to (column_name, metric, value) long form — the bounded
    report a quality dashboard stores per batch. count_distinct columns
    plan as a single multi-distinct aggregate; everything else is plain
    partial-aggregable min/max/count."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("l_quantity").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("q_null"),
        F.count_distinct("l_quantity").alias("q_distinct"),
        F.round(F.min("l_quantity") * 100).cast("long").alias("q_min"),
        F.round(F.max("l_quantity") * 100).cast("long").alias("q_max"),
        F.sum(F.when(F.col("l_extendedprice").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("p_null"),
        F.count_distinct("l_extendedprice").alias("p_distinct"),
        F.round(F.min("l_extendedprice") * 100).cast("long").alias("p_min"),
        F.round(F.max("l_extendedprice") * 100).cast("long").alias("p_max"),
        F.sum(F.when(F.col("l_shipdate").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("d_null"),
        F.count_distinct("l_shipdate").alias("d_distinct"),
        F.date_format(F.min("l_shipdate"), "yyyyMMdd").cast("long").alias("d_min"),
        F.date_format(F.max("l_shipdate"), "yyyyMMdd").cast("long").alias("d_max"),
        F.sum(F.when(F.col("l_returnflag").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("f_null"),
        F.count_distinct("l_returnflag").alias("f_distinct"),
    )
    rows = [
        ("l_quantity", "n", "n"),
        ("l_quantity", "n_null", "q_null"),
        ("l_quantity", "n_distinct", "q_distinct"),
        ("l_quantity", "min_x100", "q_min"),
        ("l_quantity", "max_x100", "q_max"),
        ("l_extendedprice", "n", "n"),
        ("l_extendedprice", "n_null", "p_null"),
        ("l_extendedprice", "n_distinct", "p_distinct"),
        ("l_extendedprice", "min_x100", "p_min"),
        ("l_extendedprice", "max_x100", "p_max"),
        ("l_shipdate", "n", "n"),
        ("l_shipdate", "n_null", "d_null"),
        ("l_shipdate", "n_distinct", "d_distinct"),
        ("l_shipdate", "min_yyyymmdd", "d_min"),
        ("l_shipdate", "max_yyyymmdd", "d_max"),
        ("l_returnflag", "n", "n"),
        ("l_returnflag", "n_null", "f_null"),
        ("l_returnflag", "n_distinct", "f_distinct"),
    ]
    long_form = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.lit(m).alias("metric"),
                F.col(src).alias("value"),
            )
            for c, m, src in rows
        ]
    )
    return a.select(F.explode(long_form).alias("r")).select(
        "r.column_name", "r.metric", "r.value"
    )


_GATE_ORACLE = (
    "WITH li AS (SELECT "
    "  CAST(count(*) AS BIGINT) AS n_rows, "
    "  (min(l_quantity) >= 1 AND max(l_quantity) <= 50) AS qty_in_range, "
    "  (min(l_extendedprice) > 0) AS price_positive, "
    "  (sum(CASE WHEN l_returnflag NOT IN ('A','N','R') OR l_returnflag IS NULL "
    "     THEN 1 ELSE 0 END) = 0) AS returnflag_domain, "
    "  (sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) = 0) AS keys_not_null "
    "FROM lineitem), "
    "o AS (SELECT (count(*) = count(DISTINCT o_orderkey)) AS orderkey_unique "
    "FROM orders) "
    "SELECT n_rows, qty_in_range, price_positive, returnflag_domain, "
    "keys_not_null, orderkey_unique FROM li, o"
)


@query("dq_gate", oracle=_GATE_ORACLE)
def dq_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row constraint verdict: declared invariants of the TPC-H-ish
    facts, each a boolean — range bounds, value domain, non-null keys
    (lineitem, one pass) and primary-key uniqueness (orders, one
    count-vs-count-distinct pass). The batch is admitted iff every flag
    is true; the driver value-hash re-proves the whole gate per round."""
    li = load_table(spark, sf_dir, "lineitem").agg(
        F.count("*").alias("n_rows"),
        ((F.min("l_quantity") >= 1) & (F.max("l_quantity") <= 50)).alias(
            "qty_in_range"
        ),
        (F.min("l_extendedprice") > 0).alias("price_positive"),
        (
            F.sum(
                F.when(
                    ~F.col("l_returnflag").isin("A", "N", "R")
                    | F.col("l_returnflag").isNull(),
                    1,
                ).otherwise(0)
            )
            == 0
        ).alias("returnflag_domain"),
        (F.sum(F.when(F.col("l_orderkey").isNull(), 1).otherwise(0)) == 0).alias(
            "keys_not_null"
        ),
    )
    o = load_table(spark, sf_dir, "orders").agg(
        (F.count("*") == F.count_distinct("o_orderkey")).alias("orderkey_unique")
    )
    return li.crossJoin(F.broadcast(o))


@query(
    "quantile_normalize_lengths",
    oracle=(
        "WITH s AS (SELECT doc_id, source, n_chars FROM documents), "
        "g AS (SELECT *, row_number() OVER (ORDER BY n_chars, doc_id) "
        "AS g_rk FROM s), "
        "ns AS (SELECT source, count(*) AS n_s FROM s GROUP BY source), "
        "tot AS (SELECT count(*) AS n FROM s), "
        "r AS (SELECT doc_id, source, n_chars, row_number() OVER ("
        "PARTITION BY source ORDER BY n_chars, doc_id) AS src_rk FROM s) "
        "SELECT r.doc_id, r.source, r.n_chars, lut.n_chars AS norm_len "
        "FROM r JOIN ns USING (source) CROSS JOIN tot "
        "JOIN g lut ON lut.g_rk = CAST(round((r.src_rk - 0.5) / ns.n_s "
        "* (tot.n - 1)) AS BIGINT) + 1"
    ),
)
def quantile_normalize_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization (the batch-effect correction of
    bioinformatics, applied to corpus features): each document's length is
    replaced by the GLOBAL length at the same within-source quantile, so
    every source's feature distribution maps onto the corpus-wide one —
    the calibration step before cross-source thresholds (quality cutoffs,
    mixture caps) are comparable.

    Plan shape: within-source ranks come from ``grouped_global_rank`` and
    global ranks from ``global_rank`` (both the two-level distributed
    scheme — no per-source or global single-task window); per-source
    counts and the corpus total broadcast; the only corpus-vs-corpus join
    is rank-lookup on the computed target index (one exchange per side).
    At 100 TB the exact N-row lookup table would be replaced by the
    bounded histogram grid of ``hist_quantile_lengths`` (same mapping, ≤
    bins rows, one-bin error) — this key is the exact tier."""
    from .rank import global_rank, grouped_global_rank

    d = load_table(spark, sf_dir, "documents")
    # four consumers (g, ns, tot, r) — materialize once (module policy)
    s = d.select("doc_id", "source", "n_chars").localCheckpoint()
    g = global_rank(s, ["n_chars", "doc_id"], rank_col="g_rk").select(
        F.col("g_rk").cast("long").alias("g_rk"),
        F.col("n_chars").alias("norm_len"),
    )
    ns = s.groupBy("source").agg(F.count("*").alias("n_s"))
    tot = s.agg(F.count("*").alias("n"))
    r = grouped_global_rank(s, ["source"], ["n_chars", "doc_id"], "src_rk")
    idx = (
        F.round(
            (F.col("src_rk") - 0.5) / F.col("n_s") * (F.col("n") - 1)
        ).cast("long")
        + 1
    )
    return (
        r.join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", "source", "n_chars", idx.alias("g_rk"))
        .join(g, "g_rk")
        .select("doc_id", "source", "n_chars", "norm_len")
    )


_VEC_DIM = 64
_VEC_TORTURE_BASE = 30_000_000


def _vec_torture_rows():
    """(vec_id, v) torture vectors exercising every gate check: an
    all-zero vector, a wrong-dimension vector, a NaN-poisoned vector, and
    a DUPLICATE id. The synthetic table is clean (all checks would be
    vacuous 0s without these)."""
    zero = [0.0] * _VEC_DIM
    short = [0.5] * (_VEC_DIM // 2)
    nanv = [0.25] * _VEC_DIM
    nanv[7] = float("nan")
    normal = [0.125] * _VEC_DIM
    return [
        (_VEC_TORTURE_BASE + 0, zero),
        (_VEC_TORTURE_BASE + 1, short),
        (_VEC_TORTURE_BASE + 2, nanv),
        (_VEC_TORTURE_BASE + 0, normal),  # duplicate id
    ]


def _vec_torture_sql() -> str:
    def lst(xs):
        vals = ", ".join(
            "'NaN'::DOUBLE" if x != x else repr(float(x)) for x in xs
        )
        return f"[{vals}]::DOUBLE[]"

    rows = ", ".join(
        f"(CAST({i} AS BIGINT), {lst(v)})" for i, v in _vec_torture_rows()
    )
    return f"(VALUES {rows}) tv(vec_id, v)"


@query(
    "vector_dq_gate",
    oracle=(
        "WITH allv AS (SELECT vec_id, embedding::DOUBLE[] AS v "
        "FROM embeddings "
        f"UNION ALL SELECT vec_id, v FROM {_vec_torture_sql()}), "
        "m AS (SELECT vec_id, v, len(v) AS dim, "
        "len(list_filter(v, x -> isnan(x) OR NOT isfinite(x))) > 0 "
        "AS nonfinite, list_inner_product(v, v) AS normsq FROM allv), "
        "valid AS (SELECT * FROM m WHERE dim = "
        f"{_VEC_DIM} AND NOT nonfinite) "
        "SELECT CAST(count(*) AS BIGINT) AS n_vectors, "
        f"CAST(sum(CASE WHEN dim <> {_VEC_DIM} THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_bad_dim, "
        "CAST(sum(CASE WHEN NOT nonfinite AND normsq = 0 THEN 1 ELSE 0 "
        "END) AS BIGINT) AS n_zero_norm, "
        "CAST(sum(CASE WHEN nonfinite THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_nonfinite, "
        "CAST(count(*) - count(DISTINCT vec_id) AS BIGINT) AS n_dup_ids, "
        "round((SELECT quantile_cont(normsq, 0.5) FROM valid), 6) "
        "AS normsq_p50, "
        "round((SELECT quantile_cont(normsq, 0.99) FROM valid), 6) "
        "AS normsq_p99, "
        f"(sum(CASE WHEN dim <> {_VEC_DIM} THEN 1 ELSE 0 END) = 0 "
        "AND sum(CASE WHEN nonfinite THEN 1 ELSE 0 END) = 0 "
        "AND count(*) = count(DISTINCT vec_id)) AS gate_pass "
        "FROM m"
    ),
)
def vector_dq_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest gate for the VECTOR table — the checks an embedding store
    runs before vectors are allowed anywhere near index build or
    similarity math, where they would otherwise fail silently (a NaN
    poisons every cosine it touches; a wrong-dim vector crashes a kernel
    or — worse — broadcasts; a duplicate id makes upserts ambiguous; a
    zero vector has no direction and must be excluded from cosine pools,
    which is exactly the ``norm > 0`` rule the IVFPQ build applies).
    Reports counts per defect class + the norm² p50/p99 of valid rows
    (the drift statistic the append gate watches) + the overall verdict.
    A torture batch (zero / wrong-dim / NaN / duplicate-id vectors) is
    unioned in by BOTH engines, so every defect class is exercised and
    the gate verdict is a deterministic FALSE — the gate demonstrably
    fires.

    Scale shape: one linear scan, all checks inside a single partial+
    final aggregate (count/sum/count-distinct); the two percentiles are
    exact (sort-based) over the valid rows — swap for approx_percentile
    at real corpus scale, noted here because the oracle needs the exact
    form."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    torture = spark.createDataFrame(
        _vec_torture_rows(), "vec_id LONG, v ARRAY<DOUBLE>"
    )
    allv = emb.unionByName(torture)
    dim_ok = F.size("v") == _VEC_DIM
    nonfinite = F.exists(
        "v", lambda x: F.isnan(x) | (F.abs(x) == F.lit(float("inf")))
    )
    normsq = F.aggregate(
        "v", F.lit(0.0), lambda acc, x: acc + x * x
    )
    m = allv.select(
        "vec_id",
        dim_ok.alias("dim_ok"),
        nonfinite.alias("nonfinite"),
        normsq.alias("normsq"),
    )
    valid = m.filter(F.col("dim_ok") & ~F.col("nonfinite"))
    pct = valid.agg(
        F.round(F.expr("percentile(normsq, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(normsq, 0.99)"), 6).alias("p99"),
    )
    return (
        m.agg(
            F.count("*").alias("n_vectors"),
            F.sum(F.when(~F.col("dim_ok"), 1).otherwise(0))
            .cast("long")
            .alias("n_bad_dim"),
            F.sum(
                F.when(~F.col("nonfinite") & (F.col("normsq") == 0), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_zero_norm"),
            F.sum(F.when(F.col("nonfinite"), 1).otherwise(0))
            .cast("long")
            .alias("n_nonfinite"),
            (F.count("*") - F.countDistinct("vec_id"))
            .cast("long")
            .alias("n_dup_ids"),
        )
        .crossJoin(pct)  # 1 row × 1 row
        .select(
            "n_vectors",
            "n_bad_dim",
            "n_zero_norm",
            "n_nonfinite",
            "n_dup_ids",
            F.col("p50").alias("normsq_p50"),
            F.col("p99").alias("normsq_p99"),
            (
                (F.col("n_bad_dim") == 0)
                & (F.col("n_nonfinite") == 0)
                & (F.col("n_dup_ids") == 0)
            ).alias("gate_pass"),
        )
    )

"""Iterative graph analytics beyond connected components (driver contract
§ scale extensions; the reference has no multi-record operators at all,
src/main.cpp:78-281 — ``graphdedup.py`` covers closure, this module adds
the weighted-propagation family).

``pagerank_parts`` runs weighted PageRank over the part↔supplier
bipartite graph induced by lineitem (edge weight = number of lineitems
joining the pair, symmetrized). It is the engine's canonical ITERATIVE
benchmark shape: per iteration one join of the rank table against the
normalized edge list and one groupBy(dst) — exactly the plan a 100 TB
graph runs, with the rank state O(|V|) and the edge table partitioned by
src and reused across iterations (materialized once). No driver-side
data beyond the scalar node count.

Cross-engine determinism: the per-edge contribution is computed as
``rank * (w / wt)`` with the normalized fraction precomputed on BOTH
engines (same IEEE op sequence), and the output is fixed-point
``rank_e9`` — after ITERS=8 damped iterations the cross-engine summation
drift is ~1e-17 absolute, ~1e-8 of one fixed-point unit, so the BIGINT
hash is stable (corpus_stats float lesson applied from the start).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load_table

PAGERANK_ITERS = 8
DAMPING = 0.85


def _pagerank_oracle(iters: int = PAGERANK_ITERS) -> str:
    """Unrolled-iteration DuckDB oracle: recursive CTEs cannot aggregate
    in the recursive member, so each damped iteration is its own CTE —
    generated, not hand-written, so ITERS stays one knob."""
    sql = (
        "WITH e0 AS (SELECT l_partkey AS p, l_suppkey AS s, "
        "CAST(count(*) AS DOUBLE) AS w FROM lineitem GROUP BY p, s), "
        "edges AS (SELECT p*2 AS src, s*2+1 AS dst, w FROM e0 "
        "UNION ALL SELECT s*2+1, p*2, w FROM e0), "
        "deg AS (SELECT src, sum(w) AS wt FROM edges GROUP BY src), "
        "nedges AS (SELECT e.src, e.dst, e.w / g.wt AS nw "
        "FROM edges e JOIN deg g ON e.src = g.src), "
        "n AS (SELECT CAST(count(*) AS DOUBLE) AS c FROM deg), "
        "pr0 AS (SELECT src AS node, 1.0/(SELECT c FROM n) AS rank FROM deg), "
    )
    for i in range(1, iters + 1):
        sql += (
            f"pr{i} AS (SELECT d.src AS node, "
            f"0.15/(SELECT c FROM n) + {DAMPING}*coalesce(x.contrib, 0) AS rank "
            f"FROM deg d LEFT JOIN (SELECT e.dst, sum(p.rank * e.nw) AS contrib "
            f"FROM nedges e JOIN pr{i-1} p ON e.src = p.node GROUP BY e.dst) x "
            f"ON d.src = x.dst), "
        )
    sql = sql.rstrip(", ")
    sql += (
        f" SELECT node, CAST(round(rank * 1000000000) AS BIGINT) AS rank_e9 "
        f"FROM pr{iters}"
    )
    return sql


@query("pagerank_parts", oracle=_pagerank_oracle())
def pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (damping 0.85, 8 iterations, uniform init) over
    the symmetrized part↔supplier lineitem graph; node ids encode side in
    the low bit (part → 2p, supplier → 2s+1). See module docstring for
    the plan and determinism contract."""
    li = load_table(spark, sf_dir, "lineitem")
    e0 = li.groupBy(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).agg(F.count("*").cast("double").alias("w"))
    edges = (
        e0.select((F.col("p") * 2).alias("src"), (F.col("s") * 2 + 1).alias("dst"), "w")
        .unionAll(
            e0.select(
                (F.col("s") * 2 + 1).alias("src"), (F.col("p") * 2).alias("dst"), "w"
            )
        )
    )
    deg = edges.groupBy("src").agg(F.sum("w").alias("wt"))
    # normalized edge list materialized ONCE and reused every iteration —
    # the persisted-edge-table shape an at-scale run writes out
    nedges = (
        edges.join(deg, "src")
        .select("src", "dst", (F.col("w") / F.col("wt")).alias("nw"))
        .localCheckpoint()
    )
    n = deg.count()  # scalar driver state
    teleport = 0.15 / n
    ranks = deg.select(F.col("src").alias("node")).withColumn(
        "rank", F.lit(1.0 / n)
    )
    nodes = ranks.select("node").localCheckpoint()
    for i in range(PAGERANK_ITERS):
        contrib = (
            nedges.join(ranks, nedges["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("nw")).alias("c"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (F.lit(teleport) + DAMPING * F.coalesce("c", F.lit(0.0))).alias(
                    "rank"
                ),
            )
        )
        # truncate lineage every few iterations: 8 chained joins would
        # otherwise re-run from the scan each action
        if i % 3 == 2:
            ranks = ranks.localCheckpoint()
    return ranks.select(
        "node", F.round(F.col("rank") * 1e9).cast("long").alias("rank_e9")
    )

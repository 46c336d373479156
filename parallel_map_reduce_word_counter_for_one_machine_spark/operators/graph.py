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
``rank_e6`` — after ITERS=8 damped iterations the cross-engine summation
drift is ~1e-17 absolute, ~1e-11 of one e6 fixed-point unit; e6 (not e9)
per round-5 advice, so nothing rides on a 0.5-ulp rounding boundary even
on other data/scales (corpus_stats float lesson applied from the start).
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
        f" SELECT node, CAST(round(rank * 1000000) AS BIGINT) AS rank_e6 "
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
    # Pregel-style ADJACENCY-LIST layout, materialized ONCE: one row per
    # src holding its normalized out-edges. The per-iteration join is then
    # O(|V|) rows on BOTH sides (21 k here — AQE broadcasts it) instead of
    # an O(|E|) shuffle join, and the |E| contribution rows exist only
    # inside the explode feeding the dst aggregate. Same shape GraphX uses
    # (vertex table ⋈ edge-partition table); at 100 TB the adjacency table
    # is the persisted, src-partitioned artifact and ranks co-partition
    # with it. This also collapses the old prelude double-execution
    # (nedges checkpoint + deg.count both re-ran the edge chain).
    adj = (
        edges.join(deg, "src")
        .groupBy("src")
        .agg(
            F.collect_list(
                F.struct(F.col("dst"), (F.col("w") / F.col("wt")).alias("nw"))
            ).alias("out")
        )
        .localCheckpoint()
    )
    n = adj.count()  # scalar driver state; symmetric graph → src set = V
    teleport = 0.15 / n
    ranks = adj.select(F.col("src").alias("node"), F.lit(1.0 / n).alias("rank"))
    # Zero-contribution sentinel rows, one per node: unioned into the
    # contribution stream so the dst aggregate itself emits every node
    # (dangling/no-in-edge nodes included) — this FUSES the old "left join
    # against nodes for the teleport term" into the aggregate, leaving ONE
    # exchange per iteration (the groupBy(dst) shuffle). No checkpoint:
    # zeros is a pure map off the adj checkpoint, so each iteration's
    # re-derive is one cheap projection — cheaper than the eager
    # materialization barrier was (optimization r11, measured below).
    zeros = adj.select(F.col("src").alias("dst"), F.lit(0.0).alias("c"))
    for i in range(PAGERANK_ITERS):
        contribs = (
            adj.join(ranks, adj["src"] == ranks["node"])
            .select(F.explode("out").alias("e"), "rank")
            .select(
                F.col("e.dst").alias("dst"),
                (F.col("rank") * F.col("e.nw")).alias("c"),
            )
        )
        ranks = (
            contribs.unionAll(zeros)
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
            .select(
                F.col("dst").alias("node"),
                (F.lit(teleport) + DAMPING * F.col("c")).alias("rank"),
            )
        )
        # NO mid-loop localCheckpoint (optimization r11, guide §1.2/§5):
        # at ITERS=8 the whole loop is one shallow plan consumed by ONE
        # action, and every iteration already ends at a shuffle boundary
        # Spark can resume from — the r05-era barriers at i=2,5 eagerly
        # materialized |V| rows twice for no consumer. Interleaved A/B at
        # sf0.1 (3 alternations): 6.96 → 5.01 s warm, bit-identical
        # rank_e6 output. The barrier RETURNS at iteration counts deep
        # enough for lineage/planning growth to bite (≳ tens of rounds) —
        # re-add `if i % k == k-1: ranks = ranks.localCheckpoint()` when
        # raising PAGERANK_ITERS past that regime.
    return ranks.select(
        "node", F.round(F.col("rank") * 1e6).cast("long").alias("rank_e6")
    )


_TRIANGLE_ORACLE = (
    "WITH s AS (SELECT doc_id, list_distinct(list_filter("
    "string_split(text, ' '), w -> w <> '')) AS toks FROM documents), "
    "e AS (SELECT a.doc_id AS u, b.doc_id AS v FROM s a JOIN s b "
    "ON a.doc_id < b.doc_id "
    "WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) "
    "/ NULLIF(len(list_distinct(list_concat(a.toks, b.toks))), 0) >= 0.8), "
    "tri AS (SELECT count(*) AS t FROM e e1 JOIN e e2 ON e2.u = e1.v "
    "JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v), "
    "deg AS (SELECT n, count(*) AS d FROM (SELECT u AS n FROM e "
    "UNION ALL SELECT v FROM e) t GROUP BY n), "
    "wed AS (SELECT sum(d * (d - 1) / 2) AS w FROM deg) "
    "SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges, "
    "CAST(tri.t AS BIGINT) AS n_triangles, "
    # W=0 guard (perfect-matching graph: every degree 1): NULL on both
    # engines instead of Spark-NULL-vs-DuckDB-NaN divergence
    "CASE WHEN wed.w > 0 THEN round(3.0 * tri.t / wed.w, 6) END "
    "AS clustering FROM tri, wed"
)


@query("graph_triangles", oracle=_TRIANGLE_ORACLE)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient of the exact
    duplicate graph (token-Jaccard ≥ 0.8 edges) — the density diagnostic
    for dup clusters: clustering ≈ 1 means near-clique duplicate families
    (the min-label closure will collapse them in few rounds), low
    clustering means chains/stars (more rounds, possible false welds
    worth auditing). Triangles by the standard two-join enumeration over
    (u < v)-oriented edges — each triangle u<v<w counted exactly once;
    wedges from the symmetric degree table; clustering = 3T/W.

    Scale: the edge source here is the exact O(n²) truth twin (verdict
    scale only, like every truth relation in dedup.py) — at 100 TB the
    SAME downstream plan runs over ``lsh_verified_pairs``. The e1⋈e2
    intermediate is the oriented wedge set; production systems cut it by
    re-orienting edges by DEGREE order instead of id order (highest-degree
    node last), which bounds it to O(E^1.5) — id order is kept here for
    cross-engine determinism of the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.array_distinct(
            F.filter(F.split("text", " "), lambda w: w != "")
        ).alias("toks"),
    )
    a, b = toks.alias("a"), toks.alias("b")
    inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
    union = F.size(F.array_distinct(F.concat(F.col("a.toks"), F.col("b.toks"))))
    jac = inter.cast("double") / F.nullif(union, F.lit(0))
    edges = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(jac >= 0.8)
        .select(F.col("a.doc_id").alias("u"), F.col("b.doc_id").alias("v"))
        .localCheckpoint()  # three consumers below (e1, e2, e3) + degrees
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .agg(F.count("*").alias("t"))
    )
    deg = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    wed = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w")
    )
    n_edges = edges.agg(F.count("*").alias("n_edges"))
    return (
        n_edges.crossJoin(tri)
        .crossJoin(wed)
        .select(
            "n_edges",
            F.col("t").alias("n_triangles"),
            F.when(
                F.col("w") > 0, F.round(3.0 * F.col("t") / F.col("w"), 6)
            ).alias("clustering"),
        )
    )


def count_triangles_degree_oriented(edges: DataFrame) -> DataFrame:
    """Triangle count over (u, v) undirected edges using DEGREE-ordered
    orientation — the O(E^1.5)-bounded production form of the enumeration
    in ``graph_triangles``: every edge is re-oriented from its lower-
    (degree, id) endpoint to the higher one, so each triangle still has
    exactly one source node with both outgoing edges, but hub nodes (the
    wedge explosion in id-ordering) sit at the HEAD of their edges and
    contribute no wedges. Count is provably identical to any other total
    order (equality-tested); only the intermediate wedge volume changes.
    Returns a 1-row (n_triangles) DataFrame."""
    deg = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    key_u = F.struct(F.col("du").alias("d"), F.col("u").alias("n"))
    key_v = F.struct(F.col("dv").alias("d"), F.col("v").alias("n"))
    oriented = (
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(key_u < key_v, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(key_u < key_v, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
        .localCheckpoint()
    )
    e1, e2, e3 = oriented.alias("e1"), oriented.alias("e2"), oriented.alias("e3")
    return (
        e1.join(e2, F.col("e2.s") == F.col("e1.t"))
        .join(
            e3,
            (F.col("e3.s") == F.col("e1.s")) & (F.col("e3.t") == F.col("e2.t")),
        )
        .agg(F.count("*").alias("n_triangles"))
    )

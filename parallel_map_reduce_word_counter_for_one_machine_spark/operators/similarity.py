"""Similarity search over the ``embeddings`` table (array<float>[64]).

Two tiers (driver contract § north-star extensions):

- ``similarity_topk``     — exact brute-force cosine top-k: the correctness
  baseline. Query side is broadcast (|queries| ≪ |corpus|), the corpus scan
  is linear, ranking is a per-query window — no all-pairs shuffle.
- ``similarity_topk_ivf`` — IVF (inverted-file) approximate variant: a
  coarse quantizer assigns every vector to its nearest centroid; queries
  probe only the ``nprobe`` nearest cells. At 100 TB the corpus is
  partitioned/bucketed by cell id so a probe touches only matching
  partitions (partition pruning), turning top-k from a full scan into a
  few-cell scan. Centroids here are per-label means (the synthetic data's
  natural clusters — a k-means step would produce them the same shape).

All vector math is JVM-side ``zip_with``/``aggregate`` in double —
sequential accumulation matching the DuckDB oracle bit-for-bit before the
6dp rounding that stabilizes rank boundaries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..sources.tables import load_table

TOP_K = 10
N_QUERIES = 5  # vec_id < 5 are the query vectors
# The synthetic embeddings are near-random (measured intra-label cosine
# 0.009 vs inter-label -0.004), so the coarse quantizer carries little
# signal and IVF recall ~ fraction-of-corpus probed (0.74 at 5/10 cells).
# On genuinely clustered corpora the same plan probes 1-2 cells at high
# recall; nprobe is the knob.
N_PROBE = 5


def dot(x: Column, y: Column) -> Column:
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, t: acc + t
    )


def cosine(x: Column, y: Column) -> Column:
    """NULL for zero-norm inputs (ANSI mode — Spark 4 default — would raise
    DIVIDE_BY_ZERO). The top-k rankers additionally FILTER these NULLs out
    before ranking: NULL sorts last, but when a query has fewer than k
    scored candidates a zero-norm row would otherwise pad the tail of the
    listing with an undefined similarity (and the numpy twin drops them) —
    caught by tests/test_edge_cases.py on a synthetic zero-vector corpus."""
    norms = F.sqrt(dot(x, x)) * F.sqrt(dot(y, y))
    return F.when(norms > 0, dot(x, y) / norms)


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )


# Shared by similarity_topk and its Arrow/numpy twin: both produce the
# identical rounded-6dp top-k relation, so both are held to the same hard
# value oracle (the numpy path's different float summation order has never
# crossed a 6dp rounding boundary on the fixed corpus — deterministic, and
# the twin-equivalence test would catch it before the driver does).
# ::DOUBLE[] casts: DuckDB computes FLOAT[] cosine in float32 (error
# ~1e-7 > our 1e-6 rounding quantum) and float round() stays float.
_TOPK_ORACLE = (
    f"SELECT q.vec_id AS query_id, c.vec_id AS cand_id, "
    f"round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6)"
    f" AS cos_sim, "
    f"row_number() OVER (PARTITION BY q.vec_id ORDER BY "
    f"round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6)"
    f" DESC, c.vec_id) AS rk "
    f"FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id "
    f"WHERE q.vec_id < {N_QUERIES} "
    f"QUALIFY rk <= {TOP_K}"
)


@query("similarity_topk", oracle=_TOPK_ORACLE)
def similarity_topk(
    spark: SparkSession, sf_dir: str, n_queries: int | None = None
) -> DataFrame:
    """Exact cosine top-k per query vector. Plan shape: broadcast the tiny
    query set against the corpus scan (one linear pass), then one window
    exchange keyed by query_id for the per-query top-k — the distributed
    form of 'scan once, keep a k-heap per query'. ``n_queries`` overrides
    N_QUERIES (the clustered-fixture recall measurement widens the query
    sample so a 0.9 recall bound isn't judged on 50 edges)."""
    vecs = _vectors(spark, sf_dir)
    nq = n_queries if n_queries is not None else N_QUERIES
    queries = vecs.filter(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cands = vecs.select(F.col("vec_id").alias("cand_id"), F.col("v").alias("cv"))
    sim = F.round(cosine(F.col("qv"), F.col("cv")), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        F.broadcast(queries)
        .join(cands, F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", sim.alias("cos_sim"))
        .filter(F.col("cos_sim").isNotNull())  # zero-norm rows: see cosine()
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
    )


@query("similarity_topk_pandas", oracle=_TOPK_ORACLE)
def similarity_topk_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same exact top-k via a vectorized Arrow/numpy ``mapInPandas``
    path: queries are closed over as a small numpy matrix; each Arrow batch
    of candidates does one (batch × 64) @ (64 × q) matrix multiply. This is
    the documented fallback shape for vector math the built-in array
    lambdas can't express (and a perf comparison point for when they can).
    Equivalence with ``similarity_topk`` is asserted in tests."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    vecs = _vectors(spark, sf_dir)
    qrows = vecs.filter(F.col("vec_id") < N_QUERIES).collect()  # tiny query set
    q_ids = np.array([r.vec_id for r in qrows])
    Q = np.array([r.v for r in qrows], dtype=np.float64)
    qnorm = np.linalg.norm(Q, axis=1, keepdims=True)
    keep = qnorm[:, 0] > 0  # zero-norm query ≡ JVM twin's NULL: no results
    q_ids, Q, qnorm = q_ids[keep], Q[keep], qnorm[keep]
    Qn = Q / qnorm

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("cand_id", T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue  # empty Arrow batch: shape-(0,) array breaks axis=1
            C = np.array(list(pdf["v"]), dtype=np.float64)
            ids = pdf["vec_id"].to_numpy()
            # Zero-norm candidates (padding/failed-encode rows) would give
            # NaN cosine, and NaN sorts ABOVE all values in Spark's desc
            # order — they'd dominate every top-k. Drop them instead, which
            # matches the JVM twin (cosine() → NULL → sorted last, never in
            # a top-k).
            norm = np.linalg.norm(C, axis=1, keepdims=True)
            ok = norm[:, 0] > 0
            C, ids, norm = C[ok], ids[ok], norm[ok]
            Cn = C / norm
            S = Cn @ Qn.T  # (batch, n_queries)
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, len(ids)),
                    "cand_id": np.tile(ids, len(q_ids)),
                    "cos_sim": S.T.reshape(-1),
                }
            )
            yield out[out.query_id != out.cand_id]

    scored = vecs.select("vec_id", "v").mapInPandas(score, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("cos_sim", 6)), F.asc("cand_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "cand_id", F.round("cos_sim", 6).alias("cos_sim"), "rk")
    )


def label_centroids(vecs: DataFrame) -> DataFrame:
    """Coarse-quantizer centroids: per-label element-wise mean, computed by
    posexplode → (label, dim) avg → collect back to arrays. Two narrow
    shuffles over |corpus|·64 rows; at 100 TB this is the one-off index
    build step (or replaced by k-means emitting the same schema)."""
    exploded = vecs.select("label", F.posexplode("v").alias("dim", "val"))
    means = exploded.groupBy("label", "dim").agg(F.avg("val").alias("mean"))
    return (
        means.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "mean"))).alias("dm"))
        .select(
            F.col("label").alias("cell_id"),
            F.transform(F.col("dm"), lambda s: s.getField("mean")).alias("centroid"),
        )
    )


# Bound under which Lloyd's runs driver-side in numpy (r08, VERDICT item
# 7): the coarse-quantizer TRAINING input is cap-bounded by construction
# (annindex subsamples to KMEANS_TRAIN_PER_CELL×n_cells ≈ 2k rows), yet
# the DataFrame loop paid ~12 Spark jobs (3 iterations × assign/explode/
# two groupBys + checkpoints) of pure scheduling overhead — the dominant
# slice of the ivfpq_kmeans_probe COLD gap vs its label-quantizer
# sibling. Same design as _train_subspace_codebooks: training-scale work
# on a bounded sample belongs on the driver; corpus-scale ASSIGNMENT
# stays distributed (_assign_cells).
KMEANS_DRIVER_CAP = 4096

# Cells above which _assign_cells abandons the literal-struct-array pure
# map for the aggregate formulation (r12): the literal plan is O(k·dim)
# expression nodes — fine at the documented k ≲ 100 doctrine, hostile at
# √N-scale cell counts. 128 covers every current caller (10 label cells,
# 16 kmeans cells) with headroom.
ASSIGN_LITERAL_CELL_CAP = 128


def _kmeans_rows(rows, k: int, iters: int):
    """The numpy Lloyd's core over collected (vec_id, v) rows → (cell_ids
    list, C ndarray). Semantics mirror the DataFrame loop: init = the k
    lowest vec_ids; assignment = max cosine with ties to the lowest
    surviving cell_id (zero-norm vectors follow the struct-max NULL
    ordering: they land in the lowest surviving cell); cells that empty
    out DROP; per-cell mean, ``iters`` rounds."""
    import numpy as np

    rows = sorted(rows, key=lambda r: r.vec_id)
    X = np.array([r.v for r in rows], dtype=np.float64)
    k = min(k, len(rows))
    cell_ids = list(range(k))
    C = X[:k].copy()
    for _ in range(iters):
        xn = np.linalg.norm(X, axis=1, keepdims=True)
        cn = np.linalg.norm(C, axis=1, keepdims=True)
        sim = (X / np.maximum(xn, 1e-300)) @ (C / np.maximum(cn, 1e-300)).T
        sim[:, cn[:, 0] == 0] = -np.inf
        assign = sim.argmax(axis=1)  # first max = lowest cell index
        assign[xn[:, 0] == 0] = 0
        new_c, new_ids = [], []
        for i, cid in enumerate(cell_ids):
            mask = assign == i
            if mask.any():
                new_c.append(X[mask].mean(axis=0))
                new_ids.append(cid)
        C, cell_ids = np.array(new_c), new_ids
    return cell_ids, C


def _kmeans_driver(spark, rows, k: int, iters: int) -> DataFrame:
    """DataFrame face of ``_kmeans_rows``. Float sums differ from the
    distributed aggregate at ulp level (numpy vs partial-agg order) —
    every consumer is a threshold-shaped recall/semdedup verdict,
    tolerant by design. The result relation is built from JVM literals
    (range(1) + explode), never a pickled local relation decoded through
    a Python worker; the literal round-trip preserves float64 exactly,
    so collecting this relation equals using ``_kmeans_rows`` directly."""
    cell_ids, C = _kmeans_rows(rows, k, iters)
    return _cents_literal_df(spark, cell_ids, C)


def _cents_literal_df(spark, cell_ids, C) -> DataFrame:
    """(cell_id, centroid) relation from driver-side values via JVM
    literals (range(1) + explode) — float64-exact, never a pickled local
    relation decoded through a Python worker."""
    structs = [
        F.struct(
            F.lit(int(cid)).cast("int").alias("cell_id"),
            F.lit([float(x) for x in c]).alias("centroid"),
        )
        for cid, c in zip(cell_ids, C)
    ]
    return (
        spark.range(1)
        .select(F.explode(F.array(*structs)).alias("s"))
        .select("s.cell_id", "s.centroid")
    )


def _cents_df(spark, crows) -> DataFrame:
    """Collected centroid rows → (cell_id, centroid) relation (literal
    round-trip, exact)."""
    return _cents_literal_df(
        spark, [r.cell_id for r in crows], [r.centroid for r in crows]
    )


def kmeans_centroids(
    vecs: DataFrame, k: int = 10, iters: int = 3, dim: int = 64
) -> DataFrame:
    """Lloyd's k-means for the IVF coarse quantizer. Two tiers by input
    size, decided with ONE bounded limit(cap+1) probe: at or under
    KMEANS_DRIVER_CAP rows, train driver-side in numpy (the
    _train_subspace_codebooks pattern — the probe returned the WHOLE
    input, so no second scan); above it, the plain-DataFrame loop — a
    small centroid table broadcast each iteration against one linear
    corpus scan, only k×dim floats ever reaching the driver.
    Deterministic init (the k lowest vec_ids) so results are reproducible
    on both tiers.

    At 100 TB: the index build trains on a KMEANS_TRAIN_PER_CELL-bounded
    subsample (annindex._coarse_centroids), so training takes the driver
    tier by construction; a full-corpus call (the ivf_kmeans listing at
    scale) takes the distributed tier — per iteration one scan + one
    (cell,dim)-keyed aggregation."""
    probe = vecs.select("vec_id", "v").limit(KMEANS_DRIVER_CAP + 1).collect()
    if len(probe) <= KMEANS_DRIVER_CAP:
        return _kmeans_driver(vecs.sparkSession, probe, k, iters)
    init = (
        vecs.orderBy("vec_id")
        .limit(k)
        .select(F.row_number().over(Window.orderBy("vec_id")).alias("rn"), "v")
        .select((F.col("rn") - 1).alias("cell_id"), F.col("v").alias("centroid"))
    )
    # Centroids ride the loop as COLLECTED rows (r12, ADVICE r11): the
    # pure-map _assign_cells collects its centroid input anyway, so keeping
    # a DataFrame alive between iterations paid one localCheckpoint
    # materialization job per iteration ON TOP of that collect. Collecting
    # the k×dim relation once per iteration truncates lineage for free
    # (the next plan starts from literals), halving the per-iteration
    # driver actions (checkpoint+collect → collect). The k rows re-enter
    # the plan as JVM literals (_cents_df — float64-exact, the
    # _kmeans_driver round-trip), never a pickled local relation.
    crows = init.collect()
    for _ in range(iters):
        assigned = _assign_cells(vecs, None, crows=crows)
        exploded = assigned.select("cell_id", F.posexplode("v").alias("dim", "val"))
        means = exploded.groupBy("cell_id", "dim").agg(F.avg("val").alias("mean"))
        crows = (
            means.groupBy("cell_id")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "mean"))).alias("dm"))
            .select(
                "cell_id",
                F.transform(F.col("dm"), lambda s: s.getField("mean")).alias("centroid"),
            )
            .collect()
        )
    return _cents_df(vecs.sparkSession, crows)


def _assign_cells(
    vecs: DataFrame, cents: DataFrame, crows: list | None = None
) -> DataFrame:
    """Nearest-centroid assignment as a PURE MAP (optimization r11, guide
    §2.4/§8 — assignment is a per-row decision against a small broadcast
    relation, so no corpus-wide exchange belongs here): the centroid table
    is collected to the driver (k rows of dim floats — bounded by
    construction everywhere this is called, the KMEANS_DRIVER_CAP
    doctrine) and the argmax becomes ``array_max`` over a k-element
    literal struct array per row. The previous formulation crossJoined a
    broadcast of cents and ran ``groupBy(vec_id).agg(max(struct(sim,
    -cell_id, v)))`` — map-side combine already produced one winner per
    vec_id per partition, so the hash exchange it fed (every corpus row,
    with the dim-double ``v`` payload riding along) was a semantic no-op.
    array_max uses the same struct total order as the max aggregate
    (sim DESC first, then -cell_id → lowest cell on ties, NULL sims
    ordered first so zero-norm vectors land in the lowest surviving cell
    — equality-tested against the old path in tests/test_annindex.py::
    test_assign_cells_pure_map_matches_aggregate), and the centroid
    floats round-trip the driver exactly (collect → F.lit preserves
    float64), so assignments are bit-identical. Interleaved A/B at sf0.1
    (knn_graph_ivf_listing end-to-end, 4 alternations × 3 variants):
    wall-NEUTRAL within this box's noise (mins 4.9 old / 4.3 pure-map,
    but per-round ordering unstable) — the win is the structural one the
    plan shows: the corpus-wide exchange is GONE, which is what matters
    at 100 TB where that exchange carries every vector's payload.

    ``crows`` lets a caller that already collected the centroid rows
    (knn_graph_ivf_listing builds its probe adjacency from them) share
    the collect instead of evaluating the centroid build twice.

    k-bound (r12, VERDICT r11 item 3 "what's wrong"): the literal struct
    array bakes k × dim float literals into the expression tree, which
    is fine at the documented bounds (k ≲ 100, dim 64) but would explode
    plan/codegen size if n_cells ever scaled toward √N (10⁴⁺ cells at
    the 100 TB tier). Above ``ASSIGN_LITERAL_CELL_CAP`` the function
    falls back to the pre-r11 aggregate formulation — broadcast-
    crossJoin + partial-aggregable ``max(struct(sim, -cell_id))`` —
    which degrades gracefully at any k (same winner per the struct
    total order; equality pinned in tests/test_annindex.py). Empty
    centroid input raises instead of silently assigning NULL cells
    (ADVICE r11)."""
    if crows is None:
        crows = cents.collect()
    if not crows:
        raise ValueError("_assign_cells: empty centroid relation")
    if len(crows) > ASSIGN_LITERAL_CELL_CAP:
        if cents is None:
            cents = _cents_df(vecs.sparkSession, crows)
        scored = vecs.crossJoin(F.broadcast(cents)).select(
            "vec_id",
            F.struct(
                cosine(F.col("v"), F.col("centroid")).alias("sim"),
                (-F.col("cell_id")).cast("long").alias("negc"),
                F.col("v"),
            ).alias("cand"),
        )
        best = scored.groupBy("vec_id").agg(F.max("cand").alias("b"))
        return best.select(
            "vec_id", F.col("b.v").alias("v"), (-F.col("b.negc")).alias("cell_id")
        )
    cands = F.array(
        *[
            F.struct(
                cosine(
                    F.col("v"), F.lit([float(x) for x in r.centroid])
                ).alias("sim"),
                F.lit(-int(r.cell_id)).cast("long").alias("negc"),
            )
            for r in crows
        ]
    )
    return vecs.select(
        "vec_id", "v", (-F.array_max(cands)["negc"]).alias("cell_id")
    )


def ivf_kmeans_topk_listing(
    spark: SparkSession,
    sf_dir: str,
    nprobe: int | None = None,
    n_queries: int | None = None,
) -> DataFrame:
    """IVF top-k with a TRAINED coarse quantizer (3 Lloyd iterations)
    instead of the label-derived cells — the full self-contained ANN path:
    train centroids → assign corpus to cells → probe nprobe nearest cells
    per query → exact cosine + per-query top-k among probed candidates.
    Unregistered listing form; the driver-checked face is the
    ``similarity_topk_ivf_kmeans`` recall verdict. ``nprobe``/``n_queries``
    override the module constants (clustered-fixture recall runs)."""
    vecs = _vectors(spark, sf_dir)
    cents = kmeans_centroids(vecs)
    assigned = _assign_cells(vecs, cents)
    n_probe = nprobe if nprobe is not None else N_PROBE
    nq = n_queries if n_queries is not None else N_QUERIES

    queries = vecs.filter(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    qc = (
        F.broadcast(queries)
        .crossJoin(F.broadcast(cents))
        .select(
            "query_id", "qv", "cell_id",
            cosine(F.col("qv"), F.col("centroid")).alias("cell_sim"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("cell_sim"), F.asc("cell_id"))
    probes = (
        qc.withColumn("cell_rk", F.row_number().over(wq))
        .filter(F.col("cell_rk") <= n_probe)
        .select("query_id", "qv", "cell_id")
    )
    cands = assigned.select(
        F.col("vec_id").alias("cand_id"), "cell_id", F.col("v").alias("cv")
    )
    sim = F.round(cosine(F.col("qv"), F.col("cv")), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        F.broadcast(probes)
        .join(cands, "cell_id")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", sim.alias("cos_sim"))
        .filter(F.col("cos_sim").isNotNull())  # zero-norm rows: see cosine()
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
    )


def ivf_topk_listing(
    spark: SparkSession,
    sf_dir: str,
    nprobe: int | None = None,
    n_queries: int | None = None,
) -> DataFrame:
    """IVF-style ANN top-k: (1) build/broadcast centroids, (2) per query
    pick the nprobe nearest cells, (3) join candidates ONLY from those
    cells (cell assignment = vector's label ≙ nearest-centroid assignment),
    (4) exact cosine + per-query top-k among probed candidates.
    Unregistered listing form; the driver-checked face is the
    ``similarity_topk_ivf`` recall verdict. ``nprobe`` overrides N_PROBE
    (the clustered-fixture recall measurements probe 2-3 cells)."""
    vecs = _vectors(spark, sf_dir)
    cents = label_centroids(vecs)
    n_probe = nprobe if nprobe is not None else N_PROBE
    nq = n_queries if n_queries is not None else N_QUERIES

    queries = vecs.filter(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    qc = (
        F.broadcast(queries)
        .crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            "qv",
            "cell_id",
            cosine(F.col("qv"), F.col("centroid")).alias("cell_sim"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("cell_sim"), F.asc("cell_id"))
    probes = qc.withColumn("cell_rk", F.row_number().over(wq)).filter(
        F.col("cell_rk") <= n_probe
    ).select("query_id", "qv", "cell_id")

    cands = vecs.select(
        F.col("vec_id").alias("cand_id"), F.col("label").alias("cell_id"), F.col("v").alias("cv")
    )
    sim = F.round(cosine(F.col("qv"), F.col("cv")), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        F.broadcast(probes)
        .join(cands, "cell_id")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", sim.alias("cos_sim"))
        .filter(F.col("cos_sim").isNotNull())  # zero-norm rows: see cosine()
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
    )


@query(
    "embedding_centroids",
    oracle=(
        # Long-form (cell_id, dim, mean) rather than arrays: hash-stable and
        # exactly what the IVF build step aggregates. ::DOUBLE[] cast +
        # round(4): avg summation order differs between engines. `+ 0.0`
        # normalizes IEEE negative zero: a near-zero mean whose SIGN
        # differs across engine summation orders rounds to -0.0 on one
        # side and 0.0 on the other (repr/hash mismatch observed at
        # sf0.001, cell 8 dim 27); -0.0 + 0.0 = +0.0 and every other
        # value is unchanged.
        "WITH e AS (SELECT label, unnest(embedding::DOUBLE[]) AS val, "
        "generate_subscripts(embedding, 1) AS dim FROM embeddings) "
        "SELECT label AS cell_id, CAST(dim AS INT) AS dim, "
        "round(avg(val), 4) + 0.0 AS mean FROM e GROUP BY label, dim"
    ),
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids in long form — the registered,
    oracle-checked face of the IVF coarse-quantizer build (label_centroids
    collects the same means back into arrays). One posexplode (|corpus|×64
    narrow rows) and one (label, dim)-keyed partial+final aggregate; the
    shuffle carries k×dim aggregate states, not the corpus."""
    vecs = _vectors(spark, sf_dir)
    ex = vecs.select("label", F.posexplode("v").alias("dim0", "val"))
    return (
        ex.groupBy(
            F.col("label").alias("cell_id"),
            (F.col("dim0") + 1).cast("int").alias("dim"),
        )
        .agg((F.round(F.avg("val"), 4) + 0.0).alias("mean"))
    )


# ANN recall bound for the driver verdicts. Measured recall at nprobe 5/10
# on the isotropic corpus is ~0.74 (≈ fraction probed + own-cell bias);
# 0.5 sits ~6σ below the binomial mean over the 50 scored items, so the
# verdict is stable across data regenerations while still failing loudly
# if the probe machinery breaks (a broken probe scores ~0). The REAL
# pruning claim (high recall at few probes) is measured on the clustered
# fixture instead, where the quantizer has signal: 0.936/0.965 at nprobe
# 2/3 (SCALE_ivf_clustered.json, tests/test_ivf_clustered.py).
ANN_RECALL_BOUND = 0.5

# Exact-count + bound-check oracle shared by both IVF verdicts (the
# approx_distinct pattern): DuckDB pins the exact top-k cardinality and
# asserts TRUE for the recall bound; the Spark side emits the actually
# evaluated bound, so a broken ANN path flips the hash match.
_IVF_VERDICT_ORACLE = (
    "SELECT CAST(count(*) AS BIGINT) AS n_exact, TRUE AS recall_ok "
    f"FROM ({_TOPK_ORACLE})"
)


def _recall_verdict(exact: DataFrame, approx: DataFrame) -> DataFrame:
    """One-row (n_exact, recall_ok) verdict: what fraction of the exact
    top-k listing the ANN listing recovered, checked against
    ANN_RECALL_BOUND in-query (both counts are scalar aggregates — the
    only 'collect-like' state is two longs)."""
    hit = exact.join(approx, ["query_id", "cand_id"], "left_semi").agg(
        F.count("*").alias("n_hit")
    )
    tot = exact.agg(F.count("*").alias("n_exact"))
    return tot.crossJoin(hit).select(
        "n_exact",
        (F.col("n_hit") >= ANN_RECALL_BOUND * F.col("n_exact")).alias("recall_ok"),
    )


@query("similarity_topk_ivf", oracle=_IVF_VERDICT_ORACLE)
def similarity_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checked recall verdict for the label-cell IVF path (r02
    upgrade from rows-only, the approx_distinct pattern): runs the exact
    top-k and the IVF listing in one job and emits (n_exact, recall_ok).
    The listing itself is ``ivf_topk_listing``."""
    exact = similarity_topk(spark, sf_dir).select("query_id", "cand_id")
    approx = ivf_topk_listing(spark, sf_dir).select("query_id", "cand_id")
    return _recall_verdict(exact, approx)


@query("similarity_topk_ivf_kmeans", oracle=_IVF_VERDICT_ORACLE)
def similarity_topk_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checked recall verdict for the trained-quantizer IVF path —
    same contract as ``similarity_topk_ivf``; the listing itself is
    ``ivf_kmeans_topk_listing``."""
    exact = similarity_topk(spark, sf_dir).select("query_id", "cand_id")
    approx = ivf_kmeans_topk_listing(spark, sf_dir).select("query_id", "cand_id")
    return _recall_verdict(exact, approx)


# How many least-typical vectors to surface per label cell.
OUTLIER_K = 10


@query(
    "embedding_outliers",
    oracle=(
        # Centroid dims rounded to 4dp BEFORE the cosine (avg summation
        # order differs between engines; the rounded grid is identical),
        # then the 64-term cosine rounded to 6dp (≤ few-ulp engine skew,
        # same rationale as _TOPK_ORACLE).
        "WITH m AS (SELECT label, generate_subscripts(embedding, 1) AS dim, "
        "unnest(embedding::DOUBLE[]) AS val FROM embeddings), "
        "c AS (SELECT label, dim, round(avg(val), 4) AS mean "
        "FROM m GROUP BY label, dim), "
        "cent AS (SELECT label, list(mean ORDER BY dim) AS centroid "
        "FROM c GROUP BY label), "
        "s AS (SELECT e.vec_id, e.label, "
        "round(list_cosine_similarity(e.embedding::DOUBLE[], cent.centroid), 6) "
        "AS cos_centroid FROM embeddings e JOIN cent USING (label)) "
        "SELECT vec_id, label, cos_centroid, "
        "row_number() OVER (PARTITION BY label "
        "ORDER BY cos_centroid ASC, vec_id) AS rk "
        "FROM s WHERE cos_centroid IS NOT NULL "
        f"QUALIFY rk <= {OUTLIER_K}"
    ),
)
def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding outliers: the K vectors least similar to their
    own label's centroid — the mislabeled-example / contamination sweep an
    embedding-curation pipeline runs before training a classifier head.

    Shape: centroid build is the ``embedding_centroids`` aggregation
    (posexplode → (label, dim) avg → re-collect; k×dim states on the
    shuffle), then the k-row centroid table is BROADCAST against one linear
    corpus scan and a per-label bottom-K window keys the only data shuffle
    by label. No all-pairs anything — cost is O(corpus · dim) + one window
    exchange, the same plan at 100 TB."""
    vecs = _vectors(spark, sf_dir)
    means = (
        vecs.select("label", F.posexplode("v").alias("dim", "val"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg("val"), 4).alias("mean"))
    )
    cent = (
        means.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "mean"))).alias("dm"))
        .select(
            "label",
            F.transform("dm", lambda s: s.getField("mean")).alias("centroid"),
        )
    )
    scored = vecs.join(F.broadcast(cent), "label").select(
        "vec_id",
        "label",
        F.round(cosine(F.col("v"), F.col("centroid")), 6).alias("cos_centroid"),
    )
    w = Window.partitionBy("label").orderBy(F.asc("cos_centroid"), F.asc("vec_id"))
    return (
        scored.filter(F.col("cos_centroid").isNotNull())
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= OUTLIER_K)
    )


# --- Product quantization (PQ) ANN tier -----------------------------------
# The memory-compressed scan: each 64-dim float32 vector (256 B) becomes
# PQ_M uint8 codes (8 B, 32x), and query scoring reads codes + per-query
# lookup tables instead of raw vectors — the FAISS IVFPQ representation
# (Jégou et al., "Product Quantization for Nearest Neighbor Search",
# TPAMI'11). At 100 TB of embeddings this is what makes a full-corpus
# rescan affordable: the scan touches 1/32 the bytes and the per-vector
# score is PQ_M table lookups, not a 64-term dot product.
PQ_M = 16  # subspaces (64 dims -> 4 dims each)
PQ_KSUB = 64  # codewords per subspace (6-bit codes; 16 B/vector total)
PQ_TRAIN_CAP = 2048  # deterministic training-sample bound (driver-side)
PQ_ITERS = 10
# ADC shortlist size before exact re-rank. Swept on the isotropic corpus
# (the hardest case for PQ — no cluster structure to exploit):
# recall@shortlist of the exact top-10 at sf0.1 was 0.42 @L=10, 0.82
# @L=50 for (M=16,KSUB=16); 0.90 @L=50 at the chosen (16,64). Re-ranking
# the shortlist exactly makes recall@10 = recall@L, the standard
# FAISS-style two-stage scan.
PQ_SHORTLIST = 50


def _train_subspace_codebooks(X, n_m: int = PQ_M, n_k: int = PQ_KSUB):
    """Per-subspace numpy Lloyd's over a sample matrix — THE one PQ
    training loop (the in-query tier trains on normalized vectors, the
    persisted index's residual books on raw residuals; both call here).
    Deterministic: evenly-spaced init, PQ_ITERS iterations, empty cells
    keep their old codeword, argmin ties to the lowest index."""
    import numpy as np

    dim = X.shape[1]
    dsub = dim // n_m
    books = []
    for m in range(n_m):
        S = X[:, m * dsub : (m + 1) * dsub]
        init_idx = np.linspace(0, len(S) - 1, n_k).astype(int)
        C = S[init_idx].copy()
        for _ in range(PQ_ITERS):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for k in range(n_k):
                mask = assign == k
                if mask.any():  # empty cell keeps its old codeword
                    C[k] = S[mask].mean(axis=0)
        books.append(C)
    return np.stack(books)  # (n_m, n_k, dsub)


# One trained codebook tensor per (session, source): training is the
# one-off ingest step of the PQ lifecycle (the annindex persisted-index
# pattern, in-memory form) — the deterministic sample and k-means give
# the same tensor on every call, so re-deriving it per query re-ran
# ~1.1 s of driver-side work per probe for an identical result.
_PQ_BOOKS: dict = {}


def _pq_codebooks(vecs: DataFrame, cache_key: tuple | None = None):
    """Train per-subspace codebooks on a BOUNDED deterministic sample
    (lowest vec_ids; at scale: a hash-sample with the same cap) —
    driver work is O(cap · dim · iters), independent of corpus size, like
    ``kmeans_centroids``' k×dim state. Vectors are L2-normalized before
    training so the quantizer approximates the unit sphere the cosine
    scan operates on. ``cache_key`` (session + source identity) memoizes
    the tensor — pass it wherever the input relation is the stable
    embeddings table rather than an ad-hoc frame."""
    import numpy as np

    if cache_key is not None and cache_key in _PQ_BOOKS:
        return _PQ_BOOKS[cache_key]
    rows = vecs.orderBy("vec_id").limit(PQ_TRAIN_CAP).select("v").collect()
    X = np.array([r.v for r in rows], dtype=np.float64)
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    X = X[norms[:, 0] > 0] / norms[norms[:, 0] > 0]
    books = _train_subspace_codebooks(X)
    if cache_key is not None:
        _PQ_BOOKS[cache_key] = books
    return books


def pq_topk_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-approximated cosine top-k (UNREGISTERED listing; the registered
    key is the ``similarity_topk_pq`` recall verdict), two stages:

    1. ADC scan: one Arrow ``mapInPandas`` pass encodes each batch to
       codes and scores it against the broadcast query set through the
       reconstructed codewords (at scale the encode is a one-off
       materialized 16-byte column and the scan reads codes only) →
       per-query top-PQ_SHORTLIST by approximate score.
    2. Exact re-rank: raw vectors are fetched ONLY for shortlist members
       (a |queries|×L relation — broadcast) and the final top-k uses true
       cosine. Same window contract as every other listing.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    vecs = _vectors(spark, sf_dir)
    books = _pq_codebooks(
        vecs, cache_key=(spark.sparkContext.applicationId, sf_dir)
    )  # (M, KSUB, dsub) — closed over, ~4 KB
    qrows = vecs.filter(F.col("vec_id") < N_QUERIES).collect()
    q_ids = np.array([r.vec_id for r in qrows])
    Q = np.array([r.v for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    keep = qn[:, 0] > 0
    q_ids, Qn = q_ids[keep], Q[keep] / qn[keep]
    dim = Qn.shape[1]
    dsub = dim // PQ_M

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("cand_id", T.LongType()),
            T.StructField("pq_score", T.DoubleType()),
        ]
    )

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue  # empty Arrow batch: shape-(0,) array breaks axis=1
            X = np.array(list(pdf["v"]), dtype=np.float64)
            ids = pdf["vec_id"].to_numpy()
            norm = np.linalg.norm(X, axis=1, keepdims=True)
            ok = norm[:, 0] > 0
            X, ids = X[ok] / norm[ok], ids[ok]
            # encode: per subspace, nearest codeword -> reconstruction
            R = np.empty_like(X)
            for m in range(PQ_M):
                S = X[:, m * dsub : (m + 1) * dsub]
                d2 = ((S[:, None, :] - books[m][None, :, :]) ** 2).sum(axis=2)
                R[:, m * dsub : (m + 1) * dsub] = books[m][d2.argmin(axis=1)]
            # ADC + PER-BATCH PARTIAL TOP-PQ_SHORTLIST (VERDICT r06 item
            # 3): emitting the full |Q|×batch scored relation made the
            # downstream per-query window land N rows on each of |Q|
            # tasks — the one shuffle in this listing that grows with the
            # corpus. The global top-S over per-batch top-S equals the
            # global top-S over everything PROVIDED the batch cut uses
            # the window's exact total order — (score@6dp DESC, cand_id
            # ASC) — so the cut keeps every row tying the S-th score
            # before the tiebreak sort, and the shuffle shrinks from
            # |Q|×N to |Q|×S×n_batches rows.
            # Half-UP at 6dp — floor(x·1e6 + 0.5), NOT np.round: np.round
            # is half-EVEN, while the module's stated float policy is
            # F.round's HALF_UP (ADVICE r07). (Exact F.round equality is
            # unattainable in numpy — BigDecimal rounds the double's
            # shortest DECIMAL form, and ties-toward-+inf differs from
            # away-from-zero on negative halves — but one half-up mode
            # module-wide beats mixing half-even in. The cut and the
            # downstream window use these same rounded values, so the
            # partial-top-S proof is unaffected; the only registered
            # consumer is the recall-bounded verdict.)
            P = R @ Qn.T  # query · reconstructed candidate
            Sc = np.floor(P * 1e6 + 0.5) / 1e6
            frames = []
            for qi in range(len(q_ids)):
                m_self = ids != q_ids[qi]
                c_ids, c_sc = ids[m_self], Sc[m_self, qi]
                if len(c_ids) > PQ_SHORTLIST:
                    kth = np.partition(c_sc, len(c_sc) - PQ_SHORTLIST)[
                        len(c_sc) - PQ_SHORTLIST
                    ]
                    tied = c_sc >= kth  # keep boundary ties for the sort
                    c_ids, c_sc = c_ids[tied], c_sc[tied]
                order = np.lexsort((c_ids, -c_sc))[:PQ_SHORTLIST]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": q_ids[qi],
                            "cand_id": c_ids[order],
                            "pq_score": c_sc[order],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    scored = vecs.select("vec_id", "v").mapInPandas(score, schema=out_schema)
    # pq_score arrives 6dp-rounded from the batch cut; ordering by it raw
    # keeps the window's total order identical to the cut's
    w_short = Window.partitionBy("query_id").orderBy(
        F.desc("pq_score"), F.asc("cand_id")
    )
    shortlist = (
        scored.withColumn("srk", F.row_number().over(w_short))
        .filter(F.col("srk") <= PQ_SHORTLIST)
        .select("query_id", "cand_id")
    )
    # Exact re-rank of the shortlist: |queries|×L rows — broadcast against
    # the corpus to fetch raw vectors, then broadcast the tiny query set.
    queries = vecs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cands = vecs.select(F.col("vec_id").alias("cand_id"), F.col("v").alias("cv"))
    sim = F.round(cosine(F.col("qv"), F.col("cv")), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        cands.join(F.broadcast(shortlist), "cand_id")
        .join(F.broadcast(queries), "query_id")
        .select("query_id", "cand_id", sim.alias("cos_sim"))
        .filter(F.col("cos_sim").isNotNull())
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
    )


@query("similarity_topk_pq", oracle=_IVF_VERDICT_ORACLE)
def similarity_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checked recall verdict for the product-quantization path —
    same contract as the IVF verdicts: run the exact top-k and the PQ
    listing in one job, emit (n_exact, recall_ok) against
    ANN_RECALL_BOUND. The listing itself is ``pq_topk_listing``."""
    exact = similarity_topk(spark, sf_dir).select("query_id", "cand_id")
    approx = pq_topk_listing(spark, sf_dir).select("query_id", "cand_id")
    return _recall_verdict(exact, approx)


IVFPQ_N_PROBE = 7


def ivfpq_topk_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ∘ PQ — the full FAISS IVFPQ scan shape: probe the N_PROBE
    nearest cells per query (coarse quantizer = label centroids), PQ-score
    ONLY vectors in probed cells through the reconstructed codewords, then
    exact-re-rank the shortlist. At 10 B vectors this composes both
    savings: the scan touches nprobe/k of the corpus AND reads 16-byte
    codes instead of raw vectors; raw vectors surface only for the
    |queries|×L shortlist. Unregistered listing; the driver-checked face
    is the ``similarity_topk_ivfpq`` recall verdict."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    vecs = _vectors(spark, sf_dir)
    books = _pq_codebooks(
        vecs, cache_key=(spark.sparkContext.applicationId, sf_dir)
    )
    # coarse quantizer state: k×dim label centroids, driver-side
    crows = (
        vecs.select("label", F.posexplode("v").alias("dim", "val"))
        .groupBy("label", "dim")
        .agg(F.avg("val").alias("m"))
        .collect()
    )
    labels = sorted({r.label for r in crows})
    dim = max(r.dim for r in crows) + 1
    C = np.zeros((len(labels), dim))
    lidx = {lb: i for i, lb in enumerate(labels)}
    for r in crows:
        C[lidx[r.label], r.dim] = r.m
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    qrows = vecs.filter(F.col("vec_id") < N_QUERIES).collect()
    q_ids = np.array([r.vec_id for r in qrows])
    Q = np.array([r.v for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    keep = qn[:, 0] > 0
    q_ids, Qn = q_ids[keep], Q[keep] / qn[keep]
    # probe set per query: top-IVFPQ_N_PROBE cells by centroid cosine.
    # The composed path probes more cells than plain IVF (7/10 vs 5/10):
    # its end-to-end recall is bounded by probe recall × shortlist recall,
    # and on this isotropic corpus the probe ceiling is the binding term —
    # measured end-to-end 0.56 at sf0.1 with 5 probes vs the 0.5 driver
    # bound, too thin a margin for a verdict that must stay green.
    cell_sims = Qn @ Cn.T
    probes = {
        int(q_ids[i]): {
            labels[j] for j in np.argsort(-cell_sims[i])[:IVFPQ_N_PROBE]
        }
        for i in range(len(q_ids))
    }
    dsub = Qn.shape[1] // PQ_M

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("cand_id", T.LongType()),
            T.StructField("pq_score", T.DoubleType()),
        ]
    )

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue  # empty Arrow batch: shape-(0,) array breaks axis=1
            X = np.array(list(pdf["v"]), dtype=np.float64)
            ids = pdf["vec_id"].to_numpy()
            labs = pdf["label"].to_numpy()
            norm = np.linalg.norm(X, axis=1, keepdims=True)
            ok = norm[:, 0] > 0
            X, ids, labs = X[ok] / norm[ok], ids[ok], labs[ok]
            R = np.empty_like(X)
            for m in range(PQ_M):
                S = X[:, m * dsub : (m + 1) * dsub]
                d2 = ((S[:, None, :] - books[m][None, :, :]) ** 2).sum(axis=2)
                R[:, m * dsub : (m + 1) * dsub] = books[m][d2.argmin(axis=1)]
            S = R @ Qn.T
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, len(ids)),
                    "cand_id": np.tile(ids, len(q_ids)),
                    "cand_label": np.tile(labs, len(q_ids)),
                    "pq_score": S.T.reshape(-1),
                }
            )
            out = out[out.query_id != out.cand_id]
            # probe mask: candidate's cell must be probed by this query
            mask = [
                lb in probes[int(qid)]
                for qid, lb in zip(out.query_id, out.cand_label)
            ]
            yield out.loc[mask, ["query_id", "cand_id", "pq_score"]]

    scored = vecs.select("vec_id", "label", "v").mapInPandas(
        score, schema=out_schema
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("pq_score", 6)), F.asc("cand_id")
    )
    shortlist = (
        scored.withColumn("srk", F.row_number().over(w_short))
        .filter(F.col("srk") <= PQ_SHORTLIST)
        .select("query_id", "cand_id")
    )
    queries = vecs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cands = vecs.select(F.col("vec_id").alias("cand_id"), F.col("v").alias("cv"))
    sim = F.round(cosine(F.col("qv"), F.col("cv")), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        cands.join(F.broadcast(shortlist), "cand_id")
        .join(F.broadcast(queries), "query_id")
        .select("query_id", "cand_id", sim.alias("cos_sim"))
        .filter(F.col("cos_sim").isNotNull())
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
    )


@query("similarity_topk_ivfpq", oracle=_IVF_VERDICT_ORACLE)
def similarity_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checked recall verdict for the composed IVF∘PQ path — same
    contract as the other ANN verdicts. Expected recall ≈ the product of
    the stages' recalls (IVF probe ~0.74 at nprobe 5/10 on this isotropic
    corpus × PQ shortlist ~0.9), still well above ANN_RECALL_BOUND."""
    exact = similarity_topk(spark, sf_dir).select("query_id", "cand_id")
    approx = ivfpq_topk_listing(spark, sf_dir).select("query_id", "cand_id")
    return _recall_verdict(exact, approx)


# --- All-pairs k-NN graph -----------------------------------------------------

KNN_K = 5

# The last invocation's live block checkpoint (hygiene: dedup._drop_prev_ckpt)
_KNN_BLOCK_CKPTS: list = []

# Exact k-NN graph relation in DuckDB — shared by knn_graph's hard value
# oracle and the IVF variant's verdict oracle (which pins its exact-edge
# cardinality).
_KNN_EXACT_ORACLE = (
    "SELECT vec_id, neighbor_id, CAST(rnk AS BIGINT) AS rank, cos_sim "
    "FROM ("
    "SELECT vec_id, neighbor_id, cos_sim, row_number() OVER ("
    "PARTITION BY vec_id ORDER BY cos_sim DESC, neighbor_id) AS rnk "
    "FROM (SELECT a.vec_id, b.vec_id AS neighbor_id, "
    "round(list_cosine_similarity(a.embedding::DOUBLE[], "
    "b.embedding::DOUBLE[]), 6) AS cos_sim "
    "FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id)"
    f") WHERE rnk <= {KNN_K}"
)


def _knn_tile_topk(batches):
    """mapInPandas kernel shared by the exact and IVF k-NN graphs: each
    input row is one (xr rows, yr columns) tile; emit every x-row's LOCAL
    top-KNN_K columns under the GLOBAL final ordering (6dp-rounded cosine
    desc, neighbor_id asc — lexsort keys apply last-first), self-pairs and
    zero-norm cosines excluded. Local-contains-global: a tile's top-k
    under the exact final ordering is a superset of that tile's
    contribution to the global top-k."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        out_i, out_j, out_c = [], [], []
        for xr, yr in zip(pdf["xr"], pdf["yr"]):
            if len(xr) == 0 or len(yr) == 0:
                continue
            xid = np.array([r["vec_id"] for r in xr], dtype=np.int64)
            X = np.array([r["v"] for r in xr], dtype=np.float64)
            yid = np.array([r["vec_id"] for r in yr], dtype=np.int64)
            Y = np.array([r["v"] for r in yr], dtype=np.float64)
            xn = np.linalg.norm(X, axis=1)
            yn = np.linalg.norm(Y, axis=1)
            denom = np.outer(
                np.where(xn > 0, xn, 1.0), np.where(yn > 0, yn, 1.0)
            )
            S = np.round((X @ Y.T) / denom, 6)
            bad = ~np.outer(xn > 0, yn > 0) | np.equal.outer(xid, yid)
            S[bad] = -np.inf
            k = min(KNN_K, S.shape[1])
            order = np.lexsort((np.broadcast_to(yid, S.shape), -S), axis=1)[
                :, :k
            ]
            for r in range(S.shape[0]):
                for c in order[r]:
                    if S[r, c] == -np.inf:
                        continue
                    out_i.append(xid[r])
                    out_j.append(yid[c])
                    out_c.append(S[r, c])
        yield pd.DataFrame(
            {"vec_id": out_i, "neighbor_id": out_j, "cos_sim": out_c}
        )


def _knn_out_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )


def _global_topk(cands: DataFrame) -> DataFrame:
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KNN_K)
        .select("vec_id", "neighbor_id", F.col("rank").cast("long"), "cos_sim")
    )


@query("knn_graph", oracle=_KNN_EXACT_ORACLE)
def knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The directed exact k-NN GRAPH over the whole embedding corpus —
    every vector's KNN_K most-similar OTHER vectors with rank. This is the
    corpus×corpus sibling of ``similarity_topk`` (queries×corpus) and the
    input artifact of half the semantic-curation toolbox: SemDeDup-style
    cluster pruning, kNN label propagation, diversity/coverage sampling,
    and graph-connectivity audits all start from exactly this relation.

    Scale shape — the naive formulations both die at 100 TB: a theta
    self-join emits corpus² rows into a window, and even the blocked-GEMM
    pair stream of ``dedup_embedding`` is only viable because a THRESHOLD
    prunes it. A k-NN graph has no threshold, so the pruning must be the
    TOP-K ITSELF, pushed inside the tiles (the Faiss brute-force tier's
    shape):

    1. Block the corpus into ``_GEMM_BLOCKS`` row-blocks (hash on vec_id);
       join the full B×B block grid — a broadcast join on two tiny block
       relations, one tile per task.
    2. Each tile is one Arrow-batched numpy GEMM that emits ONLY the
       per-row LOCAL top-k against that tile's columns (``_knn_tile_topk``):
       ≤ |rows|·k rows per tile, so the exchanged candidate stream is
       corpus·B·k rows — linear in the corpus with a B·k constant — never
       corpus².
    3. One hash exchange on vec_id + a window keeps the global top-k of
       each vector's B·k candidates.

    Local and global selection use the SAME ordering — 6dp-rounded cosine
    desc, neighbor_id asc (the cross-engine float convention of
    ``dedup_embedding``: DuckDB's float32 list math differs from our
    float64 GEMM by ~1e-7, above 1e-6 only when unrounded). Zero-norm
    vectors have undefined cosine: they emit no rows and are never
    neighbors (the oracle's list_cosine_similarity likewise NULLs out).
    At 1 B+ vectors the block relation becomes a coarse quantizer's cells
    and tiles pair only adjacent cells — that scale path is measured by
    ``knn_graph_ivf`` below.

    At-most-one-live-result: re-invoking this operator frees the previous
    invocation's block checkpoint, invalidating the previously returned
    DataFrame — consume each result before the next call, or set
    ``dedup.CKPT_HYGIENE = "keep"`` to compose invocations in one plan
    (see ``dedup._drop_prev_ckpt``)."""
    from .dedup import _GEMM_BLOCKS, _drop_prev_ckpt

    e = _vectors(spark, sf_dir).select("vec_id", "v")
    blocks = e.groupBy(
        (F.pmod(F.xxhash64("vec_id"), _GEMM_BLOCKS)).alias("blk")
    ).agg(F.collect_list(F.struct("vec_id", "v")).alias("rows"))
    blocks = blocks.localCheckpoint()  # two consumers (both tile sides)
    _drop_prev_ckpt(_KNN_BLOCK_CKPTS, blocks)
    tiles = (
        blocks.alias("x")
        .join(blocks.alias("y"), F.lit(True))
        .select(F.col("x.rows").alias("xr"), F.col("y.rows").alias("yr"))
        .repartition(_GEMM_BLOCKS * _GEMM_BLOCKS)
    )
    return _global_topk(tiles.mapInPandas(_knn_tile_topk, _knn_out_schema()))


# IVF-celled approximate k-NN graph: probe width (nearest cells by
# centroid cosine, self included). On the ISOTROPIC driver corpus the
# coarse quantizer carries little signal, so edge recall ≈ the probed
# corpus fraction (~nprobe/10 cells) — that key is a machinery check. On
# clustered data the same plan's pruning is MEASURED, not assumed
# (VERDICT r10 item 1): edge recall 0.932/0.951 at nprobe 2/3 of 10
# cells on the mixture-of-clusters fixture (SCALE_ivf_clustered.json,
# pinned in tests/test_ivf_clustered.py) — the "few probes, high recall"
# regime real text embeddings operate in.
KNN_IVF_NPROBE = 7

_KNN_IVF_CKPTS: list = []


def knn_graph_ivf_listing(
    spark: SparkSession, sf_dir: str, nprobe: int | None = None
) -> DataFrame:
    """The SCALE PATH of ``knn_graph``: blocks are coarse-quantizer CELLS
    (label centroids — same quantizer as similarity_topk_ivf) and each
    cell's rows are GEMM-tiled only against its ``KNN_IVF_NPROBE``
    nearest cells by centroid cosine, self included. Tile count drops
    from B² to cells×nprobe and — the real point at 1 B+ vectors — each
    tile pair can be co-located by partitioning the corpus on cell_id, so
    the candidate stream is corpus·nprobe·k rows with NO all-block
    replication. Cell adjacency is driver-side numpy over the collected
    centroids (cap-bounded: n_cells rows — the KMEANS_DRIVER_CAP
    doctrine).

    At-most-one-live-result: re-invoking this operator frees the previous
    invocation's cell checkpoint, invalidating the previously returned
    DataFrame — consume each result before the next call, or set
    ``dedup.CKPT_HYGIENE = "keep"`` to compose invocations in one plan
    (see ``dedup._drop_prev_ckpt``)."""
    import numpy as np

    from .annindex import KMEANS_TRAIN_PER_CELL
    from .dedup import _drop_prev_ckpt

    vecs = _vectors(spark, sf_dir)
    # Quantizer trained on a KMEANS_TRAIN_PER_CELL-bounded subsample (r12,
    # VERDICT r11 item 4, guide §1/§5): the r11 shape ran label_centroids
    # over the FULL corpus — a |corpus|·dim posexplode feeding the (label,
    # dim) aggregate — inside the timed listing, profiled at ~55% of the
    # key. A coarse quantizer is a TRAINED artifact: ~128 points per cell
    # matches full-corpus training (annindex's measured band, FAISS
    # guidance 39-256/centroid), so the build cost drops from O(corpus) to
    # O(cells·128) while assignment/tiling stay corpus-wide and exact
    # within probed cells. Deterministic hash-of-id sample (the r05
    # doctrine: reproducible, id-domain-shape-independent). One bounded
    # stats pass sizes the sample; recall pins re-verified on the
    # clustered fixture (tests/test_ivf_clustered.py) and the isotropic
    # driver corpus (knn_graph_ivf's oracle verdict).
    stats = vecs.agg(
        F.count("*").alias("n"), F.approx_count_distinct("label").alias("nl")
    ).collect()[0]
    cap = KMEANS_TRAIN_PER_CELL * max(int(stats.nl), 1)
    train = vecs
    if stats.n > cap:
        step = max(2, int(stats.n) // cap)
        train = vecs.filter(F.pmod(F.xxhash64("vec_id"), F.lit(step)) == 0)
    cents = label_centroids(train)
    crows = cents.collect()  # n_cells rows, bounded by construction
    # crows shared with the pure-map assignment (optimization r11): the
    # centroid build used to be evaluated TWICE — once inside the
    # assignment's broadcast build and once by this collect.
    assigned = _assign_cells(vecs.select("vec_id", "label", "v"), cents, crows=crows)
    cid = np.array([r.cell_id for r in crows], dtype=np.int64)
    C = np.array([r.centroid for r in crows], dtype=np.float64)
    n = np.linalg.norm(C, axis=1)
    S = (C @ C.T) / np.outer(np.where(n > 0, n, 1.0), np.where(n > 0, n, 1.0))
    probe = min(nprobe if nprobe is not None else KNN_IVF_NPROBE, len(cid))
    adj = []
    for i in range(len(cid)):
        order = np.lexsort((cid, -S[i]))[:probe]
        adj.extend((int(cid[i]), int(cid[j])) for j in order)
    adj_df = spark.createDataFrame(adj, "cell_id LONG, probe_cell LONG")
    blocks = assigned.groupBy("cell_id").agg(
        F.collect_list(F.struct("vec_id", "v")).alias("rows")
    )
    blocks = blocks.localCheckpoint()  # two consumers (both tile sides)
    _drop_prev_ckpt(_KNN_IVF_CKPTS, blocks)
    tiles = (
        F.broadcast(adj_df)
        .join(blocks.alias("x"), "cell_id")
        .join(
            blocks.alias("y").withColumnRenamed("cell_id", "probe_cell"),
            "probe_cell",
        )
        .select(F.col("x.rows").alias("xr"), F.col("y.rows").alias("yr"))
        .repartition(len(adj) or 1)
    )
    return _global_topk(tiles.mapInPandas(_knn_tile_topk, _knn_out_schema()))


@query(
    "knn_graph_ivf",
    oracle=(
        "SELECT CAST(count(*) AS BIGINT) AS n_exact, TRUE AS recall_ok "
        f"FROM ({_KNN_EXACT_ORACLE})"
    ),
)
def knn_graph_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checked recall verdict for the IVF-celled k-NN graph (the
    similarity_topk_ivf contract): DuckDB pins the exact edge cardinality
    and asserts TRUE for the bound; the Spark side emits the actually
    evaluated bound over (exact knn_graph edges ∩ IVF edges), so a broken
    cell/probe path flips the hash match."""
    exact = knn_graph(spark, sf_dir).select("vec_id", "neighbor_id")
    approx = knn_graph_ivf_listing(spark, sf_dir).select(
        "vec_id", "neighbor_id"
    )
    hit = exact.join(approx, ["vec_id", "neighbor_id"], "left_semi").agg(
        F.count("*").alias("n_hit")
    )
    tot = exact.agg(F.count("*").alias("n_exact"))
    return tot.crossJoin(hit).select(
        "n_exact",
        (F.col("n_hit") >= ANN_RECALL_BOUND * F.col("n_exact")).alias(
            "recall_ok"
        ),
    )

"""Sparse retrieval over the corpus — BM25 scoring, the classic
inverted-index ranking function (Robertson & Zaragoza, FnTIR'09; the
Lucene/Elasticsearch default). The data-pipeline use is corpus-side:
given probe terms (benchmark queries, quality probes, dedup seeds), rank
the documents most relevant to each — the retrieval twin of the
``text.tfidf`` weighting key.

Scale shape: everything is counting algebra over the token stream —
per-(doc, word) term frequencies, per-doc lengths, per-word document
frequencies, two scalar corpus stats — then scoring touches ONLY the
postings of the probe terms (a semi-join on the term list, pushed ahead
of the expensive math), and per-term top-k is a bounded window over
those postings. At 100 TB the probe-term filter is the whole point: the
tf table is corpus-sized, but a query's cost is its posting lists, not
the corpus (the inverted-index access path, expressed relationally).

Reference parity: the reference (src/main.cpp:78-281) stops at word
counting; BM25 is the driver brief's text-analysis extension surface
built on the same token stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..sources.tables import load_table

BM25_K1 = 1.2
BM25_B = 0.75
# Probe terms: the N_TERMS highest-document-frequency words (df DESC,
# word ASC — deterministic in both engines); TOP_DOCS docs ranked each.
N_TERMS = 5
TOP_DOCS = 10


@query(
    "bm25_topk",
    oracle=(
        "WITH tok AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), "
        "w -> w <> '')) AS word FROM documents), "
        "tf AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY doc_id, word), "
        "dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id), "
        "stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl), "
        "df AS (SELECT word, count(*) AS df FROM tf GROUP BY word), "
        f"terms AS (SELECT word, df FROM df ORDER BY df DESC, word LIMIT {N_TERMS}), "
        "scored AS (SELECT t.word AS term, tf.doc_id, "
        "round(ln((s.n_docs - t.df + 0.5) / (t.df + 0.5) + 1) * "
        f"tf.tf * ({BM25_K1} + 1) / "
        f"(tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl)), 6) "
        "AS score "
        "FROM tf JOIN terms t ON tf.word = t.word "
        "JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s), "
        "ranked AS (SELECT term, doc_id, score, "
        "row_number() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS rank "
        "FROM scored) "
        f"SELECT term, doc_id, score, rank FROM ranked WHERE rank <= {TOP_DOCS}"
    ),
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``TOP_DOCS`` documents per probe term under BM25 (k₁ = 1.2,
    b = 0.75, Lucene's +1 idf so common terms never go negative). The
    probe-term semi-join lands BEFORE the scoring math and the window, so
    only the probed posting lists are ever ranked; ranking runs on the
    6-dp-rounded score with a doc_id tiebreak so both engines order
    identically (module float policy)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(F.filter(F.split("text", " "), lambda w: w != "")).alias("word"),
    )
    tok = tok.localCheckpoint()  # tf + dl consumers, one materialization
    tf = tok.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    df = tf.groupBy("word").agg(F.count("*").alias("df"))
    terms = df.orderBy(F.desc("df"), F.asc("word")).limit(N_TERMS)
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    score = F.round(
        idf
        * F.col("tf")
        * (BM25_K1 + 1)
        / (
            F.col("tf")
            + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        ),
        6,
    )
    scored = (
        tf.join(F.broadcast(terms), "word")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(F.col("word").alias("term"), "doc_id", score.alias("score"))
    )
    w = Window.partitionBy("term").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_DOCS)
        .select("term", "doc_id", "score", "rank")
    )


# Hybrid retrieval: query docs, sparse candidate depth, final depth.
N_Q = 3
N_CAND = 20
FINAL_K = 5


def _hybrid_ctes() -> str:
    """The shared CTE chain through ``cs`` (query_id, doc_id, bm25, cos)
    — consumed by the cosine-rerank oracle AND the RRF-fusion oracle."""
    from .embedprep import hashed_cte_sql

    return (
        "WITH tok AS (SELECT doc_id, unnest(list_filter(string_split(text, "
        "' '), w -> w <> '')) AS word FROM documents), "
        "tf AS (SELECT doc_id, word, count(*) AS tf FROM tok "
        "GROUP BY doc_id, word), "
        "dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id), "
        "stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl), "
        "df AS (SELECT word, count(*) AS df FROM tf GROUP BY word), "
        f"q AS (SELECT doc_id AS query_id, word FROM tf WHERE doc_id < {N_Q}), "
        "bs AS (SELECT q.query_id, tf.doc_id, "
        "round(sum(ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1) * "
        f"tf.tf * ({BM25_K1} + 1) / "
        f"(tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl))"
        "), 6) AS bm25 "
        "FROM tf JOIN q ON tf.word = q.word "
        "JOIN df ON tf.word = df.word "
        "JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s "
        "WHERE tf.doc_id <> q.query_id "
        "GROUP BY q.query_id, tf.doc_id), "
        "c20 AS (SELECT query_id, doc_id, bm25 FROM ("
        "SELECT *, row_number() OVER (PARTITION BY query_id "
        "ORDER BY bm25 DESC, doc_id) AS crank FROM bs) "
        f"WHERE crank <= {N_CAND}), "
        # the one shared spelling of the hashed-feature SQL (embedprep)
        "hemb AS (" + hashed_cte_sql("tok") + "), "
        "nrm AS (SELECT doc_id, CAST(sum(val * val) AS BIGINT) AS n2 "
        "FROM hemb GROUP BY doc_id), "
        "pd AS (SELECT cd.query_id, cd.doc_id, "
        "CAST(sum(dh.val * qh.val) AS BIGINT) AS dot "
        "FROM c20 cd JOIN hemb dh ON dh.doc_id = cd.doc_id "
        "JOIN hemb qh ON qh.doc_id = cd.query_id AND qh.dim = dh.dim "
        "GROUP BY cd.query_id, cd.doc_id), "
        "dots AS (SELECT c.query_id, c.doc_id, c.bm25, "
        "coalesce(pd.dot, 0) AS dot FROM c20 c "
        "LEFT JOIN pd USING (query_id, doc_id)), "
        "cs AS (SELECT d.query_id, d.doc_id, d.bm25, "
        "CASE WHEN nq.n2 > 0 AND nd.n2 > 0 THEN "
        "round(CAST(d.dot AS DOUBLE) / "
        "sqrt(CAST(nq.n2 AS DOUBLE) * CAST(nd.n2 AS DOUBLE))"
        ", 6) ELSE 0.0 END AS cos "
        "FROM dots d JOIN nrm nq ON nq.doc_id = d.query_id "
        "JOIN nrm nd ON nd.doc_id = d.doc_id) "
    )


def _hybrid_oracle() -> str:
    return _hybrid_ctes() + (
        "SELECT query_id, rank, doc_id, bm25 AS bm25_score, "
        "cos AS cos_score FROM ("
        "SELECT *, CAST(row_number() OVER (PARTITION BY query_id "
        "ORDER BY cos DESC, doc_id) AS INT) AS rank FROM cs) "
        f"WHERE rank <= {FINAL_K}"
    )


def _hybrid_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared two-stage candidate relation (query_id, doc_id, bm25,
    cos): BM25 over the query docs' terms selects N_CAND sparse
    candidates per query, then the dense hashed-feature cosine is scored
    for exactly those candidates. Consumed by the cosine rerank
    (``hybrid_retrieval``) and the RRF fusion (``hybrid_retrieval_rrf``).

    Scale shape: stage 1 touches only the probed posting lists (the query
    terms' rows of tf — broadcast query side), aggregates per (query,
    doc) map-side, and bounds each query to N_CAND via WindowGroupLimit.
    Stage 2 is candidate-scoped: the hashed-feature join runs over
    N_Q × N_CAND docs' features (query features broadcast), never the
    corpus — exactly the retrieve-then-rerank cost asymmetry that makes
    the architecture work at index scale. Dense dot products are INTEGER
    (hashed features), so the rerank score is float-exact cross-engine;
    BM25 sums are rounded 6dp post-aggregation per module float policy."""
    from .embedprep import hashed_features

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(F.filter(F.split("text", " "), lambda w: w != "")).alias(
            "word"
        ),
    )
    # ONE corpus explode; everything downstream (dl, df, hashed features)
    # derives from the (doc, word, tf) relation — materializing tf is
    # much cheaper than checkpointing the expanded token stream, and
    # sum(tf) per doc ≡ count per doc over tokens.
    tf = tok.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    tf = tf.localCheckpoint()  # scored/query-side/df/dl/hemb consumers
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    dfreq = tf.groupBy("word").agg(F.count("*").alias("df"))
    q = tf.filter(F.col("doc_id") < N_Q).select(
        F.col("doc_id").alias("query_id"), "word"
    )
    # df restricted to the probed terms before broadcast (vocab-sized
    # otherwise): semi-join on the query word set.
    dfq = dfreq.join(F.broadcast(q.select("word").distinct()), "word")
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    term_score = (
        idf
        * F.col("tf")
        * (BM25_K1 + 1)
        / (
            F.col("tf")
            + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    bs = (
        tf.join(F.broadcast(q), "word")
        .filter(F.col("doc_id") != F.col("query_id"))
        .join(F.broadcast(dfq), "word")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(term_score), 6).alias("bm25"))
    )
    cw = Window.partitionBy("query_id").orderBy(F.desc("bm25"), F.asc("doc_id"))
    c20 = (
        bs.withColumn("crank", F.row_number().over(cw))
        .filter(F.col("crank") <= N_CAND)
        .drop("crank")
    )
    # weighted form: sign × tf per distinct (doc, word) ≡ sign per token
    hemb = hashed_features(tf, weight="tf")
    hemb = hemb.localCheckpoint()  # candidate-side, query-side, norms
    nrm = hemb.groupBy("doc_id").agg(
        F.sum(F.col("val") * F.col("val")).cast("long").alias("n2")
    )
    qh = hemb.filter(F.col("doc_id") < N_Q).select(
        F.col("doc_id").alias("query_id"), "dim", F.col("val").alias("qval")
    )
    cd = c20.select("query_id", "doc_id").join(hemb, "doc_id")
    pair_dots = (
        cd.join(F.broadcast(qh), ["query_id", "dim"])
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("val") * F.col("qval")).cast("long").alias("dot"))
    )
    dots = c20.join(pair_dots, ["query_id", "doc_id"], "left").withColumn(
        "dot", F.coalesce(F.col("dot"), F.lit(0))
    )
    # query norms ONLY — nrm is corpus-sized; broadcasting it unfiltered
    # would collect every doc's norm to the driver
    nq = nrm.filter(F.col("doc_id") < N_Q).select(
        F.col("doc_id").alias("query_id"), F.col("n2").alias("qn2")
    )
    cs = (
        dots.join(F.broadcast(nq), "query_id")
        .join(nrm, "doc_id")
        .select(
            "query_id",
            "doc_id",
            "bm25",
            F.when(
                (F.col("qn2") > 0) & (F.col("n2") > 0),
                # norms cast to double BEFORE the product: two long
                # squared-norms can overflow int64 on pathological docs
                F.round(
                    F.col("dot").cast("double")
                    / F.sqrt(
                        F.col("qn2").cast("double") * F.col("n2").cast("double")
                    ),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("cos"),
        )
    )
    return cs


@query("hybrid_retrieval", oracle=_hybrid_oracle())
def hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage hybrid retrieval, cosine rerank: keep the FINAL_K
    candidates with the best dense score (see ``_hybrid_scored`` for the
    two-stage pipeline and its scale shape)."""
    cs = _hybrid_scored(spark, sf_dir)
    fw = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("doc_id"))
    return (
        cs.withColumn("rank", F.row_number().over(fw))
        .filter(F.col("rank") <= FINAL_K)
        .select(
            "query_id",
            "rank",
            "doc_id",
            F.col("bm25").alias("bm25_score"),
            F.col("cos").alias("cos_score"),
        )
    )


# Reciprocal-rank-fusion constant (Cormack, Clarke & Büttcher, SIGIR'09:
# k = 60 dominates the tested alternatives and is the standard default).
RRF_K = 60


def _rrf_oracle() -> str:
    return _hybrid_ctes() + (
        ", rk AS (SELECT query_id, doc_id, "
        "CAST(row_number() OVER (PARTITION BY query_id "
        "ORDER BY bm25 DESC, doc_id) AS INT) AS sparse_rank, "
        "CAST(row_number() OVER (PARTITION BY query_id "
        "ORDER BY cos DESC, doc_id) AS INT) AS dense_rank FROM cs) "
        f"SELECT query_id, rank, doc_id, sparse_rank, dense_rank, "
        "rrf_score FROM ("
        f"SELECT *, round(1.0 / ({RRF_K} + sparse_rank) + "
        f"1.0 / ({RRF_K} + dense_rank), 6) AS rrf_score, "
        "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
        f"1.0 / ({RRF_K} + sparse_rank) + 1.0 / ({RRF_K} + dense_rank) "
        "DESC, doc_id) AS INT) AS rank FROM rk) "
        f"WHERE rank <= {FINAL_K}"
    )


@query("hybrid_retrieval_rrf", oracle=_rrf_oracle())
def hybrid_retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage hybrid retrieval, RECIPROCAL-RANK FUSION combiner — the
    other standard way to merge a sparse and a dense ranking (Cormack et
    al. SIGIR'09; the Elasticsearch/Vespa hybrid default): each candidate
    scores Σᵢ 1/(RRF_K + rankᵢ) over the two per-query rankings, which
    needs NO score calibration between BM25 and cosine (only ranks enter).

    Scale shape: identical to ``hybrid_retrieval`` through the candidate
    relation (posting-list-probed stage 1, candidate-scoped stage 2);
    the fusion itself adds two rank windows and an arithmetic projection
    over N_Q × N_CAND rows — bounded by the candidate budget, never the
    corpus. Cross-engine floats: ranks are integers, the two reciprocal
    terms are evaluated in the same order on both engines, and the fused
    score is rounded 6dp; ties broken by doc_id."""
    cs = _hybrid_scored(spark, sf_dir)
    sw = Window.partitionBy("query_id").orderBy(F.desc("bm25"), F.asc("doc_id"))
    dw = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("doc_id"))
    rk = cs.select(
        "query_id",
        "doc_id",
        F.row_number().over(sw).cast("int").alias("sparse_rank"),
        F.row_number().over(dw).cast("int").alias("dense_rank"),
    )
    fused = 1.0 / (RRF_K + F.col("sparse_rank")) + 1.0 / (
        RRF_K + F.col("dense_rank")
    )
    fw = Window.partitionBy("query_id").orderBy(F.desc(fused), F.asc("doc_id"))
    return (
        rk.withColumn("rrf_score", F.round(fused, 6))
        .withColumn("rank", F.row_number().over(fw).cast("int"))
        .filter(F.col("rank") <= FINAL_K)
        .select(
            "query_id", "rank", "doc_id", "sparse_rank", "dense_rank",
            "rrf_score",
        )
    )


def _ir_eval_oracle() -> str:
    from .similarity import _TOPK_ORACLE, N_QUERIES, TOP_K

    return (
        f"WITH topk AS ({_TOPK_ORACLE}), "
        "lab AS (SELECT vec_id, label FROM embeddings), "
        "j AS (SELECT t.query_id, t.rk, "
        "CASE WHEN ql.label = cl.label THEN 1 ELSE 0 END AS rel "
        "FROM topk t JOIN lab ql ON ql.vec_id = t.query_id "
        "JOIN lab cl ON cl.vec_id = t.cand_id), "
        "per AS (SELECT query_id, "
        "max(CASE WHEN rel = 1 THEN 1.0 / rk ELSE 0 END) AS rr, "
        "sum(rel) AS n_rel_topk FROM j GROUP BY query_id), "
        "tot AS (SELECT q.vec_id AS query_id, count(*) AS n_rel_total "
        "FROM lab q JOIN lab c ON c.vec_id <> q.vec_id "
        "AND c.label = q.label "
        f"WHERE q.vec_id < {N_QUERIES} GROUP BY q.vec_id) "
        "SELECT per.query_id, round(per.rr, 6) AS rr, "
        f"round(CAST(per.n_rel_topk AS DOUBLE) / {TOP_K}, 6) AS p_at_k, "
        "round(CAST(per.n_rel_topk AS DOUBLE) "
        "/ greatest(tot.n_rel_total, 1), 6) AS r_at_k "
        "FROM per LEFT JOIN tot ON per.query_id = tot.query_id"
    )


@query("retrieval_eval_metrics", oracle=_ir_eval_oracle())
def retrieval_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IR evaluation harness over the exact top-k: per query, reciprocal
    rank of the first relevant hit, precision@k, and recall@k, with
    relevance = SAME LABEL as the query vector (the pseudo-relevance
    every labeled-embedding eval uses when graded judgments don't exist).
    This is the measurement side of the retrieval stack — the numbers a
    team watches when swapping BM25 weights, fusion constants, or ANN
    probe settings; the ANN verdicts gate recall AGAINST this exact
    baseline, this key gates the baseline's own arithmetic against an
    independent engine.

    Metrics are kept to exact RATIONALS (1/rank, counts/k) rounded at
    6dp — nDCG is deliberately excluded because log2 is libm-dependent
    across engines and the value hash would chase ulps, not bugs.

    Scale shape: |Q|×k scored rows joined twice against the label
    column (broadcast — labels are one slim column), one per-query
    aggregate; the total-relevant side is a label-keyed count, shuffled
    on label, never all-pairs."""
    from .similarity import N_QUERIES, TOP_K, similarity_topk

    topk = similarity_topk(spark, sf_dir).select("query_id", "cand_id", "rk")
    lab = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    ql = lab.withColumnRenamed("vec_id", "query_id").withColumnRenamed(
        "label", "q_label"
    )
    cl = lab.withColumnRenamed("vec_id", "cand_id").withColumnRenamed(
        "label", "c_label"
    )
    j = (
        topk.join(F.broadcast(ql), "query_id")
        .join(F.broadcast(cl), "cand_id")
        .select(
            "query_id",
            "rk",
            F.when(F.col("q_label") == F.col("c_label"), 1)
            .otherwise(0)
            .alias("rel"),
        )
    )
    per = j.groupBy("query_id").agg(
        F.max(
            F.when(F.col("rel") == 1, F.lit(1.0) / F.col("rk")).otherwise(0.0)
        ).alias("rr"),
        F.sum("rel").alias("n_rel_topk"),
    )
    tot = (
        ql.filter(F.col("query_id") < N_QUERIES)
        .join(
            lab.withColumnRenamed("vec_id", "cand_id"),
            F.col("label") == F.col("q_label"),
        )
        .filter(F.col("cand_id") != F.col("query_id"))
        .groupBy("query_id")
        .agg(F.count("*").alias("n_rel_total"))
    )
    return per.join(tot, "query_id", "left").select(
        "query_id",
        F.round("rr", 6).alias("rr"),
        F.round(F.col("n_rel_topk").cast("double") / TOP_K, 6).alias("p_at_k"),
        F.round(
            F.col("n_rel_topk").cast("double")
            / F.greatest(F.col("n_rel_total"), F.lit(1)),
            6,
        ).alias("r_at_k"),
    )

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

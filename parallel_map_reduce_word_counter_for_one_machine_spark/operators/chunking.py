"""Document chunking for RAG / training-sequence preparation (driver
contract § LLM-pipeline extensions; no reference citation — the reference's
only unit of text is the whole file, src/main.cpp:104-108).

``chunk_documents`` is the fixed-window/stride splitter every retrieval or
pretraining pipeline runs between curation and embedding: window W tokens,
stride S < W (so consecutive chunks overlap by W−S tokens and no boundary
sentence is lost to truncation).

Scale shape: chunk construction is a pure per-row array expression
(``sequence`` → ``transform`` → ``slice``) followed by one ``posexplode`` —
no shuffle, no UDF; at 100 TB it is a map-only pass whose output is
~n_tokens/S rows per document, pipelined straight into the next stage.
Contrast with ``pipeline.pack_sequences``, which solves the inverse
problem (concatenating short docs up to a context length) and needs a
distributed prefix sum; window chunking needs no cross-row state at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load_table

# Window/stride in tokens. W=64/S=48 → 16-token overlap (25%), the classic
# RAG default ratio; both are plumbed through the oracle string so they can
# be retuned in one place.
CHUNK_TOKENS = 64
CHUNK_STRIDE = 48


# The chunk relation in DuckDB terms, shared by the chunk_documents oracle
# and the chunk-level-dedup oracle that composes on it.
CHUNK_ORACLE = (
    "WITH t AS (SELECT doc_id, "
    "list_filter(string_split(text, ' '), w -> w <> '') AS toks "
    "FROM documents), "
    "c AS (SELECT doc_id, toks, "
    f"1 + (greatest(len(toks) - {CHUNK_TOKENS}, 0) + {CHUNK_STRIDE - 1})"
    f" // {CHUNK_STRIDE} AS n_chunks "
    "FROM t WHERE len(toks) > 0), "
    "x AS (SELECT doc_id, toks, unnest(range(0, n_chunks)) AS i FROM c) "
    "SELECT doc_id, CAST(i AS BIGINT) AS chunk_id, "
    f"len(toks[i*{CHUNK_STRIDE}+1 : i*{CHUNK_STRIDE}+{CHUNK_TOKENS}])"
    " AS n_chunk_tokens, "
    f"array_to_string(toks[i*{CHUNK_STRIDE}+1 : "
    f"i*{CHUNK_STRIDE}+{CHUNK_TOKENS}], ' ') AS chunk_text "
    "FROM x"
)


def chunk_relation(docs: DataFrame) -> DataFrame:
    """The chunk transformation over any (doc_id, text) relation — batch
    or streaming (it is stateless, so the identical expression tree runs
    under a readStream with no watermark or state store at all; the
    streaming twin in ``streaming/chunkstream.py`` uses exactly this).

    chunk count = 1 + ceil(max(0, n−W)/S), computed in integer arithmetic
    (identical on both engines); the last chunk may be short but is never
    empty because S ≤ W guarantees its start index ≤ n. Token-less docs
    produce no chunks (filtered before ``sequence`` — Spark's ``sequence``
    would otherwise count DOWN for a negative stop and fabricate chunks).
    """
    toks = F.filter(F.split("text", " "), lambda w: w != "")
    n = F.size("toks")
    n_chunks = (
        F.lit(1)
        + F.floor(
            (F.greatest(n - CHUNK_TOKENS, F.lit(0)) + (CHUNK_STRIDE - 1))
            / CHUNK_STRIDE
        )
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), F.col("n_chunks") - 1),
        lambda i: F.slice(F.col("toks"), i * CHUNK_STRIDE + 1, CHUNK_TOKENS),
    )
    return (
        docs.select("doc_id", toks.alias("toks"))
        .filter(n > 0)
        .withColumn("n_chunks", n_chunks)
        .select("doc_id", F.posexplode(chunks).alias("chunk_id", "chunk_toks"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.size("chunk_toks").alias("n_chunk_tokens"),
            F.array_join("chunk_toks", " ").alias("chunk_text"),
        )
    )


@query("chunk_documents", oracle=CHUNK_ORACLE)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-window chunks per document (see chunk_relation)."""
    return chunk_relation(load_table(spark, sf_dir, "documents"))


@query(
    "dedup_chunks",
    oracle=(
        f"WITH chunks AS ({CHUNK_ORACLE}) "
        "SELECT md5(chunk_text) AS chunk_md5, "
        "CAST(count(*) AS BIGINT) AS n_copies, "
        "CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs, "
        "CAST(min(doc_id) AS BIGINT) AS first_doc "
        "FROM chunks GROUP BY md5(chunk_text) HAVING count(*) > 1"
    ),
)
def dedup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact dedup: which chunk contents recur across the
    corpus, and in how many documents — the substring-granularity
    companion to ``dedup_exact`` (whole docs) and ``dedup_spans``
    (rolling 8-token windows). Training pipelines run this after chunking
    so a boilerplate paragraph shared by thousands of pages is dropped
    once, not per page.

    Scale shape: the map-only chunker feeds a groupBy keyed on the
    16-byte md5 of the chunk text, so the shuffle carries fingerprints and
    counts — never the chunk bodies. ``first_doc`` (min doc_id) gives the
    deterministic survivor the drop list would keep."""
    chunks = chunk_documents(spark, sf_dir)
    return (
        chunks.groupBy(F.md5("chunk_text").alias("chunk_md5"))
        .agg(
            F.count("*").alias("n_copies"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_copies") > 1)
    )

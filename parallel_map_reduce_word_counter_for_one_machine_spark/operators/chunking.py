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


# Content-defined chunking: a token is a CUT POINT iff its md5 hex digest
# starts with '0' or '1' — P(cut) = 2/16, mean chunk ≈ 8 tokens. The
# criterion is a pure function of the token, chosen over an integer
# rolling hash because md5-prefix comparison evaluates IDENTICALLY in
# Spark and DuckDB (no cross-engine integer-hash to reconcile); the
# statistical behavior (geometric chunk lengths, content-anchored
# boundaries) is the same as Rabin-style CDC.
CDC_CUT_PREFIXES = ("0", "1")


def cdc_chunks(docs: DataFrame) -> DataFrame:
    """Content-DEFINED chunking (the storage/dedup-world complement of the
    fixed-window `chunk_relation`): boundaries are anchored to token
    CONTENT, so inserting or deleting text re-chunks only up to the next
    cut point — every later chunk keeps its exact bytes and fingerprint,
    which is what makes chunk-level dedup robust to edits (fixed windows
    shift every downstream boundary and zero fingerprints survive; pinned
    by the stability test). Plan shape: one posexplode + ONE exchange
    keyed on doc_id (the running cut count needs a per-doc window) + the
    grouped re-assembly on the same key — Exchange-reuse keeps it a
    single shuffle at scale.

    Returns (doc_id, chunk_id, fp, n_tokens): fingerprint-ready chunks.
    """
    from pyspark.sql.window import Window

    toks = docs.select(
        "doc_id",
        F.posexplode(F.filter(F.split("text", " "), lambda w: w != "")).alias(
            "pos", "word"
        ),
    )
    cut = F.when(
        F.substring(F.md5("word"), 1, 1).isin(*CDC_CUT_PREFIXES), 1
    ).otherwise(0)
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunked = toks.select(
        "doc_id",
        "pos",
        "word",
        F.coalesce(F.sum(cut).over(w_prev), F.lit(0)).alias("chunk_id"),
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "word"))),
        lambda s: s.getField("word"),
    )
    return chunked.groupBy("doc_id", "chunk_id").agg(
        F.md5(F.array_join(ordered, " ")).alias("fp"),
        F.count("*").alias("n_tokens"),
    )


_CDC_ORACLE = (
    "WITH a AS (SELECT doc_id, list_filter(string_split(text, ' '), "
    "w -> w <> '') AS toks FROM documents), "
    "t AS (SELECT doc_id, toks[i] AS word, i AS pos FROM a, "
    "LATERAL unnest(generate_series(1, len(toks))) g(i)), "
    "f AS (SELECT doc_id, word, pos, CASE WHEN substr(md5(word), 1, 1) IN "
    "('0', '1') THEN 1 ELSE 0 END AS cut FROM t), "
    "c AS (SELECT doc_id, word, pos, COALESCE(sum(cut) OVER ("
    "PARTITION BY doc_id ORDER BY pos "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id "
    "FROM f) "
    "SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id, "
    "md5(string_agg(word, ' ' ORDER BY pos)) AS fp, "
    "CAST(count(*) AS BIGINT) AS n_tokens "
    "FROM c GROUP BY doc_id, chunk_id"
)


@query("chunk_cdc", oracle=_CDC_ORACLE)
def chunk_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered face of content-defined chunking over the corpus."""
    return cdc_chunks(load_table(spark, sf_dir, "documents"))


@query(
    "dedup_chunks_cdc",
    oracle=(
        f"WITH chunks AS ({_CDC_ORACLE}) "
        "SELECT fp, CAST(count(*) AS BIGINT) AS n_copies, "
        "CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs, "
        "CAST(min(doc_id) AS BIGINT) AS first_doc "
        "FROM chunks GROUP BY fp HAVING count(*) > 1"
    ),
)
def dedup_chunks_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level dedup over CONTENT-DEFINED chunks — the combination
    the storage-dedup literature runs: because CDC boundaries survive
    edits (stability test above), a boilerplate paragraph recurs with the
    SAME fingerprint even when its surrounding documents differ, so this
    catches shared content the fixed-window `dedup_chunks` misses
    whenever the boilerplate sits at different offsets. Same scale shape:
    fingerprint-keyed groupBy, bodies never shuffled."""
    chunks = chunk_cdc(spark, sf_dir)
    return (
        chunks.groupBy("fp")
        .agg(
            F.count("*").alias("n_copies"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_copies") > 1)
    )

"""STREAMING near-dup ingest gate: the fuzzy tier of the incremental
dedup check, run as a real readStream over the incoming document feed.

The reference has no streaming (src/main.cpp:78-281); this is extension
surface, and it exists BECAUSE of the r04 signature rewrite: MinHash
signatures are now a pure per-row map (token hash → rolling shingle hash
→ array-domain mins — no explode-groupBy), so the whole probe side —
signature, banding, index lookup, exact verify — composes from
streaming-compatible operators:

    readStream(docs) → signatures (map) → banded keys (explode)
      → stream-STATIC join against the persisted banded corpus index
      → stream-STATIC join against the corpus shingle table (verify)
      → append (in_id, corpus_id, jaccard) match events to the sink

Per micro-batch this is exactly the production per-batch gate: incoming
work is O(batch × bands); the corpus index and shingle table are the
standing (static) build side. No streaming aggregation state at all —
the gate emits match EVENTS (append mode), and "is doc X a dup" is
`exists` over its events, so there is no watermark to manage and nothing
grows with stream history. The equivalence test asserts the drained
event set flags exactly the same doc_ids as the batch gate
(operators/dedup.py::fuzzy_gate_flags).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    INCREMENTAL_MOD,
    JACCARD_THRESHOLD,
    MAX_BUCKET,
    _shingles,
    banded_keys,
    minhash_signatures,
)
from ..sources.tables import SCHEMAS, load_table
from . import drain


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming source for the documents table (explicit schema, as every
    file stream here)."""
    return (
        spark.readStream.schema(SCHEMAS["documents"])
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def run_stream_fuzzy_gate(
    spark: SparkSession, sf_dir: str, query_name: str
) -> DataFrame:
    """Run the gate as a real stream; returns the drained memory-sink
    match events (in_id, corpus_id, jaccard ≥ threshold)."""
    corpus_docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % INCREMENTAL_MOD != 0
    )
    # Standing build side, as in the batch gate: capped banded index +
    # hashed shingle table (both static, materialized once).
    index = (
        banded_keys(minhash_signatures(corpus_docs))
        .groupBy("band_id", "band_hash")
        .agg(
            F.slice(F.array_sort(F.collect_list("doc_id")), 1, MAX_BUCKET).alias(
                "docs"
            )
        )
        .localCheckpoint()
    )
    corp_sh = corpus_docs.select(
        F.col("doc_id").alias("corpus_id"),
        F.transform(_shingles(), lambda s: F.xxhash64(s)).alias("c_sh"),
        F.size(_shingles()).alias("c_n"),
    ).localCheckpoint()

    incoming = read_documents_stream(spark, sf_dir).filter(
        F.col("doc_id") % INCREMENTAL_MOD == 0
    )
    # Probe side on the STREAM: one lineage builds the verify payload
    # (hashed string-shingle set), the signature (pure map — the r04
    # rewrite; SAME chain-hash space as the corpus index), and the banded
    # keys (explode). The verify arrays RIDE ALONG via the carry params
    # instead of a stream-stream self-join (which would hold watermark
    # state for no reason).
    in0 = incoming.select(
        "doc_id",
        "text",
        F.transform(_shingles(), lambda s: F.xxhash64(s)).alias("i_sh"),
        F.size(_shingles()).alias("i_n"),
    )
    sigs = minhash_signatures(in0, carry=("i_sh", "i_n"))
    probes = banded_keys(sigs, carry=("i_sh", "i_n"))
    inter = F.size(F.array_intersect(F.col("i_sh"), F.col("c_sh")))
    union = F.col("i_n") + F.col("c_n") - inter
    jac = F.when(union > 0, inter.cast("double") / union)
    matches = (
        probes.join(index, ["band_id", "band_hash"])
        .select(
            F.col("doc_id").alias("in_id"),
            F.explode("docs").alias("corpus_id"),
            "i_sh",
            "i_n",
        )
        .join(corp_sh, "corpus_id")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("in_id", "corpus_id")
    )
    q = (
        matches.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain(q)
    return spark.sql(f"SELECT * FROM {query_name}")


from ..operators.dedup import (  # noqa: E402
    _GATE_VERDICT_ORACLE,
    _gate_verdict_vs_truth,
)
from ..registry import query  # noqa: E402


@query("stream_fuzzy_gate", oracle=_GATE_VERDICT_ORACLE)
def stream_fuzzy_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated face of the STREAMING near-dup ingest gate (module
    docstring): the incoming feed streams through signature → banded
    probe → exact verify, and the drained match events must yield the
    SAME verdict — precision against the exact incoming×corpus truth,
    recall on high-J witnesses — as the batch gate, under the same
    oracle. Proves the stream-static join composition loses no candidate
    the batch listing finds."""
    name = "fuzzy_gate_" + str(abs(hash((sf_dir, "fg"))) % 10**8)
    events = run_stream_fuzzy_gate(spark, sf_dir, name).localCheckpoint()
    flagged = events.select(F.col("in_id").alias("doc_id")).distinct()
    n_incoming = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % INCREMENTAL_MOD == 0)
        .agg(F.count("*").cast("long").alias("n_incoming"))
    )
    return _gate_verdict_vs_truth(spark, sf_dir, flagged, n_incoming)

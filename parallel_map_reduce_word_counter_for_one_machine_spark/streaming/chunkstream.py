"""Streaming document chunking: the ``chunk_documents`` transformation run
under a real file-source ``readStream``.

The reference has no streaming (src/main.cpp:78-281); extension surface.
Chunking is STATELESS — every output row derives from exactly one input
row — so the streaming run needs no watermark, no state store, and no
output-mode subtlety: append mode, identical expression tree as the batch
operator (``operators/chunking.chunk_relation``), results provably equal
to the batch relation. This is the operational shape for "chunk documents
as they land": each micro-batch is a map-only pass, so ingest throughput
scales with executors and backlog never accumulates operator state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.chunking import chunk_relation
from . import drain
from .fuzzygate import read_documents_stream


def run_stream_chunks(
    spark: SparkSession, sf_dir: str, query_name: str
) -> DataFrame:
    """Real streaming run: documents file stream → chunk_relation → append
    to a memory sink; returns the drained sink contents."""
    stream = read_documents_stream(spark, sf_dir)
    out = chunk_relation(stream)
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain(q)
    return spark.sql(f"SELECT * FROM {query_name}")


from ..registry import ORACLES, query  # noqa: E402


def _chunk_oracle() -> str:
    # chunking registers before streaming modules in registry.load_all,
    # so its oracle is present; composing it keeps the two faces
    # drift-free by construction.
    return ORACLES["chunk_documents"]


@query("stream_chunk_documents", oracle=_chunk_oracle())
def stream_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated face of STREAMING chunking: the document feed through
    a real readStream must produce exactly the batch ``chunk_documents``
    relation (same oracle verbatim — the two faces cannot drift).
    Stateless map, append mode: the operational shape for chunking
    documents as they land."""
    name = "chunk_stream_" + str(abs(hash((sf_dir, "cs"))) % 10**8)
    return run_stream_chunks(spark, sf_dir, name)

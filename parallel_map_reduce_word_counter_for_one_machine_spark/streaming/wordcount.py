"""The reference program as an INCREMENTAL stream: word count maintained
micro-batch by micro-batch over a document feed.

The reference rescans its whole input from scratch each run (one-shot
batch program, src/main.cpp:140-206); this operator is the version a
continuously-ingesting corpus needs — the running (word, cnt) table is
updated only for words seen in the new micro-batch (update output mode),
with the same tokenizer semantics as the batch flagship.

State = the running aggregate, O(|vocabulary|) — naturally bounded for
word counting (no watermark required: word is not event time and the
aggregate must stay complete). The equivalence test drains the feed and
checks the final update-mode state equals the batch `word_count` exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import SCHEMAS
from . import drain


def _counts(docs: DataFrame) -> DataFrame:
    # Same tokenization as operators/wordcount.py's flagship.
    word = F.explode(F.split(F.col("text"), " ")).alias("word")
    return (
        docs.select(word)
        .filter(F.col("word") != "")
        .groupBy("word")
        .count()
        .withColumnRenamed("count", "cnt")
    )


def run_stream_word_count(
    spark: SparkSession, sf_dir: str, query_name: str
) -> DataFrame:
    """Stream documents.parquet through the incremental counter; returns
    the final (word, cnt) state from the update-mode memory sink (the last
    update per word wins — realized as max(cnt), since counts only grow)."""
    docs = (
        spark.readStream.schema(SCHEMAS["documents"])
        .option("pathGlobFilter", "documents.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(sf_dir)
    )
    q = (
        _counts(docs)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    drain(q)
    return (
        spark.sql(f"SELECT word, cnt FROM {query_name}")
        .groupBy("word")
        .agg(F.max("cnt").alias("cnt"))
    )

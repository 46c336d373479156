"""Raw text-file source/sink — the reference's exact I/O surface.

The reference reads one UTF-8 text file line-by-line (ifstream+getline,
reference src/main.cpp:104-108) and writes two full sorted listings
(output.txt alphabetical, output2.txt by descending count,
src/main.cpp:226-266). ``run_reference_pipeline`` is that whole program as
one declarative Spark job.

Scale: ``spark.read.text`` splits files by ``maxPartitionBytes`` — the
built-in, correct version of the reference's BATCH_SIZE=2M-line
bounded-memory loop (src/main.cpp:103,140-178). A 100 TB input directory
reads the same way; uncompressed text splits at byte offsets with line
reassembly handled by the Hadoop LineRecordReader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.wordcount import (
    ALPHA_HEADER,
    BY_COUNT_HEADER,
    REF_DELIM_REGEX,
    listing_lines,
)


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """Line-oriented scan: DataFrame[value: string], one row per \\n line."""
    return spark.read.text(path)


def run_reference_pipeline(
    spark: SparkSession, in_path: str, out_dir: str, headers: bool = True
) -> DataFrame:
    """The reference program end-to-end (src/main.cpp:78-281), Spark-first:

    text scan → reference-parity tokenize → groupBy count →
    alpha listing → ``{out_dir}/alpha`` ; frequency listing →
    ``{out_dir}/by_count``; returns the counts DataFrame. Header lines
    match the reference byte-for-byte (src/main.cpp:231, :262) —
    tests/test_textfile_stateful.py diffs the alpha listing against the
    compiled reference binary's output.txt.

    Difference by design (SURVEY.md §4): frequency ties are pinned to
    (cnt DESC, word ASC) where the reference is unstable-sort-unspecified.
    """
    lines = read_text_lines(spark, in_path)
    counts = (
        lines.select(F.explode(F.split("value", REF_DELIM_REGEX)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    (
        listing_lines(counts, [F.asc("word")], ALPHA_HEADER if headers else None)
        .write.mode("overwrite")
        .text(f"{out_dir}/alpha")
    )
    (
        listing_lines(
            counts,
            [F.desc("cnt"), F.asc("word")],
            BY_COUNT_HEADER if headers else None,
        )
        .write.mode("overwrite")
        .text(f"{out_dir}/by_count")
    )
    return counts

"""Partitioned parquet sink + partition-pruned reads — the table-layout
story for 100 TB.

A corpus partitioned by a low-cardinality column (here ``lang``) turns
per-language queries into partition-pruned scans: Spark lists only the
matching ``lang=xx/`` directories, so a 100 TB corpus with 30 languages
reads ~3 TB for a one-language query before any row is touched. Tests
assert the pruning is visible in the plan (``PartitionFilters``) and that
a roundtrip preserves content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .tables import load_table


def write_partitioned_documents(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> None:
    """documents → parquet partitioned by lang (hive-style directories)."""
    d = load_table(spark, sf_dir, "documents")
    (
        d.write.mode("overwrite")
        .partitionBy("lang")
        .parquet(out_dir)
    )


def read_language(spark: SparkSession, out_dir: str, lang: str) -> DataFrame:
    """Partition-pruned scan: the lang filter is resolved at file listing
    time, never per-row."""
    return spark.read.parquet(out_dir).filter(f"lang = '{lang}'")

"""Robust JSON line source: explicit schema + corrupt-record policy.

The reference reads only plain text (src/main.cpp:104); JSON ingestion is
extension surface. At 100 TB a scraped/partner JSONL feed ALWAYS contains
malformed rows, so the loader makes the failure policy explicit instead of
inheriting whatever default the session has:

- ``permissive`` (default): malformed rows land in ``_corrupt_record`` with
  every schema column null — the pipeline keeps them for quarantine audits.
- ``dropmalformed``: malformed rows silently dropped.
- ``failfast``: any malformed row aborts the job (the right choice when the
  producer claims a contract).

Schema is REQUIRED: schema inference over 100 TB is a full extra pass of
the data before the real one, and a sampled inference can silently type a
column wrong (e.g. an id column inferred long until the first UUID shows
up). Explicit schemas also make the corrupt-record column work — inference
would swallow it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

_MODES = {"permissive", "dropmalformed", "failfast"}


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    mode: str = "permissive",
) -> DataFrame:
    """Read newline-delimited JSON with a declared schema and an explicit
    malformed-row policy."""
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {sorted(_MODES)}, got {mode!r}")
    full = schema
    if mode == "permissive" and CORRUPT_COL not in schema.fieldNames():
        full = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
        )
    return (
        spark.read.schema(full)
        .option("mode", mode.upper())
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def quarantine_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) split of a permissive read. Quarantined rows
    keep the full row — whatever partially parsed plus the raw line in
    ``_corrupt_record`` for replay. (Keeping the schema columns also
    side-steps Spark's QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction: a
    scan whose only referenced column is the corrupt column is rejected.)"""
    clean = df.filter(df[CORRUPT_COL].isNull()).drop(CORRUPT_COL)
    bad = df.filter(df[CORRUPT_COL].isNotNull())
    return clean, bad


def read_csv_robust(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    mode: str = "permissive",
    header: bool = True,
) -> DataFrame:
    """CSV twin of :func:`read_jsonl`: declared schema + explicit
    malformed-row policy (same three modes, same quarantine column). CSV
    needs it even more than JSON at scale — quoting/escaping bugs in
    producers are the norm, and inference over 100 TB is two passes."""
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {sorted(_MODES)}, got {mode!r}")
    full = schema
    if mode == "permissive" and CORRUPT_COL not in schema.fieldNames():
        full = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
        )
    return (
        spark.read.schema(full)
        .option("mode", mode.upper())
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .csv(path)
    )

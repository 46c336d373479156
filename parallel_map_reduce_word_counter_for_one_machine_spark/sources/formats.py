"""Multi-format source/sink parity: CSV, JSON-lines, and ORC round-trips.

The reference reads one format — plain text lines (src/main.cpp:104).
A 100 TB lake is never that clean: partner drops arrive as CSV, scraped
feeds as JSONL, legacy Hive estates as ORC, and the engine must read and
write all of them WITHOUT value corruption. All three are Spark-builtin
JVM readers (no Python in the scan path), so the scan parallelism,
predicate pushdown (ORC), and whole-stage codegen story is the same as
parquet's; the formats differ in what they can silently mangle:

- **CSV** has no types and no nesting, and unescaped delimiters/newlines
  shred rows. The writer here always quotes-and-escapes; the reader gets
  an EXPLICIT schema (inference at 100 TB is an extra full pass), the
  matching quote/escape options, and ``multiLine`` so embedded newlines
  survive. ``mode=FAILFAST`` because a parity check must fail loudly.
- **JSONL** keeps types (mostly) but is schema-on-read; the read goes
  through ``jsonio.read_jsonl`` — explicit schema + explicit
  malformed-row policy — like every other JSON path in the engine.
- **ORC** is the columnar cousin: typed, splittable, predicate-pushdown
  capable; the risk is not mangling but dialect drift, so it rides the
  same checker.

The registered verdict (``source_format_parity``) round-trips the
documents corpus PLUS a torture batch (embedded commas, double quotes,
newlines, tabs, non-ASCII, a field that looks like a number) through
each format and certifies, per format: (1) the full round-tripped
relation is row-for-row identical to what was written (distributed
``exceptAll`` both ways — this is where unescaped CSV would die), and
(2) aggregates computed FROM THE ROUND-TRIPPED ROWS match DuckDB's
independent computation over the original parquet — the numbers flow
through the format under test, so a reader that padded, truncated, or
re-encoded text would break the anchor, not just the boolean.

At 100 TB the verdict's shape is unchanged: the round-trip is one write
plus one scan per format, the parity check is a co-partitioned
``exceptAll`` (sort-merge, spill-safe), and nothing collects to the
driver.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from .jsonio import read_jsonl
from .tables import load_table

_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

# Torture rows: every CSV/JSON failure mode the synthetic corpus is too
# polite to contain. doc_ids sit far above any real corpus id so the
# DuckDB-anchored aggregates can exclude them exactly.
_TORTURE_OFFSET = 10_000_000
_TORTURE_TEXTS = [
    'comma, "double quoted", trailing comma,',
    "embedded\nnewline and\r\ncarriage return",
    "tab\tseparated\tlooking\ttext",
    "unicode: école, 東京, naïve, Ωmega, emoji \U0001f600",
    "123456",  # numeric-looking string must stay a string
    "   leading and trailing spaces   ",
    "quote at end\"",
    "backslash \\n that is NOT a newline",
]


def _torture_rows(spark: SparkSession) -> DataFrame:
    rows = [
        (_TORTURE_OFFSET + i, t, "xx", "torture", len(t))
        for i, t in enumerate(_TORTURE_TEXTS)
    ]
    return spark.createDataFrame(rows, _DOC_SCHEMA)


def write_docs(df: DataFrame, fmt: str, path: str) -> None:
    """Write the documents relation in the given format with the loss-safe
    writer options (CSV always quotes-and-escapes; header on so the files
    are self-describing for humans even though readers get schemas)."""
    if fmt == "csv":
        (
            df.write.option("header", True)
            .option("quote", '"')
            .option("escape", '"')  # RFC-4180 doubled quotes
            # the writer TRIMS field whitespace by default — data loss
            .option("ignoreLeadingWhiteSpace", False)
            .option("ignoreTrailingWhiteSpace", False)
            .csv(path)
        )
    elif fmt == "jsonl":
        df.write.json(path)
    elif fmt == "orc":
        df.write.orc(path)
    else:
        raise ValueError(f"unknown format {fmt!r}")


def read_docs(spark: SparkSession, fmt: str, path: str) -> DataFrame:
    """Read the documents relation back with an EXPLICIT schema and a
    fail-loud malformed-row policy — the parity contract's read side."""
    if fmt == "csv":
        return (
            spark.read.schema(_DOC_SCHEMA)
            .option("header", True)
            .option("quote", '"')
            .option("escape", '"')
            .option("multiLine", True)  # embedded newlines stay in-field
            .option("ignoreLeadingWhiteSpace", False)
            .option("ignoreTrailingWhiteSpace", False)
            .option("mode", "FAILFAST")
            .csv(path)
        )
    if fmt == "jsonl":
        return read_jsonl(spark, path, _DOC_SCHEMA, mode="failfast")
    if fmt == "orc":
        return spark.read.schema(_DOC_SCHEMA).orc(path)
    raise ValueError(f"unknown format {fmt!r}")


_FORMATS = ("csv", "jsonl", "orc")


@query(
    "source_format_parity",
    oracle=(
        "SELECT f.format, "
        "CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_rows, "
        "CAST((SELECT sum(length(text)) FROM documents) AS BIGINT) "
        "AS sum_chars, "
        "CAST((SELECT count(DISTINCT source) FROM documents) AS BIGINT) "
        "AS n_sources, "
        "TRUE AS roundtrip_exact_ok "
        "FROM (VALUES ('csv'), ('jsonl'), ('orc')) f(format)"
    ),
)
def source_format_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered verdict: documents + torture batch round-tripped through
    CSV, JSONL, and ORC. Per format, ``roundtrip_exact_ok`` is the
    distributed written-vs-read multiset equality (torture rows included —
    unescaped delimiters, embedded newlines, and string/number confusion
    all fail HERE), while n_rows/sum_chars/n_sources are computed from the
    ROUND-TRIPPED original-corpus rows and must match DuckDB's independent
    answer over the parquet — corruption the booleans might rationalize
    shows up as an anchor mismatch."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    written = docs.unionByName(_torture_rows(spark)).localCheckpoint()
    out = []
    for fmt in _FORMATS:
        path = os.path.join(
            tempfile.mkdtemp(prefix="pmrwc_fmt_"), f"docs_{fmt}"
        )
        write_docs(written, fmt, path)
        back = read_docs(spark, fmt, path)
        exact = (
            written.exceptAll(back).limit(1).count() == 0
            and back.exceptAll(written).limit(1).count() == 0
        )
        anchor = (
            back.filter(F.col("doc_id") < _TORTURE_OFFSET)
            .agg(
                F.count("*").alias("n_rows"),
                F.sum(F.length("text")).alias("sum_chars"),
                F.countDistinct("source").alias("n_sources"),
            )
            .collect()[0]  # bounded: one aggregate row per format
        )
        out.append(
            (
                fmt,
                int(anchor.n_rows),
                int(anchor.sum_chars),
                int(anchor.n_sources),
                bool(exact),
            )
        )
    return spark.createDataFrame(
        out,
        "format STRING, n_rows BIGINT, sum_chars BIGINT, "
        "n_sources BIGINT, roundtrip_exact_ok BOOLEAN",
    )


# Broken feed lines, classified by how permissive mode ACTUALLY treats
# them (empirically pinned, not assumed): unparseable or type-mismatched
# lines land in _corrupt_record (the type-mismatch row keeps its
# parseable fields — replay value); a top-level ARRAY is valid JSON, so
# it yields silent all-null rows that only a schema-validity gate
# catches — the one case the corrupt column cannot see.
_CORRUPT_LINES = [
    '{"doc_id": 1, "text": "truncated',
    "this is not json at all",
    '{"doc_id": "not-a-number", "text": 7}',
]
_SILENT_LINES = ['[{"wrong": "shape"}]']  # → one all-null row


@query(
    "jsonl_corrupt_quarantine",
    oracle=(
        "SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_clean, "
        f"CAST({len(_CORRUPT_LINES)} AS BIGINT) AS n_corrupt, "
        f"CAST({len(_SILENT_LINES)} AS BIGINT) AS n_invalid, "
        "CAST((SELECT sum(length(text)) FROM documents) AS BIGINT) "
        "AS sum_chars, "
        "TRUE AS clean_matches_ok, TRUE AS corrupt_raw_kept_ok"
    ),
)
def jsonl_corrupt_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered face of the permissive-JSONL quarantine policy
    (``jsonio.read_jsonl`` + ``quarantine_split``): the documents corpus
    is written as JSONL, a file of broken lines (truncated object,
    non-JSON text, type-mismatched field, wrong top-level shape) is
    dropped into the same directory — the daily reality of a scraped or
    partner feed — and the permissive read must (1) recover every clean
    row EXACTLY (distributed exceptAll both ways against the corpus),
    (2) quarantine the unparseable/mistyped lines with their raw text
    preserved in ``_corrupt_record`` for replay, (3) catch the one shape
    the corrupt column CANNOT see — a top-level array parses as valid
    JSON and yields silent all-null rows — with a schema-validity gate
    (required keys non-null), and (4) never abort. ``n_clean``/
    ``sum_chars`` are recomputed by DuckDB from the parquet, so the
    anchor flows through the JSONL write → permissive read → two-tier
    quarantine.

    At scale this is the ingestion-time contract: clean stream feeds the
    pipeline, corrupt + invalid streams land in replay tables, and these
    counts are the dq gate a feed must pass. One write + one scan + one
    co-partitioned exceptAll; nothing collects but the corrupt lines."""
    from .jsonio import CORRUPT_COL, quarantine_split, read_jsonl

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    root = tempfile.mkdtemp(prefix="pmrwc_quar_")
    path = os.path.join(root, "feed")
    docs.write.json(path)
    with open(os.path.join(path, "zz_bad.json"), "w") as fh:
        fh.write("\n".join(_CORRUPT_LINES + _SILENT_LINES) + "\n")
    raw = read_jsonl(spark, path, _DOC_SCHEMA, mode="permissive")
    parsed, bad = quarantine_split(raw)
    # tier 2: schema-validity gate for parseable-but-degenerate rows
    valid = F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    clean = parsed.filter(valid)
    invalid_n = parsed.filter(~valid).count()
    clean_ok = (
        docs.exceptAll(clean).limit(1).count() == 0
        and clean.exceptAll(docs).limit(1).count() == 0
    )
    # doc_id rides along: a scan referencing ONLY the corrupt column is
    # rejected (QUERY_ONLY_CORRUPT_RECORD_COLUMN). Bounded: corrupt lines.
    bad_rows = bad.select("doc_id", CORRUPT_COL).collect()
    raw_kept = sorted(r[CORRUPT_COL] for r in bad_rows) == sorted(
        _CORRUPT_LINES
    )
    agg = clean.agg(
        F.count("*").alias("n"), F.sum(F.length("text")).alias("sc")
    ).collect()[0]
    return spark.createDataFrame(
        [
            (
                int(agg.n),
                len(bad_rows),
                int(invalid_n),
                int(agg.sc),
                bool(clean_ok),
                bool(raw_kept),
            )
        ],
        "n_clean BIGINT, n_corrupt BIGINT, n_invalid BIGINT, "
        "sum_chars BIGINT, clean_matches_ok BOOLEAN, "
        "corrupt_raw_kept_ok BOOLEAN",
    )

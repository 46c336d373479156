"""Unicode text normalization — the pass every multilingual corpus runs
before tokenization (extension surface; the reference treats bytes as
bytes, src/main.cpp:59-64, and has no notion of normalization).

Pipeline: NFC canonical composition → control characters to spaces →
space-run collapse → trim. NFC (not NFKC) on purpose: canonical
composition merges combining sequences ("e" + U+0301 → "é") without
destroying compatibility distinctions (ligatures, superscripts) that a
tokenizer may legitimately care about; corpora mixing keyboards and OCR
output contain BOTH encodings of the same grapheme, which breaks exact
dedup, shingle dedup, and vocabulary counts until normalized.

Engine boundary, stated honestly: Spark has no built-in Unicode
normalizer, so NFC runs as an Arrow-batched pandas UDF over
``unicodedata`` — the sanctioned slow path for genuinely-inexpressible
per-row transforms (same rule as the multimodal decoders). Everything
else (control strip, collapse, trim) is JVM regex inside whole-stage
codegen. The whole op is a linear map: no shuffle, no state, scales with
input splits.

Cross-engine subtleties the oracle pins:

- DuckDB's ``nfc_normalize`` and Python's ``unicodedata.normalize("NFC",
  ·)`` implement the same Unicode algorithm — agreement verified on
  combining sequences, ligatures, OHM/ANGSTROM sign singletons.
- Control characters are replaced via ``\\p{Cc}`` (valid in BOTH Java
  regex and RE2). After that pass every remaining whitespace is a plain
  space, so the collapse uses ``' +'`` — deliberately NOT ``\\s+``,
  whose character class differs between Java (includes U+000B) and RE2.

The synthetic corpus is pure ASCII (normalization would be identity), so
a TORTURE batch of non-ASCII rows — combining accents, precomposed
forms, NFC singletons, control characters, padded whitespace — is
unioned in by BOTH engines; the value hash covers the rows where
normalization actually does something.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..registry import query
from ..sources.tables import load_table

# doc_ids far above the corpus domain; every row exercises a distinct
# normalization behavior.
_TORTURE_NORM: list[tuple[int, str]] = [
    (20_000_000, "café combining acute composes"),
    (20_000_001, "café precomposed stays"),
    (20_000_002, "aÅring vs Ångstrom sign"),  # both → Å
    (20_000_003, "bellcontrol and\ttaband vtab"),
    (20_000_004, "  padded   runs \r\n and newlines  "),
    (20_000_005, "ﬁ ligature survives NFC"),
    (20_000_006, "ohm Ω becomes omega"),
]


def _nfc_udf():
    """Built lazily: pandas_udf return-type DDL parsing needs an active
    session (same note as functions/udfs.py), so the decorator cannot run
    at import time."""

    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    return _nfc


def normalized_text(col) -> "F.Column":
    """NFC → controls-to-space → space-run collapse → trim, as a column
    expression (NFC is the one Arrow-batched hop)."""
    x = _nfc_udf()(col)
    x = F.regexp_replace(x, r"\p{Cc}", " ")
    x = F.regexp_replace(x, " +", " ")
    return F.trim(x)


def _torture_values_sql() -> str:
    rows = ", ".join(
        "(CAST({} AS BIGINT), '{}')".format(i, t.replace("'", "''"))
        for i, t in _TORTURE_NORM
    )
    return f"(VALUES {rows}) tv(doc_id, text)"


@query(
    "text_normalize_nfc",
    oracle=(
        "WITH all_docs AS (SELECT doc_id, text FROM documents "
        f"UNION ALL SELECT doc_id, text FROM {_torture_values_sql()}), "
        "n AS (SELECT doc_id, text, trim(regexp_replace(regexp_replace("
        "nfc_normalize(text), '\\p{Cc}', ' ', 'g'), ' +', ' ', 'g')) "
        "AS norm_text FROM all_docs) "
        "SELECT doc_id, norm_text, norm_text <> text AS changed, "
        "CAST(length(norm_text) AS BIGINT) AS n_chars_norm FROM n"
    ),
)
def text_normalize_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered face of the normalization pass over documents plus the
    non-ASCII torture batch (module docstring): per row, the normalized
    text, whether normalization changed anything, and the normalized
    character count — all value-hashed against DuckDB's independent
    ``nfc_normalize`` + RE2 pipeline."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    torture = spark.createDataFrame(_TORTURE_NORM, "doc_id LONG, text STRING")
    d = docs.unionByName(torture)
    norm = normalized_text(F.col("text"))
    return d.select(
        "doc_id",
        norm.alias("norm_text"),
        (norm != F.col("text")).alias("changed"),
        F.length(norm).cast("long").alias("n_chars_norm"),
    )

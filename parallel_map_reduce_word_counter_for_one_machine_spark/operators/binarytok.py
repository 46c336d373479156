"""Byte-level tokenizer over ``BinaryType`` columns — exact reference parity
including invalid UTF-8.

Spark ``StringType`` holds validated UTF-8, so the regex tokenizer
(``wordcount.REF_DELIM_REGEX``) cannot see byte sequences that are not valid
UTF-8 — the one reference behavior SURVEY.md §7 declared out of scope. This
operator closes the gap by tokenizing raw bytes with the reference's exact
per-byte predicate (reference src/main.cpp:59-64):

    word-char(b)  iff  (isalpha(b) || b >= 0x80) && b != '-' && !isspace(b)

which in the C locale reduces to: ASCII letter or any byte >= 0x80 ('-' and
whitespace are not letters). Digits, punctuation, and whitespace delimit;
NBSP bytes (0xC2 0xA0 — both >= 0x80) stay inside words; empty tokens never
occur (runs are maximal).

Execution: Arrow-batched ``mapInPandas``; per document the byte-class test
and word-run extraction are vectorized with a 256-entry numpy lookup table
(no per-byte Python loop). This is the deliberate slow-path fallback — the
hot path stays ``REF_DELIM_REGEX`` JVM-side; use this only when inputs may
carry invalid UTF-8 (e.g. scraped corpora before encoding repair).

Differentially tested against the COMPILED reference binary on crafted
invalid-UTF-8 inputs (tests/test_binary_tokenizer.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load_table


def _wordchar_lut():
    import numpy as np

    lut = np.zeros(256, dtype=bool)
    lut[ord("A") : ord("Z") + 1] = True
    lut[ord("a") : ord("z") + 1] = True
    lut[0x80:] = True
    return lut


def tokenize_binary(df: DataFrame, bin_col: str = "data") -> DataFrame:
    """flatMap a binary column into one row per word (``word: binary``),
    reproducing the reference byte loop on arbitrary bytes."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        lut = _wordchar_lut()
        for pdf in batches:
            words: list[bytes] = []
            for raw in pdf[bin_col]:
                if raw is None or len(raw) == 0:
                    continue
                b = bytes(raw)
                arr = np.frombuffer(b, dtype=np.uint8)
                mask = lut[arr]
                # maximal True-runs of the word-char mask = words
                d = np.diff(mask.astype(np.int8))
                starts = np.flatnonzero(d == 1) + 1
                ends = np.flatnonzero(d == -1) + 1
                if mask[0]:
                    starts = np.concatenate(([0], starts))
                if mask[-1]:
                    ends = np.concatenate((ends, [arr.size]))
                words.extend(b[s:e] for s, e in zip(starts, ends))
            yield pd.DataFrame({"word": pd.Series(words, dtype=object)})

    return df.select(bin_col).mapInPandas(gen, schema="word binary")


def word_count_bytes(df: DataFrame, bin_col: str = "data") -> DataFrame:
    """Byte-exact word count: binary tokenize → groupBy(word: binary).count.
    Spark hash-aggregates binary keys natively; the count pipeline after the
    UDF stage is identical to the flagship's (partial agg → one shuffle)."""
    return tokenize_binary(df, bin_col).groupBy("word").agg(
        F.count("*").alias("cnt")
    )


@query(
    "word_count_binary",
    oracle=(
        "SELECT word, count(*) AS cnt FROM ("
        "SELECT unnest(string_split(text, ' ')) AS word FROM documents"
        ") tok WHERE word <> '' GROUP BY word"
    ),
)
def word_count_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship through the byte-level tokenizer: encode text → binary
    → byte tokenize → count → decode. On the driver corpus every token is
    pure ASCII letters, so the result equals ``word_count`` and the same
    oracle applies; the invalid-UTF-8 capability is exercised by the
    reference-binary differential test."""
    docs = load_table(spark, sf_dir, "documents")
    bin_docs = docs.select(F.encode("text", "UTF-8").alias("data"))
    wc = word_count_bytes(bin_docs)
    return wc.select(F.decode("word", "UTF-8").alias("word"), "cnt")

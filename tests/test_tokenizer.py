"""Reference-tokenizer parity on the adversarial fixture (FIXTURES.md §B)
and binary-collation ordering (§C) — the semantics empirically verified
against the compiled reference binary (SURVEY.md §1):

- word-char = ASCII letter or any byte ≥ 0x80 (reference src/main.cpp:59-64)
- digits / hyphen / apostrophe / underscore / whitespace delimit
- NBSP is a word character (abandoned fix at src/main.cpp:62)
- case-sensitive (no folding; README.md:172)
- alpha sort is byte-wise binary collation (src/main.cpp:221-224)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parallel_map_reduce_word_counter_for_one_machine_spark.operators.wordcount import (
    tokenize_ref,
)

# (case_id, text, expected tokens) — expected values ARE the oracle,
# derived from actual reference-binary runs (FIXTURES.md §B).
TOK_CASES = [
    (1, "Hello hello", ["Hello", "hello"]),
    (2, "world-peace", ["world", "peace"]),
    (3, "123abc", ["abc"]),
    (4, "O'Brien", ["O", "Brien"]),
    (5, "under_score", ["under", "score"]),
    (6, "tab\there", ["tab", "here"]),
    (7, "täällä", ["täällä"]),
    (8, "a b", ["a b"]),  # NBSP is a word char
    (9, "end-", ["end"]),
    (10, " x  y ", ["x", "y"]),
    (11, "", []),
]


@pytest.mark.parametrize("case_id,text,expected", TOK_CASES)
def test_reference_tokenizer_parity(spark, case_id, text, expected):
    df = spark.createDataFrame([(text,)], ["text"])
    got = [r.word for r in tokenize_ref(df).collect()]
    assert got == expected, f"case {case_id}: {got!r} != {expected!r}"


def test_case_sensitivity_preserved(spark):
    df = spark.createDataFrame([("Hello hello Hello",)], ["text"])
    counts = {
        r.word: r.cnt
        for r in tokenize_ref(df).groupBy("word").agg(F.count("*").alias("cnt")).collect()
    }
    assert counts == {"Hello": 2, "hello": 1}


def test_binary_collation_order(spark):
    """Spark's default string orderBy must reproduce the reference's
    byte-wise order: ASCII uppercase < lowercase < multi-byte UTF-8
    (observed output order of the compiled reference, FIXTURES.md §C)."""
    words = ["Brien", "Hello", "O", "abc", "a b", "end", "täällä"]
    import random

    shuffled = words[:]
    random.Random(7).shuffle(shuffled)
    df = spark.createDataFrame([(w,) for w in shuffled], ["word"])
    got = [r.word for r in df.orderBy("word").collect()]
    assert got == sorted(words)  # python sorts str by code point == binary here
    assert got == words

def test_collation_vs_reference_binary_semantics(spark):
    """The reference's key semantics are byte-wise and case-SENSITIVE
    (main.cpp:65, 221-224): 'Hello' ≠ 'hello' and uppercase sorts before
    lowercase. Spark 4's collation support lets the engine OPT INTO
    case-insensitive semantics per expression — this pins both: the
    default (used by every word op) stays binary, and UTF8_LCASE is
    available when a pipeline wants folding without rewriting keys."""
    cs = spark.sql(
        "SELECT 'Hello' = 'hello' AS eq_default, "
        "'Hello' = 'hello' COLLATE UTF8_LCASE AS eq_lcase"
    ).collect()[0]
    assert cs.eq_default is False and cs.eq_lcase is True
    binary = spark.sql(
        "SELECT w FROM VALUES ('b'), ('A'), ('a'), ('B') AS t(w) ORDER BY w"
    ).collect()
    assert [r.w for r in binary] == ["A", "B", "a", "b"]  # bytewise, as ref
    folded = spark.sql(
        "SELECT w FROM VALUES ('b'), ('A'), ('a'), ('B') AS t(w) "
        "ORDER BY w COLLATE UTF8_LCASE, w"
    ).collect()
    assert [r.w for r in folded] == ["A", "a", "B", "b"]

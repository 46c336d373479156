"""Property-based parity: the Spark regex tokenizer must agree with a
direct Python transliteration of the reference's byte-class rule on
arbitrary valid-Unicode strings (hypothesis-generated).

Reference rule (src/main.cpp:59-64, verified in SURVEY.md §1): a byte is a
word-char iff it is an ASCII letter or ≥ 0x80; over valid UTF-8 that means
delimiters are exactly the ASCII non-letters. The Python model implements
that rule on code points (equivalent on valid Unicode strings, which is
Spark's string domain).
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from parallel_map_reduce_word_counter_for_one_machine_spark.operators.wordcount import (
    tokenize_ref,
)

_PY_DELIM = re.compile(r"[\x00-\x7F]+")


def reference_model(text: str) -> list[str]:
    """Pure-Python model of the reference tokenizer on a Unicode string."""
    out: list[str] = []
    cur: list[str] = []
    for ch in text:
        is_word = (not ch.isascii()) or ("a" <= ch <= "z") or ("A" <= ch <= "Z")
        if is_word:
            cur.append(ch)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


# Mix of ASCII, punctuation, digits, Latin-1, CJK, NBSP-heavy strings.
texts = st.text(
    alphabet=st.characters(
        codec="utf-8",
        exclude_characters=["\x00"],  # Spark strings cannot contain NUL reliably
    ),
    max_size=60,
)


@settings(max_examples=30, deadline=None)
@given(st.lists(texts, min_size=1, max_size=8))
def test_tokenizer_matches_python_model(spark, rows):
    df = spark.createDataFrame([(t,) for t in rows], ["text"])
    got = [r.word for r in tokenize_ref(df).collect()]
    want = [w for t in rows for w in reference_model(t)]
    assert sorted(got) == sorted(want)

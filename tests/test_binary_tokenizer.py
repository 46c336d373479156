"""Byte-level tokenizer parity — differential test against the COMPILED
reference binary, on inputs that include INVALID UTF-8.

This is the strongest parity evidence in the suite: the oracle is the
reference program itself (g++ src/main.cpp, run on a crafted input file;
its ``output.txt`` ``word -> count`` listing is parsed as raw bytes and
compared to our ``word_count_bytes`` result). Covers the one behavior the
string-typed regex tokenizer cannot (SURVEY.md §7): byte sequences that are
not valid UTF-8 — lone continuation bytes, Latin-1 punning, 0xFF/0xFE.
"""

from __future__ import annotations

import shutil
import subprocess

import pytest

from parallel_map_reduce_word_counter_for_one_machine_spark.operators.binarytok import (
    tokenize_binary,
    word_count_bytes,
)

REF_SRC = "/root/reference/src/main.cpp"

# One line per entry; deliberately adversarial bytes. NOTE: raw bytes, not
# str — several are invalid UTF-8 and can never round-trip through a Spark
# string column.
LINES = [
    b"Hello hello world-peace 123abc",
    b"caf\xe9 latte",  # 0xE9 = Latin-1 e-acute: lone continuation, invalid UTF-8
    b"\xffstart mid\xfe\xffend\xff",  # 0xFF/0xFE never appear in UTF-8
    b"ab\x80\x80cd",  # bare continuation bytes inside a word
    b"t\xc3\xa4\xc3\xa4ll\xc3\xa4 nbsp\xc2\xa0joined",  # valid UTF-8 + NBSP
    b"O'Brien under_score end- -start",
    b"",  # empty line
    b"   ",  # whitespace only
    b"\x80",  # single high byte
    b"mixed\t tabs\tand  spaces",
]


@pytest.fixture(scope="module")
def ref_binary(tmp_path_factory):
    if shutil.which("g++") is None:
        pytest.skip("g++ not available")
    import os

    if not os.path.exists(REF_SRC):
        pytest.skip("reference source not available")
    d = tmp_path_factory.mktemp("refbin")
    exe = d / "wordcount"
    subprocess.run(
        ["g++", "-std=c++17", "-O2", "-pthread", REF_SRC, "-o", str(exe)],
        check=True,
        capture_output=True,
    )
    return exe


def run_reference(exe, workdir, data: bytes) -> dict[bytes, int]:
    inp = workdir / "input.txt"
    inp.write_bytes(data)
    subprocess.run(
        [str(exe), str(inp)], cwd=workdir, check=True, capture_output=True
    )
    out = (workdir / "output.txt").read_bytes()
    counts: dict[bytes, int] = {}
    for line in out.split(b"\n"):
        if not line or b" -> " not in line:
            continue  # header / blank
        word, _, cnt = line.rpartition(b" -> ")
        counts[word] = int(cnt)
    return counts


def test_byte_tokenizer_matches_reference_binary(spark, ref_binary, tmp_path):
    expected = run_reference(ref_binary, tmp_path, b"\n".join(LINES) + b"\n")
    assert expected, "reference produced no words — fixture broken"
    df = spark.createDataFrame([(bytearray(l),) for l in LINES], "data binary")
    got = {
        bytes(r.word): r.cnt for r in word_count_bytes(df).collect()
    }
    assert got == expected


def test_listing_files_byte_identical_to_reference(spark, ref_binary, tmp_path):
    """Full sink-shape parity: run the COMPILED reference on a fixture file
    and byte-diff its output.txt / output2.txt against our distributed
    listings (part files concatenated in name order) — headers included.
    Word counts in the fixture are all distinct, so the reference's
    unstable frequency tie order cannot differ from our pinned one."""
    text = "ccc bbb aaa\nbbb aaa ccc\naaa ccc\nccc\n"  # aaa=3 bbb=2 ccc=4
    inp = tmp_path / "input.txt"
    inp.write_text(text, encoding="utf-8")
    subprocess.run(
        [str(ref_binary), str(inp)], cwd=tmp_path, check=True, capture_output=True
    )
    ref_alpha = (tmp_path / "output.txt").read_bytes()
    ref_freq = (tmp_path / "output2.txt").read_bytes()

    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.textfile import (
        run_reference_pipeline,
    )

    out = tmp_path / "spark_out"
    run_reference_pipeline(spark, str(inp), str(out))

    def concat_parts(d):
        parts = sorted((out / d).glob("part-*"))
        return b"".join(p.read_bytes() for p in parts)

    assert concat_parts("alpha") == ref_alpha
    assert concat_parts("by_count") == ref_freq


def test_byte_tokenizer_agrees_with_regex_on_valid_utf8(spark):
    """On valid UTF-8 the byte tokenizer and the JVM-side regex tokenizer
    must produce identical token streams (decoded)."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.wordcount import (
        tokenize_ref,
    )

    texts = [
        "Hello hello world-peace 123abc",
        "täällä nbsp joined",
        "O'Brien under_score end- -start",
        "mixed\t tabs\tand  spaces",
    ]
    sdf = spark.createDataFrame([(t,) for t in texts], "text string")
    via_regex = sorted(r.word for r in tokenize_ref(sdf).collect())
    bdf = sdf.selectExpr("encode(text, 'UTF-8') AS data")
    via_bytes = sorted(
        bytes(r.word).decode("utf-8") for r in tokenize_binary(bdf).collect()
    )
    assert via_bytes == via_regex

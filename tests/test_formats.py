"""Multi-format (CSV/JSONL/ORC) round-trip parity — sources/formats.py."""

from __future__ import annotations

import os

from parallel_map_reduce_word_counter_for_one_machine_spark import registry
from parallel_map_reduce_word_counter_for_one_machine_spark.sources.formats import (
    _torture_rows,
    read_docs,
    write_docs,
)

from .oracle import assert_matches_oracle


def test_format_parity_matches_oracle(spark, sf_correct):
    """The registered verdict must match its DuckDB anchor (aggregates
    flow through each round-tripped format) and every format's exactness
    boolean must hold — torture rows (embedded delimiters, newlines,
    unicode, padded whitespace) included."""
    assert_matches_oracle(
        spark,
        sf_correct,
        "source_format_parity",
        registry.QUERIES["source_format_parity"],
        registry.ORACLES["source_format_parity"],
    )
    rows = registry.QUERIES["source_format_parity"](spark, sf_correct).collect()
    assert {r.format for r in rows} == {"csv", "jsonl", "orc"}
    assert all(r.roundtrip_exact_ok for r in rows)


def test_torture_rows_catch_lossy_csv_writer(spark, tmp_path):
    """Negative control: a DEFAULT-options CSV writer (backslash escape,
    whitespace trimming) must FAIL the round-trip on the torture batch —
    proving the parity check has teeth, not just that Spark round-trips
    polite data."""
    t = _torture_rows(spark)
    path = str(tmp_path / "lossy_csv")
    t.write.option("header", True).csv(path)  # defaults: trim + backslash
    try:
        back = read_docs(spark, "csv", path)
        same = (
            t.exceptAll(back).limit(1).count() == 0
            and back.exceptAll(t).limit(1).count() == 0
        )
    except Exception:
        # FAILFAST aborting on the mangled file is detection working too
        same = False
    assert not same


def test_each_format_roundtrips_torture_batch(spark, tmp_path):
    """Per-format value-level equality on the torture batch alone (small
    and collectable, so a failure prints the exact mangled row)."""
    t = _torture_rows(spark)
    want = sorted(map(tuple, t.collect()))
    for fmt in ("csv", "jsonl", "orc"):
        path = str(tmp_path / f"rt_{fmt}")
        write_docs(t, fmt, path)
        got = sorted(map(tuple, read_docs(spark, fmt, path).collect()))
        assert got == want, f"{fmt} mangled the torture batch"
        assert any(
            f.endswith((".csv", ".json", ".orc"))
            for f in os.listdir(path)
            if not f.startswith(("_", "."))
        )


def test_jsonl_quarantine_two_tiers(spark, sf_correct):
    """Oracle match + the two-tier semantics pinned: unparseable and
    type-mismatched lines are quarantined WITH raw text; a top-level
    array — valid JSON the corrupt column cannot flag — is caught by the
    validity gate; the clean stream is exactly the corpus."""
    from parallel_map_reduce_word_counter_for_one_machine_spark import registry
    from .oracle import assert_matches_oracle

    assert_matches_oracle(
        spark,
        sf_correct,
        "jsonl_corrupt_quarantine",
        registry.QUERIES["jsonl_corrupt_quarantine"],
        registry.ORACLES["jsonl_corrupt_quarantine"],
    )
    row = registry.QUERIES["jsonl_corrupt_quarantine"](spark, sf_correct).collect()[0]
    assert row.clean_matches_ok and row.corrupt_raw_kept_ok
    assert row.n_corrupt == 3 and row.n_invalid == 1

"""Unicode normalization pass — operators/textnorm.py."""

from __future__ import annotations

from parallel_map_reduce_word_counter_for_one_machine_spark import registry
from parallel_map_reduce_word_counter_for_one_machine_spark.operators import (
    textnorm,
)

from .oracle import assert_matches_oracle


def test_text_normalize_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "text_normalize_nfc",
        registry.QUERIES["text_normalize_nfc"],
        registry.ORACLES["text_normalize_nfc"],
    )


def test_torture_rows_normalize_as_documented(spark, sf_correct):
    """Each torture row's behavior, asserted individually: combining
    sequences compose, precomposed text is untouched, NFC singletons
    (ANGSTROM, OHM) rewrite, ligatures survive (NFC ≠ NFKC), controls
    become spaces, runs collapse, padding trims."""
    import unicodedata

    rows = {
        r.doc_id: r
        for r in registry.QUERIES["text_normalize_nfc"](spark, sf_correct)
        .filter("doc_id >= 20000000")
        .collect()
    }
    t = dict(textnorm._TORTURE_NORM)
    # combining acute composed: length shrinks by 1, row flagged changed
    assert rows[20_000_000].changed
    assert rows[20_000_000].n_chars_norm == len(t[20_000_000]) - 1
    # precomposed: identity
    assert not rows[20_000_001].changed
    # singletons: ANGSTROM -> A-ring, OHM -> OMEGA
    assert "Å" in rows[20_000_002].norm_text
    assert "Å" not in rows[20_000_002].norm_text
    assert "Ω" in rows[20_000_006].norm_text
    # controls became single spaces
    assert rows[20_000_003].norm_text == "bell control and tab and vtab"
    # padding trimmed, runs collapsed
    assert rows[20_000_004].norm_text == "padded runs and newlines"
    # ligature survives NFC
    assert rows[20_000_005].norm_text.startswith("ﬁ")
    # and the whole pipeline agrees with a pure-python recomputation
    import re

    for i, s in t.items():
        x = unicodedata.normalize("NFC", s)
        x = re.sub(r"[\x00-\x1f\x7f\x80-\x9f]", " ", x)
        x = re.sub(" +", " ", x).strip()
        assert rows[i].norm_text == x, i

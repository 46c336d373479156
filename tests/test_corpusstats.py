from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parallel_map_reduce_word_counter_for_one_machine_spark import registry

from .oracle import assert_matches_oracle

registry.load_all()

KEYS = ["corpus_drift_chi2", "pmi_bigrams", "zipf_slope"]


@pytest.mark.parametrize("name", KEYS)
def test_oracle_match(spark, sf_correct, name):
    assert_matches_oracle(
        spark, sf_correct, name, registry.QUERIES[name], registry.ORACLES[name]
    )


def test_chi2_nonnegative_and_bounded_rows(spark, sf_correct):
    """χ² is non-negative by construction and the report is bounded by the
    head-vocabulary size (never by corpus size)."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.corpusstats import (
        DRIFT_VOCAB,
    )

    rows = registry.QUERIES["corpus_drift_chi2"](spark, sf_correct).collect()
    assert 0 < len(rows) <= DRIFT_VOCAB
    assert all(r.chi2 >= 0 for r in rows)
    assert all(r.c_a + r.c_b > 0 for r in rows)


def test_pmi_matches_hand_computation(spark, tmp_path):
    """The operator end-to-end on a tiny synthetic corpus vs PMI computed
    by hand in python: 'a b' × 6 gives 12 tokens, 11 bigrams — (a,b)×6
    and (b,a)×5, both above the count floor."""
    import math

    d = spark.createDataFrame(
        [(1, "a b a b a b a b a b a b")], "doc_id long, text string"
    )
    d.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        (r.w1, r.w2): (r.c12, r.pmi)
        for r in registry.QUERIES["pmi_bigrams"](spark, str(tmp_path)).collect()
    }
    n1, n2 = 12, 11
    pa = pb = 6 / n1
    expect_ab = round(math.log(6 / n2) - math.log(pa) - math.log(pb), 6)
    expect_ba = round(math.log(5 / n2) - math.log(pa) - math.log(pb), 6)
    assert out == {("a", "b"): (6, expect_ab), ("b", "a"): (5, expect_ba)}


def test_zipf_slope_negative_on_real_corpus(spark, sf_correct):
    """Word frequencies fall with rank, so the fitted slope must be
    negative, and the fit must cover the whole (small) head vocabulary."""
    row = registry.QUERIES["zipf_slope"](spark, sf_correct).collect()[0]
    assert row.slope < 0
    assert row.n_words > 5


def test_corpus_health_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "corpus_health_report",
        registry.QUERIES["corpus_health_report"],
        registry.ORACLES["corpus_health_report"],
    )


def _rhu(x, nd=0):
    """Half-up rounding on the double's shortest repr — the engines'
    round() semantics; Python's built-in round() is banker's and flips
    exact-.5 cases the other way."""
    import decimal

    q = decimal.Decimal(1).scaleb(-nd)
    return float(
        decimal.Decimal(repr(x)).quantize(q, rounding=decimal.ROUND_HALF_UP)
    )


def test_corpus_health_vs_python(spark, sf_dir):
    import hashlib

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    fpc = {}
    rows = []
    for r in docs:
        toks = [w for w in r.text.split(" ") if w]
        if not toks:
            continue
        fp = hashlib.md5(r.text.encode()).hexdigest()
        fpc[fp] = fpc.get(fp, 0) + 1
        rows.append((r.source, r.lang, r.n_chars, fp, len(toks),
                     int(_rhu(len(set(toks)) / len(toks) * 1e6))))
    total = sum(t[4] for t in rows)
    by_src = {}
    for t in rows:
        by_src.setdefault(t[0], []).append(t)
    got = {
        r.source: r
        for r in registry.QUERIES["corpus_health_report"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(by_src)
    share_sum = 0
    for src, xs in by_src.items():
        g = got[src]
        assert g.n_docs == len(xs)
        assert g.n_tokens == sum(t[4] for t in xs)
        assert g.token_share_e6 == int(_rhu(g.n_tokens * 1e6 / total))
        assert g.dup_docs == sum(1 for t in xs if fpc[t[3]] > 1)
        assert g.mean_ttr_e6 == int(_rhu(sum(t[5] for t in xs) / len(xs)))
        assert g.n_langs == len({t[1] for t in xs})
        lens = sorted(t[2] for t in xs)
        mid = (len(lens) - 1) / 2
        med = (lens[int(mid)] + lens[int(mid + 0.5)]) / 2
        assert abs(g.median_len - round(med, 2)) < 1e-9
        share_sum += g.token_share_e6
    # shares account for the whole corpus (rounding slack)
    assert abs(share_sum - 1_000_000) <= len(by_src)

from __future__ import annotations

import pytest

from parallel_map_reduce_word_counter_for_one_machine_spark import registry

from .oracle import assert_matches_oracle

registry.load_all()

TEXT_KEYS = [
    "text_stats",
    "lang_id",
    "quality_score",
    "token_count_bpe",
    "doc_fingerprint",
    "ngram_bigrams",
    "tfidf",
    "lm_unigram_logprob",
    "oov_rate",
    "quality_deciles",
    "dsir_weights",
]


@pytest.mark.parametrize("name", TEXT_KEYS)
def test_oracle_match(spark, sf_correct, name):
    assert_matches_oracle(
        spark, sf_correct, name, registry.QUERIES[name], registry.ORACLES[name]
    )


def test_inverted_index_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "inverted_index",
        registry.QUERIES["inverted_index"],
        registry.ORACLES["inverted_index"],
    )


def test_inverted_index_semantics(spark, sf_correct):
    """df counts DOCUMENTS (not occurrences), postings are sorted unique
    doc_ids, and the 100-id cap binds only when df exceeds it."""
    rows = {
        r.word: r for r in registry.QUERIES["inverted_index"](spark, sf_correct).collect()
    }
    from pyspark.sql import functions as F
    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        load_table,
    )

    docs = load_table(spark, sf_correct, "documents")
    some_word = next(iter(rows))
    expected_df = docs.filter(
        F.array_contains(F.split("text", " "), some_word)
    ).count()
    assert rows[some_word].df == expected_df
    for r in rows.values():
        ids = [int(x) for x in r.postings.split(",")]
        assert ids == sorted(set(ids))
        assert len(ids) == min(r.df, 100)


def test_quality_repetition_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "quality_repetition",
        registry.QUERIES["quality_repetition"],
        registry.ORACLES["quality_repetition"],
    )


def test_quality_repetition_flags_spam(spark, sf_correct):
    """A synthetic 'spam spam spam' doc must score ~1.0; normal corpus docs
    must not. (Built by unioning one constructed row into the real table's
    lineage so the operator code path is identical.)"""
    from pyspark.sql import functions as F

    df = registry.QUERIES["quality_repetition"](spark, sf_correct)
    # the real corpus has no degenerate all-one-bigram docs
    assert df.filter(F.col("repetition_ratio") >= 0.99).count() == 0
    spam = spark.createDataFrame(
        [(999999, "spam spam spam spam spam")], ["doc_id", "text"]
    )
    w = F.split(F.col("text"), " ")
    tail = F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0)))
    bigrams = F.zip_with(
        w, tail, lambda a, b: F.when(b.isNotNull(), F.concat_ws(" ", a, b))
    )
    counts = (
        spam.select("doc_id", F.explode(bigrams).alias("bigram"))
        .filter(F.col("bigram").isNotNull())
        .groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("n"))
        .groupBy("doc_id")
        .agg((F.max("n").cast("double") / F.sum("n")).alias("ratio"))
    )
    assert counts.collect()[0].ratio == 1.0


def test_corpus_stats_oracle(spark, sf_correct):
    from .oracle import assert_matches_oracle

    assert_matches_oracle(
        spark,
        sf_correct,
        "corpus_stats",
        registry.QUERIES["corpus_stats"],
        registry.ORACLES["corpus_stats"],
    )


def test_corpus_stats_totals_consistent(spark, sf_correct):
    """Cell totals must add up to whole-corpus totals (no doc dropped or
    double-counted by the grouping)."""
    import pyspark.sql.functions as F

    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        load_table,
    )

    df = registry.QUERIES["corpus_stats"](spark, sf_correct)
    got = df.agg(
        F.sum("n_docs").alias("d"), F.sum("total_chars").alias("c")
    ).collect()[0]
    docs = load_table(spark, sf_correct, "documents")
    want = docs.agg(
        F.count("*").alias("d"), F.sum(F.length("text")).alias("c")
    ).collect()[0]
    assert (got["d"], got["c"]) == (want["d"], want["c"])


def test_dsir_weights_favor_target_signature_tokens(spark, sf_correct):
    """The importance-weight sign is meaningful: a token's per-token llr
    is positive iff it is RELATIVELY more frequent in the target slice
    than in the raw corpus, so docs whose tokens skew target-ward must
    outscore docs that skew away. Pin the aggregate form: mean avg_llr of
    target-lang docs > mean of the rest (the model was fit to make
    exactly this separation), and `selected` is the >0 threshold."""
    from pyspark.sql import functions as F

    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.text import (
        DSIR_TARGET_LANG,
        dsir_weights,
    )
    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        load_table,
    )

    w = dsir_weights(spark, sf_correct)
    langs = load_table(spark, sf_correct, "documents").select("doc_id", "lang")
    j = w.join(langs, "doc_id")
    means = {
        r.is_t: r.m
        for r in j.groupBy(
            (F.col("lang") == DSIR_TARGET_LANG).alias("is_t")
        )
        .agg(F.avg("avg_llr").alias("m"))
        .collect()
    }
    assert means[True] > means[False], means
    rows = w.collect()
    assert all((r.avg_llr > 0) == r.selected for r in rows)


def test_lang_agreement_report_is_confusion_matrix(spark, sf_correct):
    """Oracle match + confusion-matrix laws: cell counts sum to the
    corpus, fractions sum to ~1 per declared row, every cell consistent
    with a collected lang_id recomputation."""
    from parallel_map_reduce_word_counter_for_one_machine_spark import registry
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.text import (
        lang_id,
    )
    from .oracle import assert_matches_oracle

    assert_matches_oracle(
        spark,
        sf_correct,
        "lang_agreement_report",
        registry.QUERIES["lang_agreement_report"],
        registry.ORACLES["lang_agreement_report"],
    )
    rows = registry.QUERIES["lang_agreement_report"](spark, sf_correct).collect()
    cells = {(r.declared, r.predicted): r.n_docs for r in rows}
    truth: dict[tuple, int] = {}
    for r in lang_id(spark, sf_correct).collect():
        truth[(r.lang, r.pred_lang)] = truth.get((r.lang, r.pred_lang), 0) + 1
    assert cells == truth
    by_declared: dict[str, float] = {}
    for r in rows:
        by_declared[r.declared] = by_declared.get(r.declared, 0.0) + r.frac_of_declared
    for lang, s in by_declared.items():
        assert abs(s - 1.0) < 1e-4, (lang, s)


# --- phrase_search ------------------------------------------------------------


def test_phrase_search_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "phrase_search",
        registry.QUERIES["phrase_search"],
        registry.ORACLES["phrase_search"],
    )


def test_phrase_search_counts_equal_direct_ngram_scan(spark, sf_correct):
    """The posting-list intersection must agree with a direct trigram scan:
    sum of per-doc matches == corpus-wide occurrence count of the phrase,
    and the phrase is the trigram argmax under (count DESC, phrase ASC)."""
    from pyspark.sql import functions as F
    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        load_table,
    )

    out = registry.QUERIES["phrase_search"](spark, sf_correct).cache()
    phrase = out.select("phrase").first().phrase
    d = load_table(spark, sf_correct, "documents")
    toks = d.select(F.filter(F.split("text", " "), lambda w: w != "").alias("w"))
    tri = toks.select(
        F.explode(
            F.when(
                F.size("w") >= 3,
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - 2),
                    lambda i: F.array_join(F.slice(F.col("w"), i, 3), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g")
    ).cache()
    counts = tri.groupBy("g").agg(F.count("*").alias("c"))
    top = counts.orderBy(F.desc("c"), F.asc("g")).first()
    assert top.g == phrase
    direct = tri.filter(F.col("g") == phrase).count()
    got = out.agg(F.sum("n_matches")).first()[0]
    tri.unpersist()
    out.unpersist()
    assert got == direct
    assert top.c == direct


def test_phrase_search_prunes_terms_before_join(spark, sf_correct):
    """Query cost must scale with the phrase terms' posting lists: the
    term filter (word IN phrase-terms) sits below every join in the plan."""
    out = registry.QUERIES["phrase_search"](spark, sf_correct)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" in plan
    # posexplode feeds a Filter on `word` before any join input is built
    assert "word#" in plan and "Filter" in plan

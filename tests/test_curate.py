from __future__ import annotations

from parallel_map_reduce_word_counter_for_one_machine_spark import registry
from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
    SCHEMAS,
    load_table,
)

from .oracle import assert_matches_oracle

registry.load_all()


def test_curate_corpus_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "curate_corpus",
        registry.QUERIES["curate_corpus"],
        registry.ORACLES["curate_corpus"],
    )


def test_orc_roundtrip(spark, sf_correct, tmp_path):
    """ORC connector (another format the reference lacks, SURVEY.md §2b)."""
    src = load_table(spark, sf_correct, "part")
    out = str(tmp_path / "part_orc")
    src.write.mode("overwrite").orc(out)
    back = spark.read.schema(SCHEMAS["part"]).orc(out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_decontaminate_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "decontaminate",
        registry.QUERIES["decontaminate"],
        registry.ORACLES["decontaminate"],
    )


def test_decontaminate_broadcasts_eval_set(spark, sf_correct):
    """The eval shingle set must broadcast (it is benchmark-sized, the
    training corpus is not): no corpus-wide shuffle on the hit join."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.plans.inspect import (
        plan_string,
    )

    p = plan_string(registry.QUERIES["decontaminate"](spark, sf_correct), mode="simple")
    assert "BroadcastHashJoin" in p


def test_decontaminate_flags_actual_overlap(spark, sf_correct):
    """An eval doc's verbatim twin in the training split must be flagged;
    eval docs themselves never appear in the output."""
    from pyspark.sql import functions as F
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.pipeline import (
        DECONTAM_EVAL_MOD,
    )

    out = registry.QUERIES["decontaminate"](spark, sf_correct)
    assert out.filter(F.col("doc_id") % DECONTAM_EVAL_MOD == 0).count() == 0
    # every contaminated doc must have >= 1 shared shingle by definition
    assert out.filter(
        F.col("contaminated") & (F.col("n_eval_shingles") < 1)
    ).count() == 0
    # and uncontaminated docs report exactly 0
    assert out.filter(
        (~F.col("contaminated")) & (F.col("n_eval_shingles") != 0)
    ).count() == 0


def test_source_typo_pairs_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "source_typo_pairs",
        registry.QUERIES["source_typo_pairs"],
        registry.ORACLES["source_typo_pairs"],
    )


def test_deletion_blocking_complete_at_distance_one(spark, sf_correct):
    """The SymSpell blocking must be COMPLETE: candidates cover every pair
    the O(V²) brute force finds at levenshtein <= 1 (in-engine twin of the
    cross-engine oracle)."""
    from pyspark.sql import functions as F

    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.curate import (
        source_typo_pairs,
    )
    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        load_table,
    )

    src = load_table(spark, sf_correct, "documents").select("source").distinct()
    a = src.select(F.col("source").alias("src_a"))
    b = src.select(F.col("source").alias("src_b"))
    brute = (
        a.crossJoin(b)
        .filter(
            (F.col("src_a") < F.col("src_b"))
            & (F.levenshtein("src_a", "src_b") <= 1)
        )
        .select("src_a", "src_b")
    )
    got = {(r.src_a, r.src_b) for r in source_typo_pairs(spark, sf_correct).collect()}
    want = {tuple(r) for r in brute.collect()}
    assert got == want and got


def test_deletion_blocking_complete_property(spark):
    """Hypothesis: for ARBITRARY small source vocabularies (short lowercase
    strings), the SymSpell deletion-blocked pipeline finds exactly the
    brute-force Levenshtein<=1 pair set. Few examples (one Spark job
    each), but adversarial shapes: repeats collapse via distinct, near-
    identical strings, single chars, empty-adjacent lengths."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.curate import (
        source_typo_pairs,
    )

    words = st.text(alphabet="abc", min_size=1, max_size=4)

    @settings(max_examples=8, deadline=None)
    @given(st.lists(words, min_size=2, max_size=8, unique=True))
    def check(vocab):
        import os
        import tempfile

        d = tempfile.mkdtemp(prefix="typo_prop_")
        rows = [
            (i, "x", "en", src, 1) for i, src in enumerate(vocab)
        ]
        spark.createDataFrame(
            rows,
            "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
        ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        got = {
            (r.src_a, r.src_b)
            for r in source_typo_pairs(spark, d).collect()
        }

        def lev(a, b):
            m = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
            for i in range(len(a) + 1):
                m[i][0] = i
            for j in range(len(b) + 1):
                m[0][j] = j
            for i in range(1, len(a) + 1):
                for j in range(1, len(b) + 1):
                    m[i][j] = min(
                        m[i - 1][j] + 1,
                        m[i][j - 1] + 1,
                        m[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
                    )
            return m[len(a)][len(b)]

        want = {
            (a, b)
            for a in vocab
            for b in vocab
            if a < b and lev(a, b) <= 1
        }
        assert got == want, (sorted(got), sorted(want), vocab)

    check()


def test_curate_funnel_conserves_and_matches_corpus(spark, sf_correct):
    """Oracle match + conservation: drop classes partition the input
    exactly, and n_output equals the registered curate_corpus row count."""
    from parallel_map_reduce_word_counter_for_one_machine_spark import registry
    from .oracle import assert_matches_oracle

    assert_matches_oracle(
        spark,
        sf_correct,
        "curate_funnel_report",
        registry.QUERIES["curate_funnel_report"],
        registry.ORACLES["curate_funnel_report"],
    )
    row = registry.QUERIES["curate_funnel_report"](spark, sf_correct).collect()[0]
    assert (
        row.n_dropped_length + row.n_dropped_ttr + row.n_dropped_dup + row.n_output
        == row.n_input
    )
    n_corpus = registry.QUERIES["curate_corpus"](spark, sf_correct).count()
    assert row.n_output == n_corpus


# --- decontaminate_bloom ------------------------------------------------------


def test_decontaminate_bloom_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "decontaminate_bloom",
        registry.QUERIES["decontaminate_bloom"],
        registry.ORACLES["decontaminate_bloom"],
    )


def test_bloom_never_misses(spark, sf_correct):
    """Bloom filters admit false positives, never false negatives: every
    exactly-contaminated doc must also be bloom-contaminated, and its bloom
    hit count must dominate the exact count."""
    from pyspark.sql import functions as F

    out = registry.QUERIES["decontaminate_bloom"](spark, sf_correct).cache()
    assert (
        out.filter(F.col("exact_contaminated") & ~F.col("bloom_contaminated")).count()
        == 0
    )
    # the FP accounting is non-vacuous at the driver's sf: the 8 KB filter
    # is sized so sf0.01's eval shingle load actually produces collisions
    assert out.filter("bloom_false_positive").count() >= 1
    out.unpersist()


def test_bloom_membership_is_joinless(spark, sf_correct):
    """The bloom arm's membership test is a pure per-row expression against
    the broadcast bit array: exactly ONE join keyed on the shingle column
    (the exact-check rescue arm) — the bloom hit count reaches the output
    through doc_id-keyed reassembly joins, never a second shingle probe."""
    out = registry.QUERIES["decontaminate_bloom"](spark, sf_correct)
    plan = out._jdf.queryExecution().executedPlan().toString()
    g_joins = [ln for ln in plan.splitlines() if "Join [g#" in ln]
    assert len(g_joins) == 1


def test_bloom_exact_probe_gated_on_survivors(spark, sf_correct):
    """VERDICT r09 item 1: the exact rescue join probes ONLY bloom
    survivors. Bloom has no false negatives, so pre-filtering on the bit
    predicate is output-identical while shrinking the hash probe to the
    FP-rate-sized survivor stream. Structurally: the bitset Filter
    (element_at + bitmask) sits BELOW the shingle-keyed join and ABOVE the
    train shingle explode — a plan where the join probes the raw stream
    (the r09 layout) has no such Filter in that span and fails here."""
    out = registry.QUERIES["decontaminate_bloom"](spark, sf_correct)
    plan = out._jdf.queryExecution().executedPlan().toString().splitlines()
    j = next(i for i, ln in enumerate(plan) if "Join [g#" in ln)
    gen = next(
        i for i, ln in enumerate(plan) if i > j and "Generate explode" in ln
    )
    gated = [
        i
        for i, ln in enumerate(plan)
        if j < i < gen and "Filter " in ln and "element_at" in ln
    ]
    assert gated, (
        "bloom bitset filter is not between the exact-probe join and the "
        "train shingle explode — the exact arm probes the full stream"
    )


# --- corpus_version_diff ------------------------------------------------------


def test_corpus_version_diff_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "corpus_version_diff",
        registry.QUERIES["corpus_version_diff"],
        registry.ORACLES["corpus_version_diff"],
    )


def test_corpus_version_diff_counts(spark, sf_correct):
    """Statuses reproduce the deterministic crawl derivation exactly: one
    'removed' per expired id, one 'changed' per surviving edited id, one
    'added' per fresh id — and NO 'unchanged' rows ever leave the operator."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_correct, "documents").cache()
    out = registry.QUERIES["corpus_version_diff"](spark, sf_correct)
    got = {r.status: r.n for r in out.groupBy("status").agg(F.count("*").alias("n")).collect()}
    n_removed = docs.filter(F.col("doc_id") % 17 == 3).count()
    n_changed = docs.filter(
        (F.col("doc_id") % 13 == 4) & (F.col("doc_id") % 17 != 3)
    ).count()
    n_added = docs.filter(F.col("doc_id") % 11 == 5).count()
    docs.unpersist()
    assert got.get("removed", 0) == n_removed
    assert got.get("changed", 0) == n_changed
    assert got.get("added", 0) == n_added
    assert set(got) <= {"removed", "changed", "added"}


def test_corpus_version_diff_joins_fingerprints_not_text(spark, sf_correct):
    """The full-outer exchange must carry (doc_id, fp) only — document text
    is projected away before the join."""
    out = registry.QUERIES["corpus_version_diff"](spark, sf_correct)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the join output attributes: no `text` column may survive into the join
    join_lines = [
        ln for ln in plan.splitlines() if "Join" in ln and "doc_id" in ln
    ]
    assert join_lines, "expected a join on doc_id in the executed plan"
    assert all("text" not in ln for ln in join_lines)

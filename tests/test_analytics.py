"""Event-sequence analytics (operators/analytics.py) and span-level dedup
stats (operators/dedup.py::dedup_spans): oracle equivalence plus the
semantic properties the oracle's order-insensitive hash can't see."""

from __future__ import annotations

from pyspark.sql import functions as F

from parallel_map_reduce_word_counter_for_one_machine_spark import registry
from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
    load_table,
)

from .oracle import assert_matches_oracle

registry.load_all()


def test_event_funnel_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "event_funnel",
        registry.QUERIES["event_funnel"],
        registry.ORACLES["event_funnel"],
    )


def test_event_funnel_monotone(spark, sf_correct):
    """Funnel counts can only shrink step to step, and step 1 equals the
    count of users with at least one 'view' event."""
    rows = {
        r["step"]: r["users"]
        for r in registry.QUERIES["event_funnel"](spark, sf_correct).collect()
    }
    assert rows[1] >= rows[2] >= rows[3] >= 0
    viewers = (
        load_table(spark, sf_correct, "events")
        .filter(F.col("event_type") == "view")
        .select("user_id")
        .distinct()
        .count()
    )
    assert rows[1] == viewers


def test_cohort_retention_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "cohort_retention",
        registry.QUERIES["cohort_retention"],
        registry.ORACLES["cohort_retention"],
    )


def test_cohort_retention_offset_zero_complete(spark, sf_correct):
    """Every user is active in their own cohort week by definition, so the
    offset-0 counts across cohorts must sum to the distinct user count."""
    df = registry.QUERIES["cohort_retention"](spark, sf_correct)
    at_zero = (
        df.filter(F.col("week_offset") == 0)
        .agg(F.sum("active_users").alias("s"))
        .collect()[0]["s"]
    )
    users = (
        load_table(spark, sf_correct, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert at_zero == users
    assert df.filter(F.col("week_offset") < 0).count() == 0


def test_dedup_spans_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "dedup_spans",
        registry.QUERIES["dedup_spans"],
        registry.ORACLES["dedup_spans"],
    )


def test_dedup_spans_invariants(spark, sf_correct):
    """Structural invariants the oracle hash can't articulate: per-doc span
    count equals max(tokens - K + 1, 0); 0 ≤ n_repeated ≤ n_spans; and
    cross-doc repetition can never mark exactly ONE doc (a repeated span by
    definition occurs in at least two)."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.dedup import (
        SPAN_K,
    )

    out = registry.QUERIES["dedup_spans"](spark, sf_correct).cache()
    assert out.filter(
        (F.col("n_repeated") < 0) | (F.col("n_repeated") > F.col("n_spans"))
    ).count() == 0

    docs = load_table(spark, sf_correct, "documents")
    ntok = docs.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda w: w != "")).alias("nt"),
    )
    joined = out.join(ntok, "doc_id")
    mismatch = joined.filter(
        F.col("n_spans") != F.greatest(F.col("nt") - SPAN_K + 1, F.lit(0))
    ).count()
    assert mismatch == 0

    flagged = out.filter(F.col("n_repeated") > 0).count()
    assert flagged != 1
    # the sf0.01 corpus has near-dup families sharing long runs — the
    # operator should actually fire on it
    assert flagged > 1
    out.unpersist()


def test_events_anomaly_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "events_anomaly",
        registry.QUERIES["events_anomaly"],
        registry.ORACLES["events_anomaly"],
    )


def test_events_anomaly_thresholds(spark, sf_correct):
    """Flagged rows really sit beyond the cut, and the result is non-empty
    on the gate corpus (a 0-row pass would be a vacuous oracle match)."""
    df = registry.QUERIES["events_anomaly"](spark, sf_correct)
    rows = df.collect()
    assert len(rows) > 0
    assert all(abs(r["z"]) >= 2.5 for r in rows)


def test_funnel_fold_matches_python_reference_on_random_sequences(spark):
    """Randomized differential test of the greedy-subsequence fold: 300
    users × random event sequences (including duplicate timestamps, the
    tie case the SQL formulation resolves via strict '>'), stages computed
    by a 10-line Python reference and compared exactly."""
    import random

    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.analytics import (
        FUNNEL_STEPS,
        event_funnel,
    )

    rng = random.Random(20240813)
    types = FUNNEL_STEPS + ["error", "signup"]
    rows = []
    for uid in range(300):
        n = rng.randint(0, 12)
        # coarse timestamps on purpose: plenty of exact ties; range spans
        # NEGATIVE micros so pre-epoch events must still match step 1
        # (the fold's last-time sentinel is Long.MIN, not -1)
        evs = [(rng.randint(-3, 5) * 1_000_000, rng.choice(types)) for _ in range(n)]
        rows.extend((uid, us, et) for us, et in evs)

    def py_stage(evs):
        stage, last = 0, float("-inf")
        for us, et in sorted(evs):  # (us, et) lexicographic = the fold's order
            if stage < len(FUNNEL_STEPS) and us > last and et == FUNNEL_STEPS[stage]:
                stage, last = stage + 1, us
        return stage

    from collections import defaultdict

    by_user = defaultdict(list)
    for uid, us, et in rows:
        by_user[uid].append((us, et))
    expected = [0, 0, 0]
    for evs in by_user.values():
        s = py_stage(evs)
        for k in range(s):
            expected[k] += 1

    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.analytics import (
        funnel_stages,
    )

    df = spark.createDataFrame(rows, "user_id long, us long, event_type string")
    got_stages = [r["stage"] for r in funnel_stages(df).collect()]
    got = [sum(1 for s in got_stages if s >= k + 1) for k in range(len(FUNNEL_STEPS))]
    assert got == expected


def test_dedup_spans_trim_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "dedup_spans_trim",
        registry.QUERIES["dedup_spans_trim"],
        registry.ORACLES["dedup_spans_trim"],
    )


def test_dedup_spans_trim_truth(spark, sf_dir):
    """Python truth twin at sf0.001: recompute the covered-token set from
    scratch (span strings, cross-doc repetition, interval cover) and assert
    clean_text, n_tokens, n_removed all match; also cross-check against
    dedup_spans (a doc is untouched iff it has no repeated span)."""
    from collections import defaultdict

    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.dedup import (
        SPAN_K,
    )

    docs = {
        r.doc_id: [w for w in r.text.split(" ") if w != ""]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    span_docs: dict[str, set] = defaultdict(set)
    for doc_id, t in docs.items():
        for i in range(len(t) - SPAN_K + 1):
            span_docs[" ".join(t[i : i + SPAN_K])].add(doc_id)
    out = {
        r.doc_id: r
        for r in registry.QUERIES["dedup_spans_trim"](spark, sf_dir).collect()
    }
    n_trimmed = 0
    for doc_id, t in docs.items():
        if not t:
            assert doc_id not in out
            continue
        covered: set = set()
        for i in range(len(t) - SPAN_K + 1):
            if len(span_docs[" ".join(t[i : i + SPAN_K])]) > 1:
                covered.update(range(i, i + SPAN_K))
        kept = [w for j, w in enumerate(t) if j not in covered]
        r = out[doc_id]
        assert r.n_tokens == len(t)
        assert r.n_removed == len(covered)
        assert r.clean_text == " ".join(kept)
        n_trimmed += bool(covered)
    assert n_trimmed > 0  # the corpus really exercises the removal path


def test_corpus_overlap_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "corpus_overlap",
        registry.QUERIES["corpus_overlap"],
        registry.ORACLES["corpus_overlap"],
    )


def test_corpus_overlap_semantics(spark, sf_correct):
    """Recompute the matrix in Python from the raw docs: per-pair shared
    normalized-token-set fingerprints, ordered source_a < source_b."""
    from collections import defaultdict

    docs = load_table(spark, sf_correct, "documents").collect()
    by_src: dict[str, set] = defaultdict(set)
    for r in docs:
        ts = tuple(sorted(set(w for w in r.text.split(" ") if w != "")))
        if ts:
            by_src[r.source].add(ts)
    expect = {}
    srcs = sorted(by_src)
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1 :]:
            n = len(by_src[sa] & by_src[sb])
            if n:
                expect[(sa, sb)] = n
    got = {
        (r.source_a, r.source_b): r.n_shared
        for r in registry.QUERIES["corpus_overlap"](spark, sf_correct).collect()
    }
    assert got == expect and len(got) > 0


def test_event_transitions_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "event_transitions",
        registry.QUERIES["event_transitions"],
        registry.ORACLES["event_transitions"],
    )


def test_event_transitions_semantics(spark, sf_correct):
    """Recompute transitions in Python from the raw events (ts, event_id
    total order per user)."""
    from collections import Counter, defaultdict

    evs = load_table(spark, sf_correct, "events").collect()
    by_user = defaultdict(list)
    for r in evs:
        by_user[r.user_id].append((r.ts, r.event_id, r.event_type))
    n: Counter = Counter()
    users = defaultdict(set)
    for uid, seq in by_user.items():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            n[(a, b)] += 1
            users[(a, b)].add(uid)
    got = {
        (r.prev_type, r.next_type): (r.n, r.n_users)
        for r in registry.QUERIES["event_transitions"](spark, sf_correct).collect()
    }
    assert got == {k: (v, len(users[k])) for k, v in n.items()} and len(got) > 0

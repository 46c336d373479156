"""Event-sequence analytics over the ``events`` table: funnel conversion,
cohort retention, and z-score anomaly flagging — classic product-analytics
/ data-quality shapes a warehouse-replacement engine is expected to answer
(absent from the reference, whose only dataset is a word→count map —
SURVEY.md §2b; these extend the §2c event-time family alongside
``sessionize`` and ``join_event_attribution``).

All are single-digit-shuffle DataFrame plans:

- ``event_funnel`` folds each user's time-sorted event array through a
  greedy subsequence matcher (pure JVM ``aggregate`` HOF — one shuffle on
  user_id, state is two scalars per user, never a re-scan per step). The
  greedy fold is equivalent to the nested min-timestamp formulation the
  DuckDB oracle uses: if any ordered (view < click < purchase) subsequence
  exists, matching each step at its earliest qualifying time finds one.
- ``cohort_retention`` derives each user's cohort week from their first
  event, then counts distinct active users per (cohort week, week offset).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..sources.tables import load_table

# Ordered funnel: a user converts step k only after having converted step
# k-1 at a strictly earlier event time.
FUNNEL_STEPS = ["view", "click", "purchase"]


def funnel_stages(evs: DataFrame) -> DataFrame:
    """(user_id, us: long, event_type) → (user_id, stage): how many ordered
    FUNNEL_STEPS each user completed, each step at a strictly later event
    time than the previous. One shuffle: groupBy(user_id) collects the
    (time, type) events and an ``aggregate`` fold advances a
    (stage, last_time) state machine through the sorted array — the
    per-user state is two scalars regardless of event count. Exposed
    separately so tests can run the EXACT production fold on synthetic
    event frames (randomized differential test in test_analytics.py)."""
    steps = F.array(*[F.lit(s) for s in FUNNEL_STEPS])
    per_user = (
        evs.filter(F.col("event_type").isin(FUNNEL_STEPS))
        .select(
            "user_id",
            F.struct(F.col("us").alias("us"), F.col("event_type").alias("et")).alias(
                "e"
            ),
        )
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_list("e")).alias("seq"))
    )
    # F.get is 0-based and null-safe: at stage == len(steps) the lookup
    # yields NULL and the equality is never true, so the fold saturates
    # without ANSI out-of-bounds errors. `last` starts at Long.MIN, not -1:
    # pre-epoch timestamps are negative micros and must still match step 1
    # (callers filter NULL timestamps — see event_funnel — because a
    # NULL-propagating comparison would silently never advance).
    state = F.aggregate(
        F.col("seq"),
        F.struct(
            F.lit(0).alias("stage"),
            F.lit(-9223372036854775808).cast("long").alias("last"),
        ),
        lambda acc, e: F.when(
            (e["us"] > acc["last"]) & (e["et"] == F.get(steps, acc["stage"])),
            F.struct((acc["stage"] + 1).alias("stage"), e["us"].alias("last")),
        ).otherwise(acc),
    )
    return per_user.select("user_id", state["stage"].alias("stage"))


@query(
    "event_funnel",
    oracle=(
        # ts IS NOT NULL on every step: an event without a timestamp cannot
        # participate in an ORDERED funnel (mirrors the Spark-side filter).
        "WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events "
        "  WHERE event_type = 'view' AND ts IS NOT NULL GROUP BY user_id), "
        "s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e "
        "  JOIN s1 ON e.user_id = s1.user_id "
        "  WHERE e.event_type = 'click' AND e.ts IS NOT NULL "
        "  AND e.ts > s1.t1 GROUP BY e.user_id), "
        "s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e "
        "  JOIN s2 ON e.user_id = s2.user_id "
        "  WHERE e.event_type = 'purchase' AND e.ts IS NOT NULL "
        "  AND e.ts > s2.t2 GROUP BY e.user_id) "
        "SELECT 1 AS step, 'view' AS step_name, (SELECT count(*) FROM s1) AS users "
        "UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2) "
        "UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)"
    ),
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users reaching each ordered funnel step (view → click → purchase):
    ``funnel_stages`` over the events table, reduced to one row of step
    counts — identical to the oracle's chained min-timestamp joins (greedy
    earliest matching finds an ordered subsequence iff one exists)."""
    evs = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("user_id", F.unix_micros("ts").alias("us"), "event_type")
    )
    stages = funnel_stages(evs)
    counts = stages.agg(
        *[
            F.count_if(F.col("stage") >= k + 1).alias(f"s{k + 1}")
            for k in range(len(FUNNEL_STEPS))
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(k + 1).alias("step"),
                F.lit(name).alias("step_name"),
                F.col(f"s{k + 1}").alias("users"),
            )
            for k, name in enumerate(FUNNEL_STEPS)
        ]
    )
    return counts.select(F.explode(rows).alias("r")).select(
        "r.step", "r.step_name", "r.users"
    )


@query(
    "cohort_retention",
    oracle=(
        "WITH first AS (SELECT user_id, date_trunc('week', min(ts)) AS cw "
        "  FROM events GROUP BY user_id), "
        "act AS (SELECT DISTINCT e.user_id, f.cw, "
        "  date_trunc('week', e.ts) AS aw "
        "  FROM events e JOIN first f ON e.user_id = f.user_id) "
        "SELECT CAST(cw AS DATE) AS cohort_week, "
        "CAST(date_diff('day', cw, aw) // 7 AS INTEGER) AS week_offset, "
        "count(*) AS active_users "
        "FROM act GROUP BY cw, aw"
    ),
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users grouped by the week of their
    first event, counted once per week they were active, keyed by the
    offset (in weeks) from their cohort week.

    Plan shape: one groupBy(user_id) for first-event week, an equi-join
    back on user_id (co-partitioned with the grouping's exchange), a
    distinct on (user, cohort, week) and the final small aggregation. Both
    engines truncate weeks to Monday, so the oracle matches without any
    session-timezone dependence (timestamps are naive micros)."""
    evs = load_table(spark, sf_dir, "events")
    first = evs.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cw")
    )
    act = (
        evs.join(first, "user_id")
        .select("user_id", "cw", F.date_trunc("week", F.col("ts")).alias("aw"))
        .distinct()
    )
    return act.groupBy(
        F.to_date("cw").alias("cohort_week"),
        (F.datediff("aw", "cw") / 7).cast("int").alias("week_offset"),
    ).agg(F.count("*").alias("active_users"))


@query(
    "events_anomaly",
    oracle=(
        "WITH st AS (SELECT event_id, user_id, event_type, value, "
        "  avg(value) OVER w AS mu, stddev_samp(value) OVER w AS sd, "
        "  count(*) OVER w AS n "
        "  FROM events WINDOW w AS (PARTITION BY user_id, event_type)) "
        "SELECT event_id, user_id, event_type, "
        "round((value - mu) / sd, 4) AS z "
        "FROM st WHERE n >= 10 AND sd > 0 "
        "AND abs(round((value - mu) / sd, 4)) >= 2.5"
    ),
)
def events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, event_type) z-score outliers: events whose value sits
    ≥ 2.5 sample standard deviations from that key's mean. The data-quality
    gate of an ingestion pipeline (flag broken sensors / abusive users)
    expressed as one keyed window — a single exchange on the group key, no
    global pass. Groups under 10 events are skipped (z-scores on tiny
    samples are noise; at sf0.01 the synthetic events average ~13 rows per
    (user, type) group, so the floor still leaves a non-trivial result).

    Float policy (operators/relational.py): mu/sd are aggregate doubles
    whose summation order differs cross-engine, so z is rounded to the
    same 4dp quantum on BOTH sides and the threshold is applied to the
    ROUNDED value — set membership is then a function of the emitted
    value, and the engines can only disagree if a raw z straddles a 1e-4
    rounding boundary (vs the far-likelier ulp-level disagreement right
    at 2.5 that thresholding the raw double would give)."""
    w = Window.partitionBy("user_id", "event_type")
    st = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sd"),
        F.count("*").over(w).alias("n"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    return (
        st.filter(
            (F.col("n") >= 10) & (F.col("sd") > 0) & (F.abs(F.round(z, 4)) >= 2.5)
        )
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.round(z, 4).alias("z"),
        )
    )


@query(
    "corpus_overlap",
    oracle=(
        "WITH fp AS (SELECT DISTINCT source, "
        "md5(array_to_string(list_sort(list_distinct("
        "list_filter(string_split(text, ' '), w -> w <> ''))), chr(1))) AS fp "
        "FROM documents "
        "WHERE len(list_filter(string_split(text, ' '), w -> w <> '')) > 0) "
        "SELECT a.source AS source_a, b.source AS source_b, "
        "CAST(count(*) AS BIGINT) AS n_shared "
        "FROM fp a JOIN fp b ON a.fp = b.fp AND a.source < b.source "
        "GROUP BY a.source, b.source"
    ),
)
def corpus_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: for every ordered source pair,
    how many normalized content fingerprints (sorted distinct token set —
    the exact-collapse fp from ``lsh_verified_pairs``) appear in BOTH —
    the report that tells a corpus owner which feeds are re-scraping each
    other before mixture weights are trusted.

    Shape: one distinct over (source, 16-byte fp), then a self-join keyed
    on the fingerprint — the join explodes only within same-fp groups
    (bounded by the number of sources, not corpus size) and the final
    aggregate carries one row per source pair. Token-less docs are
    excluded so md5 of the empty set cannot weld unrelated feeds."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda w: w != "")
    fp = (
        d.select(
            "source",
            F.md5(
                F.array_join(F.array_sort(F.array_distinct(toks)), "\x01")
            ).alias("fp"),
        )
        .filter(F.size(toks) > 0)
        .distinct()
    )
    # Materialize the fingerprint table once: both self-join sides consume
    # it, and the plan otherwise re-scans + re-tokenizes the corpus per
    # side (2 FileScans measured). Same convention as lsh_verified_pairs'
    # groups table; at 100 TB this is the persisted fp index.
    fp = fp.localCheckpoint()
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").alias("n_shared"))
    )


@query(
    "event_transitions",
    oracle=(
        "WITH seq AS (SELECT user_id, event_type, "
        "lag(event_type) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS prev_type FROM events) "
        "SELECT prev_type, event_type AS next_type, "
        "CAST(count(*) AS BIGINT) AS n, "
        "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users "
        "FROM seq WHERE prev_type IS NOT NULL "
        "GROUP BY prev_type, event_type"
    ),
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over each user's event stream
    — the behavioral fingerprint behind journey analysis and anomaly
    baselines (which step usually follows which). Deterministic total
    order (ts, event_id) breaks same-timestamp ties identically on both
    engines.

    Shape: one window exchange keyed by user_id (the lag), then one
    partial+final aggregate on the (prev, next) pair — cardinality
    |event_types|², independent of corpus size."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )

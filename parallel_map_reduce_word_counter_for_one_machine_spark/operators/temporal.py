"""Temporal join operators: as-of and interval joins (SURVEY.md §2b lists
these among the join kinds the reference lacks entirely; DuckDB has native
ASOF JOIN, making them oracle-checkable).

As-of join has no native Spark operator — implemented here as the standard
composition (option (a) of the custom-operator ladder): range-prefilter
equi-join on the key, then a per-left-row window argmax keeps the latest
right row at-or-before the left timestamp.

Scale notes: the as-of join shuffles on the equi key (user_id) — the same
exchange a plain equi join needs; the window runs inside the same
partitioning (no extra shuffle: partitionBy is a prefix of the join key
distribution). For keyless/global as-of at 100 TB, bin timestamps to
coarse buckets and join bucket±1 instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..sources.tables import load_table


@query(
    "join_asof",
    oracle=(
        # Latest 'click' at-or-before each 'purchase' per user.
        "SELECT p.event_id AS purchase_id, p.user_id, "
        "epoch_ms(p.ts) AS purchase_ms, c.event_id AS click_id, "
        "epoch_ms(c.ts) AS click_ms "
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p "
        "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c "
        "ON p.user_id = c.user_id AND p.ts >= c.ts"
    ),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the user's latest click at-or-before
    it (NULL if none — left as-of). Window argmax over (purchase, click≤ts)
    candidates; ties on click ts broken by highest event_id to stay
    deterministic (DuckDB ASOF keeps one arbitrary max-ts row; the data has
    unique (user_id, ts) so the tiebreak never fires at sf0.01 — asserted
    by the oracle match itself)."""
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    joined = p.join(
        c, (p.user_id == c.c_user) & (p.p_ts >= c.c_ts), "left"
    )
    w = Window.partitionBy("purchase_id").orderBy(
        F.desc_nulls_last("c_ts"), F.desc_nulls_last("click_id")
    )
    return (
        joined.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "purchase_id",
            "user_id",
            F.unix_millis("p_ts").alias("purchase_ms"),
            "click_id",
            F.unix_millis("c_ts").alias("click_ms"),
        )
    )


@query(
    "join_interval",
    oracle=(
        # Event pairs for the same user within 5 minutes of each other.
        "SELECT a.event_id AS id_a, b.event_id AS id_b, a.user_id "
        "FROM events a JOIN events b ON a.user_id = b.user_id "
        "AND a.event_id < b.event_id "
        "AND b.ts BETWEEN a.ts - INTERVAL '5 minutes' AND a.ts + INTERVAL '5 minutes'"
    ),
)
def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval self-join: same-user event pairs within ±5 minutes. The
    equi key (user_id) carries the hash join; the interval predicate is a
    cheap residual. (A keyless interval join would instead bin ts to
    5-minute buckets and join bucket±1 — noted for the 100 TB path.)"""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    a = e.alias("a")
    b = e.alias("b")
    cond = (
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.event_id") < F.col("b.event_id"))
        & (F.col("b.ts") >= F.col("a.ts") - F.expr("INTERVAL 5 MINUTES"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 5 MINUTES"))
    )
    return a.join(b, cond).select(
        F.col("a.event_id").alias("id_a"),
        F.col("b.event_id").alias("id_b"),
        F.col("a.user_id").alias("user_id"),
    )


@query(
    "join_salted",
    oracle=(
        "SELECT o_orderpriority, count(*) AS n_orders, "
        "count(DISTINCT c_nationkey) AS n_nations "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "GROUP BY o_orderpriority"
    ),
)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant salted join: the (hypothetically hot-keyed) left side
    gets a random-free deterministic salt in [0,8); the right side is
    replicated 8× with each salt value; the join key becomes (key, salt) so
    one hot key spreads over 8 reducers. Result ≡ the plain join (oracle).
    This is the manual fallback when AQE's skewJoin can't kick in (e.g.
    pre-AQE Spark or deliberately disabled); with AQE on, prefer the plain
    join — asserted equivalent here."""
    n_salt = 8
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    o_s = o.withColumn("salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(n_salt)))
    c_s = c.crossJoin(
        F.broadcast(
            o.sparkSession.range(n_salt).select(F.col("id").cast("long").alias("salt"))
        )
    )
    j = o_s.join(
        c_s,
        (o_s.o_custkey == c_s.c_custkey) & (o_s.salt == c_s.salt),
    )
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.count_distinct("c_nationkey").alias("n_nations"),
    )


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


@query(
    "sessionize",
    oracle=(
        "WITH g AS (SELECT user_id, ts, event_id, "
        "CASE WHEN lag(ts) OVER w IS NULL OR "
        f"epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_US} "
        "THEN 1 ELSE 0 END AS new_s FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "s AS (SELECT user_id, ts, CAST(sum(new_s) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_n FROM g) "
        "SELECT user_id, session_n, count(*) AS n_events, "
        "min(epoch_us(ts)) AS start_us, "
        "max(epoch_us(ts)) - min(epoch_us(ts)) AS dur_us "
        "FROM s GROUP BY user_id, session_n"
    ),
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: a gap > 30 min starts a new session
    (lag-diff → boundary flag → running sum = session index → per-session
    aggregate). The batch twin of streaming session windows
    (stream_session_window), and the classic composition the reference
    cannot express (no windows of any kind, SURVEY.md §2b).

    Scale: both windows and the final agg are partitioned by user_id — one
    hash exchange total (the window's exchange is reused by the groupBy),
    no global ordering anywhere. Ties broken by event_id so the ROWS
    frames are total-ordered and deterministic."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    boundary = F.when(
        gap.isNull() | (gap > SESSION_GAP_US), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = e.select(
        "user_id",
        "ts",
        F.sum(boundary).over(run).alias("session_n"),
    )
    return sess.groupBy("user_id", "session_n").agg(
        F.count("*").alias("n_events"),
        F.min(F.unix_micros("ts")).alias("start_us"),
        (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))).alias(
            "dur_us"
        ),
    )


@query(
    "events_locf",
    oracle=(
        "SELECT event_id, user_id, "
        "round(last_value(CASE WHEN event_type = 'purchase' THEN value END "
        "IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS UNBOUNDED PRECEDING), 2) AS last_purchase_value "
        "FROM events"
    ),
)
def events_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF (last observation carried forward): every event annotated with
    the user's most recent purchase value at that point in time — the
    gap-filling primitive for sparse time series (sensor forward-fill,
    feature as-of-event-time without a join). `last(expr, ignorenulls)`
    over an unbounded-preceding frame; one exchange keyed on user_id,
    state O(1) per row during the frame scan. The (ts, event_id) total
    order makes the carried value deterministic under duplicate
    timestamps on both engines."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return e.select(
        "event_id",
        "user_id",
        F.round(F.last(purchase_val, ignorenulls=True).over(w), 2).alias(
            "last_purchase_value"
        ),
    )


@query(
    "dim_scd2_build",
    oracle=(
        "WITH o AS (SELECT user_id, ts, event_id, value, "
        "lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "AS prev FROM events), "
        "ch AS (SELECT user_id, ts, event_id, value FROM o "
        "WHERE prev IS NULL OR value <> prev) "
        "SELECT user_id, epoch_ms(ts) AS valid_from_ms, "
        "epoch_ms(lead(ts) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id)) AS valid_to_ms, value "
        "FROM ch"
    ),
)
def dim_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a type-2 slowly-changing dimension (Kimball's SCD2 — the
    standard warehouse versioning layout) from a change log: per user,
    consecutive duplicate values collapse, each surviving change opens a
    [valid_from, valid_to) interval, and the current row has
    valid_to = NULL. The output is the point-in-time table that
    ``join_asof``/``join_interval`` consume as their dimension side.

    Plan shape: BOTH windows (the lag change-detect and the lead
    interval-close) are keyed on user_id with the same ordering, so the
    whole build is ONE user-keyed exchange — the sessionize pattern. At
    100 TB of change log the state per task is one partition of users;
    no global sort, no driver state. Timestamps emit as epoch millis
    (module convention: immune to the driver session's timezone)."""
    evs = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ch = (
        evs.select("user_id", "ts", "event_id", "value")
        .withColumn("prev", F.lag("value").over(w))
        .filter(F.col("prev").isNull() | (F.col("value") != F.col("prev")))
    )
    return ch.select(
        "user_id",
        F.unix_millis("ts").alias("valid_from_ms"),
        F.unix_millis(F.lead("ts").over(w)).alias("valid_to_ms"),
        "value",
    )


@query(
    "events_ohlc_hourly",
    oracle=(
        # open/close spelled as row_number windows — result-equivalent to
        # the engine's struct-min/max hash aggregate.
        "WITH e AS (SELECT event_type, "
        "epoch_ms(date_trunc('hour', ts)) AS hour_ms, ts, event_id, value "
        "FROM events), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY event_type, "
        "hour_ms ORDER BY ts, event_id) AS ro, "
        "row_number() OVER (PARTITION BY event_type, hour_ms "
        "ORDER BY ts DESC, event_id DESC) AS rc FROM e) "
        "SELECT event_type, hour_ms, "
        "max(CASE WHEN ro = 1 THEN value END) AS open, "
        "max(value) AS high, min(value) AS low, "
        "max(CASE WHEN rc = 1 THEN value END) AS close, "
        "count(*) AS n_events "
        "FROM r GROUP BY event_type, hour_ms"
    ),
)
def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC resampling (the time-series downsample every metrics/market
    system ships): per (event_type, hour), the first value (open), max
    (high), min (low), last value (close), and the event count. First/
    last are deterministic under the (ts, event_id) total order.

    Plan shape: ONE hash aggregate — open/close are min/max over a
    (ts, event_id, value) struct (field-ordered comparison; the unique
    (ts, event_id) prefix decides before value is ever compared), so all
    five stats combine map-side and only |types × hours| rows shuffle.
    The window spelling the oracle uses would shuffle every event twice.
    Values pass through untouched (no float arithmetic) — exact
    cross-engine."""
    evs = load_table(spark, sf_dir, "events")
    key = F.struct("ts", "event_id", F.col("value").alias("v"))
    return (
        evs.groupBy(
            "event_type",
            F.unix_millis(F.date_trunc("hour", "ts")).alias("hour_ms"),
        )
        .agg(
            F.min(key).getField("v").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(key).getField("v").alias("close"),
            F.count("*").alias("n_events"),
        )
    )


_MS_DAY = 86_400_000


@query(
    "events_gap_fill",
    oracle=(
        "WITH e AS (SELECT user_id, epoch_ms(ts) // "
        f"{_MS_DAY} AS d, value FROM events), "
        "b AS (SELECT user_id, min(d) AS d0, max(d) AS d1 FROM e "
        "GROUP BY user_id), "
        "spine AS (SELECT user_id, u.d FROM b, "
        "LATERAL unnest(generate_series(d0, d1)) AS u(d)), "
        "agg AS (SELECT user_id, d, CAST(count(*) AS BIGINT) AS n, "
        "round(sum(value), 2) AS sv FROM e GROUP BY user_id, d) "
        "SELECT spine.user_id, "
        f"CAST(spine.d * {_MS_DAY} AS BIGINT) AS day_ms, "
        "CAST(coalesce(agg.n, 0) AS BIGINT) AS n_events, "
        "coalesce(agg.sv, 0.0) AS sum_value, "
        "agg.user_id IS NULL AS is_gap "
        "FROM spine LEFT JOIN agg ON spine.user_id = agg.user_id "
        "AND spine.d = agg.d"
    ),
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-user DAILY series with explicit gap rows — the
    regularization step before any window/LOCF/anomaly pass that assumes
    one row per bucket (``events_locf`` carries values FORWARD over
    existing rows; this materializes the missing buckets those passes
    silently skip). Each user's spine runs from their first to their last
    active day; absent days appear with n_events = 0 and ``is_gap`` set.

    Scale shape: one aggregate for per-user bounds (2 longs/user), one
    ``sequence``+``explode`` to build the spine — output-sized, no
    cross join — and one co-partitioned left join against the daily
    aggregate (both sides hash on user_id). Spine cardinality =
    Σ(user active span in days): bounded by the calendar × user count,
    independent of event volume — the join's build side SHRINKS relative
    to the corpus as event density grows."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        (F.unix_millis("ts") / F.lit(_MS_DAY))
        .cast("long")
        .alias("d"),
        "value",
    )
    b = e.groupBy("user_id").agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    spine = b.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("d")
    )
    agg = e.groupBy("user_id", "d").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sv")
    )
    return spine.join(agg, ["user_id", "d"], "left").select(
        "user_id",
        (F.col("d") * _MS_DAY).cast("long").alias("day_ms"),
        F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        F.coalesce("sv", F.lit(0.0)).alias("sum_value"),
        F.col("n").isNull().alias("is_gap"),
    )


ASOF_TOL_MS = 86_400_000  # 24 h — the staleness bound


@query(
    "join_asof_tolerance",
    oracle=(
        # ASOF picks the LATEST click ≤ ts; if that one is older than the
        # tolerance every earlier candidate is older still, so post-hoc
        # NULLing the pair is exactly merge_asof(tolerance=...) semantics.
        "SELECT purchase_id, user_id, purchase_ms, "
        f"CASE WHEN purchase_ms - click_ms <= {ASOF_TOL_MS} "
        "THEN click_id END AS click_id, "
        f"CASE WHEN purchase_ms - click_ms <= {ASOF_TOL_MS} "
        "THEN click_ms END AS click_ms FROM ("
        "SELECT p.event_id AS purchase_id, p.user_id, "
        "epoch_ms(p.ts) AS purchase_ms, c.event_id AS click_id, "
        "epoch_ms(c.ts) AS click_ms "
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p "
        "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c "
        "ON p.user_id = c.user_id AND p.ts >= c.ts)"
    ),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a STALENESS BOUND (pandas ``merge_asof``'s
    ``tolerance``): the user's latest click at-or-before each purchase,
    but only if it happened within 24 h — an attribution window, a sensor
    reading too old to trust, a quote past its validity. The bound moves
    INTO the join predicate, which matters at scale: candidates older
    than the tolerance never enter the per-purchase window state, so a
    user with years of history contributes only their last-24 h rows per
    probe instead of their whole past (the unbounded as-of's window reads
    everything ≤ ts and keeps rank-1).

    DuckDB has no tolerance argument, so the oracle post-filters the
    plain ASOF result — sound because as-of picks the LATEST candidate:
    if that is stale, every other candidate is staler."""
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    tol = F.expr(f"INTERVAL {ASOF_TOL_MS // 1000} SECONDS")
    joined = p.join(
        c,
        (p.user_id == c.c_user)
        & (p.p_ts >= c.c_ts)
        & (c.c_ts >= p.p_ts - tol),  # the bound prunes candidates early
        "left",
    )
    w = Window.partitionBy("purchase_id").orderBy(
        F.desc_nulls_last("c_ts"), F.desc_nulls_last("click_id")
    )
    return (
        joined.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "purchase_id",
            "user_id",
            F.unix_millis("p_ts").alias("purchase_ms"),
            "click_id",
            F.unix_millis("c_ts").alias("click_ms"),
        )
    )

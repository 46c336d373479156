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

"""Distributed global rank (row_number over a total order, no single-owner
partition).

The naive ``row_number().over(Window.orderBy(...))`` — no ``partitionBy`` —
funnels EVERY row through one task: fine for a k-row top-k, an anti-pattern
for a full listing at 100 TB. This module computes the same global rank with
the classic two-level scheme the reference's parallel merge sort
hand-codes imperatively (reference src/main.cpp:24-36: per-thread sorted
runs + merge):

1. range-exchange on the sort keys (``repartitionByRange`` — partition ``i``
   holds keys strictly below partition ``i+1``; sampled boundaries, the same
   mechanism as ``orderBy``);
2. local ``row_number`` within each range partition (window partitioned by
   ``spark_partition_id()`` — every partition ranks in parallel);
3. per-partition row counts → running offsets. This window IS
   single-partition, but over P rows (the partition count), not |data|;
4. broadcast the P-row offset table back and add.

The range exchange appears in two branches of one plan and is planned once
(``ReusedExchange``) — which also guarantees both branches see identical
(sampled) range boundaries, keeping pid-consistency between the local ranks
and the offsets. Verified in tests/test_plans.py.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

ColumnOrName = Union[Column, str]


def global_rank(
    df: DataFrame,
    keys: Sequence[ColumnOrName],
    rank_col: str = "rk",
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Attach a 1-based global ``row_number`` over ``keys`` without a
    whole-dataset single-partition window.

    ``keys`` must induce a total order (unique combination per row) for the
    rank to be deterministic — same contract as any oracle-checked sort.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parts = df.repartitionByRange(n, *keys).withColumn(
        "_pid", F.spark_partition_id()
    )

    local = parts.withColumn(
        "_lrk", F.row_number().over(Window.partitionBy("_pid").orderBy(*keys))
    )

    # Running offset per range partition: sum of counts of all lower pids.
    # P rows total (P = shuffle partition count), so the global window here
    # is O(P), not O(|df|).
    off_w = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        parts.groupBy("_pid")
        .agg(F.count("*").alias("_n"))
        .select(
            "_pid",
            F.coalesce(F.sum("_n").over(off_w), F.lit(0)).alias("_off"),
        )
    )

    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, (F.col("_lrk") + F.col("_off")).cast("int"))
        .drop("_pid", "_lrk", "_off")
    )


def global_cumsum(
    df: DataFrame,
    keys: Sequence[ColumnOrName],
    value_col: str,
    out_col: str = "cum",
    num_partitions: Optional[int] = None,
    reset_keys: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Exclusive prefix sum of ``value_col`` over the total order induced by
    ``keys`` — same two-level scheme as :func:`global_rank` (range exchange,
    per-partition window in parallel, P-row offset table broadcast back), so
    no single-partition window ever sees the full dataset.

    ``reset_keys``: optional grouping columns at which the sum restarts
    (e.g. one running offset per dataset split). They are prepended to the
    range-partitioning keys so each group's rows stay key-ordered across
    partitions, and the offset table gets one row per (partition, group) —
    still O(P × groups), tiny. With few huge groups this beats a plain
    ``Window.partitionBy(group)`` cumsum, which would funnel each group
    through ONE task.

    ``keys`` (with ``reset_keys``) must be a total order for determinism.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    rk = list(reset_keys or [])
    parts = df.repartitionByRange(n, *rk, *keys).withColumn(
        "_pid", F.spark_partition_id()
    )

    local_w = (
        Window.partitionBy("_pid", *rk)
        .orderBy(*keys)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = parts.withColumn(
        "_lc", F.coalesce(F.sum(value_col).over(local_w), F.lit(0))
    )

    off_w = (
        Window.partitionBy(*rk)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        parts.groupBy("_pid", *rk)
        .agg(F.sum(value_col).alias("_n"))
        .select(
            "_pid",
            *rk,
            F.coalesce(F.sum("_n").over(off_w), F.lit(0)).alias("_off"),
        )
    )

    return (
        local.join(F.broadcast(offsets), ["_pid", *rk])
        .withColumn(out_col, F.col("_lc") + F.col("_off"))
        .drop("_pid", "_lc", "_off")
    )


def grouped_global_rank(
    df: DataFrame,
    group_keys: Sequence[str],
    order_keys: Sequence[ColumnOrName],
    rank_col: str = "rk",
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Per-group 1-based ``row_number`` without ``Window.partitionBy(group)``
    funneling each group through one task.

    With a handful of huge groups (per-language corpora at 100 TB), a plain
    grouped window is the same skew trap as the global single-partition
    window :func:`global_rank` exists to avoid. Same two-level scheme, with
    the group keys prepended to the range exchange (each group's rows stay
    order-key-sorted across partitions) and one offset row per
    (partition, group) — O(P × groups alive per partition), tiny, exactly
    the ``reset_keys`` layout of :func:`global_cumsum`.

    ``group_keys + order_keys`` must induce a total order per group.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    gk = list(group_keys)
    parts = df.repartitionByRange(n, *gk, *order_keys).withColumn(
        "_pid", F.spark_partition_id()
    )

    local = parts.withColumn(
        "_lrk",
        F.row_number().over(Window.partitionBy("_pid", *gk).orderBy(*order_keys)),
    )

    off_w = (
        Window.partitionBy(*gk)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        parts.groupBy("_pid", *gk)
        .agg(F.count("*").alias("_n"))
        .select(
            "_pid",
            *gk,
            F.coalesce(F.sum("_n").over(off_w), F.lit(0)).alias("_off"),
        )
    )

    return (
        local.join(F.broadcast(offsets), ["_pid", *gk])
        .withColumn(rank_col, (F.col("_lrk") + F.col("_off")).cast("int"))
        .drop("_pid", "_lrk", "_off")
    )

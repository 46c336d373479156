"""foreachBatch incremental-upsert sink: materialize a keyed state table
from a stream, MERGE-style (the CDC/"latest row per key" pattern every
warehouse ingestion runs; Delta/Iceberg expose it as MERGE INTO — here
the same inner plan maintains versioned parquet, which is also how those
formats implement it: immutable files + a new table version per commit).

The reference has no streaming and no mutation (src/main.cpp:78-281);
extension surface alongside ``operators/pipeline.merge_upsert`` (the
batch MERGE) and the exactly-once file sink test.

Per micro-batch: reduce the batch to one row per key (latest by event
time, deterministic tiebreak), full-outer-merge against the previous
state VERSION directory, write version N+1. Versioned directories rather
than in-place overwrite because a Spark job cannot safely read and
overwrite the same path — exactly the immutability rule the table
formats enforce; the latest-version pointer is the commit.

Scale: each batch shuffles batch-keys + state-keys once on the key
column. For 100 TB state the full-outer rewrite becomes the bottleneck
and the real systems switch to partitioned/clustered MERGE (rewrite only
matching files) — same logical plan, narrower physical scope.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import read_events_stream
from . import drain


def _latest_per_key(df: DataFrame) -> DataFrame:
    """One row per user_id: the latest (ts, event_id)-ordered event's
    value — max_by with a total order so replays are deterministic."""
    return df.groupBy("user_id").agg(
        F.max_by(
            F.struct("value", "event_type"), F.struct("ts", "event_id")
        ).alias("s"),
        F.max("ts").alias("last_ts"),
        F.count("*").alias("n_events_batch"),
    ).select(
        "user_id",
        F.col("s.value").alias("value"),
        F.col("s.event_type").alias("event_type"),
        "last_ts",
    )


def run_stream_upsert(
    spark: SparkSession, sf_dir: str, state_root: str, query_name: str
) -> DataFrame:
    """Drive the stream through the foreachBatch upsert; returns the final
    state (latest version directory) as a DataFrame."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        batch = _latest_per_key(batch_df)
        versions = sorted(
            int(d[1:]) for d in os.listdir(state_root) if d.startswith("v")
        ) if os.path.isdir(state_root) else []
        if versions:
            cur = batch_df.sparkSession.read.parquet(
                os.path.join(state_root, f"v{versions[-1]}")
            )
            b = batch.select(
                F.col("user_id").alias("b_user_id"),
                F.col("value").alias("b_value"),
                F.col("event_type").alias("b_event_type"),
                F.col("last_ts").alias("b_last_ts"),
            )
            merged = cur.join(
                b, cur["user_id"] == b["b_user_id"], "full_outer"
            ).select(
                F.coalesce("b_user_id", "user_id").alias("user_id"),
                # batch wins when both sides have the key AND the batch is
                # newer (per-key event time) — the MERGE WHEN MATCHED rule
                F.when(
                    F.col("b_user_id").isNotNull()
                    & (
                        F.col("user_id").isNull()
                        | (F.col("b_last_ts") >= F.col("last_ts"))
                    ),
                    F.col("b_value"),
                ).otherwise(F.col("value")).alias("value"),
                F.when(
                    F.col("b_user_id").isNotNull()
                    & (
                        F.col("user_id").isNull()
                        | (F.col("b_last_ts") >= F.col("last_ts"))
                    ),
                    F.col("b_event_type"),
                ).otherwise(F.col("event_type")).alias("event_type"),
                F.greatest(
                    F.coalesce("b_last_ts", "last_ts"),
                    F.coalesce("last_ts", "b_last_ts"),
                ).alias("last_ts"),
            )
            out_version = versions[-1] + 1
        else:
            merged = batch
            out_version = 0
        merged.write.mode("overwrite").parquet(
            os.path.join(state_root, f"v{out_version}")
        )

    q = (
        read_events_stream(spark, sf_dir)
        .writeStream.foreachBatch(upsert)
        .queryName(query_name)
        .option("checkpointLocation", os.path.join(state_root, "_chk"))
        .trigger(availableNow=True)
        .start()
    )
    drain(q)
    versions = sorted(
        int(d[1:]) for d in os.listdir(state_root) if d.startswith("v")
    )
    return spark.read.parquet(os.path.join(state_root, f"v{versions[-1]}"))

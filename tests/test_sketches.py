"""Sketch algebra: mergeable HLL union, CMS bounds, and the registered
verdicts' oracles at both test scales."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parallel_map_reduce_word_counter_for_one_machine_spark import registry
from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
    load_table,
)

from .oracle import assert_matches_oracle

registry.load_all()


@pytest.mark.parametrize(
    "name",
    [
        "hll_partition_merge",
        "cms_heavy_hitters",
        "bitmap_distinct_users",
        "hist_quantile_lengths",
    ],
)
def test_sketch_verdict_oracle(spark, sf_correct, name):
    assert_matches_oracle(
        spark, sf_correct, name, registry.QUERIES[name], registry.ORACLES[name]
    )


@pytest.mark.parametrize("name", ["hll_partition_merge", "cms_heavy_hitters"])
def test_sketch_verdict_green_at_smoke_scale(spark, sf_dir, name):
    """The bound checks must hold at every sf, not just the driver's —
    a sketch whose envelope only clears on one corpus is mis-tuned."""
    row = registry.QUERIES[name](spark, sf_dir).collect()[0]
    assert row[-1] is True, row


def test_hll_union_equals_global_sketch(spark, sf_correct):
    """Mergeability is exact, not approximate: the union of per-lang
    sketches must estimate IDENTICALLY to one global sketch over the same
    rows (same lgK, same stream items — the sketch is order-insensitive)."""
    d = load_table(spark, sf_correct, "documents")
    toks = d.select(
        "lang", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    merged = (
        toks.groupBy("lang")
        .agg(F.hll_sketch_agg("word").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]
        .est
    )
    direct = (
        toks.agg(F.hll_sketch_estimate(F.hll_sketch_agg("word")).alias("est"))
        .collect()[0]
        .est
    )
    assert merged == direct


def test_cms_never_undercounts_and_bounds_absent_words(spark, sf_correct):
    """The one-sided CMS guarantee on hits, and est(absent) ≤ ε·N on
    misses (an absent word's estimate is pure collision mass)."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.sketches import (
        CMS_CONFIDENCE,
        CMS_EPS,
        CMS_SEED,
    )
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.wordcount import (
        tokenize,
    )

    toks = tokenize(load_table(spark, sf_correct, "documents"))
    sk = toks.agg(
        F.count_min_sketch(
            "word", F.lit(CMS_EPS), F.lit(CMS_CONFIDENCE), F.lit(CMS_SEED)
        ).alias("sk")
    ).collect()[0]
    cms = spark.sparkContext._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(sk.sk)
    )
    exact = {r["word"]: r["count"] for r in toks.groupBy("word").count().collect()}
    n = sum(exact.values())
    for w, c in exact.items():
        assert cms.estimateCount(w) >= c, (w, c)
    for absent in ["qzx", "notaword", ""]:
        assert cms.estimateCount(absent) <= CMS_EPS * n


def test_bitmap_or_agg_merges_partial_bitmaps(spark, sf_correct):
    """Mergeability, the property that makes bitmaps incremental: per-
    partition partial bitmaps OR-merged (`bitmap_or_agg`) count exactly
    what one global construct counts."""
    from pyspark.sql import functions as F

    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        load_table,
    )

    e = load_table(spark, sf_correct, "events")
    base = e.select(
        "event_type",
        (F.col("event_id") % 4).alias("shard"),  # simulated ingest shards
        F.expr("bitmap_bucket_number(user_id)").alias("bk"),
        F.expr("bitmap_bit_position(user_id)").alias("pos"),
    )
    sharded = (
        base.groupBy("event_type", "shard", "bk")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
        .groupBy("event_type", "bk")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .groupBy("event_type")
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("n"))
    )
    direct = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n")
    )
    got = {(r.event_type, r.n) for r in sharded.collect()}
    want = {(r.event_type, r.n) for r in direct.collect()}
    assert got == want and got


def test_bitmap_distinct_handles_negative_and_large_ids(spark):
    """Domain edges of the bitmap scheme: negative ids, bucket-boundary
    values, 40-bit ids, and duplicates — distinct count stays exact."""
    from pyspark.sql import functions as F

    d = spark.createDataFrame(
        [(-(2**40),), (-5,), (-1,), (0,), (1,), (63,), (64,), (-5,), (2**40,)],
        "id LONG",
    )
    n = (
        d.select(
            F.expr("bitmap_bucket_number(id)").alias("bk"),
            F.expr("bitmap_bit_position(id)").alias("p"),
        )
        .groupBy("bk")
        .agg(F.expr("bitmap_construct_agg(p)").alias("bm"))
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("n"))
        .collect()[0]
        .n
    )
    assert n == d.distinct().count() == 8


def test_hist_quantile_bounds_hold_at_smoke_scale(spark, sf_dir):
    """Every per-source bound flag must hold at the smoke sf too."""
    rows = registry.QUERIES["hist_quantile_lengths"](spark, sf_dir).collect()
    assert rows and all(r.bounds_ok for r in rows), rows


def test_hist_quantile_merge_algebra(spark, sf_correct):
    """The mergeability claim itself: per-lang partial histograms summed
    into global (source, bin) counts must reproduce the single-pass
    histogram exactly — the rollup a 100 TB pipeline runs daily."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.sketches import (
        HIST_W,
    )

    d = load_table(spark, sf_correct, "documents")
    lens = d.select(
        "source",
        "lang",
        F.size(F.filter(F.split("text", " "), lambda w: w != "")).alias("l"),
    ).withColumn("bin", F.floor(F.col("l") / HIST_W))
    direct = {
        (r.source, r.bin): r.cnt
        for r in lens.groupBy("source", "bin").agg(F.count("*").alias("cnt")).collect()
    }
    partial = lens.groupBy("source", "lang", "bin").agg(F.count("*").alias("cnt"))
    merged = {
        (r.source, r.bin): r.cnt
        for r in partial.groupBy("source", "bin")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    assert merged == direct

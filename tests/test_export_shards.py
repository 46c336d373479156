"""Export-manifest contract: the registered manifest matches its oracle,
and a real partitioned write reproduces the manifest exactly from the
files on disk — the resumable-exporter property."""

from __future__ import annotations

from pyspark.sql import functions as F

from parallel_map_reduce_word_counter_for_one_machine_spark import registry
from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
    load_table,
)

from .oracle import assert_matches_oracle

registry.load_all()


def test_oracle_match(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "export_training_shards",
        registry.QUERIES["export_training_shards"],
        registry.ORACLES["export_training_shards"],
    )


def test_manifest_accounts_for_every_doc(spark, sf_correct):
    rows = registry.QUERIES["export_training_shards"](spark, sf_correct).collect()
    total = load_table(spark, sf_correct, "documents").count()
    assert sum(r.n_docs for r in rows) == total
    assert len(rows) == 16  # every hex digit populated at this sf


def test_written_shards_reproduce_manifest(spark, sf_correct, tmp_path):
    """Write the corpus partitioned by shard, then re-derive the manifest
    FROM THE FILES and compare field-for-field: a lost or duplicated file
    must surface as a count or checksum mismatch."""
    manifest = {
        r.shard: (r.n_docs, r.n_tokens, r.ids_xor)
        for r in registry.QUERIES["export_training_shards"](
            spark, sf_correct
        ).collect()
    }
    d = load_table(spark, sf_correct, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    out = str(tmp_path / "shards")
    d.withColumn("shard", F.substring(h, 1, 1)).write.partitionBy(
        "shard"
    ).parquet(out)

    back = spark.read.parquet(out)
    idh = F.conv(F.substring(h, 2, 14), 16, 10).cast("long")
    ntok = F.size(F.filter(F.split("text", " "), lambda w: w != ""))
    rederived = {
        r.shard: (r.n_docs, r.n_tokens, r.ids_xor)
        for r in back.select("shard", idh.alias("idh"), ntok.alias("ntok"))
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ntok").cast("long").alias("n_tokens"),
            F.expr("bit_xor(idh)").alias("ids_xor"),
        )
        .collect()
    }
    assert rederived == manifest


def test_checksum_flips_on_membership_change(spark, sf_correct):
    """Drop one doc from one shard: that shard's n_docs AND ids_xor must
    change while every other shard's triple is untouched."""
    d = load_table(spark, sf_correct, "documents")
    victim = d.select("doc_id").orderBy("doc_id").limit(1).collect()[0].doc_id
    full = {
        r.shard: (r.n_docs, r.n_tokens, r.ids_xor)
        for r in registry.QUERIES["export_training_shards"](
            spark, sf_correct
        ).collect()
    }
    h = F.md5(F.col("doc_id").cast("string"))
    idh = F.conv(F.substring(h, 2, 14), 16, 10).cast("long")
    ntok = F.size(F.filter(F.split("text", " "), lambda w: w != ""))
    dropped = {
        r.shard: (r.n_docs, r.n_tokens, r.ids_xor)
        for r in d.filter(F.col("doc_id") != victim)
        .select(F.substring(h, 1, 1).alias("shard"), idh.alias("idh"), ntok.alias("ntok"))
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ntok").cast("long").alias("n_tokens"),
            F.expr("bit_xor(idh)").alias("ids_xor"),
        )
        .collect()
    }
    changed = [s for s in full if full[s] != dropped.get(s)]
    assert len(changed) == 1
    s = changed[0]
    assert dropped[s][0] == full[s][0] - 1
    assert dropped[s][2] != full[s][2]

from __future__ import annotations

from pyspark.sql import functions as F

from parallel_map_reduce_word_counter_for_one_machine_spark.plans.inspect import (
    plan_string,
)
from parallel_map_reduce_word_counter_for_one_machine_spark.sources.bucketed import (
    bucketed_join,
    write_bucketed_pair,
)
from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
    load_table,
)

from parallel_map_reduce_word_counter_for_one_machine_spark import registry

from .oracle import assert_matches_oracle

registry.load_all()


def test_bucketed_join_has_no_exchange(spark, sf_correct, tmp_path):
    """The whole point of bucketing: the fact-fact join plans with ZERO
    Exchange operators (broadcast disabled to force the join to prove it)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o_name, l_name = write_bucketed_pair(
            spark, sf_correct, str(tmp_path), "t1"
        )
        j = bucketed_join(spark, o_name, l_name)
        plan = plan_string(j, mode="simple")
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan

        # correctness: identical to the plain (shuffled) join
        o = load_table(spark, sf_correct, "orders")
        li = load_table(spark, sf_correct, "lineitem")
        plain = o.join(li, o.o_orderkey == li.l_orderkey).select(
            "o_orderkey", "l_linenumber", "o_totalprice", "l_quantity"
        )
        assert j.count() == plain.count()
        a = j.agg(F.round(F.sum("l_quantity"), 2)).collect()[0][0]
        b = plain.agg(F.round(F.sum("l_quantity"), 2)).collect()[0][0]
        assert a == b
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS orders_b_t1")
        spark.sql("DROP TABLE IF EXISTS lineitem_b_t1")


def test_registered_join_bucketed_no_exchange_and_correct(spark, sf_correct):
    """The REGISTERED query key (driver-stamped): zero Exchange in the
    plan with broadcast disabled, and row/sum parity with the plain join."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.bucketed import (
        join_bucketed,
    )

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = join_bucketed(spark, sf_correct)
        plan = plan_string(j, mode="simple")
        assert "Exchange" not in plan, plan
        o = load_table(spark, sf_correct, "orders")
        li = load_table(spark, sf_correct, "lineitem")
        plain = o.join(li, o.o_orderkey == li.l_orderkey)
        assert j.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_compaction_reduces_files_and_preserves_content(spark, sf_correct, tmp_path):
    """64 debris files → size-derived file count (1 at test scale), byte
    sizing from the FS content summary, exact content roundtrip."""
    from pyspark.sql import functions as F

    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.compaction import (
        compact_parquet,
        directory_bytes,
        parquet_file_count,
    )
    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        load_table,
    )

    frag = str(tmp_path / "frag")
    out = str(tmp_path / "out")
    docs = load_table(spark, sf_correct, "documents")
    docs.repartition(64).write.parquet(frag)
    assert parquet_file_count(frag) == 64
    total = directory_bytes(spark, frag)
    assert total > 0
    # target chosen to land at exactly 2 files at this scale
    n = compact_parquet(spark, frag, out, target_bytes=(total + 1) // 2)
    assert n == 2 == parquet_file_count(out)
    a = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    b = sorted(r.doc_id for r in docs.collect())
    assert a == b


def test_compact_roundtrip_matches_oracle(spark, sf_correct):
    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.compaction import (
        FRAGMENT_FILES,
        compacted_documents_dir,
        parquet_file_count,
    )

    frag, compact = compacted_documents_dir(spark, sf_correct)
    assert parquet_file_count(frag) == FRAGMENT_FILES
    assert parquet_file_count(compact) < FRAGMENT_FILES
    assert_matches_oracle(
        spark,
        sf_correct,
        "compact_roundtrip",
        registry.QUERIES["compact_roundtrip"],
        registry.ORACLES["compact_roundtrip"],
    )


def test_partitioned_compaction_preserves_layout_and_content(
    spark, sf_correct, tmp_path
):
    """Per-partition compaction: the lang= layout survives, every
    partition collapses to its size-derived file count, and a pruned read
    over the compacted root equals the source filter."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.compaction import (
        compact_partitioned,
        parquet_file_count,
    )
    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        load_table,
    )

    frag = str(tmp_path / "part_frag")
    out = str(tmp_path / "part_out")
    docs = load_table(spark, sf_correct, "documents")
    docs.repartition(8).write.partitionBy("lang").parquet(frag)
    counts = compact_partitioned(spark, frag, out)
    assert set(counts) == {
        f"lang={r.lang}" for r in docs.select("lang").distinct().collect()
    }
    for d, n in counts.items():
        assert n == 1  # tiny partitions at test scale
        assert parquet_file_count(f"{out}/{d}") == 1
        assert parquet_file_count(f"{frag}/{d}") > 1
    # pruned read over the compacted layout matches the flat filter
    got = sorted(
        r.doc_id
        for r in spark.read.parquet(f"{out}/lang=de").collect()
    )
    want = sorted(
        r.doc_id for r in docs.filter(F.col("lang") == "de").collect()
    )
    assert got == want and got

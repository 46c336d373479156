"""Persisted IVFPQ index lifecycle: layout on disk, partition-pruned probe
plan, ADC/recall correctness, and the registered verdict's oracle."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from parallel_map_reduce_word_counter_for_one_machine_spark import registry
from parallel_map_reduce_word_counter_for_one_machine_spark.operators.annindex import (
    ivfpq_index_dir,
    ivfpq_pruned_topk_listing,
    probed_codes_scan,
)
from parallel_map_reduce_word_counter_for_one_machine_spark.operators.similarity import (
    ANN_RECALL_BOUND,
    PQ_M,
    similarity_topk,
)
from parallel_map_reduce_word_counter_for_one_machine_spark.plans.inspect import (
    plan_string,
)

from .oracle import assert_matches_oracle

registry.load_all()


def test_index_layout_on_disk(spark, sf_dir):
    """The build writes the three FAISS-shaped tables; codes are hive-
    partitioned by cell and exactly PQ_M bytes per vector."""
    root = ivfpq_index_dir(spark, sf_dir)
    assert os.path.isdir(os.path.join(root, "codebooks"))
    assert os.path.isdir(os.path.join(root, "centroids"))
    cell_dirs = [
        d for d in os.listdir(os.path.join(root, "codes")) if d.startswith("cell=")
    ]
    assert len(cell_dirs) >= 2, "codes not partitioned by cell"
    codes = spark.read.parquet(os.path.join(root, "codes"))
    lens = codes.select(F.length("code").alias("n")).distinct().collect()
    assert [r.n for r in lens] == [PQ_M]
    # every nonzero vector is indexed exactly once
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert codes.select("vec_id").distinct().count() == codes.count() <= n_vecs


def test_probe_scan_is_partition_pruned(spark, sf_dir):
    """The probed read resolves the cell filter at file-listing time:
    PartitionFilters carries `cell`, and the data schema read from disk is
    codes-only (16 B/vector), never raw embeddings."""
    root = ivfpq_index_dir(spark, sf_dir)
    df = probed_codes_scan(spark, root, [0, 1, 2])
    plan = plan_string(df)
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters")[1].splitlines()[0]
    assert "embedding" not in plan  # raw vectors never touched by the probe
    got_cells = sorted(r.cell for r in df.select("cell").distinct().collect())
    assert got_cells == [0, 1, 2]


def test_pruned_listing_recall_vs_exact(spark, sf_dir):
    """End-to-end probe recall over the persisted index clears the same
    bound the registered verdict enforces, and the listing keeps the
    shared (query_id, cand_id, cos_sim, rk) contract."""
    exact = {
        (r.query_id, r.cand_id)
        for r in similarity_topk(spark, sf_dir).collect()
    }
    approx = ivfpq_pruned_topk_listing(spark, sf_dir)
    rows = approx.collect()
    assert rows and set(approx.columns) == {"query_id", "cand_id", "cos_sim", "rk"}
    got = {(r.query_id, r.cand_id) for r in rows}
    assert len(exact & got) >= ANN_RECALL_BOUND * len(exact)


def test_registered_verdict_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "similarity_topk_ivfpq_pruned",
        registry.QUERIES["similarity_topk_ivfpq_pruned"],
        registry.ORACLES["similarity_topk_ivfpq_pruned"],
    )


def test_kmeans_index_deepens_pruning(spark, sf_dir):
    """The trained coarse quantizer spreads codes over more cells than the
    10 labels, so a fixed-n_probe probe opens a SMALLER fraction of the
    partition directories — the pruning-depth knob the label-cell index
    can't turn. Asserts the kmeans index has more cell dirs than labels
    and that a single probe's file fraction is below the label-cell one."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.annindex import (
        IVFPQ_KMEANS_CELLS,
        IVFPQ_KMEANS_PROBE,
    )
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.similarity import (
        IVFPQ_N_PROBE,
    )

    root_km = ivfpq_index_dir(spark, sf_dir, n_cells=IVFPQ_KMEANS_CELLS)
    cell_dirs = [
        d for d in os.listdir(os.path.join(root_km, "codes")) if d.startswith("cell=")
    ]
    n_labels = 10
    assert len(cell_dirs) > n_labels
    # per-query scan fraction: n_probe / n_cells, strictly deeper pruning
    assert IVFPQ_KMEANS_PROBE / len(cell_dirs) < IVFPQ_N_PROBE / n_labels
    # every nonzero vector still indexed exactly once
    codes = spark.read.parquet(os.path.join(root_km, "codes"))
    assert codes.select("vec_id").distinct().count() == codes.count()


def test_kmeans_pruned_verdict_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "similarity_topk_ivfpq_kmeans_pruned",
        registry.QUERIES["similarity_topk_ivfpq_kmeans_pruned"],
        registry.ORACLES["similarity_topk_ivfpq_kmeans_pruned"],
    )

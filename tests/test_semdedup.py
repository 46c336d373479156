"""SemDeDup certification: oracle match on the driver corpus (no
false-positive removals at τ = 0.9) plus planted-duplicate tests proving
recall and the paper's keeper-selection semantics against an independent
numpy reference (the same split ``dedup_embedding_lsh`` uses)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from parallel_map_reduce_word_counter_for_one_machine_spark import registry
from parallel_map_reduce_word_counter_for_one_machine_spark.operators import (
    semdedup as SD,
)
from parallel_map_reduce_word_counter_for_one_machine_spark.operators.similarity import (
    kmeans_centroids,
)

from .oracle import assert_matches_oracle

registry.load_all()


def test_oracle_match(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "dedup_semdedup",
        registry.QUERIES["dedup_semdedup"],
        registry.ORACLES["dedup_semdedup"],
    )


def _planted_vectors(rng: np.random.Generator) -> np.ndarray:
    """80 isotropic unit vectors + two planted 4-cliques (base + 1e-3
    noise) + one 3-chain a–b–c with cos(a,b)=cos(b,c)≈0.95 but
    cos(a,c)≈0.81 < τ, built by rotating in a fixed 2-plane."""
    dim = 16
    vecs = []
    iso = rng.normal(size=(80, dim))
    vecs.append(iso)
    for _ in range(2):
        base = rng.normal(size=dim)
        clique = base + 1e-3 * rng.normal(size=(4, dim))
        vecs.append(clique)
    # Chain: rotate base within the (e1, e2) plane spanned by two random
    # orthonormal directions by 0, θ, 2θ with cos θ = 0.95.
    u = rng.normal(size=dim)
    u /= np.linalg.norm(u)
    w = rng.normal(size=dim)
    w -= (w @ u) * u
    w /= np.linalg.norm(w)
    theta = np.arccos(0.95)
    chain = np.stack(
        [np.cos(k * theta) * u + np.sin(k * theta) * w for k in range(3)]
    )
    vecs.append(chain)
    X = np.concatenate(vecs)
    return X / np.linalg.norm(X, axis=1, keepdims=True)


def _numpy_reference(X: np.ndarray, assigned: list) -> set[int]:
    """Independent dominated-rule reference: per cell, pairwise cosine;
    a vector is removed iff a same-cell τ-neighbor has strictly lower
    centroid similarity (tie → lower vec_id)."""
    cell = {r.vec_id: r.cell_id for r in assigned}
    csim = {r.vec_id: r.cent_sim for r in assigned}
    ids = sorted(cell)
    removed = set()
    for i in ids:
        for j in ids:
            if i == j or cell[i] != cell[j]:
                continue
            if float(X[i] @ X[j]) < SD.SEMDEDUP_TAU:
                continue
            if (csim[i], i) < (csim[j], j):
                removed.add(j)
    return set(ids) - removed


@pytest.fixture(scope="module")
def planted(spark):
    rng = np.random.default_rng(7)
    X = _planted_vectors(rng)
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("v", ArrayType(DoubleType())),
        ]
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))], schema
    )
    cents = kmeans_centroids(df, k=6, dim=16)
    kept = SD.semdedup_kept(df, cents)
    assigned = SD.assign_cells_with_sim(df, cents).collect()
    return X, assigned, kept.collect()


def test_planted_matches_numpy_reference(planted):
    X, assigned, kept_rows = planted
    expect = _numpy_reference(X, assigned)
    got = {r.vec_id for r in kept_rows}
    assert got == expect


def test_planted_cliques_keep_exactly_centroid_farthest(planted):
    """Each planted clique (ids 80-83, 84-87) collapses to ONE survivor —
    its centroid-FARTHEST member (the paper's keeper rule) — provided the
    clique co-clusters (cos ≈ 1 members share a nearest centroid)."""
    X, assigned, kept_rows = planted
    cell = {r.vec_id: r.cell_id for r in assigned}
    csim = {r.vec_id: r.cent_sim for r in assigned}
    kept = {r.vec_id for r in kept_rows}
    for clique in (range(80, 84), range(84, 88)):
        cells = {cell[i] for i in clique}
        assert len(cells) == 1, "near-identical members must co-cluster"
        survivors = kept & set(clique)
        assert len(survivors) == 1
        assert survivors == {min(clique, key=lambda i: (csim[i], i))}


def test_planted_chain_over_removes_per_paper(planted):
    """Chain ids 88-89-90: both τ-edges remove their centroid-closer
    endpoint even when the remover is itself removed — at most one
    survivor, and the survivor is undominated (paper's triangular rule,
    NOT connected-component keep-one)."""
    X, assigned, kept_rows = planted
    chain = [88, 89, 90]
    # Construction sanity: adjacent ≥ τ, ends < τ.
    assert float(X[88] @ X[89]) >= SD.SEMDEDUP_TAU
    assert float(X[89] @ X[90]) >= SD.SEMDEDUP_TAU
    assert float(X[88] @ X[90]) < SD.SEMDEDUP_TAU
    kept = {r.vec_id for r in kept_rows}
    cell = {r.vec_id: r.cell_id for r in assigned}
    if len({cell[i] for i in chain}) == 1:
        survivors = kept & set(chain)
        assert len(survivors) <= 2  # a–c may both survive only if b removed
        assert 89 in kept or survivors <= {88, 90}


def test_isotropic_vectors_all_survive(planted):
    """No planted structure among the 80 isotropic vectors ⇒ none removed
    unless it genuinely has a ≥ τ neighbor (vanishingly unlikely at
    dim 16 with 80 draws — construction asserts it)."""
    X, assigned, kept_rows = planted
    iso = range(0, 80)
    sims = X[list(iso)] @ X[list(iso)].T
    np.fill_diagonal(sims, 0.0)
    assert sims.max() < SD.SEMDEDUP_TAU
    kept = {r.vec_id for r in kept_rows}
    assert set(iso) <= kept

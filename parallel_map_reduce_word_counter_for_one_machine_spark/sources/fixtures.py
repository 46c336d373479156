"""Deterministic synthetic fixtures for scale-path evidence runs.

The driver's testdata embeddings are ISOTROPIC (vectors drawn without
cluster structure), so a coarse quantizer over them carries no signal and
any IVF recall measurement degenerates to ≈ the probed corpus fraction
(VERDICT r10 item 1: probing 70% to recover 77.5% of edges proves
nothing about pruning). Real embedding corpora are the opposite — text
embeddings cluster heavily by topic/language — and the IVF family's
entire 100 TB story is "few probes, high recall" ON THAT STRUCTURE.

``write_clustered_embeddings`` builds the minimal honest stand-in: a
mixture of k well-separated unit centroids with isotropic Gaussian noise,
written in the exact testdata `embeddings` schema (vec_id LONG,
embedding ARRAY<FLOAT>, label INT, label = generating mixture component)
so every IVF/ANN operator runs on it unmodified via its ``sf_dir``
argument. The label column doubles as the coarse-quantizer cell
assignment — the production assumption that cells come from SOME
clustering of the corpus (label_centroids here, kmeans_centroids in the
trained path), with the fixture guaranteeing the clustering is real.

Geometry notes (d=32, k=10, seed fixed): random unit centroids are
near-orthogonal (pairwise cos ~ N(0, 1/√d) ≈ ±0.18); per-dim noise σ
(``spread``) puts within-cluster cosine at ≈ 1/(1+dσ²) and cross-cluster
at ≈ ρ/(1+dσ²) — at σ=0.25 that is ~0.33 vs ~0.06, separated but noisy
enough that a measurable fraction of true neighbors sit across cell
boundaries, which is exactly what makes nprobe>1 non-trivial.
"""

from __future__ import annotations

import os

# Fixture defaults: 2000 vectors matches the sf0.1 embeddings table size;
# 10 cells matches the label-cell count of the driver corpus.
CLUSTERED_N = 2000
CLUSTERED_D = 32
CLUSTERED_K = 10
CLUSTERED_SPREAD = 0.25
CLUSTERED_SEED = 20260816


def write_clustered_embeddings(
    dir_path: str,
    n: int = CLUSTERED_N,
    d: int = CLUSTERED_D,
    k: int = CLUSTERED_K,
    spread: float = CLUSTERED_SPREAD,
    seed: int = CLUSTERED_SEED,
) -> str:
    """Write ``{dir_path}/embeddings.parquet`` — a k-component
    mixture-of-Gaussians embedding corpus in the testdata schema.
    Round-robin component assignment (vec_id % k) keeps every cell at
    n/k members, so no cell is degenerate and the probed-fraction
    arithmetic (nprobe/k of the corpus) is exact. Returns ``dir_path``
    so call sites can pass it straight as an operator's ``sf_dir``."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    cents = rng.normal(size=(k, d))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    labels = np.arange(n) % k
    X = cents[labels] + spread * rng.normal(size=(n, d))
    os.makedirs(dir_path, exist_ok=True)
    table = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(
                [row.astype(np.float32) for row in X],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(labels.astype(np.int32)),
        }
    )
    out = os.path.join(dir_path, "embeddings.parquet")
    pq.write_table(table, out)
    return dir_path

"""Embedding-side training-data prep: semantic decontamination, triplet
mining, and feature-hashed doc vectors — each proven against the DuckDB
oracle AND an independent numpy/Python reference."""

from __future__ import annotations

import hashlib

import numpy as np

from parallel_map_reduce_word_counter_for_one_machine_spark import registry
from parallel_map_reduce_word_counter_for_one_machine_spark.operators.embedprep import (
    BENCH_MOD,
    CONTAM_TAU,
    HASH_DIMS,
    N_ANCHORS,
)

from .oracle import assert_matches_oracle

registry.load_all()


def _load_np(spark, sf_dir):
    rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    labels = np.array([r.label for r in rows], dtype=np.int64)
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    return ids, labels, X


def _cos_matrix(X, Y):
    xn = np.linalg.norm(X, axis=1, keepdims=True)
    yn = np.linalg.norm(Y, axis=1, keepdims=True)
    return (X @ Y.T) / (xn * yn.T)


def test_decontaminate_semantic_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "decontaminate_semantic",
        registry.QUERIES["decontaminate_semantic"],
        registry.ORACLES["decontaminate_semantic"],
    )


def test_decontaminate_semantic_vs_numpy(spark, sf_dir):
    ids, _, X = _load_np(spark, sf_dir)
    bench = ids % BENCH_MOD == 0
    S = np.round(_cos_matrix(X[~bench], X[bench]), 6)
    hit = S >= CONTAM_TAU
    expected = {
        int(v): (int(hit[i].sum()), float(S[i][hit[i]].max()))
        for i, v in enumerate(ids[~bench])
        if hit[i].any()
    }
    got = {
        r.vec_id: (r.n_bench_hits, r.max_bench_cos)
        for r in registry.QUERIES["decontaminate_semantic"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(expected)
    for v, (n, mx) in expected.items():
        assert got[v][0] == n
        assert abs(got[v][1] - mx) < 1e-9
    # no benchmark vector may appear as a flagged corpus vector
    assert all(v % BENCH_MOD != 0 for v in got)


def test_triplet_mining_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "triplet_mining",
        registry.QUERIES["triplet_mining"],
        registry.ORACLES["triplet_mining"],
    )


def test_triplet_mining_vs_numpy(spark, sf_dir):
    """pos = argmax cosine among same-label (excluding self), neg = argmax
    among different-label, tiebreak lowest cand_id — checked per anchor."""
    ids, labels, X = _load_np(spark, sf_dir)
    S = np.round(_cos_matrix(X, X), 6)
    got = {
        r.anchor_id: r
        for r in registry.QUERIES["triplet_mining"](spark, sf_dir).collect()
    }
    anchors = [i for i, v in enumerate(ids) if v < N_ANCHORS]
    assert len(got) == len(anchors)
    for i in anchors:
        cands = [
            (-S[i, j], ids[j], j) for j in range(len(ids)) if ids[j] != ids[i]
        ]
        pos = min(c for c in cands if labels[c[2]] == labels[i])
        neg = min(c for c in cands if labels[c[2]] != labels[i])
        r = got[ids[i]]
        assert (r.pos_id, r.neg_id) == (pos[1], neg[1])
        assert abs(r.pos_cos - -pos[0]) < 1e-9
        assert abs(r.neg_cos - -neg[0]) < 1e-9
        assert abs(r.margin - round(-pos[0] - -neg[0], 6)) < 1e-9


def test_doc_embedding_hashed_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "doc_embedding_hashed",
        registry.QUERIES["doc_embedding_hashed"],
        registry.ORACLES["doc_embedding_hashed"],
    )


def _py_hash_embed(text):
    out = {}
    for w in text.split(" "):
        if not w:
            continue
        h = hashlib.md5(w.encode()).hexdigest()
        dim = int(h[:8], 16) % HASH_DIMS
        sgn = 1 if int(h[8], 16) % 2 == 0 else -1
        out[dim] = out.get(dim, 0) + sgn
    return out


def test_doc_embedding_hashed_vs_python(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    expected = {}
    for d in docs:
        for dim, val in _py_hash_embed(d.text).items():
            expected[(d.doc_id, dim)] = val
    got = {
        (r.doc_id, r.dim): r.val
        for r in registry.QUERIES["doc_embedding_hashed"](
            spark, sf_dir
        ).collect()
    }
    assert got == expected
    # signed sums are bounded by the doc's token count
    for d in docs:
        n = sum(1 for w in d.text.split(" ") if w)
        assert sum(abs(v) for (i, _), v in got.items() if i == d.doc_id) <= n


def test_embedding_quantize_int8_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "embedding_quantize_int8",
        registry.QUERIES["embedding_quantize_int8"],
        registry.ORACLES["embedding_quantize_int8"],
    )


def test_embedding_quantize_int8_vs_numpy(spark, sf_dir):
    """Independent twin: per-dim max-abs scales, floor(x+0.5) quantize,
    reconstruction errors — per-label n_vecs/mse_e12/max_err_e12 must
    match the engine exactly."""
    import math

    ids, labels, X = _load_np(spark, sf_dir)
    scale = np.abs(X).max(axis=0)
    safe = np.where(scale > 0, scale, 1.0)
    q = np.floor(X / safe * 127 + 0.5)
    deq = np.where(scale > 0, q * safe / 127, 0.0)
    err = (X - deq) ** 2
    want = {}
    for lb in sorted(set(labels)):
        m = labels == lb
        e = err[m]
        want[int(lb)] = (
            int(m.sum()),
            int(round(e.mean() * 1e12)),
            int(round(e.max() * 1e12)),
        )
    got = {
        r.label: (r.n_vecs, r.mse_e12, r.max_err_e12)
        for r in registry.QUERIES["embedding_quantize_int8"](
            spark, sf_dir
        ).collect()
    }
    assert got == want


def test_quantized_vectors_preserve_topk_recall(spark, sf_dir):
    """The acceptance claim behind the report: ANN over DEQUANTIZED
    vectors recovers almost all of the exact float top-10 (the int8 noise
    floor sits far below inter-vector distance scale)."""
    ids, _, X = _load_np(spark, sf_dir)
    nrm = np.linalg.norm(X, axis=1)
    ok = nrm > 0
    ids, X = ids[ok], X[ok]
    scale = np.abs(X).max(axis=0)
    safe = np.where(scale > 0, scale, 1.0)
    deq = np.where(scale > 0, np.floor(X / safe * 127 + 0.5) * safe / 127, 0.0)

    def topk(M):
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        hits = {}
        for qi in range(min(5, len(ids))):
            sims = Mn @ Mn[qi]
            sims[qi] = -2
            order = np.argsort(np.round(-sims, 12), kind="stable")
            hits[ids[qi]] = {int(ids[j]) for j in order[:10]}
        return hits

    exact, quant = topk(X), topk(deq)
    inter = sum(len(exact[q] & quant[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    recall = inter / total
    assert recall >= 0.9, f"int8 top-10 recall {recall:.2f} < 0.9"


# --- skipgram_pairs -----------------------------------------------------------


def test_skipgram_pairs_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "skipgram_pairs",
        registry.QUERIES["skipgram_pairs"],
        registry.ORACLES["skipgram_pairs"],
    )


def test_skipgram_pair_conservation(spark, sf_correct):
    """Pair-token conservation: every interior token contributes exactly
    2*WIN pairs, boundary tokens fewer — so sum(n) equals the window-sum
    computed directly from per-doc token counts. Also symmetry: the
    relation is its own transpose (every (a, b) window co-occurrence is
    seen from both ends)."""
    from pyspark.sql import functions as F
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.embedprep import (
        SKIPGRAM_WIN,
    )
    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        load_table,
    )

    out = registry.QUERIES["skipgram_pairs"](spark, sf_correct).cache()
    total = out.agg(F.sum("n")).first()[0]
    d = load_table(spark, sf_correct, "documents")
    ns = [
        r.n
        for r in d.select(
            F.size(F.filter(F.split("text", " "), lambda x: x != "")).alias("n")
        ).collect()
    ]
    expect = 0
    for n in ns:
        for i in range(n):
            expect += min(i + SKIPGRAM_WIN, n - 1) - max(i - SKIPGRAM_WIN, 0)
    assert total == expect
    # transpose symmetry
    flipped = out.select(
        F.col("context").alias("center"), F.col("center").alias("context"), "n"
    )
    assert out.exceptAll(flipped).count() == 0
    out.unpersist()


def test_word2vec_negative_table_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "word2vec_negative_table",
        registry.QUERIES["word2vec_negative_table"],
        registry.ORACLES["word2vec_negative_table"],
    )


def test_negative_table_smoothing_law(spark, sf_correct):
    """cnt^0.75 smoothing: weights grow with count but SUBLINEARLY — for
    any two words, cnt_a > cnt_b implies w_a > w_b and w_a/w_b < cnt_a/
    cnt_b. Also the sqrt(sqrt(c³)) trick must equal pow within 1 micro
    unit on every row (they can differ in the last ulp — that is WHY pow
    is not used — but never by a unit at 6 decimals)."""
    rows = registry.QUERIES["word2vec_negative_table"](spark, sf_correct).collect()
    assert rows
    by_cnt = sorted(rows, key=lambda r: (r.cnt, r.word))
    for a, b in zip(by_cnt, by_cnt[1:]):
        if b.cnt > a.cnt:
            assert b.weight_e6 > a.weight_e6
            assert b.weight_e6 * a.cnt < a.weight_e6 * b.cnt  # sublinear
    for r in rows:
        assert abs(r.weight_e6 - round(r.cnt ** 0.75 * 1e6)) <= 1

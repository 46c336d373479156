"""Hybrid retrieve-then-rerank: DuckDB oracle match plus a full Python
twin of both stages (BM25 candidate generation, hashed-feature cosine
rerank) at smoke scale."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from parallel_map_reduce_word_counter_for_one_machine_spark import registry
from parallel_map_reduce_word_counter_for_one_machine_spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    FINAL_K,
    N_CAND,
    N_Q,
)
from parallel_map_reduce_word_counter_for_one_machine_spark.operators.embedprep import (
    HASH_DIMS,
)

from .oracle import assert_matches_oracle

registry.load_all()


def test_hybrid_retrieval_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "hybrid_retrieval",
        registry.QUERIES["hybrid_retrieval"],
        registry.ORACLES["hybrid_retrieval"],
    )


def _hash_vec(words):
    v = [0] * HASH_DIMS
    for w in words:
        h = hashlib.md5(w.encode()).hexdigest()
        v[int(h[:8], 16) % HASH_DIMS] += 1 if int(h[8], 16) % 2 == 0 else -1
    return v


def test_hybrid_retrieval_vs_python(spark, sf_dir):
    docs = {
        r.doc_id: [w for w in r.text.split(" ") if w]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    tf = {d: Counter(ws) for d, ws in docs.items()}
    dl = {d: len(ws) for d, ws in docs.items()}
    n_docs = len(docs)
    avgdl = sum(dl.values()) / n_docs
    df = Counter(w for t in tf.values() for w in t)

    def bm25(query_id, doc_id):
        s = 0.0
        for w in tf[query_id]:
            f = tf[doc_id].get(w, 0)
            if not f:
                continue
            idf = math.log((n_docs - df[w] + 0.5) / (df[w] + 0.5) + 1)
            s += idf * f * (BM25_K1 + 1) / (
                f + BM25_K1 * (1 - BM25_B + BM25_B * dl[doc_id] / avgdl)
            )
        return round(s, 6)

    vecs = {d: _hash_vec(ws) for d, ws in docs.items()}

    expected = set()
    for qid in [d for d in docs if d < N_Q]:
        # engine candidates come from a join on shared terms — docs with
        # no term overlap never enter stage 1
        shared = [
            d for d in docs if d != qid and any(w in tf[d] for w in tf[qid])
        ]
        cands = sorted(
            ((bm25(qid, d), d) for d in shared), key=lambda t: (-t[0], t[1])
        )[:N_CAND]
        qv = vecs[qid]
        qn = sum(x * x for x in qv)
        rer = []
        for b, d in cands:
            dv = vecs[d]
            dn = sum(x * x for x in dv)
            dot = sum(a * c for a, c in zip(qv, dv))
            cos = round(dot / math.sqrt(qn * dn), 6) if qn > 0 and dn > 0 else 0.0
            rer.append((cos, d, b))
        rer.sort(key=lambda t: (-t[0], t[1]))
        for rank, (cos, d, b) in enumerate(rer[:FINAL_K], start=1):
            expected.add((qid, rank, d, b, cos))

    got = {
        (r.query_id, r.rank, r.doc_id, r.bm25_score, r.cos_score)
        for r in registry.QUERIES["hybrid_retrieval"](spark, sf_dir).collect()
    }
    assert got == expected


def test_hybrid_rrf_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "hybrid_retrieval_rrf",
        registry.QUERIES["hybrid_retrieval_rrf"],
        registry.ORACLES["hybrid_retrieval_rrf"],
    )


def test_hybrid_rrf_fuses_the_candidate_rankings(spark, sf_dir):
    """RRF must be a pure rank-space fusion of the SAME candidate relation
    the cosine rerank consumes: recompute both per-query rankings from
    ``_hybrid_scored`` in Python, fuse with 1/(60+r), and the engine's
    top-FINAL_K (ranks, scores, order) must match exactly."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.retrieval import (
        RRF_K,
        _hybrid_scored,
    )

    cs = _hybrid_scored(spark, sf_dir).collect()
    by_q: dict = {}
    for r in cs:
        by_q.setdefault(r.query_id, []).append(r)
    want = []
    for qid, rows in by_q.items():
        sparse = sorted(rows, key=lambda r: (-r.bm25, r.doc_id))
        dense = sorted(rows, key=lambda r: (-r.cos, r.doc_id))
        sr = {r.doc_id: i + 1 for i, r in enumerate(sparse)}
        dr = {r.doc_id: i + 1 for i, r in enumerate(dense)}
        fused = sorted(
            ((1.0 / (RRF_K + sr[r.doc_id]) + 1.0 / (RRF_K + dr[r.doc_id]),
              r.doc_id) for r in rows),
            key=lambda t: (-t[0], t[1]),
        )
        for rank, (score, doc) in enumerate(fused[:5], start=1):
            want.append((qid, rank, doc, sr[doc], dr[doc], round(score, 6)))
    got = [
        (r.query_id, r.rank, r.doc_id, r.sparse_rank, r.dense_rank, r.rrf_score)
        for r in registry.QUERIES["hybrid_retrieval_rrf"](spark, sf_dir).collect()
    ]
    assert sorted(got) == sorted(want)


def test_retrieval_eval_metrics_domain(spark, sf_correct):
    """Oracle match + metric-domain invariants: rr, p@k, r@k all in
    [0, 1]; rr > 0 implies at least one relevant hit in the top-k
    (p_at_k > 0); one row per query vector."""
    from parallel_map_reduce_word_counter_for_one_machine_spark import registry
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.similarity import (
        N_QUERIES,
    )
    from .oracle import assert_matches_oracle

    assert_matches_oracle(
        spark,
        sf_correct,
        "retrieval_eval_metrics",
        registry.QUERIES["retrieval_eval_metrics"],
        registry.ORACLES["retrieval_eval_metrics"],
    )
    rows = registry.QUERIES["retrieval_eval_metrics"](spark, sf_correct).collect()
    assert len(rows) == N_QUERIES
    for r in rows:
        assert 0 <= r.rr <= 1 and 0 <= r.p_at_k <= 1 and 0 <= r.r_at_k <= 1
        assert (r.rr > 0) == (r.p_at_k > 0)

"""Tests for chunk_documents, quality_gopher, and embedding_outliers:
oracle matches plus hand-checkable semantic invariants (window/stride
coverage, rule-flag reconstruction, bottom-K-per-label shape)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from parallel_map_reduce_word_counter_for_one_machine_spark import registry
from parallel_map_reduce_word_counter_for_one_machine_spark.operators.chunking import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    chunk_documents,
)
from parallel_map_reduce_word_counter_for_one_machine_spark.operators.similarity import (
    OUTLIER_K,
    embedding_outliers,
)
from parallel_map_reduce_word_counter_for_one_machine_spark.operators.text import (
    GOPHER_MIN_STOP_HITS,
    GOPHER_MIN_WORDS,
    quality_gopher,
)
from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
    load_table,
)

from .oracle import assert_matches_oracle

registry.load_all()

NEW_KEYS = ["chunk_documents", "quality_gopher", "embedding_outliers"]


@pytest.mark.parametrize("name", NEW_KEYS)
def test_oracle_match(spark, sf_correct, name):
    assert_matches_oracle(
        spark, sf_correct, name, registry.QUERIES[name], registry.ORACLES[name]
    )


def test_chunk_coverage_and_overlap(spark, sf_dir):
    """Per doc: chunk count matches the closed form, chunk 0 starts at the
    first token, consecutive chunks overlap by exactly W−S tokens (when the
    successor is full-width start alignment holds), concatenating each
    chunk's FIRST S tokens plus the last chunk's tail reconstructs the
    document, and no chunk is empty."""
    docs = {
        r.doc_id: [w for w in r.text.split(" ") if w != ""]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    chunks = chunk_documents(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, toks in docs.items():
        n = len(toks)
        if n == 0:
            assert doc_id not in by_doc
            continue
        rows = sorted(by_doc[doc_id], key=lambda r: r.chunk_id)
        expect_chunks = 1 + math.ceil(max(0, n - CHUNK_TOKENS) / CHUNK_STRIDE)
        assert [r.chunk_id for r in rows] == list(range(expect_chunks))
        recon: list[str] = []
        for r in rows:
            got = r.chunk_text.split(" ")
            start = r.chunk_id * CHUNK_STRIDE
            assert got == toks[start : start + CHUNK_TOKENS]
            assert r.n_chunk_tokens == len(got) > 0
            recon.extend(got[:CHUNK_STRIDE])
        # stride-prefix concatenation + final chunk's overlap tail = doc
        last = rows[-1].chunk_text.split(" ")
        recon.extend(last[CHUNK_STRIDE:])
        assert recon == toks


def test_gopher_flag_reconstruction(spark, sf_correct):
    """gopher_pass equals the conjunction recomputed from the emitted
    metrics, and the corpus (50+-token clean prose-ish docs) passes the
    word floor wherever it should."""
    rows = quality_gopher(spark, sf_correct).collect()
    assert len(rows) > 0
    for r in rows:
        if r.n_words == 0:
            assert r.gopher_pass is False
            continue
        expect = (
            GOPHER_MIN_WORDS <= r.n_words <= 100_000
            and 3.0 <= r.mean_word_len <= 10.0
            and r.alpha_frac >= 0.8
            and r.symbol_ratio <= 0.1
            and r.stop_hits >= GOPHER_MIN_STOP_HITS
        )
        assert r.gopher_pass == expect, r


def test_embedding_outliers_shape(spark, sf_correct):
    """Exactly OUTLIER_K rows per label, ranks are 1..K by ascending
    cos_centroid, and every surfaced cosine is <= that label's median
    (outliers really are the atypical tail)."""
    out = embedding_outliers(spark, sf_correct)
    rows = out.collect()
    per_label: dict[int, list] = {}
    for r in rows:
        per_label.setdefault(r.label, []).append(r)
    emb = load_table(spark, sf_correct, "embeddings")
    n_labels = emb.select("label").distinct().count()
    assert len(per_label) == n_labels
    for label, lr in per_label.items():
        lr.sort(key=lambda r: r.rk)
        assert [r.rk for r in lr] == list(range(1, OUTLIER_K + 1))
        cs = [r.cos_centroid for r in lr]
        assert cs == sorted(cs)


def test_chunk_plan_is_map_only(spark, sf_correct):
    """No Exchange in the chunking plan — chunk construction must stay a
    map-only pass (the 100 TB contract in the module docstring)."""
    plan = chunk_documents(spark, sf_correct)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


@pytest.mark.parametrize(
    "name", ["dedup_chunks", "quality_dup_ngrams", "dedup_chunks_cdc"]
)
def test_oracle_match_round2(spark, sf_correct, name):
    assert_matches_oracle(
        spark, sf_correct, name, registry.QUERIES[name], registry.ORACLES[name]
    )


def test_dedup_chunks_semantics(spark, sf_correct):
    """Every reported fingerprint really has n_copies matching occurrences
    in the chunk relation, n_docs <= n_copies, and first_doc is a doc that
    contains the chunk."""
    from collections import Counter

    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.chunking import (
        dedup_chunks,
    )
    import hashlib

    chunks = chunk_documents(spark, sf_correct).collect()
    occ: Counter = Counter()
    docs: dict[str, set] = {}
    for r in chunks:
        fp = hashlib.md5(r.chunk_text.encode()).hexdigest()
        occ[fp] += 1
        docs.setdefault(fp, set()).add(r.doc_id)
    reported = dedup_chunks(spark, sf_correct).collect()
    assert len(reported) > 0  # corpus has recurring chunk content
    assert {r.chunk_md5 for r in reported} == {f for f, n in occ.items() if n > 1}
    for r in reported:
        assert r.n_copies == occ[r.chunk_md5]
        assert r.n_docs == len(docs[r.chunk_md5])
        assert r.first_doc == min(docs[r.chunk_md5])


def test_dup_ngrams_hand_case(spark):
    """dup_frac on a hand-built doc: 'a b a b a b' has trigrams
    [aba, bab, aba, bab] -> all 4 occurrences duplicated -> dup_frac 1.0;
    'x y z w' has 2 distinct trigrams -> dup_frac 0.0."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators import text as t

    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "x y z w"), (3, "p q")],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("tmp_docs")
    import parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables as tables

    orig = tables.load_table
    try:
        tables.load_table = lambda spark, sf, name: df  # noqa: ARG005
        t.load_table = tables.load_table
        rows = {r.doc_id: r for r in t.quality_dup_ngrams(spark, "ignored").collect()}
    finally:
        tables.load_table = orig
        t.load_table = orig
    assert rows[1].n_trigrams == 4 and rows[1].dup_frac == 1.0
    assert rows[2].n_trigrams == 2 and rows[2].dup_frac == 0.0
    assert 3 not in rows  # <3 tokens -> no trigrams


def test_chunk_stream_equals_batch(spark, sf_correct):
    """The chunker run as a REAL readStream (file source, availableNow,
    append sink) produces exactly the batch relation — chunking is
    stateless, so streaming ingest needs no watermark or state store."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.streaming.chunkstream import (
        run_stream_chunks,
    )

    stream_df = run_stream_chunks(spark, sf_correct, "t_stream_chunks")
    batch_df = chunk_documents(spark, sf_correct)
    assert sorted(map(tuple, stream_df.collect())) == sorted(
        map(tuple, batch_df.collect())
    )


def test_chunk_relation_property(spark):
    """Property check on adversarial token counts (window/stride boundary
    n ∈ {0,1,S,W-1,W,W+1,W+S-1,W+S,W+S+1,3W}, plus multi-space noise):
    chunk count matches the closed form, slices are exact, coverage holds."""
    import math

    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.chunking import (
        CHUNK_STRIDE as S,
        CHUNK_TOKENS as W,
        chunk_relation,
    )

    cases = []
    for i, n in enumerate([0, 1, S, W - 1, W, W + 1, W + S - 1, W + S, W + S + 1, 3 * W]):
        toks = [f"w{j}" for j in range(n)]
        # inject double spaces and a trailing space: split() artifacts the
        # token filter must absorb
        text = "  ".join(toks) + " " if n else ""
        cases.append((i, text, toks))
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in cases], "doc_id long, text string"
    )
    rows = chunk_relation(df).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, _, toks in cases:
        n = len(toks)
        if n == 0:
            assert i not in by_doc
            continue
        got = sorted(by_doc[i], key=lambda r: r.chunk_id)
        assert len(got) == 1 + math.ceil(max(0, n - W) / S), (n, len(got))
        for r in got:
            s0 = r.chunk_id * S
            assert r.chunk_text.split(" ") == toks[s0 : s0 + W]


def test_cdc_chunk_cdc_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "chunk_cdc",
        registry.QUERIES["chunk_cdc"],
        registry.ORACLES["chunk_cdc"],
    )


def test_cdc_boundaries_survive_prefix_edit(spark, sf_correct):
    """THE content-defined property: prepend tokens to every document and
    most chunk fingerprints survive (only the chunk containing the edit —
    and nothing after the next cut point — changes), while the fixed-
    window chunker loses essentially all of them (every boundary shifts).
    This asymmetry is why storage/dedup systems chunk by content."""
    from pyspark.sql import functions as F

    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.chunking import (
        cdc_chunks,
        chunk_relation,
    )
    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        load_table,
    )

    docs = load_table(spark, sf_correct, "documents").select("doc_id", "text")
    edited = docs.withColumn("text", F.concat(F.lit("zzz yyy xxx "), "text"))

    def fps(chunks):
        return {(r.doc_id, r.fp) for r in chunks.select("doc_id", "fp").collect()}

    cdc_before, cdc_after = fps(cdc_chunks(docs)), fps(cdc_chunks(edited))
    cdc_survival = len(cdc_before & cdc_after) / len(cdc_before)

    def win_fps(d):
        return {
            (r.doc_id, r.chunk_md5)
            for r in chunk_relation(d)
            .select("doc_id", F.md5("chunk_text").alias("chunk_md5"))
            .collect()
        }

    win_before, win_after = win_fps(docs), win_fps(edited)
    win_survival = len(win_before & win_after) / len(win_before)

    assert cdc_survival > 0.8, cdc_survival
    assert win_survival < 0.2, win_survival
    assert cdc_survival > win_survival + 0.5


def test_cdc_chunks_partition_the_token_stream_property(spark):
    """Hypothesis invariants for the CDC chunker on generated corpora:
    (a) chunk token counts per doc sum to the doc's token count — the
    chunks PARTITION the stream; (b) appending tokens at the END changes
    no chunk fingerprint except (possibly) the final chunk's — boundary
    stability, the sharp form of the prefix-edit test."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.chunking import (
        cdc_chunks,
    )

    word = st.text(alphabet="abcde", min_size=1, max_size=3)
    doc = st.lists(word, min_size=1, max_size=30).map(" ".join)

    @settings(max_examples=6, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=4))
    def check(texts):
        rows = [(i, t) for i, t in enumerate(texts)]
        d = spark.createDataFrame(rows, "doc_id LONG, text STRING")
        chunks = cdc_chunks(d).collect()
        # (a) partition property
        got_tokens = {}
        for r in chunks:
            got_tokens[r.doc_id] = got_tokens.get(r.doc_id, 0) + r.n_tokens
        want_tokens = {
            i: len([w for w in t.split(" ") if w]) for i, t in enumerate(texts)
        }
        assert got_tokens == want_tokens

        # (b) append stability: add tokens at the end of every doc
        d2 = spark.createDataFrame(
            [(i, t + " zz qq") for i, t in enumerate(texts)],
            "doc_id LONG, text STRING",
        )
        chunks2 = cdc_chunks(d2).collect()
        before = {(r.doc_id, r.chunk_id): r.fp for r in chunks}
        after = {(r.doc_id, r.chunk_id): r.fp for r in chunks2}
        for i, t in enumerate(texts):
            last = max(cid for (d_, cid) in before if d_ == i)
            for (d_, cid), fp in before.items():
                if d_ == i and cid < last:
                    assert after.get((d_, cid)) == fp, (d_, cid, texts)

    check()


def test_registered_stream_chunks_matches_oracle(spark, sf_correct):
    """Driver-gated streaming chunker: identical relation (and oracle) as
    the batch chunk_documents — the two faces share the oracle string."""
    from parallel_map_reduce_word_counter_for_one_machine_spark import registry
    from parallel_map_reduce_word_counter_for_one_machine_spark.streaming import (
        chunkstream,  # noqa: F401 — registers the key
    )
    from .oracle import assert_matches_oracle

    assert registry.ORACLES["stream_chunk_documents"] == registry.ORACLES[
        "chunk_documents"
    ]
    assert_matches_oracle(
        spark,
        sf_correct,
        "stream_chunk_documents",
        registry.QUERIES["stream_chunk_documents"],
        registry.ORACLES["stream_chunk_documents"],
    )

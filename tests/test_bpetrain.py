"""BPE training: the engine's merges must equal a greedy-leftmost Python
reference — including the adversarial shapes that break naive delimiting
(adjacent repeats sharing a boundary, overlapping runs, merged symbols
participating in later merges)."""

from __future__ import annotations

from collections import Counter

from parallel_map_reduce_word_counter_for_one_machine_spark import registry
from parallel_map_reduce_word_counter_for_one_machine_spark.operators.bpetrain import (
    train_bpe,
)

from .oracle import assert_matches_oracle

registry.load_all()


def _py_bpe(word_counts, merges):
    """Trusted twin: textbook greedy-leftmost BPE on (word, count)."""
    seqs = [([ch for ch in w], c) for w, c in word_counts]
    out = []
    for t in range(1, merges + 1):
        pc = Counter()
        for syms, c in seqs:
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append((t, a, b, cnt))
        nxt = []
        for syms, c in seqs:
            ns, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            nxt.append((ns, c))
        seqs = nxt
    return out


def test_oracle_match(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "tokenizer_bpe_train",
        registry.QUERIES["tokenizer_bpe_train"],
        registry.ORACLES["tokenizer_bpe_train"],
    )


def test_matches_python_reference_on_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    wc = Counter()
    for d in docs:
        for w in d.text.split(" "):
            if w:
                wc[w] += 1
    words = spark.createDataFrame(
        [(w, c) for w, c in wc.items()], "word STRING, c BIGINT"
    )
    assert train_bpe(words, 8) == _py_bpe(wc.items(), 8)


def test_encode_oracle_match(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "tokenizer_bpe_encode",
        registry.QUERIES["tokenizer_bpe_encode"],
        registry.ORACLES["tokenizer_bpe_encode"],
    )


def test_encode_matches_python_reference(spark, sf_dir):
    """Per-doc (n_words, n_bpe_tokens) must equal applying the Python
    reference's learned merges word-by-word over every document."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    wc = Counter()
    for d in docs:
        for w in d.text.split(" "):
            if w:
                wc[w] += 1
    merges = _py_bpe(wc.items(), 6)

    def encode_len(word):
        syms = list(word)
        for _, a, b, _c in merges:
            ns, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            syms = ns
        return len(syms)

    expected = {}
    for d in docs:
        ws = [w for w in d.text.split(" ") if w]
        expected[d.doc_id] = (len(ws), sum(encode_len(w) for w in ws))

    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in registry.QUERIES["tokenizer_bpe_encode"](spark, sf_dir).collect()
    }
    assert got == expected


def test_adversarial_adjacent_and_overlap_shapes(spark):
    """The cases where single-delimiter replace diverges from greedy BPE:
    back-to-back pair occurrences ('abab' — the shared boundary), odd runs
    ('aaa' — leftmost-first), and merges whose output symbol feeds the
    next merge ('merged symbol + next char')."""
    wc = {
        "abab": 10,        # adjacent occurrences share a delimiter
        "ababab": 5,       # three in a row
        "aaaa": 7,         # overlapping run, even
        "aaa": 6,          # overlapping run, odd
        "xabay": 4,        # pair inside other context
        "ka": 3,           # 'a' preceded by non-delimiter must not match
        "ab": 2,
    }
    words = spark.createDataFrame(list(wc.items()), "word STRING, c BIGINT")
    assert train_bpe(words, 6) == _py_bpe(wc.items(), 6)


def test_randomized_corpora_match_reference(spark):
    """Property sweep for the r10 greedy-batch simulation: tiny alphabets
    maximize exactly the shapes where naive batching breaks — symbol
    overlap between front candidates, inverse pairs, self-pairs (runs),
    concat collisions across passes ('ab' re-creatable), tie-breaks, and
    pipe content (the delimiter escape). Every corpus must train
    bit-identically to the sequential Python twin at a merge budget deep
    enough to exhaust most of them. Seeds are FIXED (deterministic test,
    no runtime randomness in CI)."""
    import random

    for seed in range(12):
        rng = random.Random(seed)
        alphabet = ["a", "b", "c", "|"][: rng.randint(2, 4)]
        wc = {}
        for _ in range(rng.randint(4, 14)):
            w = "".join(
                rng.choice(alphabet) for _ in range(rng.randint(1, 7))
            )
            wc[w] = wc.get(w, 0) + rng.randint(1, 40)
        words = spark.createDataFrame(
            list(wc.items()), "word STRING, c BIGINT"
        )
        want = _py_bpe(wc.items(), 20)
        got = train_bpe(words, 20)
        assert got == want, f"seed {seed}: {wc}\n got {got}\nwant {want}"


def test_batched_trainer_is_exact_and_saves_passes(spark, sf_dir):
    """VERDICT r08 item 2: the batched trainer must (a) emit merges
    bit-identical to sequential greedy (the Python twin) and (b) learn
    the corpus's merges in FEWER vocabulary passes than merges — the
    de-sequencing that removes the 50k-sequential-jobs structure."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators import (
        bpetrain,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    wc = Counter()
    for r in docs:
        for w in r.text.split(" "):
            if w:
                wc[w] += 1
    words = spark.createDataFrame(list(wc.items()), "word STRING, c BIGINT")
    got = train_bpe(words, 12)
    assert got == _py_bpe(wc.items(), 12)
    stats = bpetrain.LAST_TRAIN_STATS
    assert stats["merges"] == 12
    assert stats["passes"] < 12, stats
    assert sum(stats["batch_sizes"]) == 12


def test_batch_prefix_degenerates_safely_on_overlapping_front(spark):
    """When the top pairs share symbols (a run-heavy corpus: every front
    pair touches 'a'), the provably-exact prefix must collapse toward
    batch=1 rather than emit a wrong merge — sequential equivalence on
    exactly the shape where naive batching breaks. Ties included ('ba'
    vs 'ca' counts equal) to exercise the lex tie-break inside a pass."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators import (
        bpetrain,
    )

    wc = {
        "aaaa": 50,  # (a,a) dominates; its merge rewrites the run
        "baca": 30,  # (b,a) and (c,a) tie at 30 and touch 'a'
        "ba": 1,
        "ca": 1,
        "de": 2,  # disjoint low-count pair — must NOT jump the queue
    }
    words = spark.createDataFrame(list(wc.items()), "word STRING, c BIGINT")
    assert train_bpe(words, 6) == _py_bpe(wc.items(), 6)
    assert bpetrain.LAST_TRAIN_STATS["merges"] == len(
        _py_bpe(wc.items(), 6)
    )


def _gb(rows, budget=6, complete=True, ltop=None, rtop=None, dtc=None,
        created=frozenset()):
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.bpetrain import (
        _greedy_batch,
    )

    return _greedy_batch(
        rows, budget, complete, ltop or {}, rtop or {}, dtc or {}, created
    )


def test_greedy_batch_unit_shapes():
    """_greedy_batch unit shapes: disjoint fronts batch; exact trigram
    losses let overlapping candidates batch THROUGH a shared symbol; the
    merge-created top pair is tracked and accepted with its exact count;
    residual (untracked) trigram mass and unknown upper bounds stop the
    batch; self-pair merges degrade sharers to bounds; the sub-table
    floor and budget are respected."""
    # disjoint, steeply falling front, no adjacent trigram mass: all batch
    rows = [
        {"a": "a", "b": "b", "pc": 100},
        {"a": "c", "b": "d", "pc": 40},
        {"a": "e", "b": "f", "pc": 10},
    ]
    assert _gb(rows) == [("a", "b", 100), ("c", "d", 40), ("e", "f", 10)]
    # budget respected
    assert _gb(rows, budget=2) == [("a", "b", 100), ("c", "d", 40)]

    # incomplete table: floor = last pc; a candidate AT the floor could
    # tie with an uncollected pair of unknowable lex — stop before it
    rows2 = [
        {"a": "a", "b": "b", "pc": 100},
        {"a": "c", "b": "d", "pc": 40},
    ]
    assert _gb(rows2, complete=False) == [("a", "b", 100)]

    # exact overlap arithmetic + new-pair tracking (the r10 upgrade; the
    # r08/r09 prefix rule returned only [(x, a, 100)] here): merging
    # (x, a) consumes ALL of (q, x)'s mass (trigram q x a = 90) and
    # creates (q, xa) with EXACTLY that count; greedy then picks (c, d)
    # at 90 (smaller lex than (q, xa)), then the tracked (q, xa)
    rows = [
        {"a": "x", "b": "a", "pc": 100},
        {"a": "c", "b": "d", "pc": 90},
        {"a": "q", "b": "x", "pc": 90},
    ]
    got = _gb(
        rows,
        ltop={("x", "a"): [("q", 90)]},
        dtc={("q", "x", "a"): 90},
    )
    assert got == [("x", "a", 100), ("c", "d", 90), ("q", "xa", 90)]

    # residual danger: four trigram rows collected means the tracked top
    # K_TRACK leave a 4th row as the bound on UNTRACKED new pairs — a
    # next candidate at that count is unsafe
    rows = [
        {"a": "a", "b": "b", "pc": 100},
        {"a": "c", "b": "d", "pc": 50},
    ]
    got = _gb(
        rows,
        ltop={("a", "b"): [("w", 50), ("x", 50), ("y", 50), ("z", 50)]},
    )
    assert got == [("a", "b", 100)]

    # inverse pair (b, a): losses can double-count one occurrence, so
    # only an upper bound survives — low enough here not to block (c, d)
    rows = [
        {"a": "a", "b": "b", "pc": 100},
        {"a": "b", "b": "a", "pc": 60},
        {"a": "c", "b": "d", "pc": 50},
    ]
    got = _gb(rows, dtc={("b", "a", "b"): 10, ("a", "b", "a"): 20})
    assert got == [("a", "b", 100), ("c", "d", 50)]
    # ... but an unknown bound ABOVE the next candidate blocks it
    rows[2]["pc"] = 35
    got = _gb(rows, dtc={("b", "a", "b"): 10, ("a", "b", "a"): 20})
    assert got == [("a", "b", 100)]

    # self-pair merge (a == b): overlap makes losses inexact — sharers
    # degrade to bounds and block anything below them
    rows = [
        {"a": "a", "b": "a", "pc": 100},
        {"a": "a", "b": "c", "pc": 90},
        {"a": "d", "b": "e", "pc": 80},
    ]
    assert _gb(rows) == [("a", "a", 100)]



def test_greedy_batch_tied_front_incomplete_makes_progress():
    """Regression (ADVICE r10, high): an INCOMPLETE table whose whole
    front ties at one count must still accept top[0] — it is the exact
    global (count, lex) argmax because the table is globally ordered
    before the LIMIT, so any sub-table tie has lex ≥ every top row.
    Previously the floor check ran before the first acceptance and
    returned [], which train_bpe read as 'fully merged' and silently
    ended training below the merge budget."""
    rows = [
        {"a": "a", "b": "b", "pc": 5},
        {"a": "c", "b": "d", "pc": 5},
    ]
    got = _gb(rows, budget=6, complete=False)
    # exactly ONE merge: top[0] is exact, but the second floor-tied
    # candidate could still lose to an uncollected sub-table pair's lex
    assert got == [("a", "b", 5)]

    # the guard must still hold AFTER the first acceptance: a later
    # candidate AT the floor stays unsafe
    rows = [
        {"a": "a", "b": "b", "pc": 9},
        {"a": "c", "b": "d", "pc": 5},
        {"a": "e", "b": "f", "pc": 5},
    ]
    assert _gb(rows, budget=6, complete=False) == [("a", "b", 9)]


def test_exhausts_gracefully(spark):
    """Fewer possible merges than requested: stop when fully merged."""
    wc = {"ab": 5}
    words = spark.createDataFrame(list(wc.items()), "word STRING, c BIGINT")
    got = train_bpe(words, 4)
    assert got == [(1, "a", "b", 5)]


def test_ids_oracle_match(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "tokenizer_bpe_ids",
        registry.QUERIES["tokenizer_bpe_ids"],
        registry.ORACLES["tokenizer_bpe_ids"],
    )


def test_ids_matches_python_reference(spark, sf_dir):
    """The positioned subword stream must equal encoding every word of
    every doc with the Python reference's merges, with vocabulary ids
    assigned by sorted order over the corpus subword vocabulary."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    wc = Counter()
    for d in docs:
        for w in d.text.split(" "):
            if w:
                wc[w] += 1
    merges = _py_bpe(wc.items(), 6)

    def encode(word):
        syms = list(word)
        for _, a, b, _c in merges:
            ns, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            syms = ns
        return syms

    enc = {w: encode(w) for w in wc}
    vocab = {s: i + 1 for i, s in enumerate(sorted({t for e in enc.values() for t in e}))}
    expected = set()
    for d in docs:
        wp = 0
        for w in d.text.split(" "):
            if not w:
                continue
            for sp, sub in enumerate(enc[w]):
                expected.add((d.doc_id, wp, sp, sub, vocab[sub]))
            wp += 1
    got = {
        (r.doc_id, r.word_pos, r.sub_pos, r.subword, r.token_id)
        for r in registry.QUERIES["tokenizer_bpe_ids"](spark, sf_dir).collect()
    }
    assert got == expected


def test_ids_reconstruct_budgets(spark, sf_dir):
    """Summing the id stream per doc must reproduce tokenizer_bpe_encode's
    (n_words, n_bpe_tokens) budgets exactly — the two keys are views of
    the same encoding."""
    ids = registry.QUERIES["tokenizer_bpe_ids"](spark, sf_dir).collect()
    per_doc = {}
    for r in ids:
        nw, nt = per_doc.get(r.doc_id, (set(), 0))
        nw.add(r.word_pos)
        per_doc[r.doc_id] = (nw, nt + 1)
    budgets = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in registry.QUERIES["tokenizer_bpe_encode"](
            spark, sf_dir
        ).collect()
    }
    assert {d: (len(w), n) for d, (w, n) in per_doc.items()} == budgets


def test_oracles_survive_merge_exhaustion(spark, tmp_path, sf_dir):
    """A corpus whose merges EXHAUST before BPE_MERGES (every word fully
    merged) must keep engine and oracle in agreement for all three BPE
    keys: the seq CTE chain uses LEFT JOIN ON true, so an empty m{t}
    leaves seq{t} = seq{t-1} instead of emptying the chain (a cross join
    would return ZERO oracle rows while the engine, which breaks early,
    returns the encoded corpus)."""
    import os

    import duckdb

    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        TABLE_NAMES,
    )

    d = str(tmp_path)
    for t in TABLE_NAMES:
        if t != "documents":
            os.symlink(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    con = duckdb.connect()
    con.execute(
        "COPY (SELECT * FROM (VALUES "
        "(0, 'ab ab cd', 'en', 'src0', 8), "
        "(1, 'ab cd', 'en', 'src0', 5)) "
        "t(doc_id, text, lang, source, n_chars)) "
        f"TO '{d}/documents.parquet' (FORMAT parquet)"
    )
    con.close()
    # sanity: this corpus exhausts after 2 merges (vocab {ab, cd})
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{d}/documents.parquet")
    words = docs.select(
        F.explode(F.split("text", " ")).alias("word")
    ).groupBy("word").agg(F.count("*").alias("c"))
    assert len(train_bpe(words, 6)) == 2
    for key in ("tokenizer_bpe_train", "tokenizer_bpe_encode", "tokenizer_bpe_ids"):
        assert_matches_oracle(
            spark, d, key, registry.QUERIES[key], registry.ORACLES[key]
        )


def test_pipe_content_participates(spark):
    """ADVICE r07: pipe-bearing words were silently dropped from the
    vocabulary (and, via the encode/ids inner joins, from the outputs).
    The '|' ↦ ' ' escape keeps them — train_bpe must now match the
    textbook Python reference on a pipe-heavy vocabulary, including
    merges whose symbols contain '|' and tie-breaks against them."""
    wc = {
        "a|b": 10,   # pipe inside content
        "||": 6,     # pipe-only word
        "a|a|": 5,   # trailing pipe
        "ab": 4,
        "|b": 4,     # tie shape: '|'+'b' vs 'a'+'b' ordering
    }
    words = spark.createDataFrame(list(wc.items()), "word STRING, c BIGINT")
    got = train_bpe(words, 6)
    assert got == _py_bpe(wc.items(), 6)
    # at least one learned symbol must actually carry a pipe
    assert any("|" in a or "|" in b for _, a, b, _c in got)


def test_pipe_corpus_all_keys_match_oracle(spark, tmp_path, sf_dir):
    """Engine and DuckDB oracle must agree on a corpus WITH pipe content
    for all three BPE keys (both run the same reversible escape), and the
    encode output must count pipe-bearing words instead of dropping them."""
    import os

    import duckdb

    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        TABLE_NAMES,
    )

    d = str(tmp_path)
    for t in TABLE_NAMES:
        if t != "documents":
            os.symlink(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    con = duckdb.connect()
    con.execute(
        "COPY (SELECT * FROM (VALUES "
        "(0, 'a|b a|b ab cd |x', 'en', 'src0', 16), "
        "(1, 'a|b || cd cd', 'en', 'src0', 12)) "
        "t(doc_id, text, lang, source, n_chars)) "
        f"TO '{d}/documents.parquet' (FORMAT parquet)"
    )
    con.close()
    for key in ("tokenizer_bpe_train", "tokenizer_bpe_encode", "tokenizer_bpe_ids"):
        assert_matches_oracle(
            spark, d, key, registry.QUERIES[key], registry.ORACLES[key]
        )
    # no word is dropped: every doc's n_words equals its whitespace count
    got = {
        r.doc_id: r.n_words
        for r in registry.QUERIES["tokenizer_bpe_encode"](spark, d).collect()
    }
    assert got == {0: 5, 1: 4}


def test_roundtrip_against_ground_truth(spark, sf_correct):
    """decode(encode(corpus)) must equal the corpus word-for-word — the
    oracle is the documents table itself (whitespace-run normalization is
    the one documented loss)."""
    from parallel_map_reduce_word_counter_for_one_machine_spark import registry
    from .oracle import assert_matches_oracle

    assert_matches_oracle(
        spark,
        sf_correct,
        "tokenizer_bpe_roundtrip",
        registry.QUERIES["tokenizer_bpe_roundtrip"],
        registry.ORACLES["tokenizer_bpe_roundtrip"],
    )


def test_train_bpe_leaves_no_checkpoint_blocks(spark, sf_dir):
    """Checkpoint hygiene (BULK_r9 finding): train_bpe localCheckpoints a
    vocabulary snapshot per pass; every one of them must be freed before
    return — DataFrame.unpersist() is a NO-OP for localCheckpoint blocks
    (CacheManager vs RDD-layer persist), so the trainer goes through the
    LogicalRDD's own RDD. A 50k-merge run would otherwise pin thousands of
    orphan snapshots in storage memory."""
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.bpetrain import (
        _corpus_words,
        train_bpe,
    )
    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        load_table,
    )

    jsc = spark.sparkContext._jsc.sc()
    before = len(jsc.getRDDStorageInfo())
    merges = train_bpe(_corpus_words(load_table(spark, sf_dir, "documents")))
    assert len(merges) > 0
    after = len(jsc.getRDDStorageInfo())
    assert after <= before, (
        f"train_bpe leaked checkpoint blocks: {before} -> {after} persisted RDDs"
    )

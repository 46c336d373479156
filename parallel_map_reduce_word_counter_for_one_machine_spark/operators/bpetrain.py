"""Distributed BPE tokenizer training (Sennrich et al., ACL 2016 — public;
the reference's tokenizer, src/main.cpp:55-75, is a fixed whitespace
splitter — this learns the subword vocabulary a real LLM pipeline trains
BEFORE tokenizing 100 TB).

Algorithm (classic word-level BPE): collapse the corpus to (word, count)
once, split words into character symbols, then repeat: count adjacent
symbol pairs weighted by word frequency, merge the most frequent pair
(ties → lexicographically smallest) inside every word, emit the merge.

Scale shape — the whole point of training BPE on an engine like this:
- ONE corpus-scale pass (the word count — literally the flagship plan).
  Everything after runs on the VOCABULARY (|V| rows), not the corpus:
  each merge iteration is a |V|-row pair explode + one hash aggregate +
  a 1-row argmax (TakeOrdered), exactly the word-count economics at 1/10⁶
  the volume. 50k merges over a 10M-word vocab never rescans the corpus.
- The argmax pair is a 1-row driver scalar per iteration (the pagerank
  convergence-scalar pattern); the rewrite is a broadcast-literal
  ``replace`` projection.

Cross-engine exactness: pure string/integer ops — no floats anywhere.
The merge rewrite is engine-portable because both Spark's and DuckDB's
``replace`` scan left-to-right non-overlapping, which equals BPE's greedy
leftmost merge IF symbol boundaries survive the match. Single delimiters
fail: merging (a,b) in ``a b a b`` = ``|a|b|a|b|`` consumes the shared
``|`` and misses the second pair. DOUBLE boundaries fix it: in
``||a||b||a||b||`` the pattern ``|a||b|`` takes one pipe from each side,
leaving ``||ab||ab||`` — every adjacent occurrence matched, and a pattern
can never start inside a multi-char symbol (its chars are never preceded
by ``|``). Verified against a greedy Python reference in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load_table
from .rank import global_rank

BPE_MERGES = 6  # unrolled in the oracle; 50k in production — same plan/iter

# Top-of-table size for the batched trainer's per-pass candidate collect
# (a BOUNDED driver collect — ≤ this many (sym, sym, count) rows per
# vocabulary pass, the annindex.py:94 cap-bounded-collect doctrine).
BPE_BATCH_CANDIDATES = 64

# Instrumentation for the decade rehearsal (BULK_r9, VERDICT r08 item 2):
# how many vocabulary-scale Spark passes the last train_bpe call used,
# and the exact batch sizes it proved safe. Reset per call.
LAST_TRAIN_STATS: dict = {"passes": 0, "merges": 0, "batch_sizes": []}


def _pairs_expr() -> F.Column:
    """Adjacent symbol pairs from the double-delimited seq column.
    slice-zip instead of sequence(): ``sequence(0, -1)`` on a 1-symbol
    word would generate a DESCENDING range, not an empty one."""
    syms = F.filter(F.split("seq", r"\|"), lambda s: s != "")
    return F.zip_with(
        F.slice(syms, 1, F.size(syms) - 1),
        F.slice(syms, 2, F.size(syms) - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )


def _seq_expr() -> F.Column:
    """``word`` → the double-delimited character sequence (``||a||b||``) —
    the ONE definition of the delimiter scheme (train, encode, and ids
    all build on it).

    Pipe content is ESCAPED into the symbol domain first: ``'|' ↦ ' '``
    (ADVICE r07 — the previous rule silently DROPPED pipe-bearing words
    from the vocabulary and, via the encode/ids inner joins, from the
    outputs). A word can never contain a space (words come from
    ``split(text, ' ')``), so the map is injective over the word domain
    and exactly reversible — no corpus content is lost, and the delimiter
    cannot alias with content. Training/merging runs entirely in the
    escaped domain; output boundaries unmap emitted symbols with
    ``_unescape_sym`` (train's left/right_sym, ids' subwords). Lengths
    and counts are escape-invariant, so encode needs no unmap."""
    esc = F.replace(F.col("word"), F.lit("|"), F.lit(" "))
    return F.concat(F.regexp_replace(esc, "(.)", r"||$1"), F.lit("||"))


def _unescape_sym(col: F.Column) -> F.Column:
    """Escaped-domain symbol → original content (`' ' ↦ '|'`; exact
    inverse of ``_seq_expr``'s escape since words never contain spaces)."""
    return F.replace(col, F.lit(" "), F.lit("|"))


def _apply_merges(merges: list[tuple]) -> F.Column:
    """``word`` → the fully-merged seq after replaying ``merges`` (the
    chained greedy-leftmost ``replace`` fold — one codegen span).
    ``merges`` carries CONTENT-domain symbols (train_bpe's contract);
    the replay re-escapes them into the seq's symbol domain."""
    seq = _seq_expr()
    for _, a, b, _pc in merges:
        ea, eb = a.replace("|", " "), b.replace("|", " ")
        seq = F.replace(seq, F.lit(f"|{ea}||{eb}|"), F.lit(f"|{ea}{eb}|"))
    return seq


def _corpus_words(d: DataFrame) -> DataFrame:
    """documents → the (word, c) vocabulary relation (the one corpus-scale
    pass every BPE key starts from). ``word`` is the ORIGINAL content
    (the encode/ids join key against the per-doc word stream); delimiter
    safety is handled downstream by ``_seq_expr``'s reversible
    ``'|' ↦ ' '`` escape, so pipe-bearing words participate fully —
    nothing is dropped (ADVICE r07)."""
    return (
        d.select(
            F.explode(
                F.filter(F.split("text", " "), lambda w: w != "")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("c"))
    )


def _safe_batch_prefix(
    top: list, budget: int, complete: bool
) -> list[tuple]:
    """From one pass's top-of-table pair counts (rows of ``a, b, pc`` in
    exact-greedy order: pc DESC, content-lex ASC), return the longest
    PREFIX that is provably identical to running exact greedy BPE one
    merge at a time — the batching that de-sequences the trainer
    (VERDICT r08 item 2) WITHOUT changing a single emitted merge.

    Exactness argument (why a prefix batch equals sequential greedy):
    merging pair i = (a, b) into symbol ab can change pair counts three
    ways, and each is bounded by the collected table —

    1. OLD pairs touching ``a`` or ``b`` only LOSE occurrences (new
       adjacencies all involve the new symbol). Under the prefix rule
       every such pair ranked above the next accepted candidate is itself
       accepted, so a decrease cannot re-order the front — but the NEXT
       CANDIDATE's own count becoming stale can, so the batch STOPS at
       the first candidate sharing a symbol with an earlier accepted
       merge (or equal to its concat — see 3).
    2. NEW pairs ``(x, ab)`` / ``(ab, y)``: every occurrence contains the
       merged occurrence, so the count is ≤ pc_i, and it also contains
       the pre-merge pair ``(x, a)`` / ``(b, y)``, so it is ≤ the largest
       table count with ``a`` on the right / ``b`` on the left (pairs
       outside a truncated table are ≤ the table floor).
    3. An OLD symbol whose string equals the concat ``ab`` GAINS
       occurrences from 2 — its pairs' post-counts are ≤ their pre-count
       (table/floor-bounded) + the bound from 2.
    A later candidate is therefore exactly the next sequential argmax iff
    its count strictly exceeds every accepted merge's danger bound
    (ties are unsafe: a new pair's lex position is unknowable here).
    The first candidate is always safe, so every pass makes progress.
    Worst case this degenerates to one merge per pass — the r08 trainer.
    """
    floor = 0 if complete else int(top[-1]["pc"])
    max_left: dict[str, int] = {}  # sym -> max pc over table pairs (sym, y)
    max_right: dict[str, int] = {}  # sym -> max pc over table pairs (x, sym)
    for r in top:
        pc = int(r["pc"])
        if pc > max_left.get(r["a"], 0):
            max_left[r["a"]] = pc
        if pc > max_right.get(r["b"], 0):
            max_right[r["b"]] = pc

    accepted: list[tuple] = []
    touched: set[str] = set()  # accepted members + their concat symbols
    dangers: list[int] = []
    for r in top:
        if len(accepted) == budget:
            break
        a, b, pc = r["a"], r["b"], int(r["pc"])
        if accepted:
            if a in touched or b in touched:
                break  # case 1/3: this candidate's own count is stale
            if any(pc <= d for d in dangers):
                break  # a merge-created pair could outrank it
        accepted.append((a, b, pc))
        touched.update((a, b, a + b))
        new_pair_bound = min(
            pc, max(max_right.get(a, 0), max_left.get(b, 0), floor)
        )
        concat_pre_bound = max(
            max_left.get(a + b, 0), max_right.get(a + b, 0), floor
        )
        dangers.append(new_pair_bound + concat_pre_bound)
    return accepted


def _drop_ckpt(df: DataFrame) -> None:
    """Free a localCheckpoint's storage blocks. ``DataFrame.unpersist()`` is
    a NO-OP for them (it talks to the CacheManager; localCheckpoint persists
    at the RDD layer) — verified empirically: RDDStorageInfo keeps the block
    after df.unpersist(), drops it after unpersisting the LogicalRDD's own
    RDD. Without this, blocks linger until the py4j proxy is finalized AND
    the JVM ContextCleaner notices — nondeterministic, and a 50k-merge run
    would pin thousands of orphan vocabulary snapshots in storage memory."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        # non-LogicalRDD plan (not a checkpoint) — nothing to free
        return


def train_bpe(words: DataFrame, merges: int = BPE_MERGES) -> list[tuple]:
    """Learn ``merges`` BPE merges from a (word, c) vocabulary relation.
    Returns [(iteration, left_sym, right_sym, pair_count), ...] with
    symbols in CONTENT domain (the internal '|' ↦ ' ' delimiter escape is
    unmapped at return, so the result matches a textbook BPE run on the
    raw words — including pipe-bearing ones).

    De-sequenced (VERDICT r08 item 2): each vocabulary pass collects the
    top ``BPE_BATCH_CANDIDATES`` pair counts (bounded collect) and applies
    the longest provably-exact prefix batch (``_safe_batch_prefix``) as
    ONE chained-replace projection, instead of one merge per pass. On
    Zipfian text the front of the pair table is mostly symbol-disjoint, so
    a 50k-merge production run needs ~merges/batch Spark passes, not
    ``merges`` — the structure VERDICT r08 called the package's one true
    sequential bottleneck. Emitted merges are bit-identical to the
    sequential trainer (the r08 loop IS the degenerate batch=1 case), so
    the unrolled exact-greedy DuckDB oracle is unchanged."""
    seqed = words.select(
        _seq_expr().alias("seq"), "c"
    ).localCheckpoint()  # vocabulary-sized; base of every iteration
    out: list[tuple] = []
    cur = seqed
    # Checkpoint hygiene (found by BULK_r9's decade ladder): every pass
    # materializes a new checkpoint, and nothing in the RESULT references
    # any of them (merges leave as collected rows), so the previous pass's
    # blocks must be dropped as soon as the next pass stands — a 50k-merge
    # production run would otherwise pin thousands of orphan RDDs in
    # storage memory, and even this 5-pass trainer showed multi-10s GC /
    # eviction noise across repeated runs in one JVM before the unpersist.
    prev_ckpt = None
    LAST_TRAIN_STATS.update(passes=0, merges=0, batch_sizes=[])
    while len(out) < merges:
        top = (
            cur.select(F.explode(_pairs_expr()).alias("p"), "c")
            .groupBy("p.a", "p.b")
            .agg(F.sum("c").alias("pc"))
            # tie-break in CONTENT domain (unmap before comparing): ' '
            # and '|' sort differently, so an escaped-domain tie-break
            # could pick a different argmax than a textbook run on the
            # raw words whenever a pipe symbol ties
            .orderBy(
                F.desc("pc"),
                F.asc(_unescape_sym(F.col("a"))),
                F.asc(_unescape_sym(F.col("b"))),
            )
            .limit(BPE_BATCH_CANDIDATES)
            .collect()
        )
        LAST_TRAIN_STATS["passes"] += 1
        if not top:  # every word fully merged
            break
        batch = _safe_batch_prefix(
            top, merges - len(out), complete=len(top) < BPE_BATCH_CANDIDATES
        )
        LAST_TRAIN_STATS["batch_sizes"].append(len(batch))
        seq = F.col("seq")
        for a, b, pc in batch:
            out.append((len(out) + 1, a, b, pc))
            seq = F.replace(
                seq, F.lit(f"|{a}||{b}|"), F.lit(f"|{a}{b}|")
            )
        cur = cur.select(seq.alias("seq"), "c")
        if len(out) < merges:
            # keep lineage one projection deep across passes (a 50k-merge
            # run would otherwise stack thousands of replace() layers)
            cur = cur.localCheckpoint()
            if prev_ckpt is not None:
                _drop_ckpt(prev_ckpt)
            prev_ckpt = cur
    for ckpt in (prev_ckpt, seqed):
        if ckpt is not None:
            _drop_ckpt(ckpt)
    LAST_TRAIN_STATS["merges"] = len(out)
    # unmap the escaped symbol domain at the contract boundary (' ' ↦ '|')
    return [(t, a.replace(" ", "|"), b.replace(" ", "|"), pc) for t, a, b, pc in out]


def _bpe_ctes() -> str:
    """The shared unrolled training CTE chain (no final SELECT)."""
    # AS MATERIALIZED throughout: seq{t} and m{t} each have two consumers,
    # and DuckDB inlines plain CTEs per reference — the chain would expand
    # exponentially in BPE_MERGES (same blowup as the GD oracle; see
    # selection._gd_oracle).
    parts = [
        "WITH words AS (SELECT word, count(*) AS c FROM ("
        "SELECT unnest(list_filter(string_split(text, ' '), "
        "w -> w <> '')) "
        "AS word FROM documents) GROUP BY word)",
        # word is carried through the chain (inert for training — p{t}
        # projects only (s, c)) so the encode oracle can join lengths
        # back onto the per-doc word stream by the ORIGINAL word.
        # Delimiter safety: the reversible '|' ↦ ' ' escape (twin of
        # _seq_expr — words never contain spaces, so it is injective).
        "seq0 AS MATERIALIZED (SELECT word, "
        "regexp_replace(replace(word, '|', ' '), '(.)', '||\\1', 'g') || '||' "
        "AS seq, c FROM words)",
    ]
    for t in range(1, BPE_MERGES + 1):
        parts.append(
            f"p{t} AS MATERIALIZED (SELECT s[i] AS a, s[i + 1] AS b, "
            "CAST(sum(c) AS BIGINT) AS pc FROM ("
            "SELECT list_filter(string_split(seq, '|'), x -> x <> '') AS s, c "
            f"FROM seq{t - 1}), "
            "LATERAL unnest(generate_series(1, len(s) - 1)) AS g(i) "
            "GROUP BY a, b)"
        )
        parts.append(
            # tie-break in CONTENT domain (twin of train_bpe's unmapped
            # ordering)
            f"m{t} AS MATERIALIZED (SELECT a, b, pc FROM p{t} "
            "ORDER BY pc DESC, replace(a, ' ', '|'), replace(b, ' ', '|') "
            "LIMIT 1)"
        )
        if t < BPE_MERGES:
            parts.append(_seq_step_cte(t))
    return ", ".join(parts)


def _seq_step_cte(t: int) -> str:
    """seq{t}: apply merge t to seq{t-1}. LEFT JOIN ON true (not a cross
    join): when merges EXHAUST before BPE_MERGES, m{t} is empty and a
    cross join would empty seq{t} — and every later seq — making the
    encode/ids oracles return ZERO rows for a corpus the engine handles
    (train_bpe breaks early and applies only the learned merges). The
    CASE keeps seq unchanged on the empty-merge arm, matching the engine's
    early break exactly. The train oracle never needed this (an empty
    m{t} just contributes no UNION rows)."""
    return (
        f"seq{t} AS MATERIALIZED (SELECT word, "
        "CASE WHEN m.a IS NULL THEN seq ELSE replace(seq, "
        "'|' || m.a || '||' || m.b || '|', "
        f"'|' || m.a || m.b || '|') END AS seq, c "
        f"FROM seq{t - 1} LEFT JOIN m{t} m ON true)"
    )


def _bpe_oracle() -> str:
    """Unrolled per-merge CTE chain (the pagerank oracle pattern): each
    iteration re-derives pairs from the previous rewrite and takes the
    same (count DESC, pair ASC) argmax."""
    sel = " UNION ALL ".join(
        # output boundary: unmap the escaped symbol domain (' ' ↦ '|')
        f"SELECT {t} AS iteration, replace(a, ' ', '|') AS left_sym, "
        f"replace(b, ' ', '|') AS right_sym, "
        f"pc AS pair_count FROM m{t}"
        for t in range(1, BPE_MERGES + 1)
    )
    return _bpe_ctes() + " " + sel


def _seq_final_cte() -> str:
    """The final rewrite (seq{BPE_MERGES}) — the training chain stops at
    m{N} and never builds it; the encode/ids oracles both need it.
    Exhaustion-safe like every seq step (see ``_seq_step_cte``)."""
    return ", " + _seq_step_cte(BPE_MERGES)


def _encode_oracle() -> str:
    """Training chain (same CTEs) + the encode step: apply all BPE_MERGES
    rewrites to the distinct-word relation, count surviving symbols, join
    the per-word subword length back onto the per-doc word multiset."""
    parts = [
        _bpe_ctes(),
        _seq_final_cte(),
        (
            ", wlen AS (SELECT word, "
            "len(list_filter(string_split(seq, '|'), x -> x <> '')) AS n_sub "
            f"FROM seq{BPE_MERGES})"
        ),
        # per-doc word stream joined by the ORIGINAL word (the merged seq
        # is NOT a join key — dw's words are unmerged)
        (
            ", dw AS (SELECT doc_id, "
            "unnest(list_filter(string_split(text, ' '), "
            "w -> w <> '')) AS word FROM documents)"
        ),
        (
            " SELECT dw.doc_id, count(*) AS n_words, "
            "CAST(sum(w.n_sub) AS BIGINT) AS n_bpe_tokens "
            "FROM dw JOIN wlen w ON dw.word = w.word "
            "GROUP BY dw.doc_id"
        ),
    ]
    return "".join(parts)


@query("tokenizer_bpe_encode", oracle=_encode_oracle())
def tokenizer_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode the corpus with the merges learned by ``train_bpe`` and emit
    the per-doc subword budget (doc_id, n_words, n_bpe_tokens) — the
    sequence-length accounting a packing/curriculum step consumes.

    Scale shape: the merges apply to the DISTINCT-WORD relation (|V|
    rows × T chained ``replace`` projections, one codegen span), and the
    per-word subword length joins back onto the corpus word stream — the
    corpus itself is scanned once and never rewritten per merge. The
    word→length join broadcasts (|V| ≪ corpus; at a 10 M-word vocab it is
    a few hundred MB of strings — still broadcastable, else it degrades
    to one hash join). The oracle re-runs training AND encoding."""
    d = load_table(spark, sf_dir, "documents")
    # consumed by train_bpe AND the wlen projection
    words = _corpus_words(d).localCheckpoint()
    merges = train_bpe(words)
    # re-derive the fully-merged seq per distinct word (vocabulary-sized)
    seq = _apply_merges(merges)
    wlen = words.select(
        "word",
        F.size(F.filter(F.split(seq, r"\|"), lambda s: s != "")).alias("n_sub"),
    )
    dw = d.select(
        "doc_id",
        F.explode(F.filter(F.split("text", " "), lambda w: w != "")).alias(
            "word"
        ),
    )
    return (
        dw.join(F.broadcast(wlen), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sub").cast("long").alias("n_bpe_tokens"),
        )
    )


def _ids_oracle() -> str:
    """Training chain + the FULL tokenize step: per-word subword lists,
    vocabulary ids by sorted rank, and the positioned per-doc subword
    stream. Positions come from the ``unnest(range(...))`` idiom (the
    chunking oracle's pattern) — DuckDB replicates the other columns per
    element, and the list index recovers the value at each position."""
    return (
        _bpe_ctes()
        + _seq_final_cte()
        + (
            # subwords unmap to original content (' ' ↦ '|') before the
            # vocabulary rank — twin of the engine's _unescape_sym
            ", wsubs AS (SELECT word, "
            "list_transform(list_filter(string_split(seq, '|'), "
            "x -> x <> ''), s -> replace(s, ' ', '|')) AS subs "
            f"FROM seq{BPE_MERGES})"
        )
        + (
            ", vocab AS (SELECT subword, "
            "CAST(row_number() OVER (ORDER BY subword) AS INT) AS token_id "
            "FROM (SELECT DISTINCT unnest(subs) AS subword FROM wsubs))"
        )
        + (
            ", d AS (SELECT doc_id, list_filter(string_split(text, ' '), "
            "w -> w <> '') AS toks FROM documents)"
        )
        + (
            ", dw AS (SELECT doc_id, "
            "CAST(unnest(range(0, len(toks))) AS INT) AS word_pos, toks "
            "FROM d)"
        )
        + (
            ", dws AS (SELECT doc_id, word_pos, toks[word_pos + 1] AS word "
            "FROM dw)"
        )
        + (
            ", j AS (SELECT doc_id, word_pos, s.subs FROM dws "
            "JOIN wsubs s USING (word))"
        )
        + (
            ", js AS (SELECT doc_id, word_pos, subs, "
            "CAST(unnest(range(0, len(subs))) AS INT) AS sub_pos FROM j)"
        )
        + (
            " SELECT js.doc_id, js.word_pos, js.sub_pos, "
            "js.subs[js.sub_pos + 1] AS subword, v.token_id FROM js "
            "JOIN vocab v ON js.subs[js.sub_pos + 1] = v.subword"
        )
    )


@query("tokenizer_bpe_ids", oracle=_ids_oracle())
def tokenizer_bpe_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full tokenize step: the corpus as a positioned subword-id
    stream — (doc_id, word_pos, sub_pos, subword, token_id) — the relation
    a sequence-packing/training-export step actually consumes (the
    ``pack_sequences`` input, with ids instead of whole words).

    Scale shape: merges apply to the |V|-row vocab (chained ``replace``
    projections); the subword vocabulary gets ids from the DISTRIBUTED
    global rank (rank.py — a plain ``row_number() over (ORDER BY ...)``
    would funnel the vocab through one task; at 1 M+ subwords that
    matters); the corpus word stream is scanned ONCE (posexplode) and
    broadcast-joins the word→subwords map, then a second posexplode
    unpacks subword positions. No corpus-sized shuffle anywhere — both
    joins are broadcast, both generators are map-side."""
    d = load_table(spark, sf_dir, "documents")
    # consumed by train_bpe AND the wsubs projection
    words = _corpus_words(d).localCheckpoint()
    merges = train_bpe(words)
    seq = _apply_merges(merges)
    wsubs = words.select(
        "word",
        # output boundary: subwords unmap to original content (' ' ↦ '|')
        # BEFORE the vocabulary rank, so token ids order by real content
        F.transform(
            F.filter(F.split(seq, r"\|"), lambda s: s != ""), _unescape_sym
        ).alias("subs"),
    ).localCheckpoint()  # consumed by the vocab derivation AND the join
    vocab = global_rank(
        wsubs.select(F.explode("subs").alias("subword")).distinct(),
        ["subword"],
        rank_col="token_id",
    )
    dw = d.select(
        "doc_id",
        F.posexplode(F.filter(F.split("text", " "), lambda w: w != "")).alias(
            "word_pos", "word"
        ),
    )
    return (
        dw.join(F.broadcast(wsubs), "word")
        .select(
            "doc_id",
            "word_pos",
            F.posexplode("subs").alias("sub_pos", "subword"),
        )
        .join(F.broadcast(vocab), "subword")
        .select("doc_id", "word_pos", "sub_pos", "subword", "token_id")
    )


@query("tokenizer_bpe_train", oracle=_bpe_oracle())
def tokenizer_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the first BPE_MERGES BPE merges on the documents corpus and
    emit the merge table (iteration, left_sym, right_sym, pair_count) —
    the artifact a tokenizer ships. The DuckDB oracle re-runs the full
    training loop (unrolled CTEs) and must produce the identical merges,
    certifying argmax ties, the greedy-leftmost rewrite, and the weighted
    pair counts cross-engine."""
    d = load_table(spark, sf_dir, "documents")
    merges = train_bpe(_corpus_words(d))  # already content-domain symbols
    return spark.createDataFrame(
        merges, "iteration INT, left_sym STRING, right_sym STRING, pair_count BIGINT"
    )


@query(
    "tokenizer_bpe_roundtrip",
    oracle=(
        # Ground truth IS the corpus: decode(encode(x)) must reproduce
        # every word exactly. Whitespace-run normalization is the one
        # documented loss (split-on-space tokenization cannot see run
        # lengths), so the target is the single-spaced word stream.
        "SELECT doc_id, array_to_string(list_filter(string_split(text, ' '), "
        "w -> w <> ''), ' ') AS decoded FROM documents "
        "WHERE len(list_filter(string_split(text, ' '), w -> w <> '')) > 0"
    ),
)
def tokenizer_bpe_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOSSLESSNESS proof for the whole tokenize path: encode the corpus
    to positioned subword ids (``tokenizer_bpe_ids``), then DECODE —
    concatenate each word's subwords in sub_pos order, join words in
    word_pos order — and the result must equal the original text
    word-for-word (the oracle is ``SELECT doc_id, text`` modulo
    whitespace-run normalization, the one documented loss of
    split-on-space tokenization). A tokenizer that drops a word (the
    r07 pipe-delimiter bug's failure mode), mis-orders subwords, or
    unescapes a symbol wrongly fails HERE against ground truth rather
    than against our own encoder.

    Scale shape: two ordered-array aggregations (sub_pos within word,
    word_pos within doc), both partial-aggregable collect_list + sort —
    each keyed one level above the exploded stream, so state per group is
    one word / one doc, never the corpus."""
    ids = tokenizer_bpe_ids(spark, sf_dir)
    words = ids.groupBy("doc_id", "word_pos").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub_pos", "subword"))),
                lambda s: s.subword,
            ),
            "",
        ).alias("word")
    )
    return words.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("word_pos", "word"))),
                lambda s: s.word,
            ),
            " ",
        ).alias("decoded")
    )

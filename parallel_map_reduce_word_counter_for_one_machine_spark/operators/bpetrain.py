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
# vocabulary pass, the annindex.py:94 cap-bounded-collect doctrine; the
# overlap-trigram collect is ≤ the square of this, 16,384 rows).
BPE_BATCH_CANDIDATES = 128

# Merge-created pairs tracked as first-class candidates per accepted merge
# and side (the K_TRACK+1-th trigram row becomes the residual danger).
K_TRACK = 3

# Instrumentation for the decade rehearsal (BULK_r9, VERDICT r08 item 2):
# how many vocabulary-scale Spark passes the last train_bpe call used,
# and the exact batch sizes it proved safe. Reset per call.
LAST_TRAIN_STATS: dict = {"passes": 0, "merges": 0, "batch_sizes": []}

# Count of _drop_ckpt reach-through failures swallowed (ADVICE r09): a
# Spark upgrade changing the plan shape flips this nonzero instead of
# silently reverting to the pre-r09 leak.
DROP_CKPT_FAILURES = 0


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


# Left word-boundary sentinel for the padded trigram relation. Symbols
# live in the ESCAPED domain ('|' ↦ ' '), so no real symbol can ever be or
# contain a pipe — the sentinel and the '|'-separated candidate keys below
# are collision-free by construction.
SENT = "|"


def _tri_table(cur: DataFrame) -> DataFrame:
    """The per-pass PADDED TRIGRAM aggregate — the single vocabulary-scale
    relation every per-pass statistic derives from (VERDICT r09 item 2).

    Each word's symbol list is left-padded with the sentinel, so every
    adjacent pair (s_i, s_{i+1}) is the (y, z) suffix of EXACTLY ONE
    trigram (its left neighbor, or the sentinel at word start). Hence:

    - pair counts  = sum of tc grouped by (y, z)      (exact, no padding loss)
    - new-pair ceilings = max of tc per candidate pair  (see _greedy_batch)
    - exact overlap losses = individual tc rows whose prefix AND suffix
      pairs are both candidates

    One explode + one hash aggregate per pass — the same economics as the
    r08 pair pass (rows are identical in number, one column wider) — and
    the result is localCheckpointed by the caller so the three downstream
    reads (top pairs, ceilings, overlap rows) are re-aggregations of the
    materialized vocabulary-scale table, not corpus work.

    slice-zip instead of sequence(): ``sequence(0, -1)`` on a short word
    would generate a DESCENDING range, not an empty one."""
    syms = F.filter(F.split("seq", r"\|"), lambda s: s != "")
    padded = F.concat(F.array(F.lit(SENT)), syms)
    n3 = F.greatest(F.size(padded) - 2, F.lit(0))
    tri = F.zip_with(
        F.zip_with(
            F.slice(padded, 1, n3),
            F.slice(padded, 2, n3),
            lambda a, b: F.struct(a.alias("x"), b.alias("y")),
        ),
        F.slice(padded, 3, n3),
        lambda p, z: F.struct(
            p["x"].alias("x"), p["y"].alias("y"), z.alias("z")
        ),
    )
    return (
        cur.select(F.explode(tri).alias("t"), "c")
        .groupBy("t.x", "t.y", "t.z")
        .agg(F.sum("c").alias("tc"))
    )


def _greedy_batch(
    top: list,
    budget: int,
    complete: bool,
    ltop: dict,
    rtop: dict,
    dtc: dict,
    created: frozenset,
) -> list[tuple]:
    """Driver-side EXACT simulation of sequential greedy BPE over one
    pass's top-of-table candidates — returns [(a, b, exact_count), ...],
    bit-identical to the one-merge-per-pass r08 trainer but admitting
    MANY merges per vocabulary pass (VERDICT r09 item 2: the r08/r09
    prefix rule broke at the first symbol-sharing candidate and its
    table-derived danger bound was ≈ pc itself on natural text, so
    BULK_r9 recorded batch_sizes [2,1,1,1,1]).

    Inputs, all exact statistics of the pass-start state ("state 0"):
    - top: candidate rows (a, b, pc) in exact greedy order
    - ltop[(a,b)] / rtop[(a,b)]: the K_TRACK+1 LARGEST trigram rows with
      (a, b) as suffix — [(x, tc), ...] desc — / as prefix ([(y, tc)…])
    - dtc[(x,y,z)]: counts of trigrams whose prefix AND suffix pairs are
      both candidates (the overlap-loss arithmetic)
    - created: concat strings of every previously emitted merge (initial
      symbols are single code points, so a concat absent here is
      provably a FRESH symbol)

    The exactness toolkit (see module header for the residual-0 lemma):
    1. For a ≠ b, greedy-leftmost replace merges EVERY (a, b) adjacency,
       so merging changes pair counts EXACTLY as follows — pair (x, a)
       loses tc(x, a, b); pair (b, y) loses tc(a, b, y); pair (x, ab)
       GAINS exactly tc(x, a, b) (each occurrence IS such a trigram
       occurrence), symmetrically (ab, y); all other pairs unchanged.
    2. A trigram whose three symbols are all UNTOUCHED (never an element
       or concat of an applied merge) has an invariant count: fusion
       never deletes symbols and never creates an adjacency between two
       old symbols. Whenever a needed trigram contains a touched symbol,
       the candidate degrades to an upper bound ("unknown") — counts are
       loss-only outside the concat-collision case, which is bounded
       separately.
    3. Merge-created pairs are therefore REAL candidates: the top
       K_TRACK per side enter the pool with exact counts (their ceiling
       at acceptance comes from the 4-gram containment argument: a pair
       (w, x·ab) needs state-0 trigram (w_last, x, a), bounded by
       ltop[(x, a)] or — when (x, a) is sub-table — by the pair floor);
       everything below the tracked rows is bounded by the residual
       (K_TRACK+1-th) trigram count, which becomes the merge's danger.

    A candidate is accepted iff its EXACT count strictly beats the
    sub-table floor, every accumulated danger, and every unknown's upper
    bound (lex breaks exact ties with unknowns; ties with floor/dangers
    are unsafe — a hidden pair's lex rank is unknowable). The first
    candidate is always accepted, so every pass makes progress; the
    worst case is the r08 one-merge pass."""
    floor = 0 if complete else int(top[-1]["pc"])
    candset = {(r["a"], r["b"]) for r in top}

    def _lex(a: str, b: str) -> tuple:
        return (a.replace(" ", "|"), b.replace(" ", "|"))

    def _first(m: dict, k: tuple) -> int:
        rows = m.get(k)
        return int(rows[0][1]) if rows else 0

    cands = [
        {
            "a": r["a"],
            "b": r["b"],
            "v": int(r["pc"]),
            "lex": _lex(r["a"], r["b"]),
            "known": True,
            "ub": 0,
            # origin of a merge-created candidate: None for state-0 pairs,
            # ("L"|"R", am, bm) for pairs created by merging (am, bm)
            "origin": None,
        }
        for r in top
    ]
    accepted: list[tuple] = []
    dangers: list[int] = []
    touched: set = set()
    batch_created: set = set()
    while len(accepted) < budget:
        best = None
        for c in cands:
            if c["known"] and c["v"] >= 1:
                if best is None or (-c["v"], c["lex"]) < (
                    -best["v"],
                    best["lex"],
                ):
                    best = c
        if best is None:
            break
        v = best["v"]
        # The floor check is EXEMPT for the first acceptance (ADVICE r10,
        # high): at iteration 0 every candidate is a state-0 table row, so
        # ``best`` IS top[0] — and top[0] is the exact global (count, lex)
        # argmax even when the table is incomplete, because the table is
        # globally ordered (pc desc, content-lex asc) BEFORE the LIMIT:
        # any sub-table pair tying at the floor has lex ≥ every top row's
        # lex. Without the exemption, an incomplete table whose whole
        # front ties at one count returned an EMPTY batch, which
        # train_bpe read as "fully merged" and silently truncated
        # training below the budget.
        if accepted and not complete and v <= floor:
            break  # a sub-table pair could tie or win — unknowable lex
        if any(v <= d for d in dangers):
            break  # an untracked merge-created pair could reach this count
        if any(
            (not c["known"])
            and (c["ub"] > v or (c["ub"] == v and c["lex"] < best["lex"]))
            for c in cands
        ):
            break  # an unknown candidate might still outrank it
        am, bm = best["a"], best["b"]
        ab = am + bm
        if ab in batch_created:
            break  # twice-created concat: gain accounting would compound
        origin = best["origin"]
        exactable = am != bm and am not in touched and bm not in touched
        # ceiling on any single pair this merge can create (toolkit #3)
        if origin is None:
            ceiling = min(v, max(_first(ltop, (am, bm)), _first(rtop, (am, bm))))
        elif origin[0] == "L":  # best == (x, a0b0), merge (a0, b0) earlier
            _, a0, b0 = origin
            lb = _first(ltop, (am, a0)) if (am, a0) in candset else floor
            ceiling = min(v, max(lb, _first(rtop, (a0, b0))))
        else:  # "R": best == (a0b0, y)
            _, a0, b0 = origin
            rb = _first(rtop, (b0, bm)) if (b0, bm) in candset else floor
            ceiling = min(v, max(_first(ltop, (a0, b0)), rb))
        collision = ab in created
        accepted.append((am, bm, v))
        batch_created.add(ab)
        cands.remove(best)
        for c in cands:
            if ab in (c["a"], c["b"]):
                # the candidate's symbol IS the merged concat string
                # (possible only on a prior-pass collision): it can only
                # GAIN, by at most this merge's new-pair ceiling
                c["ub"] = (c["v"] if c["known"] else c["ub"]) + ceiling
                c["known"] = False
                continue
            if not c["known"]:
                continue  # already a bound; losses keep it valid
            dec1 = c["b"] == am  # would lose tc(c.a, am, bm)
            dec2 = c["a"] == bm  # would lose tc(am, bm, c.b)
            if not (dec1 or dec2):
                continue  # disjoint or harmless share: count unchanged
            if dec1 and dec2 and exactable:
                # inverse pair (bm, am): one occurrence can lose BOTH
                # ways (4-gram am bm am bm) — only a bound survives
                c["ub"] = c["v"] - max(
                    dtc.get((bm, am, bm), 0), dtc.get((am, bm, am), 0)
                )
                c["known"] = False
            elif (
                exactable
                and not (dec1 and dec2)
                and (not dec1 or c["a"] not in touched)
                and (not dec2 or c["b"] not in touched)
                and c["origin"] is None
            ):
                # exact loss (toolkit #1 + #2: every trigram symbol
                # untouched, merge basis pristine, state-0 pair)
                if dec1:
                    c["v"] -= dtc.get((c["a"], am, bm), 0)
                if dec2:
                    c["v"] -= dtc.get((am, bm, c["b"]), 0)
            else:
                c["ub"] = c["v"]
                c["known"] = False
        # track this merge's top created pairs as new candidates; the
        # residual row (if present) bounds everything untracked
        residual = 0
        if exactable and not collision and origin is None:
            lrows = ltop.get((am, bm), [])
            rrows = rtop.get((am, bm), [])
            for rows, side in ((lrows, "L"), (rrows, "R")):
                if len(rows) > K_TRACK:
                    residual = max(residual, int(rows[K_TRACK][1]))
                for s, t in rows[:K_TRACK]:
                    # POISON rows (found by the randomized property
                    # sweep): for x == bm the leading x of trigram
                    # (x, am, bm) can itself be consumed by an ADJACENT
                    # instance of the same merge ("am bm am bm" yields
                    # (ab, ab), not (bm, ab)), so tc is only an upper
                    # bound on BOTH (bm, ab) and (ab, ab) — it becomes a
                    # danger, never a tracked count. Symmetrically
                    # y == am on the right side.
                    if (side == "L" and s == bm) or (
                        side == "R" and s == am
                    ):
                        dangers.append(int(t))
                        continue
                    nc = {
                        "v": int(t),
                        "known": s not in touched,
                        "ub": int(t),
                        "origin": (side, am, bm),
                    }
                    if side == "L":
                        nc["a"], nc["b"] = s, ab
                    else:
                        nc["a"], nc["b"] = ab, s
                    nc["lex"] = _lex(nc["a"], nc["b"])
                    cands.append(nc)
        else:
            residual = ceiling
        dangers.append(residual + (floor if collision else 0))
        touched.update((am, bm, ab))
    return accepted



def _collect_batch_stats(
    tg: DataFrame, budget: int, created: frozenset
) -> list[tuple]:
    """Run one pass's driver-side statistics against the checkpointed
    trigram aggregate ``tg`` and return the provably-exact merge batch.
    At most three SMALL actions over the materialized vocabulary-scale
    table: top pairs (≤ BPE_BATCH_CANDIDATES rows), the K_TRACK+1
    largest trigram rows per candidate and side (≤ 2·(K_TRACK+1)·|cands|
    rows — rank-limited in Spark, never fanned out), and the
    candidate-overlap trigrams (≤ |cands|² rows by construction — the
    cap-bounded-collect doctrine, annindex.py:94). When only one merge
    remains (or only one pair exists) the first candidate is
    unconditionally exact, so the extra reads are skipped."""
    from pyspark.sql import Window

    top = (
        tg.groupBy("y", "z")
        .agg(F.sum("tc").alias("pc"))
        .select(F.col("y").alias("a"), F.col("z").alias("b"), "pc")
        # tie-break in CONTENT domain (unmap before comparing): ' ' and
        # '|' sort differently, so an escaped-domain tie-break could pick
        # a different argmax than a textbook run on the raw words
        # whenever a pipe symbol ties
        .orderBy(
            F.desc("pc"),
            F.asc(_unescape_sym(F.col("a"))),
            F.asc(_unescape_sym(F.col("b"))),
        )
        .limit(BPE_BATCH_CANDIDATES)
        .collect()
    )
    if not top:
        return []
    if budget == 1 or len(top) == 1:
        r = top[0]
        return [(r["a"], r["b"], int(r["pc"]))]
    keys = [f"{r['a']}|{r['b']}" for r in top]
    lk = F.concat_ws("|", "y", "z")
    rk = F.concat_ws("|", "x", "y")
    # deterministic rank inside equal tc ties: any fixed order works — the
    # simulation only needs SOME top-K rows plus a valid residual bound,
    # and equal-tc rows are interchangeable for both
    lrows = (
        tg.filter((F.col("x") != SENT) & lk.isin(keys))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("y", "z").orderBy(
                    F.desc("tc"), F.asc("x")
                )
            ),
        )
        .filter(F.col("rn") <= K_TRACK + 1)
        .select(
            F.lit("L").alias("s"),
            F.col("y").alias("a"),
            F.col("z").alias("b"),
            F.col("x").alias("o"),
            "tc",
            "rn",
        )
    )
    rrows = (
        tg.filter(rk.isin(keys))  # x = SENT can never match a real key
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("x", "y").orderBy(
                    F.desc("tc"), F.asc("z")
                )
            ),
        )
        .filter(F.col("rn") <= K_TRACK + 1)
        .select(
            F.lit("R").alias("s"),
            F.col("x").alias("a"),
            F.col("y").alias("b"),
            F.col("z").alias("o"),
            "tc",
            "rn",
        )
    )
    # The candidate-overlap trigrams ride the SAME collect as the L/R
    # rank-limited rows (optimization r11): dtc was a third separate
    # driver action per pass over the tg checkpoint; as a third union
    # branch ("D", a=x, b=y, o=z) the pass needs two bounded actions
    # (top + this union) instead of three — on a 50k-merge production
    # run that is one fewer job per vocabulary pass. Row content and
    # the resulting dicts are unchanged.
    drows = tg.filter(lk.isin(keys) & rk.isin(keys)).select(
        F.lit("D").alias("s"),
        F.col("x").alias("a"),
        F.col("y").alias("b"),
        F.col("z").alias("o"),
        "tc",
        F.lit(0).alias("rn"),
    )
    ltop: dict = {}
    rtop: dict = {}
    dtc: dict = {}
    for r in lrows.unionAll(rrows).unionAll(drows).collect():
        if r["s"] == "D":
            dtc[(r["a"], r["b"], r["o"])] = int(r["tc"])
            continue
        (ltop if r["s"] == "L" else rtop).setdefault(
            (r["a"], r["b"]), []
        ).append((r["o"], int(r["tc"]), int(r["rn"])))
    for m in (ltop, rtop):
        for k in m:
            m[k] = [(o, t) for o, t, _ in sorted(m[k], key=lambda e: e[2])]
    return _greedy_batch(
        top,
        budget,
        complete=len(top) < BPE_BATCH_CANDIDATES,
        ltop=ltop,
        rtop=rtop,
        dtc=dtc,
        created=created,
    )



def _drop_ckpt(df: DataFrame) -> None:
    """Free a localCheckpoint's storage blocks. ``DataFrame.unpersist()`` is
    a NO-OP for them (it talks to the CacheManager; localCheckpoint persists
    at the RDD layer) — verified empirically: RDDStorageInfo keeps the block
    after df.unpersist(), drops it after unpersisting the LogicalRDD's own
    RDD. Without this, blocks linger until the py4j proxy is finalized AND
    the JVM ContextCleaner notices — nondeterministic, and a 50k-merge run
    would pin thousands of orphan vocabulary snapshots in storage memory.

    The reach-through is private-API (ADVICE r09): a Spark upgrade that
    changes the plan shape would silently revert to leaking. Swallowed
    failures are therefore COUNTED in ``DROP_CKPT_FAILURES`` — the
    hygiene test asserts zero blocks leak, and any nonzero counter after
    a train run is visible to callers/bench without digging through
    RDDStorageInfo."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        # non-LogicalRDD plan (not a checkpoint) — nothing to free
        global DROP_CKPT_FAILURES
        DROP_CKPT_FAILURES += 1
        return


def train_bpe(words: DataFrame, merges: int = BPE_MERGES) -> list[tuple]:
    """Learn ``merges`` BPE merges from a (word, c) vocabulary relation.
    Returns [(iteration, left_sym, right_sym, pair_count), ...] with
    symbols in CONTENT domain (the internal '|' ↦ ' ' delimiter escape is
    unmapped at return, so the result matches a textbook BPE run on the
    raw words — including pipe-bearing ones).

    De-sequenced (VERDICT r08 item 2, tightened r10 per VERDICT r09 item
    2): each pass materializes ONE vocabulary-scale relation — the padded
    trigram aggregate (``_tri_table``) — and every per-pass statistic
    (pair counts, new-pair ceilings, exact overlap losses) is a bounded
    driver read of that checkpoint. ``_greedy_batch`` then simulates
    sequential greedy EXACTLY on the driver, adjusting symbol-sharing
    candidates by their true trigram losses instead of breaking the batch
    at the first overlap (the r08/r09 prefix rule), and applies the whole
    batch as ONE chained-replace projection. A 50k-merge production run
    needs ~merges/batch vocabulary passes, not ``merges``. Emitted merges
    are bit-identical to the sequential trainer, so the unrolled
    exact-greedy DuckDB oracle is unchanged."""
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
    created: set = set()  # concat strings of every emitted merge (escaped)
    LAST_TRAIN_STATS.update(passes=0, merges=0, batch_sizes=[])
    # try/finally (ADVICE r09): an exception mid-pass (a failed collect)
    # must not leak prev_ckpt/seqed/tg blocks — the exact leak class the
    # r09 hygiene fix targets.
    try:
        while len(out) < merges:
            # ONE vocabulary-scale job per pass: materialize the padded
            # trigram aggregate; the top-pair / ceiling / overlap reads
            # below are bounded re-aggregations of the checkpoint.
            tg = _tri_table(cur).localCheckpoint()
            LAST_TRAIN_STATS["passes"] += 1
            try:
                batch = _collect_batch_stats(
                    tg, merges - len(out), frozenset(created)
                )
            finally:
                _drop_ckpt(tg)
            if not batch:  # every word fully merged
                break
            LAST_TRAIN_STATS["batch_sizes"].append(len(batch))
            seq = F.col("seq")
            for a, b, pc in batch:
                out.append((len(out) + 1, a, b, pc))
                created.add(a + b)
                seq = F.replace(
                    seq, F.lit(f"|{a}||{b}|"), F.lit(f"|{a}{b}|")
                )
            cur = cur.select(seq.alias("seq"), "c")
            if len(out) < merges:
                # keep lineage one projection deep across passes (a
                # 50k-merge run would otherwise stack thousands of
                # replace() layers)
                cur = cur.localCheckpoint()
                if prev_ckpt is not None:
                    _drop_ckpt(prev_ckpt)
                prev_ckpt = cur
    finally:
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
    broadcast-joins the word→positioned-subword-ids map. Token ids are
    pre-joined into that map on the VOCABULARY-sized side (r12, guide
    §2.4 — the r11 shape ran a second posexplode + a second broadcast
    hash join over the corpus-width subword stream; attaching ids where
    the relation is |V| rows leaves the corpus stream one join + one
    generate). No corpus-sized shuffle anywhere."""
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
    ).localCheckpoint()  # consumed by the vocab derivation AND the id join
    vocab = global_rank(
        wsubs.select(F.explode("subs").alias("subword")).distinct(),
        ["subword"],
        rank_col="token_id",
    )
    # word → [(sub_pos, subword, token_id)...]: the id lookup runs ONCE per
    # vocabulary word here instead of once per corpus subword occurrence
    # downstream; array_sort on the leading sub_pos restores subword order
    # after the join scrambles it.
    wsubs_ids = (
        wsubs.select("word", F.posexplode("subs").alias("sub_pos", "subword"))
        .join(F.broadcast(vocab), "subword")
        .groupBy("word")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("sub_pos", "subword", "token_id"))
            ).alias("subs")
        )
    )
    dw = d.select(
        "doc_id",
        F.posexplode(F.filter(F.split("text", " "), lambda w: w != "")).alias(
            "word_pos", "word"
        ),
    )
    return (
        dw.join(F.broadcast(wsubs_ids), "word")
        .select("doc_id", "word_pos", F.explode("subs").alias("s"))
        .select(
            "doc_id",
            "word_pos",
            F.col("s.sub_pos").alias("sub_pos"),
            F.col("s.subword").alias("subword"),
            F.col("s.token_id").alias("token_id"),
        )
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

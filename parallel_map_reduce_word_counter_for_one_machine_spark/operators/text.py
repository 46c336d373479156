"""Text-analysis operators for a training-data pipeline (driver contract
§ north-star extensions; no reference citation — the reference's only text
operation is its tokenizer, src/main.cpp:55-75, which these generalize).

All hot-path logic is JVM-side array/lambda expressions (``split``,
``filter``, ``transform``, ``zip_with``, ``aggregate``) — no Python UDFs:
at 100 TB these run inside whole-stage codegen per partition with zero
serialization across the Python boundary.

Determinism notes (exact value-hash vs DuckDB):
- Double arithmetic is emitted unrounded where both engines execute the
  identical IEEE op sequence per row (ratios, divisions).
- ``tfidf`` rounds to 6dp: ``ln`` differs by ≤1 ulp between Java's and C's
  libm, and document-frequency aggregation order is engine-specific.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import ORACLES, query
from ..sources.tables import load_table

# BPE-ish pretokenizer: letter runs, digit runs, single non-alnum symbols.
# Kept to syntax shared by Java regex (Spark) and RE2 (DuckDB oracle).
BPE_TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny high-frequency stopword lists per language for the n-gram-free
# language-ID heuristic (set-membership scoring — the classic fastText-lite
# fallback when no model is available).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "von"],
    "fr": ["le", "la", "les", "et", "est", "de"],
    "es": ["el", "la", "los", "y", "es", "de"],
}


def _words(col: str = "text") -> F.Column:
    return F.split(F.col(col), " ")


@query(
    "text_stats",
    oracle=(
        "SELECT doc_id, length(text) AS n_chars_calc, "
        "len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tokens, "
        "len(list_distinct(list_filter(string_split(text, ' '), w -> w <> ''))) "
        "  AS n_distinct_tokens, "
        "CAST(length(replace(text, ' ', '')) AS DOUBLE) "
        "  / NULLIF(len(list_filter(string_split(text, ' '), w -> w <> '')), 0)"
        "  AS avg_token_len "
        "FROM documents"
    ),
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics — one narrow projection, no shuffle;
    the per-doc arrays never leave the executor."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(_words(), lambda w: w != "")
    n = F.size(toks)
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_calc"),
        n.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        # NULL for token-less docs (ANSI mode would raise DIVIDE_BY_ZERO)
        F.when(
            n > 0,
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / n,
        ).alias("avg_token_len"),
    )


def _lang_hits(lang: str) -> F.Column:
    return F.size(
        F.array_intersect(_words(), F.array(*[F.lit(w) for w in STOPWORDS[lang]]))
    )


@query(
    "lang_id",
    oracle=(
        "WITH scored AS (SELECT doc_id, lang, "
        + ", ".join(
            f"len(list_intersect(string_split(text, ' '), {ws!r}::VARCHAR[]))"
            f" AS hits_{lg}"
            for lg, ws in STOPWORDS.items()
        )
        + " FROM documents) "
        "SELECT doc_id, lang, hits_en, hits_de, hits_fr, hits_es, "
        "CASE WHEN greatest(hits_en, hits_de, hits_fr, hits_es) = 0 THEN 'unknown' "
        "WHEN hits_en >= greatest(hits_de, hits_fr, hits_es) THEN 'en' "
        "WHEN hits_de >= greatest(hits_fr, hits_es) THEN 'de' "
        "WHEN hits_fr >= hits_es THEN 'fr' ELSE 'es' END AS pred_lang "
        "FROM scored"
    ),
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-membership language ID (n-gram-heuristic class). Distinct-set
    intersection sizes per language, argmax with a fixed preference order so
    ties are deterministic. Pure JVM set ops — scales linearly, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    hits = {lg: _lang_hits(lg) for lg in STOPWORDS}
    pred = (
        F.when(
            F.greatest(*[hits[lg] for lg in STOPWORDS]) == 0, F.lit("unknown")
        )
        .when(hits["en"] >= F.greatest(hits["de"], hits["fr"], hits["es"]), F.lit("en"))
        .when(hits["de"] >= F.greatest(hits["fr"], hits["es"]), F.lit("de"))
        .when(hits["fr"] >= hits["es"], F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    return d.select(
        "doc_id",
        "lang",
        hits["en"].alias("hits_en"),
        hits["de"].alias("hits_de"),
        hits["fr"].alias("hits_fr"),
        hits["es"].alias("hits_es"),
        pred.alias("pred_lang"),
    )


@query(
    "quality_score",
    oracle=(
        "WITH t AS (SELECT doc_id, "
        "len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tokens, "
        "len(list_distinct(list_filter(string_split(text, ' '), w -> w <> '')))"
        " AS n_distinct, "
        "len(list_intersect(string_split(text, ' '), "
        "['the','a','of','and','to','in','is']::VARCHAR[])) AS stop_hits "
        "FROM documents) "
        "SELECT doc_id, n_tokens, "
        "CAST(n_distinct AS DOUBLE) / NULLIF(n_tokens, 0) AS ttr, "
        "CAST(stop_hits AS DOUBLE) / NULLIF(n_tokens, 0) AS stop_ratio, "
        "(CASE WHEN n_tokens >= 20 THEN 1.0 ELSE CAST(n_tokens AS DOUBLE) / 20 END)"
        " * (CAST(n_distinct AS DOUBLE) / NULLIF(n_tokens, 0)) AS quality "
        "FROM t"
    ),
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic doc-quality signals: type-token ratio, stopword ratio, and a
    length-damped composite — the pre-filter stage of an LLM data pipeline.
    Identical fixed-order double arithmetic on both engines (no rounding)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(_words(), lambda w: w != "")
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    stop_hits = F.size(
        F.array_intersect(_words(), F.array(*[F.lit(w) for w in STOPWORDS["en"]]))
    )
    # NULL ratios for token-less docs (ANSI divide-by-zero guard)
    ttr = F.when(n_tokens > 0, n_distinct.cast("double") / n_tokens)
    length_damp = F.when(n_tokens >= 20, F.lit(1.0)).otherwise(
        n_tokens.cast("double") / 20
    )
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        ttr.alias("ttr"),
        F.when(n_tokens > 0, stop_hits.cast("double") / n_tokens).alias("stop_ratio"),
        (length_damp * ttr).alias("quality"),
    )


@query(
    "token_count_bpe",
    oracle=(
        f"SELECT doc_id, "
        f"len(regexp_extract_all(text, '{BPE_TOKEN_REGEX}')) AS n_bpe_tokens, "
        f"length(text) AS n_chars_calc "
        f"FROM documents"
    ),
)
def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count estimation with a BPE-ish pretokenizer regex (letter runs
    / digit runs / single symbols) — the cheap cost-estimation pass run over
    a corpus before tokenizing for real."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(BPE_TOKEN_REGEX)).alias("n_bpe_tokens"),
        F.length("text").alias("n_chars_calc"),
    )


@query(
    "doc_fingerprint",
    oracle=(
        "SELECT doc_id, md5(lower(text)) AS fp_md5, "
        "md5(array_to_string(list_sort(list_distinct("
        "list_filter(string_split(text, ' '), w -> w <> ''))), ' ')) AS fp_shingle "
        "FROM documents"
    ),
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two content fingerprints: exact (md5 of lowercased text) and
    bag-of-words-invariant (md5 of the sorted distinct token set — catches
    reorder-only duplicates). Both JVM-side digest builtins."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(_words(), lambda w: w != "")
    return d.select(
        "doc_id",
        F.md5(F.lower(F.col("text"))).alias("fp_md5"),
        F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " ")).alias(
            "fp_shingle"
        ),
    )


@query(
    "ngram_bigrams",
    oracle=(
        "SELECT bigram, count(*) AS cnt FROM ("
        "SELECT unnest(list_transform(list_zip(w, w[2:]), "
        "x -> CASE WHEN x[2] IS NULL THEN NULL ELSE x[1] || ' ' || x[2] END)) AS bigram "
        "FROM (SELECT string_split(text, ' ') AS w FROM documents) s"
        ") t WHERE bigram IS NOT NULL GROUP BY bigram"
    ),
)
def ngram_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram counts. Bigrams are built inside the array domain
    (``zip_with`` of the token array with its own tail) so each document
    contributes its n-grams without a per-token shuffle; the only exchange
    is the final count aggregation."""
    d = load_table(spark, sf_dir, "documents")
    w = _words()
    tail = F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0)))
    bigrams = F.zip_with(
        w,
        tail,
        lambda a, b: F.when(b.isNotNull(), F.concat_ws(" ", a, b)),
    )
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .filter(F.col("bigram").isNotNull())
        .groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "tfidf",
    oracle=(
        "WITH tok AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), "
        "w -> w <> '')) AS word FROM documents), "
        "tf AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY doc_id, word), "
        "df AS (SELECT word, count(DISTINCT doc_id) AS df FROM tok GROUP BY word), "
        "n AS (SELECT count(*) AS n_docs FROM documents) "
        "SELECT tf.doc_id, tf.word, tf.tf, df.df, "
        "round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf "
        "FROM tf JOIN df USING (word) CROSS JOIN n"
    ),
)
def tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF over the corpus: per-doc term counts ⋈ document frequencies
    (broadcast — |vocabulary| ≪ |corpus|) ⋈ corpus size (scalar broadcast).
    Two aggregations + broadcast joins; the big tokens relation is never
    shuffled twice. 6dp rounding: see module docstring."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.filter(_words(), lambda w: w != "")).alias("word"),
    )
    tf = toks.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    # df derived FROM tf (one row per (doc,word) ⇒ count per word = #docs
    # containing it): aggregates the already-reduced tf relation instead of
    # re-tokenizing + re-shuffling the raw token stream — at 100 TB the
    # second full corpus scan this replaces is the dominant cost.
    df = tf.groupBy("word").agg(F.count("*").alias("df"))
    n_docs = d.count()  # scalar (table count, not data); embedded as literal
    return tf.join(F.broadcast(df), "word").select(
        "doc_id",
        "word",
        "tf",
        "df",
        F.round(
            F.col("tf") * F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)), 6
        ).alias("tfidf"),
    )


@query(
    "tfidf_ngrams",
    oracle=(
        "WITH grams AS (SELECT doc_id, unnest(list_transform(list_zip(w, w[2:]), "
        "x -> CASE WHEN x[2] IS NULL THEN NULL ELSE x[1] || ' ' || x[2] END)) AS gram "
        "FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) s), "
        "g AS (SELECT doc_id, gram FROM grams WHERE gram IS NOT NULL), "
        "tf AS (SELECT doc_id, gram, count(*) AS tf FROM g GROUP BY doc_id, gram), "
        "df AS (SELECT gram, count(DISTINCT doc_id) AS df FROM g GROUP BY gram), "
        "n AS (SELECT count(*) AS n_docs FROM documents) "
        "SELECT tf.doc_id, tf.gram, tf.tf, df.df, "
        "round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf "
        "FROM tf JOIN df USING (gram) CROSS JOIN n"
    ),
)
def tfidf_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF over word BIGRAMS (SURVEY.md §2c key ``tfidf_ngrams``): the
    n-gram generator runs in the array domain per doc, then the same
    two-aggregation + broadcast-join shape as unigram ``tfidf``."""
    d = load_table(spark, sf_dir, "documents")
    w = _words()
    tail = F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0)))
    bigrams = F.zip_with(w, tail, lambda a, b: F.when(b.isNotNull(), F.concat_ws(" ", a, b)))
    g = d.select("doc_id", F.explode(bigrams).alias("gram")).filter(
        F.col("gram").isNotNull()
    )
    tf = g.groupBy("doc_id", "gram").agg(F.count("*").alias("tf"))
    df = tf.groupBy("gram").agg(F.count("*").alias("df"))  # derived from tf
    n_docs = d.count()
    return tf.join(F.broadcast(df), "gram").select(
        "doc_id",
        "gram",
        "tf",
        "df",
        F.round(
            F.col("tf") * F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)), 6
        ).alias("tfidf"),
    )


# Lexicon-based sentiment (PAPERS.md: "Large Scale Sentiment Analysis on
# Twitter with Spark", EDBT 2016 — the classic lexicon baseline): counts of
# polarity words, score = (pos - neg) / (pos + neg).
POS_WORDS = ["fast", "good", "great", "win", "best", "value"]
NEG_WORDS = ["slow", "bad", "error", "fail", "worst", "crash"]


@query(
    "sentiment_score",
    oracle=(
        "WITH t AS (SELECT doc_id, "
        "list_filter(string_split(text, ' '), w -> w <> '') AS toks "
        "FROM documents), c AS (SELECT doc_id, "
        f"len(list_filter(toks, w -> list_contains({POS_WORDS!r}, w))) AS n_pos, "
        f"len(list_filter(toks, w -> list_contains({NEG_WORDS!r}, w))) AS n_neg "
        "FROM t) "
        "SELECT doc_id, n_pos, n_neg, "
        "CAST(n_pos - n_neg AS DOUBLE) / NULLIF(n_pos + n_neg, 0) AS polarity "
        "FROM c"
    ),
)
def sentiment_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon sentiment — counts polarity TOKENS (not set membership, so
    repeated words weigh in), per-row only, no shuffle. Division guarded
    (ANSI mode) and emitted unrounded: both engines run the identical
    IEEE op on integer-valued doubles."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(_words(), lambda w: w != "")
    pos_arr = F.array(*[F.lit(w) for w in POS_WORDS])
    neg_arr = F.array(*[F.lit(w) for w in NEG_WORDS])
    n_pos = F.size(F.filter(toks, lambda w: F.array_contains(pos_arr, w)))
    n_neg = F.size(F.filter(toks, lambda w: F.array_contains(neg_arr, w)))
    c = d.select(
        "doc_id", n_pos.alias("n_pos"), n_neg.alias("n_neg")
    )
    tot = F.col("n_pos") + F.col("n_neg")
    return c.select(
        "doc_id",
        "n_pos",
        "n_neg",
        F.when(
            tot > 0, (F.col("n_pos") - F.col("n_neg")).cast("double") / tot
        ).alias("polarity"),
    )


FREQ_SUPPORT = 0.02  # heavy-hitter threshold: words in >= 2% of all tokens


@query(
    "frequent_words_sketch",
    oracle=(
        # Tolerance oracle (same pattern as approx_distinct): freqItems'
        # single-pass Karp-Frequent sketch guarantees a SUPERSET of the true
        # heavy hitters; the Spark side verifies containment in-query and
        # the oracle pins the exact heavy-hitter count + an all-TRUE verdict.
        "WITH t AS (SELECT unnest(list_filter(string_split(text,' '), "
        "w->w<>'')) AS word FROM documents), "
        "c AS (SELECT word, count(*) AS cnt, sum(count(*)) OVER () AS total "
        "FROM t GROUP BY word) "
        "SELECT CAST(count(*) AS BIGINT) AS n_true_heavy, "
        f"TRUE AS all_contained FROM c WHERE cnt >= {FREQ_SUPPORT} * total"
    ),
)
def frequent_words_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate heavy hitters over the token stream via
    ``DataFrame.stat.freqItems`` (single-pass Karp et al. frequent-items
    sketch — O(1/support) state per partition, merged associatively): THE
    shape for vocabulary-pruning decisions at 100 TB, where an exact
    count-then-filter needs a full vocabulary shuffle first.

    The sketch result is a guaranteed superset of the true >= support
    items (false positives possible, false negatives impossible), so the
    verdict checked against the oracle is "every exact heavy hitter is in
    the sketch output". The sketch list itself is O(1/support) = 50 items
    of driver data — bounded, not corpus-sized."""
    from .wordcount import tokenize

    toks = tokenize(load_table(spark, sf_dir, "documents"))
    sketch = set(toks.stat.freqItems(["word"], FREQ_SUPPORT).collect()[0][0])
    wc = toks.groupBy("word").agg(F.count("*").alias("cnt"))
    total = wc.agg(F.sum("cnt").alias("total"))
    heavy = wc.join(F.broadcast(total)).filter(
        F.col("cnt") >= FREQ_SUPPORT * F.col("total")
    )
    return heavy.agg(
        F.count("*").alias("n_true_heavy"),
        F.coalesce(
            F.bool_and(F.col("word").isin(list(sketch))), F.lit(True)
        ).alias("all_contained"),
    )


@query(
    "inverted_index",
    oracle=(
        "WITH tok AS (SELECT doc_id, unnest(list_distinct(list_filter("
        "string_split(text, ' '), w -> w <> ''))) AS word FROM documents) "
        "SELECT word, count(*) AS df, "
        "array_to_string(list_sort(list(doc_id))[1:100], ',') AS postings "
        "FROM tok GROUP BY word"
    ),
)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index build: word → document frequency + sorted posting
    list — the search-engine-shaped product of the reference's word→count
    map (src/main.cpp:116 keeps only counts; an index keeps WHERE).

    One explode of the per-doc DISTINCT token set, one groupBy(word) —
    identical shuffle shape to word_count, except the aggregation state
    carries doc_ids. Posting lists are capped at 100 ids per word
    (deterministically: the smallest doc_ids): uncapped, a stopword's
    posting list at 15 B documents is billions of entries in ONE reducer
    row — real systems chunk postings; the cap stands in for that chunking
    while keeping `df` (the full count) exact."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.filter(_words(), lambda w: w != ""))).alias(
            "word"
        ),
    )
    postings = F.slice(F.array_sort(F.collect_list("doc_id")), 1, 100)
    return tok.groupBy("word").agg(
        F.count("*").alias("df"),
        F.array_join(
            F.transform(postings, lambda x: x.cast("string")), ","
        ).alias("postings"),
    )


@query(
    "quality_repetition",
    oracle=(
        "WITH bg AS (SELECT doc_id, unnest(list_transform(list_zip(w, w[2:]), "
        "x -> CASE WHEN x[2] IS NULL THEN NULL ELSE x[1] || ' ' || x[2] END)) "
        "AS bigram FROM (SELECT doc_id, string_split(text, ' ') AS w "
        "FROM documents) s), "
        "c AS (SELECT doc_id, bigram, count(*) AS n FROM bg "
        "WHERE bigram IS NOT NULL GROUP BY doc_id, bigram) "
        "SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams, "
        "CAST(max(n) AS BIGINT) AS top_bigram_n, "
        "CAST(max(n) AS DOUBLE) / sum(n) AS repetition_ratio "
        "FROM c GROUP BY doc_id"
    ),
)
def quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-bigram ratio per document — the classic template-spam /
    boilerplate signal (a doc whose most frequent bigram covers a large
    fraction of its text is "spam spam spam", not prose); used as a
    filter rule alongside ``quality_score``'s length/punct heuristics.

    Shape: per-doc bigrams built in the array domain (zip_with of the
    token array with its own tail, as in ``ngram_bigrams``), exploded and
    counted by (doc_id, bigram), then folded to max/sum per doc — two
    combiner-friendly shuffles whose key cardinality is bounded by
    document size, never corpus vocabulary. Docs with <2 tokens have no
    bigrams and drop out (no NULL-ratio rows to special-case)."""
    d = load_table(spark, sf_dir, "documents")
    w = _words()
    tail = F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0)))
    bigrams = F.zip_with(
        w, tail, lambda a, b: F.when(b.isNotNull(), F.concat_ws(" ", a, b))
    )
    counts = (
        d.select("doc_id", F.explode(bigrams).alias("bigram"))
        .filter(F.col("bigram").isNotNull())
        .groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("n"))
    )
    return counts.groupBy("doc_id").agg(
        F.sum("n").alias("n_bigrams"),
        F.max("n").alias("top_bigram_n"),
        (F.max("n").cast("double") / F.sum("n")).alias("repetition_ratio"),
    )


@query(
    "corpus_stats",
    oracle=(
        "SELECT source, lang, count(*) AS n_docs, "
        # CAST AS BIGINT: DuckDB sums BIGINT into HUGEINT, which lands as
        # float64 in the driver's canonicalizer and hashes `2301.0` vs
        # Spark's `2301` (the one red r03 hash row). Same cast every other
        # sum-oracle in this file carries.
        "CAST(sum(len(list_filter(string_split(text, ' '), w -> w <> ''))) "
        "AS BIGINT) AS total_tokens, "
        "CAST(sum(length(text)) AS BIGINT) AS total_chars, "
        "CAST(round(avg(len(list_filter(string_split(text, ' '), w -> w <> ''))) "
        "* 10000) AS BIGINT) AS avg_tokens_per_doc_e4 "
        "FROM documents GROUP BY source, lang"
    ),
)
def corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) corpus accounting — the report a training-data
    pipeline runs before and after every curation stage (token budgets per
    slice, mixture weights). One partial+final aggregate pass; the token
    counting is a per-row array expression that never leaves the executor,
    so the shuffle carries one row per (source, lang) cell, not per doc.
    avg is an aggregate double → emitted as fixed-point BIGINT (×10⁴) on
    both sides: a rounded double round-trips differently through the
    driver's hash canonicalizer than through DuckDB (the one red r02 row,
    VERDICT.md), so the output carries no float at all."""
    d = load_table(spark, sf_dir, "documents")
    ntok = F.size(F.filter(_words(), lambda w: w != ""))
    return d.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(ntok).alias("total_tokens"),
        F.sum(F.length("text")).alias("total_chars"),
        F.round(F.avg(ntok) * 10000)
        .cast("long")
        .alias("avg_tokens_per_doc_e4"),
    )


# Vocabulary size for the unigram LM quality scorer. Deterministic top-V by
# (count DESC, word) so both engines select the identical vocabulary.
LM_VOCAB_SIZE = 1000


@query(
    "lm_unigram_logprob",
    oracle=(
        "WITH tok AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), "
        "w -> w <> '')) AS word FROM documents), "
        "tot AS (SELECT count(*) AS n FROM tok), "
        "vocab AS (SELECT word, count(*) AS c FROM tok GROUP BY word "
        f"ORDER BY c DESC, word LIMIT {LM_VOCAB_SIZE}), "
        "scored AS (SELECT t.doc_id, "
        "ln(coalesce(v.c, 1) * 1.0 / tot.n) AS lp "
        "FROM tok t LEFT JOIN vocab v ON t.word = v.word CROSS JOIN tot) "
        "SELECT doc_id, count(*) AS n_tokens, "
        "round(avg(lp), 4) AS avg_logprob FROM scored GROUP BY doc_id"
    ),
)
def lm_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean unigram log-probability — the language-model
    quality signal (CCNet-style): documents whose tokens are improbable
    under a corpus LM (garbled text, wrong language, boilerplate noise)
    score low and get filtered or down-mixed. A full pipeline uses a
    5-gram KenLM; the unigram version has the identical Spark shape with
    an exactly-oracleable model.

    Two passes, both scale-shaped: (1) train = token count groupBy with a
    deterministic top-V cut (TakeOrderedAndProject — V rows ever leave the
    agg) + one scalar total; (2) score = explode tokens, BROADCAST the
    V-row model (left join, OOV floor count 1), re-aggregate per doc.
    The corpus shuffles once per pass, keyed by word then doc_id; the
    model itself never exceeds V rows."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.filter(_words(), lambda w: w != "")).alias("word")
    )
    # Two consumers (vocab build + scoring scan): materialize the token
    # stream once, as everywhere else in this module.
    tok = tok.localCheckpoint()
    vocab = (
        tok.groupBy("word")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("word"))
        .limit(LM_VOCAB_SIZE)
    )
    total = tok.agg(F.count("*").alias("n"))
    lp = F.log(F.coalesce(F.col("c"), F.lit(1)) * 1.0 / F.col("n"))
    return (
        tok.join(F.broadcast(vocab), "word", "left")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(lp), 4).alias("avg_logprob"),
        )
    )


# DSIR target slice: the "domain" whose distribution selection should
# match (the driver tables have no domain column; lang plays the role).
DSIR_TARGET_LANG = "en"


@query(
    "dsir_weights",
    oracle=(
        "WITH tok AS (SELECT d.doc_id, d.lang, "
        "unnest(list_filter(string_split(d.text, ' '), w -> w <> '')) AS word "
        "FROM documents d), "
        "model AS (SELECT word, count(*) AS raw_c, "
        f"sum(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END) AS tgt_c "
        "FROM tok GROUP BY word), "
        "tot AS (SELECT sum(raw_c) AS n_raw, sum(tgt_c) AS n_tgt, "
        "count(*) AS v FROM model), "
        "scored AS (SELECT t.doc_id, "
        "ln(((m.tgt_c + 1.0) / (tot.n_tgt + tot.v)) / "
        "((m.raw_c + 1.0) / (tot.n_raw + tot.v))) AS llr "
        "FROM tok t JOIN model m ON t.word = m.word CROSS JOIN tot) "
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, "
        "round(avg(llr), 4) + 0.0 AS avg_llr, "  # +0.0 folds -0.0 -> 0.0
        "round(avg(llr), 4) > 0 AS selected FROM scored GROUP BY doc_id"
    ),
)
def dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Data Selection via Importance
    Resampling, Xie et al., NeurIPS 2023 — public; PAPERS.md family): score
    every document by the mean log-likelihood ratio of its tokens under a
    TARGET-domain unigram model vs the RAW-corpus model (add-1 smoothing
    on both), and flag the positive-ratio docs — the ones more probable
    under the target distribution — as selected. This is the
    domain-matching data-selection step of a pretraining pipeline (raw
    web corpus resampled toward a quality/domain target).

    Scale shape: ONE token-stream pass builds BOTH models (conditional
    count inside a single groupBy — raw_c and tgt_c per word), totals are
    one model-sized aggregate, and scoring broadcasts the model back over
    a second token pass — the lm_unigram_logprob economics with two
    numerators. The paper's hashed-n-gram trick (features =
    hash(ngram) % 10k) is what bounds the model when the vocabulary
    doesn't fit a broadcast: identical plan with a pmod(xxhash64(...))
    projection before the groupBy — word-level here because the oracle
    must reproduce the feature map cross-engine."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        "lang",
        F.explode(F.filter(_words(), lambda w: w != "")).alias("word"),
    ).localCheckpoint()  # two consumers: model build + scoring scan
    model = tok.groupBy("word").agg(
        F.count("*").alias("raw_c"),
        F.sum(
            F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0)
        ).alias("tgt_c"),
    )
    tot = model.agg(
        F.sum("raw_c").alias("n_raw"),
        F.sum("tgt_c").alias("n_tgt"),
        F.count("*").alias("v"),
    )
    llr = F.log(
        ((F.col("tgt_c") + 1.0) / (F.col("n_tgt") + F.col("v")))
        / ((F.col("raw_c") + 1.0) / (F.col("n_raw") + F.col("v")))
    )
    avg_llr = F.round(F.avg(llr), 4) + F.lit(0.0)  # +0.0 folds -0.0 -> 0.0
    return (
        tok.join(F.broadcast(model), "word")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            avg_llr.alias("avg_llr"),
            (avg_llr > 0).alias("selected"),
        )
    )


# Gopher-rule bounds (Rae et al. 2021, §A1.1 — public paper; PAPERS.md).
# The word-count floor is scaled to the synthetic corpus (real Gopher uses
# 50..100k words; our docs are single-line token streams).
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_STOP_HITS = 2


@query(
    "quality_gopher",
    oracle=(
        "WITH t AS (SELECT doc_id, "
        "list_filter(string_split(text, ' '), w -> w <> '') AS toks "
        "FROM documents), "
        "m AS (SELECT doc_id, len(toks) AS n_words, "
        "CAST(len(array_to_string(toks, '')) AS DOUBLE) / NULLIF(len(toks), 0) "
        "  AS mean_word_len, "
        "CAST(len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)"
        " / NULLIF(len(toks), 0) AS alpha_frac, "
        "CAST(len(list_filter(toks, w -> w IN ('#', '...', '…'))) AS DOUBLE)"
        " / NULLIF(len(toks), 0) AS symbol_ratio, "
        "len(list_intersect(toks, "
        "['the','a','of','and','to','in','is']::VARCHAR[])) AS stop_hits "
        "FROM t) "
        "SELECT doc_id, n_words, mean_word_len, alpha_frac, symbol_ratio, "
        "stop_hits, "
        "(n_words BETWEEN 50 AND 100000) AND "
        "(mean_word_len BETWEEN 3.0 AND 10.0) AND (alpha_frac >= 0.8) AND "
        "(symbol_ratio <= 0.1) AND (stop_hits >= 2) AS gopher_pass "
        "FROM m"
    ),
)
def quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document-quality rule battery (Rae et al. 2021 §A1.1):
    word-count bounds, mean word length 3–10, ≥80% words containing an
    alphabetic character, ≤10% symbol tokens (#/ellipsis), ≥2 English
    stopwords. Emits every metric plus the conjunction flag so downstream
    filters can relax individual rules without recomputing.

    All metrics are per-row array expressions in whole-stage codegen — a
    map-only pass at any scale. Ratio NULL-guards on token-less docs match
    the ANSI divide-by-zero convention used across this module; a doc with
    no tokens fails the word-count bound so ``gopher_pass`` is FALSE
    regardless (AND with NULL never yields TRUE here because n_words=0 is
    itself FALSE — both engines agree on three-valued AND)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(_words(), lambda w: w != "")
    dd = d.select("doc_id", toks.alias("toks"))
    n = F.size("toks")
    mean_len = F.when(
        n > 0, F.length(F.array_join("toks", "")).cast("double") / n
    )
    alpha_frac = F.when(
        n > 0,
        F.size(F.filter("toks", lambda w: w.rlike("[A-Za-z]"))).cast("double") / n,
    )
    # filter, not array_intersect: the ratio counts symbol OCCURRENCES
    # (matching the oracle's list_filter), not distinct symbol kinds.
    symbol_ratio = F.when(
        n > 0,
        F.size(F.filter("toks", lambda w: w.isin("#", "...", "…"))).cast("double")
        / n,
    )
    stop_hits = F.size(
        F.array_intersect(
            F.col("toks"), F.array(*[F.lit(w) for w in STOPWORDS["en"]])
        )
    )
    passes = (
        n.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & mean_len.between(GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN)
        & (alpha_frac >= GOPHER_MIN_ALPHA_FRAC)
        & (symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO)
        & (stop_hits >= GOPHER_MIN_STOP_HITS)
    )
    return dd.select(
        "doc_id",
        n.alias("n_words"),
        mean_len.alias("mean_word_len"),
        alpha_frac.alias("alpha_frac"),
        symbol_ratio.alias("symbol_ratio"),
        stop_hits.alias("stop_hits"),
        passes.alias("gopher_pass"),
    )


@query(
    "quality_dup_ngrams",
    oracle=(
        "WITH w AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents), "
        "tg AS (SELECT doc_id, unnest(list_transform(list_zip(t, t[2:], t[3:]), "
        "x -> CASE WHEN x[3] IS NULL THEN NULL "
        "ELSE x[1] || ' ' || x[2] || ' ' || x[3] END)) AS trigram FROM w), "
        "c AS (SELECT doc_id, trigram, count(*) AS n FROM tg "
        "WHERE trigram IS NOT NULL GROUP BY doc_id, trigram) "
        "SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_trigrams, "
        "CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS n_dup_occ, "
        "CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS DOUBLE) / sum(n) "
        "AS dup_frac "
        "FROM c GROUP BY doc_id"
    ),
)
def quality_dup_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher's duplicate-n-gram repetition metric (Rae et al. 2021 §A1.1,
    n=3): the fraction of a document's trigram occurrences that belong to
    trigrams appearing more than once WITHIN the document. Complements
    ``quality_repetition`` (top-bigram dominance): dup_frac catches diffuse
    repetition — a page cycling through ten boilerplate sentences scores
    high here while no single bigram dominates.

    Shape: per-doc trigrams via the zip_with chain in the array domain,
    exploded and counted by (doc_id, trigram), folded to per-doc sums —
    two combiner-friendly shuffles keyed by doc-local cardinality, exactly
    the ``quality_repetition`` plan with one more zip. Docs with <3 tokens
    have no trigrams and drop out."""
    d = load_table(spark, sf_dir, "documents")
    w = _words()
    t2 = F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0)))
    t3 = F.slice(w, 3, F.greatest(F.size(w) - 2, F.lit(0)))
    tri = F.zip_with(
        F.zip_with(w, t2, lambda a, b: F.concat_ws(" ", a, b)),
        t3,
        lambda ab, c: F.when(c.isNotNull(), F.concat_ws(" ", ab, c)),
    )
    counts = (
        d.select("doc_id", F.explode(tri).alias("trigram"))
        .filter(F.col("trigram").isNotNull())
        .groupBy("doc_id", "trigram")
        .agg(F.count("*").alias("n"))
    )
    dup = F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(F.lit(0)))
    return counts.groupBy("doc_id").agg(
        F.sum("n").alias("n_trigrams"),
        dup.alias("n_dup_occ"),
        (dup.cast("double") / F.sum("n")).alias("dup_frac"),
    )


OOV_VOCAB_K = 20


@query(
    "oov_rate",
    oracle=(
        "WITH toks AS (SELECT doc_id, unnest(list_filter(string_split(text,"
        " ' '), w -> w <> '')) AS word FROM documents), "
        "freq AS (SELECT word, count(*) AS c FROM toks GROUP BY word), "
        f"vocab AS (SELECT word FROM freq ORDER BY c DESC, word LIMIT {OOV_VOCAB_K}) "
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, "
        "CAST(count(CASE WHEN word NOT IN (SELECT word FROM vocab) THEN 1 "
        "END) AS BIGINT) AS n_oov, "
        "round(count(CASE WHEN word NOT IN (SELECT word FROM vocab) THEN 1 "
        "END) * 1.0 / count(*), 6) AS oov_rate "
        "FROM toks GROUP BY doc_id"
    ),
)
def oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus's own top-K
    vocabulary — the coverage metric a tokenizer/vocab decision is judged
    by (a doc whose tokens are mostly OOV is noise to a fixed-vocab model
    and a candidate for filtering or vocab growth). Deterministic vocab:
    top OOV_VOCAB_K words by (count DESC, word ASC) — a TakeOrdered over
    the word-frequency aggregate, i.e. bounded driver-side state like
    every top-k here. Membership is a broadcast left join (K rows), so
    the corpus is scanned once for frequencies and once for scoring —
    in a deployment the vocab is a persisted table and scoring is the
    only pass. Empty-token docs emit no row (no tokens to rate), same on
    both engines."""
    from .wordcount import SPACE_DELIM

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", SPACE_DELIM)).alias("word")
    ).filter(F.col("word") != "")
    vocab = (
        toks.groupBy("word")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("word"))
        .limit(OOV_VOCAB_K)
        .select("word", F.lit(1).alias("in_vocab"))
    )
    joined = toks.join(F.broadcast(vocab), "word", "left")
    n_oov = F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        n_oov.cast("long").alias("n_oov"),
        F.round(n_oov / F.count("*"), 6).alias("oov_rate"),
    )


@query(
    "quality_deciles",
    oracle=(
        "WITH t AS (SELECT doc_id, "
        "len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tokens, "
        "len(list_distinct(list_filter(string_split(text, ' '), w -> w <> '')))"
        " AS n_distinct FROM documents), "
        "q AS (SELECT doc_id, "
        "(CASE WHEN n_tokens >= 20 THEN 1.0 ELSE CAST(n_tokens AS DOUBLE) / 20"
        " END) * (CAST(n_distinct AS DOUBLE) / NULLIF(n_tokens, 0)) AS quality"
        " FROM t), "
        "r AS (SELECT doc_id, quality, row_number() OVER (ORDER BY quality,"
        " doc_id) AS rk, count(*) OVER () AS n FROM q "
        "WHERE quality IS NOT NULL) "
        "SELECT CAST(floor((rk - 1) * 10.0 / n) AS BIGINT) AS decile, "
        "CAST(count(*) AS BIGINT) AS n_docs, "
        "min(quality) AS q_min, max(quality) AS q_max "
        "FROM r GROUP BY 1"
    ),
)
def quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-decile bucketing — the curriculum/mixture-design step that
    follows scoring (sample decile 9 at full weight, decile 0 not at all).
    Decile = floor((global_rank − 1) · 10 / N) over (quality, doc_id) —
    computed with the DISTRIBUTED rank (operators/rank.py: range exchange
    + per-partition row_number + P-row offsets), NOT an
    `ntile() OVER (ORDER BY …)` single-partition window, which would
    funnel the corpus through one task at 100 TB. min/max per decile are
    order-insensitive exact doubles (the quality expression is fixed-order
    arithmetic on both engines); no averages, so no rounding slack
    needed. Token-less docs (NULL quality) are excluded — their decile is
    undefined, same rule both engines."""
    from .rank import global_rank

    q = quality_score(spark, sf_dir).filter(F.col("quality").isNotNull())
    ranked = global_rank(q.select("doc_id", "quality"), ["quality", "doc_id"])
    n_total = ranked.count()
    return (
        ranked.withColumn(
            "decile",
            # explicit floor: DuckDB CAST(double AS BIGINT) ROUNDS, Spark
            # cast truncates — floor() agrees everywhere for rk >= 1
            F.floor((F.col("rk") - 1) * 10 / F.lit(n_total)).cast("long"),
        )
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("quality").alias("q_min"),
            F.max("quality").alias("q_max"),
        )
    )


# Stupid Backoff discount (Brants et al., EMNLP'07 — "Large Language
# Models in Machine Translation"): score, not probability; the fixed 0.4
# backoff is the web-scale replacement for tuned Kneser-Ney discounts.
SB_ALPHA = 0.4


@query(
    "lm_bigram_backoff",
    oracle=(
        "WITH t AS (SELECT doc_id, "
        "list_filter(string_split(text, ' '), w -> w <> '') AS t FROM documents), "
        "tok AS (SELECT doc_id, unnest(t) AS word FROM t), "
        "bg AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2 "
        "FROM t, LATERAL unnest(generate_series(1, len(t) - 1)) AS g(i) "
        "WHERE len(t) >= 2), "
        "uni AS (SELECT word, count(*) AS c1 FROM tok GROUP BY word), "
        "big AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2), "
        "tot AS (SELECT count(*) AS n FROM tok), "
        "scored AS (SELECT bg.doc_id, "
        "CASE WHEN big.c2 IS NOT NULL THEN ln(big.c2 * 1.0 / u1.c1) "
        f"ELSE ln({SB_ALPHA} * u2.c1 / tot.n) END AS lp "
        "FROM bg JOIN uni u1 ON bg.w1 = u1.word "
        "JOIN uni u2 ON bg.w2 = u2.word "
        "LEFT JOIN big ON bg.w1 = big.w1 AND bg.w2 = big.w2 CROSS JOIN tot) "
        "SELECT doc_id, count(*) AS n_bigrams, "
        "round(avg(lp), 4) AS avg_logscore FROM scored GROUP BY doc_id"
    ),
)
def lm_bigram_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean bigram log-score under Stupid Backoff — the next
    rung above ``lm_unigram_logprob`` on the LM-quality ladder and the
    shape of a KenLM-style fluency filter: S(w₂|w₁) = c(w₁w₂)/c(w₁) when
    the bigram was seen, else SB_ALPHA·c(w₂)/N (back off to the unigram,
    Brants et al. EMNLP'07). Repetitive/templated docs score high,
    shuffled or disfluent text scores low even when every unigram is
    common — the signal the unigram model cannot see.

    Scale shape, and the one big difference from the unigram key: a
    bigram model over a web corpus does NOT fit a broadcast, so the score
    join is a plain hash join of the bigram stream against the bigram
    count table on (w₁,w₂) — the stream is already shuffled by that key
    from the counting groupBy, so AQE reuses the exchange; only the
    unigram side rides a broadcast. Bigram pairs come from one
    element_at pass over the token array (no self-join on positions).
    Trained and scored on the same corpus here, so every unigram exists
    (no zero-prob floor needed); 4-dp rounding per the module float
    policy."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.filter(_words(), lambda w: w != "").alias("t"))
    toks = toks.localCheckpoint()
    tok = toks.select("doc_id", F.explode("t").alias("word"))
    bg = toks.filter(F.size("t") >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("t"), i).alias("w1"),
                    F.element_at(F.col("t"), i + 1).alias("w2"),
                ),
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    uni = tok.groupBy("word").agg(F.count("*").alias("c1"))
    big = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    tot = tok.agg(F.count("*").alias("n"))
    lp = F.when(
        F.col("c2").isNotNull(), F.log(F.col("c2") * 1.0 / F.col("u1c"))
    ).otherwise(F.log(F.lit(SB_ALPHA) * F.col("u2c") / F.col("n")))
    return (
        bg.join(
            F.broadcast(uni.select(F.col("word").alias("w1"), F.col("c1").alias("u1c"))),
            "w1",
        )
        .join(
            F.broadcast(uni.select(F.col("word").alias("w2"), F.col("c1").alias("u2c"))),
            "w2",
        )
        .join(big, ["w1", "w2"], "left")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(lp), 4).alias("avg_logscore"),
        )
    )


@query(
    "lang_agreement_report",
    oracle=(
        "WITH p AS (" + ORACLES["lang_id"] + ") "
        "SELECT lang AS declared, pred_lang AS predicted, "
        "CAST(count(*) AS BIGINT) AS n_docs, "
        "round(CAST(count(*) AS DOUBLE) / sum(count(*)) "
        "OVER (PARTITION BY lang), 6) AS frac_of_declared "
        "FROM p GROUP BY lang, pred_lang"
    ),
)
def lang_agreement_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """METADATA VALIDATION: the confusion table between each document's
    DECLARED language tag and the content-derived ``lang_id`` prediction —
    the audit a pipeline runs before trusting upstream metadata for
    mixture weighting or routing (a partner feed whose 'en' tag is 30%
    mislabeled quietly poisons every per-language decision downstream).
    Per (declared, predicted) cell: doc count and the cell's share of its
    declared row (the row-normalized confusion matrix). Off-diagonal
    mass localizes WHICH tag is unreliable; the 'unknown' column is the
    stopword model's own abstention rate.

    Scale shape: the lang_id scoring is a linear JVM set-intersection
    scan; the report is one partial-aggregable groupBy over (declared,
    predicted) — |langs|² cells out — plus a window over that tiny cell
    table. Oracle composes the registered lang_id oracle verbatim, so
    the two keys cannot drift."""
    p = lang_id(spark, sf_dir).select(
        F.col("lang").alias("declared"), F.col("pred_lang").alias("predicted")
    )
    cells = p.groupBy("declared", "predicted").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    w = Window.partitionBy("declared")
    return cells.select(
        "declared",
        "predicted",
        "n_docs",
        F.round(
            F.col("n_docs").cast("double") / F.sum("n_docs").over(w), 6
        ).alias("frac_of_declared"),
    )


# --- Positional phrase search ------------------------------------------------


@query(
    "phrase_search",
    oracle=(
        "WITH t AS (SELECT doc_id, "
        "list_filter(string_split(text, ' '), w -> w <> '') AS w "
        "FROM documents), "
        "tri AS (SELECT doc_id, unnest(list_transform("
        "range(1, greatest(len(w) - 1, 1)), "
        "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g FROM t), "
        "top AS (SELECT g FROM (SELECT g, count(*) AS c FROM tri GROUP BY g "
        "ORDER BY c DESC, g ASC LIMIT 1)) "
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches, "
        "(SELECT g FROM top) AS phrase "
        "FROM tri WHERE g = (SELECT g FROM top) GROUP BY doc_id"
    ),
)
def phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase query answered from POSITIONAL posting lists — the
    inverted-index operation ``inverted_index`` (text.py:431) builds toward:
    all (doc, position) pairs where the corpus's most frequent trigram
    occurs verbatim, counted per doc.

    Two stages, deliberately asymmetric in shape:

    1. PHRASE SELECTION (offline analytics): trigram counts in the array
       domain (one linear transform, one corpus-token-sized groupBy — the
       word_count shuffle shape), argmax by (count DESC, phrase ASC)
       collected as ONE row (bounded collect, the bpetrain.py argmax
       doctrine).
    2. PHRASE MATCH (the online query): the positional postings relation
       (word, doc_id, pos) is filtered to the phrase's THREE terms BEFORE
       any join — in a term-partitioned index layout this is partition
       pruning, i.e. query cost scales with the three posting lists, not
       the corpus — then the lists intersect on (doc_id, pos+offset) with
       two co-partitioned equi-joins. On 100 TB the posting lists of a
       phrase's terms are the only bytes read.

    The driver oracle recomputes both stages (argmax tie-break included)
    from the trigram relation alone, so the posting-join path must agree
    with the direct n-gram count for every doc."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.filter(_words(), lambda w: w != "").alias("w")
    )
    tri = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("w") >= 3,
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - 2),
                    lambda i: F.array_join(F.slice(F.col("w"), i, 3), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g"),
    )
    top = (
        tri.groupBy("g")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("g"))
        .limit(1)
        .collect()
    )
    phrase = top[0].g if top else ""
    terms = phrase.split(" ") if phrase else []
    if len(terms) != 3:  # degenerate corpus: no trigram anywhere
        return spark.createDataFrame(
            [], "doc_id BIGINT, n_matches BIGINT, phrase STRING"
        )

    postings = toks.select(
        "doc_id", F.posexplode("w").alias("pos", "word")
    ).filter(F.col("word").isin(terms))
    p0 = postings.filter(F.col("word") == terms[0]).select("doc_id", "pos")
    p1 = postings.filter(F.col("word") == terms[1]).select(
        "doc_id", (F.col("pos") - 1).alias("pos")
    )
    p2 = postings.filter(F.col("word") == terms[2]).select(
        "doc_id", (F.col("pos") - 2).alias("pos")
    )
    return (
        p0.join(p1, ["doc_id", "pos"])
        .join(p2, ["doc_id", "pos"])
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_matches"))
        .select("doc_id", "n_matches", F.lit(phrase).alias("phrase"))
    )

"""End-to-end corpus curation: the composite query an LLM-data pipeline
actually runs — quality gate → exact dedup → language ID → per-doc stats,
in ONE declarative plan (each stage is individually oracle-checked
elsewhere; this entry proves they compose).

Plan shape: one documents scan feeds the per-row quality/lang/stat
expressions (no shuffle), then a single md5-keyed aggregation implements
keep-lowest-doc-id dedup; the final join back to row attributes is on the
deduped (small) side. Two shuffles total regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load_table
from .text import STOPWORDS

MIN_TOKENS = 20
MIN_TTR = 0.3


@query(
    "curate_corpus",
    oracle=(
        "WITH scored AS ("
        "  SELECT doc_id, text, lang, "
        "    len(list_filter(string_split(text,' '), w -> w <> '')) AS n_tokens, "
        "    CAST(len(list_distinct(list_filter(string_split(text,' '), w -> w <> ''))) AS DOUBLE)"
        "      / NULLIF(len(list_filter(string_split(text,' '), w -> w <> '')), 0) AS ttr "
        "  FROM documents), "
        "kept AS (SELECT * FROM scored WHERE n_tokens >= 20 AND ttr >= 0.3), "
        "dedup AS ("
        "  SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_copies "
        "  FROM kept GROUP BY md5(text)) "
        "SELECT k.doc_id, k.lang, k.n_tokens, k.ttr, d.n_copies "
        "FROM kept k JOIN dedup d ON k.doc_id = d.keep_id"
    ),
)
def curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gated, deduplicated corpus with per-doc metadata — the rows a
    downstream tokenizer would consume."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    n_tokens = F.size(toks)
    # Guarded BEFORE the quality filter: ANSI mode evaluates the projection
    # during the scan, so an unguarded division crashes on a zero-token doc
    # even though the filter would discard it.
    ttr = F.when(n_tokens > 0, F.size(F.array_distinct(toks)).cast("double") / n_tokens)
    scored = d.select(
        "doc_id",
        "text",
        "lang",
        n_tokens.alias("n_tokens"),
        ttr.alias("ttr"),
    )
    kept = scored.filter(
        (F.col("n_tokens") >= MIN_TOKENS) & (F.col("ttr") >= MIN_TTR)
    )
    dedup = kept.groupBy(F.md5("text").alias("fp")).agg(
        F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies")
    )
    return kept.join(
        dedup, kept.doc_id == dedup.keep_id
    ).select("doc_id", "lang", "n_tokens", "ttr", "n_copies")


@query(
    "source_typo_pairs",
    oracle=(
        # brute-force truth over the (small) distinct-source domain — the
        # blocked candidate generation must be COMPLETE at distance <= 1
        "WITH s AS (SELECT DISTINCT source FROM documents) "
        "SELECT a.source AS src_a, b.source AS src_b, "
        "CAST(levenshtein(a.source, b.source) AS BIGINT) AS dist "
        "FROM s a JOIN s b ON a.source < b.source "
        "AND levenshtein(a.source, b.source) <= 1"
    ),
)
def source_typo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical source/domain detection — the variant-collapse step
    of source-level curation (``cap_per_source``'s sibling: before capping
    per domain you must notice 'src1' and 'src11' are different but
    'example.com' / 'examp1e.com' are a typosquat pair). All pairs of
    distinct sources at Levenshtein distance <= 1, WITHOUT the O(V²)
    all-pairs join: SymSpell-style deletion-neighborhood blocking — each
    string generates itself plus its |s| single-deletion variants, pairs
    sharing a variant are the only candidates, then an exact levenshtein
    verify. Complete at distance 1 by construction (substitution ⇒ both
    sides delete the substituted position and meet at the same string;
    insertion/deletion ⇒ the longer side's deletion meets the shorter
    side's identity variant). At 100 TB vocabulary scale this is linear in
    total string length with a groupBy-shaped shuffle on variant keys —
    the same bucketed-not-all-pairs doctrine as every dedup path here;
    deeper neighborhoods (distance 2) add the deletions-of-deletions
    tier, same plan shape."""
    src = (
        load_table(spark, sf_dir, "documents").select("source").distinct()
    )
    # identity + 1-deletion variants, as pure array expressions
    variants = src.select(
        "source",
        F.explode(
            F.array_union(
                F.array(F.col("source")),
                F.expr(
                    "transform(sequence(1, length(source)), "
                    "i -> concat(substr(source, 1, i - 1), "
                    "substr(source, i + 1, length(source))))"
                ),
            )
        ).alias("v"),
    )
    a, b = variants.alias("a"), variants.alias("b")
    cands = (
        a.join(b, F.col("a.v") == F.col("b.v"))
        .filter(F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .distinct()
    )
    dist = F.levenshtein("src_a", "src_b")
    return cands.filter(dist <= 1).select(
        "src_a", "src_b", dist.cast("long").alias("dist")
    )


@query(
    "curate_funnel_report",
    oracle=(
        "WITH scored AS ("
        "  SELECT doc_id, text, "
        "    len(list_filter(string_split(text,' '), w -> w <> '')) AS n_tokens, "
        "    CAST(len(list_distinct(list_filter(string_split(text,' '), w -> w <> ''))) AS DOUBLE)"
        "      / NULLIF(len(list_filter(string_split(text,' '), w -> w <> '')), 0) AS ttr "
        "  FROM documents), "
        "kept AS (SELECT * FROM scored WHERE n_tokens >= 20 AND ttr >= 0.3), "
        "surv AS (SELECT min(doc_id) AS keep_id FROM kept GROUP BY md5(text)) "
        "SELECT CAST((SELECT count(*) FROM scored) AS BIGINT) AS n_input, "
        "CAST((SELECT count(*) FROM scored WHERE n_tokens < 20) AS BIGINT) "
        "AS n_dropped_length, "
        "CAST((SELECT count(*) FROM scored WHERE n_tokens >= 20 "
        "AND (ttr IS NULL OR ttr < 0.3)) AS BIGINT) AS n_dropped_ttr, "
        "CAST((SELECT count(*) FROM kept) - (SELECT count(*) FROM surv) "
        "AS BIGINT) AS n_dropped_dup, "
        "CAST((SELECT count(*) FROM surv) AS BIGINT) AS n_output, "
        "round(CAST((SELECT count(*) FROM surv) AS DOUBLE) "
        "/ (SELECT count(*) FROM scored), 6) AS yield_frac"
    ),
)
def curate_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FUNNEL over ``curate_corpus``'s stages — the chart every
    curation writeup leads with: input docs, drops per gate (length,
    type-token ratio, exact dedup), final output, end-to-end yield. A
    gate ordering or predicate drift between this report and the corpus
    key would desynchronize their oracles, so the stage predicates here
    are copies OF the registered curate_corpus oracle's CTEs — the driver
    re-proves both against the same definitions every round. Drop
    classes are disjoint and ordered (length first, then ttr among
    length-survivors, then dup among gate-survivors): the report's
    columns sum exactly to n_input.

    Scale shape: one scored scan, counts as partial aggregates, the dup
    stage one content-hash groupBy — the same shapes as the underlying
    pipeline, emitting six numbers."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    n_tokens = F.size(toks)
    ttr = F.when(
        n_tokens > 0, F.size(F.array_distinct(toks)).cast("double") / n_tokens
    )
    scored = d.select(
        "doc_id", "text", n_tokens.alias("n_tokens"), ttr.alias("ttr")
    ).localCheckpoint()
    kept = scored.filter(
        (F.col("n_tokens") >= MIN_TOKENS) & (F.col("ttr") >= MIN_TTR)
    )
    n_input = scored.count()
    n_len = scored.filter(F.col("n_tokens") < MIN_TOKENS).count()
    n_ttr = scored.filter(
        (F.col("n_tokens") >= MIN_TOKENS)
        & (F.col("ttr").isNull() | (F.col("ttr") < MIN_TTR))
    ).count()
    n_kept = kept.count()
    n_out = kept.groupBy(F.md5("text")).count().count()
    return spark.createDataFrame(
        [
            (
                n_input,
                n_len,
                n_ttr,
                n_kept - n_out,
                n_out,
                round(n_out / n_input, 6),
            )
        ],
        "n_input BIGINT, n_dropped_length BIGINT, n_dropped_ttr BIGINT, "
        "n_dropped_dup BIGINT, n_output BIGINT, yield_frac DOUBLE",
    )

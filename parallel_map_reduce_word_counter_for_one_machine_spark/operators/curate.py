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

"""User-defined function surface: scalar pandas UDF, grouped-agg UDAF, and
a Python UDTF (SURVEY.md §2b: the reference has no extension points at all
— its tokenizer et al. are hard-coded into main()).

Placement policy (the engine's UDF doctrine, enforced elsewhere by plan
tests): builtins first — every UDF here exists because it demonstrates the
extension surface, and each docstring states what would justify the Python
round-trip in production (custom native libs, model inference, business
logic that genuinely can't be expressed as expressions). All are
Arrow-vectorized; none are row-at-a-time Python UDFs.

NOTE: pandas_udf/udtf return-type DDL parsing requires an active
SparkSession, so UDF objects are constructed lazily inside the query
functions — module import stays session-free (the driver imports the
contract module before building its session).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load_table


def make_signed_log1p():
    """Vectorized scalar pandas UDF: sign-preserving log1p — stands in for
    any numpy-backed feature transform (Arrow batches, ~100x faster than a
    row-at-a-time Python UDF)."""

    @F.pandas_udf("double")
    def signed_log1p(v: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(np.sign(v) * np.log1p(np.abs(v)))

    return signed_log1p


@query(
    "udf_scalar_pandas",
    oracle=(
        # DuckDB computes the same transform natively; 6dp rounding absorbs
        # libm-vs-numpy last-ulp differences in log1p.
        "SELECT event_id, round(sign(value) * ln(1 + abs(value)), 6) AS slog "
        "FROM events"
    ),
)
def udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF applied over the events stream — checked against
    the closed-form SQL equivalent."""
    e = load_table(spark, sf_dir, "events")
    slog = make_signed_log1p()
    return e.select("event_id", F.round(slog("value"), 6).alias("slog"))


def make_geomean():
    """Grouped-aggregate pandas UDF (UDAF): geometric mean — the shape for
    custom sketch merges or model-metric aggregations."""

    @F.pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        import numpy as np

        return float(np.exp(np.log(v.to_numpy()).mean()))

    return geomean


@query(
    "udf_grouped_agg",
    oracle=(
        "SELECT o_orderpriority, round(exp(avg(ln(o_totalprice))), 4) AS geo_price "
        "FROM orders GROUP BY o_orderpriority"
    ),
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDAF via grouped-agg pandas UDF, oracle-checked against the
    closed-form exp(avg(ln)). 4dp rounding: the UDAF averages per-group in
    one numpy pass while the oracle's avg() accumulates in SQL order."""
    o = load_table(spark, sf_dir, "orders")
    geomean = make_geomean()
    return o.groupBy("o_orderpriority").agg(
        F.round(geomean("o_totalprice"), 4).alias("geo_price")
    )


class SplitWords:
    """Python UDTF: one (word, position) row per token — the table-function
    form of the tokenizer. Justified when tokenization needs a real
    library (sentencepiece/tiktoken); here it mirrors split+posexplode so
    tests can assert equivalence with the pure-expression plan."""

    def eval(self, text: str):
        if text is None:
            return
        for i, w in enumerate(text.split(" ")):
            if w:
                yield (w, i)


def register_udtf(spark: SparkSession) -> None:
    spark.udtf.register("split_words", F.udtf(SplitWords, returnType="word: string, pos: int"))


@query(
    "udtf_split_words",
    oracle=(
        # enumerate() numbers EMPTY tokens too (then skips them), so pos is
        # the 0-based index in the raw split — mirrored by filtering AFTER
        # the series join.
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents) "
        "SELECT doc_id, a[i] AS word, CAST(i - 1 AS INTEGER) AS pos "
        "FROM t, LATERAL unnest(generate_series(1, len(a))) g(i) "
        "WHERE a[i] <> ''"
    ),
)
def udtf_split_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF in a LATERAL join — posexplode equivalence asserted in tests,
    and the full (doc_id, word, pos) relation value-checked against the
    DuckDB oracle: the Python UDTF path is held to the same hard gate as
    the pure-expression operators."""
    register_udtf(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("v_docs_udtf")
    return spark.sql(
        "SELECT doc_id, s.word, s.pos "
        "FROM v_docs_udtf, LATERAL split_words(text) AS s"
    )


@query(
    "arrow_vector_norms",
    oracle=(
        # closed-form twin: L2 norm per embedding, 6dp to absorb last-ulp
        "SELECT vec_id, "
        "round(sqrt(list_sum(list_transform(embedding, x -> x * x))), 6)"
        " AS l2 FROM embeddings"
    ),
)
def arrow_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow``: the zero-copy tier of the Python boundary — batches
    arrive as pyarrow RecordBatches and never materialize a pandas frame
    (no object-boxing, no index allocation), which matters exactly when the
    payload is large fixed-width arrays like embeddings. numpy views the
    Arrow buffers directly: for a 64-dim float column the pandas detour
    costs more than the math. Production case: feeding batches to a
    C++/GPU scorer that speaks Arrow. Held to the same closed-form oracle
    as every other Python-boundary demo (package UDF doctrine above)."""
    import numpy as np
    import pyarrow as pa

    def norms(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue
            col = batch.column(batch.schema.get_field_index("embedding"))
            flat = col.flatten()  # one contiguous values buffer
            X = np.asarray(flat, dtype=np.float64).reshape(batch.num_rows, -1)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("vec_id")),
                    pa.array(
                        np.round(np.sqrt((X * X).sum(axis=1)), 6),
                        type=pa.float64(),
                    ),
                ],
                names=["vec_id", "l2"],
            )

    vecs = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return vecs.mapInArrow(norms, schema="vec_id long, l2 double")


@query(
    "udf_arrow_optimized",
    oracle=(
        # closed-form twin of the per-row bucketing logic
        # explicit NULL arm: the UDF returns None for NULL input, while a
        # bare CASE's ELSE would map NULL to 'high'
        "SELECT event_id, CASE WHEN value IS NULL THEN NULL "
        "WHEN value < 0 THEN 'neg' "
        "WHEN value < 50 THEN 'low' ELSE 'high' END AS bucket FROM events"
    ),
)
def udf_arrow_optimized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-OPTIMIZED scalar Python UDF (``useArrow=True``): still
    row-at-a-time Python logic, but batched over Arrow instead of pickled
    row-by-row — the right tier when the logic is genuinely per-row Python
    (a business-rule engine, a C extension taking scalars) yet the
    pandas_udf vectorized form doesn't apply. Completes the Python
    boundary ladder demonstrated in this module: builtin expr < arrow
    udf < pandas_udf < mapInPandas < mapInArrow, each one oracle-checked.
    The per-row form is NEVER used on package hot paths (plan-test-
    enforced doctrine; this key exists to cover the API tier)."""

    @F.udf(returnType="string", useArrow=True)
    def bucket(v: float) -> str:
        if v is None:
            return None
        return "neg" if v < 0 else ("low" if v < 50 else "high")

    e = load_table(spark, sf_dir, "events")
    return e.select("event_id", bucket("value").alias("bucket"))


@query(
    "robust_length_stats",
    oracle=(
        "WITH m AS (SELECT source, median(n_chars) AS med FROM documents "
        "GROUP BY source), "
        "dev AS (SELECT d.source, abs(d.n_chars - m.med) AS dv "
        "FROM documents d JOIN m ON d.source = m.source), "
        "s AS (SELECT source, median(dv) AS mad FROM dev GROUP BY source) "
        "SELECT m.source AS source, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(m.med AS DOUBLE) AS med_chars, CAST(s.mad AS DOUBLE) AS mad_chars, "
        "CAST(count(CASE WHEN s.mad > 0 AND abs(d.n_chars - m.med) > 3 * s.mad "
        "THEN 1 END) AS BIGINT) AS n_outliers "
        "FROM documents d JOIN m ON d.source = m.source "
        "JOIN s ON d.source = s.source "
        "GROUP BY m.source, m.med, s.mad"
    ),
)
def robust_length_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInPandas`` — the per-GROUP rung of the Python
    ladder (each source's docs arrive as ONE pandas frame): median/MAD
    robust length profile + 3-MAD outlier count per source, the
    quarantine signal length-based curation uses (mean/stddev are
    dragged by the very outliers being hunted; median/MAD are not).
    Justified as a grouped-map demo because rank statistics are genuinely
    awkward as streaming aggregates; the closed-form DuckDB twin (median
    is exact on both engines, interpolating at even counts) holds it to
    the hard gate. Caveat stated for 100 TB: one group must fit one
    worker's memory — true for per-source profiles (docs-per-source is
    capped by `cap_per_source` upstream), NOT true for groupBy(lang);
    skewed grouping keys need the sketch path (`percentiles_approx`)."""
    import numpy as np
    import pandas as pd

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["n_chars"].to_numpy(dtype=np.float64)
        med = float(np.median(x))
        mad = float(np.median(np.abs(x - med)))
        n_out = int(((np.abs(x - med) > 3 * mad).sum())) if mad > 0 else 0
        return pd.DataFrame(
            {
                "source": [pdf["source"].iloc[0]],
                "n_docs": [len(x)],
                "med_chars": [med],
                "mad_chars": [mad],
                "n_outliers": [n_out],
            }
        )

    d = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    return d.groupBy("source").applyInPandas(
        stats,
        schema=(
            "source string, n_docs long, med_chars double, "
            "mad_chars double, n_outliers long"
        ),
    )

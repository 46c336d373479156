"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic document generator, registered as
``format("wordgen")``.

The reference's only source is one ifstream over a text file
(src/main.cpp:104-108); this is the engine-side generalization — a
pluggable source that participates in Spark's planning like any file
format: it reports PARTITIONS (each generated independently on an
executor — the source scales horizontally) and accepts FILTER PUSHDOWN
(range predicates on ``doc_id`` are absorbed into the generator so
unneeded partitions produce zero rows instead of rows-then-filter).

Generation is a per-row LCG (deterministic in (seed, doc_id)): the same
options always yield the identical corpus, which is what makes the
source usable in tests and benchmarks — and is the same property the
synthetic-benchmark sources in real engines guarantee (dbgen/tpch).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

VOCAB = [
    "the", "a", "of", "and", "to", "in", "is", "spark", "table", "row",
    "scan", "join", "sort", "hash", "merge", "filter", "group", "window",
    "batch", "stream", "key", "value", "part", "fast", "slow",
]

_LCG_A = 6364136223846793005
_LCG_C = 1442695040888963407
_MASK = (1 << 64) - 1


def _doc_text(seed: int, doc_id: int) -> str:
    """Deterministic token stream for one doc: LCG keyed by (seed, doc_id)."""
    state = (seed * 0x9E3779B97F4A7C15 + doc_id * _LCG_A + _LCG_C) & _MASK
    n = 20 + state % 30
    words = []
    for _ in range(n):
        state = (state * _LCG_A + _LCG_C) & _MASK
        words.append(VOCAB[(state >> 33) % len(VOCAB)])
    return " ".join(words)


class WordgenReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("docs", 1000))
        self.n_parts = int(options.get("partitions", 4))
        self.seed = int(options.get("seed", 42))
        # pushdown state: surviving [lo, hi] doc_id range
        self.lo = 0
        self.hi = self.n_docs - 1

    def pushFilters(self, filters):  # noqa: N802 (API name)
        """Absorb doc_id range predicates into the generator; return the
        rest for Spark to evaluate post-scan (the file-source contract)."""
        for f in filters:
            if isinstance(f, (GreaterThan, GreaterThanOrEqual, LessThan,
                              LessThanOrEqual)) and f.attribute == ("doc_id",):
                v = int(f.value)
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, v + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, v)
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, v - 1)
                else:
                    self.hi = min(self.hi, v)
            elif isinstance(f, IsNotNull) and f.attribute == ("doc_id",):
                pass  # generated ids are never null — absorbed for free
            else:
                yield f  # unsupported → Spark evaluates it after the scan

    def partitions(self):
        # contiguous doc_id ranges; a partition fully outside the pushed
        # range yields nothing (the pruning is per-row inside read(), so
        # out-of-range partitions cost one range() over zero survivors)
        per = (self.n_docs + self.n_parts - 1) // self.n_parts
        return [
            InputPartition((i * per, min((i + 1) * per, self.n_docs)))
            for i in range(self.n_parts)
        ]

    def read(self, partition):
        start, stop = partition.value
        lo, hi = max(start, self.lo), min(stop - 1, self.hi)
        for doc_id in range(lo, hi + 1):
            yield (doc_id, _doc_text(self.seed, doc_id))


class WordgenStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same generator: each micro-batch emits the
    next ``batch_docs`` doc_ids, up to ``docs`` total. The offset dict
    carries only the next doc_id — replayable, so a restarted query
    regenerates identical batches (``readBetweenOffsets`` is the exact
    replay path Structured Streaming calls during recovery)."""

    def __init__(self, options):
        self.n_docs = int(options.get("docs", 1000))
        self.batch = int(options.get("batch_docs", 100))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self):  # noqa: N802 (API name)
        return {"next": 0}

    def read(self, start):
        lo = start["next"]
        hi = min(lo + self.batch, self.n_docs)
        # a LIST, not a generator: the runner caches and copy.copy()s the
        # returned iterator for prefetch replay, and generators can't be
        # copied (TypeError observed) — batches are bounded anyway
        return (
            [(i, _doc_text(self.seed, i)) for i in range(lo, hi)],
            {"next": hi},
        )

    def readBetweenOffsets(self, start, end):  # noqa: N802 (API name)
        return [
            (i, _doc_text(self.seed, i))
            for i in range(start["next"], end["next"])
        ]


class WordgenDataSource(DataSource):
    @classmethod
    def name(cls):
        return "wordgen"

    def schema(self):
        return "doc_id bigint, text string"

    def reader(self, schema):
        return WordgenReader(self.options)

    def simpleStreamReader(self, schema):  # noqa: N802 (API name)
        return WordgenStreamReader(self.options)


def register(spark) -> None:
    # Python-source filter pushdown is opt-in (Spark 4.1); a reader that
    # implements pushFilters() fails fast if the flag is off, so flipping
    # it here is part of registering the source.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(WordgenDataSource)

"""Query registry: the single source of truth wiring operators to the driver
contract in ``__spark_entry__.py``.

Every implemented operator registers a callable ``(spark, sf_dir) ->
DataFrame`` plus (when SQL-expressible) a DuckDB oracle SQL string computing
the same result over the same parquet tables. Column names are aliased
identically on both sides because the driver's comparator sorts columns by
name before hashing values.

Non-SQL-expressible ops (MinHash-LSH dedup, streaming stateful ops) register
with ``oracle=None`` and get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; optionally attach DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module for its registration side effects.

    ORDER MATTERS for the driver: it walks ``queries()`` in registration
    order under a per-round budget (round 1 stamped only the first ~50
    keys). Registration order is therefore priority order — the reference
    word-count surface first, then the LLM-pipeline operators (dedup,
    similarity, text, multimodal, curation, streaming — the round-1 gap),
    then the relational long-tail that already carries round-1 stamps.
    """
    # Imports deferred so `import registry` stays cheap and cycle-free.
    from .operators import (  # noqa: F401
        binarytok,
        wordcount,
        dedup,
        graphdedup,  # after dedup: composes its registered oracle
        similarity,
        text,
        multimodal,
        pipeline,
        curate,
        analytics,
    )
    from .functions import udfs  # noqa: F401
    from .streaming import dedupstream, joins, tumbling  # noqa: F401
    from .sources import bucketed, partitioned  # noqa: F401
    from .operators import (  # noqa: F401
        relational,
        relational2,
        relational3,
        temporal,
        sqlfront,
    )

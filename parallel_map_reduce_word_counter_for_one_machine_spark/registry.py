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


def _last_green_round() -> dict[str, int]:
    """key → most recent round number with a green driver hash row, read
    from the recorded CORRECTNESS_r{N}.json files (repo root)."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        for key, row in data.items():
            if isinstance(row, dict) and row.get("hash_match"):
                last[key] = max(last.get(key, 0), rnd)
    return last


def prioritize() -> None:
    """Reorder ``QUERIES``: never-green keys first, then green keys by
    STALENESS (oldest last-green round first).

    ORDER MATTERS for the driver: it walks ``queries()`` in registration
    order under a per-round budget (~50 keys/round, STATUS.md), so keys past
    the budget never receive a CORRECTNESS row. Rounds 1-2 left 23 keys
    never stamped and 10 stamped-but-not-green (VERDICT.md r2 item 1); with
    the whole registry green after r04, the budget's remaining slots now
    rotate as DRIFT RE-CHECKS — staleness ordering (VERDICT r04 item 8)
    guarantees no key's most recent green row ages more than
    ceil(registry/budget) rounds, instead of the tail never re-stamping.
    Python's sort is stable, so registration order breaks ties within one
    staleness class.
    """
    last = _last_green_round()
    items = sorted(QUERIES.items(), key=lambda kv: last.get(kv[0], -1))
    QUERIES.clear()
    QUERIES.update(items)


def load_all() -> None:
    """Import every operator module for its registration side effects, then
    reorder the registry so un-verified keys land inside the driver's
    per-round stamping budget (see ``prioritize``)."""
    # Imports deferred so `import registry` stays cheap and cycle-free.
    from .operators import (  # noqa: F401
        binarytok,
        wordcount,
        dedup,
        graphdedup,  # after dedup: composes its registered oracle
        similarity,
        annindex,  # after similarity: composes its codebooks/verdict
        semdedup,  # after similarity: reuses its quantizer/cosine
        embedprep,  # after similarity: reuses its cosine
        sketches,
        text,
        retrieval,
        corpusstats,
        dataquality,
        multimodal,
        pipeline,
        curate,
        analytics,
        chunking,
        layout,
        graph,
        selection,
        bpetrain,
        textnorm,
    )
    from .functions import udfs  # noqa: F401
    from .streaming import (  # noqa: F401
        chunkstream,
        dedupstream,
        fuzzygate,
        joins,
        latedata,
        scd2sink,
        stateful,
        tumbling,
        upsertsink,
    )
    from .sources import (  # noqa: F401
        bucketed,
        compaction,
        evolution,
        formats,
        partitioned,
    )
    from .operators import (  # noqa: F401
        relational,
        relational2,
        relational3,
        temporal,
        sqlfront,
    )

    prioritize()

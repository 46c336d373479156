"""Physical-plan inspection helpers.

The scale contract ("would this plan survive 100×?") is enforced in tests,
not prose: tests assert broadcast joins stay broadcast, filters/projections
reach the parquet scan, top-k plans as TakeOrderedAndProject, and
aggregations keep their partial (map-side) phase — the Spark equivalents of
everything the reference hand-coded (SURVEY.md §4).
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def count_occurrences(df: DataFrame, needle: str, mode: str = "formatted") -> int:
    return plan_string(df, mode).count(needle)


def assert_in_plan(df: DataFrame, *needles: str) -> None:
    plan = plan_string(df)
    missing = [n for n in needles if n not in plan]
    assert not missing, f"plan missing {missing}:\n{plan}"


def assert_not_in_plan(df: DataFrame, *needles: str) -> None:
    plan = plan_string(df)
    present = [n for n in needles if n in plan]
    assert not present, f"plan unexpectedly contains {present}:\n{plan}"


def resolve_headline(name: str):
    """Resolve a PLANS.md headline name to its (spark, sf_dir) -> DataFrame
    callable. Most names are registered keys; a few are UNREGISTERED
    production listings whose registered face is a verdict (the ADC/IVFPQ
    family) — the ONE mapping lives here so tools/dump_plans.py and
    tests/test_plan_drift.py cannot pin different plans under the same
    name (VERDICT r07 item 6). Imports are local to avoid import cycles
    (operators import plans helpers in their tests)."""
    from .. import registry
    from ..operators import annindex as _annindex
    from ..operators import dedup as _dedup
    from ..operators import similarity as _similarity

    registry.load_all()
    extra = {
        "ivfpq_pruned_listing": lambda s, d: _annindex.ivfpq_pruned_topk_listing(
            s, d
        ),
        "ivfpq_kmeans_listing": lambda s, d: _annindex.ivfpq_pruned_topk_listing(
            s, d, n_cells=_annindex.IVFPQ_KMEANS_CELLS
        ),
    }
    fn = (
        registry.QUERIES.get(name)
        or extra.get(name)
        or getattr(_dedup, name, None)
        or getattr(_similarity, name)
    )
    return fn

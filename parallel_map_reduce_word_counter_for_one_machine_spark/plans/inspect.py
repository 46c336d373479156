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

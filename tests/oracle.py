"""Local replica of the driver's differential check: run a registered Spark
query and its DuckDB oracle SQL over the same parquet, compare row count,
column names, and order-insensitive values. Running this in tests catches
engine-vs-oracle drift (float summation order, collation, timezone) before
the driver's CORRECTNESS gate does.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb

from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
    TABLE_NAMES,
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round-trip through repr keeps full precision; equality must be exact
        return repr(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # key=repr: rows may mix None with values (outer joins, rollup subtotals)
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows), key=repr
    )


def assert_matches_oracle(spark, sf_dir: str, name: str, query_fn, sql: str) -> None:
    sdf = query_fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_con(sf_dir)
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    con.close()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count mismatch spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    s_canon = _canon(s_rows, s_cols)
    d_canon = _canon(d_rows, d_cols)
    if s_canon != d_canon:
        diffs = [
            (a, b) for a, b in zip(s_canon, d_canon) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")

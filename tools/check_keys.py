"""Focused driver-style check: run named queries() keys at sf0.01 against
their DuckDB oracles (exact repr comparison, same as correctness_sim).

Usage: python tools/check_keys.py key1 key2 ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    import importlib.util

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(root, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = mod.queries(), mod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    failures = []
    for name in sys.argv[1:]:
        t0 = time.monotonic()
        rows = qs[name](spark, SF_DIR).collect()
        if name in osql:
            d = sorted(con.execute(osql[name]).fetchall(), key=repr)
            s = sorted((tuple(r) for r in rows), key=repr)
            ok = len(s) == len(d) and all(repr(a) == repr(b) for a, b in zip(s, d))
            if not ok:
                failures.append(name)
                print(f"FAIL  {name}: spark={len(s)} oracle={len(d)}")
                for a, b in list(zip(s, d))[:5]:
                    if repr(a) != repr(b):
                        print(f"   spark  {a!r}\n   oracle {b!r}")
            else:
                print(f"ok    {name:28s} {len(rows):7d} rows  {time.monotonic()-t0:5.1f}s")
        else:
            print(f"rows  {name:28s} {len(rows):7d} rows  {time.monotonic()-t0:5.1f}s")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

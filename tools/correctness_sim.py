"""Full driver-style CORRECTNESS simulation: run EVERY queries() entry at
sf0.01, compare oracled ones against DuckDB (count + columns + exact
values), count-only for rows-only entries. Exit non-zero on any mismatch.

Run twice back-to-back to catch nondeterminism:
    python tools/correctness_sim.py && python tools/correctness_sim.py

Optional argv[1]: sf dir (default /root/testdata/sf0.01).
Optional argv[2]: comma-separated key list to restrict the run (fast
single-operator iteration while fixing one key).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from pyspark.sql import SparkSession

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py"),
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

    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    failures = []
    t_start = time.monotonic()
    for name in sorted(qs):
        if only is not None and name not in only:
            continue
        t0 = time.monotonic()
        try:
            rows = qs[name](spark, SF_DIR).collect()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR {e}"))
            print(f"FAIL  {name}: spark error {e}")
            continue
        if name in osql:
            d = sorted(con.execute(osql[name]).fetchall(), key=repr)
            s = sorted((tuple(r) for r in rows), key=repr)
            ok = len(s) == len(d) and all(repr(a) == repr(b) for a, b in zip(s, d))
            status = "ok   " if ok else "FAIL "
            if not ok:
                failures.append((name, "value mismatch"))
        else:
            status = "rows "
        print(f"{status}{name:28s} {len(rows):7d} rows  {time.monotonic()-t0:5.1f}s")
    print(f"total {time.monotonic()-t_start:.1f}s, {len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
